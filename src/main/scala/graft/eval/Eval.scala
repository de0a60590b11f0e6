package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relevance judgments (trec_eval format: `qid 0 docid rel`, columns
  * 0/2/3 — `edu/gslis/hbase/trec/Qrels.java:23-130`).
  */
object Qrels {
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      // strip leading whitespace first: split on \s+ yields an empty
      // FIRST element for a line with leading whitespace (hand-edited
      // qrels files have them), which would shift qid/doc_id/rel one
      // field right and silently drop the judgment via the try_cast.
      // regexp_replace, NOT trim() (review r18): SQL TRIM strips
      // SPACES only — a TAB-led line still field-shifted through it
      .select(split(regexp_replace(col("value"), "^\\s+", ""), "\\s+")
        .as("f"))
      .filter(size(col("f")) >= 4)
      .select(
        col("f").getItem(0).as("qid"),
        col("f").getItem(2).as("doc_id"),
        expr("try_cast(f[3] AS INT)").as("rel"))
}

/** TREC evaluation metrics as DataFrame aggregations
  * (`edu/gslis/hbase/trec/Eval.java:23-194`): P, P@k, R, F1, Fβ,
  * utility, AP/MAP. Semantics notes:
  *  - AP divides by the qrels relevant count (`Eval.map`,
  *    `Eval.java:159-170`) — the reference's `avgPrecision` divides by
  *    retrieved count instead; we implement the `map` semantics and
  *    expose the divergence in this doc (SURVEY §4 quirk list).
  *  - utility = max(−100, w·TP − FP) (`Eval.java:118-127`).
  *
  * Scale: one join on (qid, doc_id) + windowed cumsum partitioned by
  * qid; no per-query driver loops.
  */
object Eval {

  /** results (qid, doc_id, rank) × qrels (qid, doc_id, rel>0) →
    * judged rows with rel ∈ {0,1} and the running relevant count.
    */
  def judge(results: DataFrame, qrels: DataFrame): DataFrame =
    results
      // distinct: real trec_eval qrels files can repeat a (qid, doc_id)
      // judgment line; the reference's Qrels map dedupes by key, and a
      // raw left join would duplicate result rows and inflate tp/n_ret.
      .join(qrels.filter(col("rel") > 0).select("qid", "doc_id").distinct()
        .withColumn("rel", lit(1)), Seq("qid", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
      // POSITION, not the caller's rank (review r14): a caller whose
      // ranks carry ties (raw scores instead of row_number) used to
      // get every tied row's rel counted into each peer's cum_rel
      // (the default RANGE frame includes ALL rank peers) AND divide
      // by the shared tied rank — AP could exceed 1 silently. Both
      // the cumsum and the downstream precision denominators run on
      // the deterministic list POSITION (trec_eval's own convention:
      // re-sort, then use positions); pos == rank whenever ranks are
      // unique 1..n, i.e. for every in-repo caller.
      .withColumn("pos",
        expr("row_number() OVER (PARTITION BY qid ORDER BY rank, doc_id)"))
      .withColumn("cum_rel",
        expr("sum(rel) OVER (PARTITION BY qid ORDER BY pos " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))

  /** Per-query metric table. `w` is the utility TP weight. */
  def metrics(results: DataFrame, qrels: DataFrame, k: Int = 10,
              beta: Double = 1.0, w: Double = 2.0): DataFrame =
    metricsAtKs(results, qrels, Seq(k), beta, w)
      .withColumnRenamed(s"p_at_$k", "p_at_k")

  /** [[metrics]] at SEVERAL cutoffs in ONE pass (review r14): rel@k is
    * the only k-dependent aggregate — one conditional sum per cutoff —
    * while the former one-k-per-call shape re-executed the caller's
    * whole results pipeline per cutoff (runQueryKdeSweep paid the
    * retrieval + KDE-sweep DAG twice for p10 + p20). Emits one
    * `p_at_<k>` column per requested cutoff.
    */
  def metricsAtKs(results: DataFrame, qrels: DataFrame, ks: Seq[Int],
                  beta: Double = 1.0, w: Double = 2.0): DataFrame = {
    // positivity too (advice r14): k <= 0 would reach rel_at_0 / 0 at
    // EXECUTION (an ANSI raise) instead of a clear driver-side error
    require(ks.nonEmpty && ks.distinct == ks && ks.forall(_ > 0),
      s"bad cutoffs $ks")
    val nrel = qrels.filter(col("rel") > 0).select("qid", "doc_id")
      .distinct() // same key-dedupe as judge(): repeated lines count once
      .groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val b2 = beta * beta
    val relAtKs = ks.map(k =>
      expr(s"sum(CASE WHEN pos <= $k THEN rel ELSE 0 END)").as(s"rel_at_$k"))
    val aggs = Seq(sum("rel").as("tp")) ++ relAtKs :+
      expr("sum(CASE WHEN rel = 1 THEN cum_rel / CAST(pos AS DOUBLE) ELSE 0 END)")
        .as("ap_num")
    judge(results, qrels)
      .groupBy("qid")
      .agg(count(lit(1)).as("n_ret"), aggs: _*)
      .join(nrel, Seq("qid"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .select(
        (col("qid") +:
          ks.map(k => expr(s"rel_at_$k / CAST($k AS DOUBLE)").as(s"p_at_$k"))) ++
        Seq(
          expr("tp / CAST(n_ret AS DOUBLE)").as("precision"),
          expr("CASE WHEN n_rel > 0 THEN tp / CAST(n_rel AS DOUBLE) ELSE 0e0 END")
            .as("recall"),
          expr(("CASE WHEN tp > 0 THEN (1 + " + b2 + ") * (tp / CAST(n_ret AS DOUBLE))" +
            " * (tp / CAST(n_rel AS DOUBLE)) / (" + b2 +
            " * (tp / CAST(n_ret AS DOUBLE)) + (tp / CAST(n_rel AS DOUBLE)))" +
            " ELSE 0e0 END")).as("f_beta"),
          expr(s"greatest(-100e0, $w * tp - (n_ret - tp))").as("utility"),
          expr("CASE WHEN n_rel > 0 THEN ap_num / n_rel ELSE 0e0 END").as("ap")): _*)
  }

  /** MAP over queries. */
  def map(results: DataFrame, qrels: DataFrame): Double =
    metrics(results, qrels).agg(avg("ap")).head().getDouble(0)
}
