package graft.tools

import graft.{GraftSession, Tables}
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** px40 shape adjudication probe (round 15, the r14 verdict's item 3:
  * px40_shingle_novelty is the one weak-band row — 1.10 s vs 0.18 =
  * 6.1× at the committed pair — that never carried a BENCH_NOTES
  * line). Decomposition + levers:
  *
  *  - DSONLY: the distinct (doc_id, 3-shingle) ledger alone — how much
  *    of the query is the shingle pass everything downstream shares.
  *  - SHIPPED: ds ⋈ (groupBy(s).min(doc_id)) on s, then the per-doc
  *    agg. The join's left side is the FULL distinct ledger (~1.4M
  *    rows at sf0.1), so the ledger crosses the wire into the join
  *    exchange besides feeding the min-agg — and `ds` has two
  *    consumers, so the shingle subtree is planned twice (exchange
  *    reuse decides whether it RUNS twice).
  *  - AGGSPLIT: no ledger join. n_new(doc) = #shingles whose
  *    min(doc_id) = doc ≡ groupBy(s).agg(min) → groupBy(d0).count();
  *    n_sh(doc) = groupBy(doc_id).count(); join the two DOC-level
  *    aggregates (n_docs rows, not n_shingles). Both aggs get
  *    map-side partials; the only wide join left is doc-sized.
  *  - WINDOW: min(doc_id) OVER (PARTITION BY s) on the ledger, then
  *    one per-doc agg — one s-exchange, no join at all, but
  *    WindowExec sorts each partition (no partial agg).
  *
  * Usage: sbt "runMain graft.tools.ProbePx40 [N]" — N replicas of the
  * sf0.1 documents table (replica docs get fresh doc_ids so the
  * ledger grows ~N×). Results → probes/px40.log + BENCH_NOTES §0u.
  */
object ProbePx40 {

  def ds(docs: DataFrame): DataFrame =
    TextOps.shingleRows(docs, 3).distinct()

  def shipped(docs: DataFrame): DataFrame = {
    val d = ds(docs)
    val first = d.groupBy("s").agg(min("doc_id").as("d0"))
    d.join(first, Seq("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        expr("CAST(sum(CASE WHEN d0 = doc_id THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n_new"))
      .withColumn("novelty", expr("round(n_new / n_sh, 6)"))
  }

  def aggSplit(docs: DataFrame): DataFrame = {
    val d = ds(docs)
    val nNew = d.groupBy("s").agg(min("doc_id").as("d0"))
      .groupBy(col("d0").as("doc_id")).agg(count(lit(1)).as("n_new"))
    d.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      .join(nNew, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("novelty", expr("round(n_new / n_sh, 6)"))
  }

  /** aggsplit with the distinct ledger LAZILY localCheckpointed — the
    * §0h px27 pattern: if AQE exchange reuse does NOT deduplicate the
    * two consumers' identical distinct subtrees at runtime, the
    * checkpoint computes the tokenize+shingle+distinct pass once.
    */
  def aggSplitCkpt(docs: DataFrame): DataFrame = {
    val d = ds(docs).localCheckpoint(false)
    val nNew = d.groupBy("s").agg(min("doc_id").as("d0"))
      .groupBy(col("d0").as("doc_id")).agg(count(lit(1)).as("n_new"))
    d.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      .join(nNew, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("novelty", expr("round(n_new / n_sh, 6)"))
  }

  def window(docs: DataFrame): DataFrame =
    ds(docs)
      .withColumn("d0", min("doc_id").over(Window.partitionBy("s")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        expr("CAST(sum(CASE WHEN d0 = doc_id THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n_new"))
      .withColumn("novelty", expr("round(n_new / n_sh, 6)"))

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables(spark, dir, "documents").select("doc_id", "text")
    val nBase = base.count()
    val docs = (if (n == 1) base
      else spark.range(n).toDF("k").crossJoin(base)
        .select((col("doc_id") + col("k") * lit(nBase)).as("doc_id"),
          // vary replica text so the ledger actually grows ~N×
          concat(col("text"), lit(" r"), col("k")).as("text")))
      .localCheckpoint()
    val nd = docs.count()

    val a = shipped(docs)
    for ((nm, b) <- Seq("aggsplit" -> aggSplit(docs), "window" -> window(docs)))
      require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"px40 $nm diverged from the shipped form")
    // pin the probe's local copy to the REGISTERED Decl (review r15:
    // the variants above are copies, and a future px40 edit would
    // otherwise drift from what this probe adjudicates) — at n=1 the
    // probe corpus IS the sf table, so the shipped query must match
    if (n == 1) {
      val decl = graft.SparkEntry.decls.find(_.name == "px40_shingle_novelty")
        .get.run(spark, dir)
      val local = aggSplit(docs)
      require(decl.exceptAll(local).isEmpty && local.exceptAll(decl).isEmpty,
        "px40 probe copy diverged from the registered Decl")
    }

    def t(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = graft.Bench.materialize(df)
      println(f"[px40] $label%-12s n=$n docs=$nd " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$r")
    }
    for (r <- 1 to 3) {
      t(s"dsonly-$r")(ds(docs))
      t(s"shipped-$r")(shipped(docs))
      t(s"aggsplit-$r")(aggSplit(docs))
      t(s"window-$r")(window(docs))
      t(s"aggckpt-$r")(aggSplitCkpt(docs))
      spark.catalog.clearCache()
    }
    // does AQE actually REUSE the two identical distinct subtrees at
    // runtime? Execute the REGISTERED Decl (parquet input — the
    // checkpointed probe corpus would hide the scans) and count plan
    // markers in the FINAL adaptive plan (the static explain never
    // shows runtime reuse; note executedPlan.toString prints the
    // initial plan alongside the final one, so counts read ~2x).
    locally {
      val q = graft.SparkEntry.queries("px40_shingle_novelty")(spark, dir)
      graft.Bench.materialize(q)
      val fin = q.queryExecution.executedPlan.toString
      for (m <- Seq("ReusedExchange", "Scan parquet", "ShuffleQueryStage"))
        println(s"[px40] final-plan $m = ${m.r.findAllIn(fin).length}")
    }
    spark.stop()
  }
}
