package graft.ir

import graft.Tables
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequential-scan retrieval, Spark-first (SURVEY.md §3.1 "Spark shape").
  *
  * The reference scores every query against every document in one pass
  * over the corpus with the query set held in task memory
  * (`nl/utwente/mirex/TrecRun.java:123-150`). Our dataflow:
  *
  *   docs → tokenize/explode → equi-join broadcast(query terms)
  *        → join doc-lengths → join broadcast(term stats)
  *        → groupBy(qid, doc) agg(score) → window top-k
  *
  * i.e. the cross-score "join" becomes a broadcast HASH join on `term`
  * (not a nested loop), partial aggregation runs map-side, and the only
  * shuffles are the groupBy on (qid, doc_id) and the top-k window on
  * qid. At 100 TB the corpus side never materializes more than the
  * matched (doc, query-term) pairs — the semi-join pruning the reference
  * hand-codes (`TrecRun.java:131`) falls out of the equi-join.
  *
  * Scoring formulas are carried as SQL expression STRINGS compiled with
  * `expr(...)` — the same strings are embedded in the DuckDB oracle, so
  * the floating-point math is identical on both engines by construction.
  * All formulas cite the reference implementation they re-express.
  */
object Retrieval {

  /** Literal evaluation query set (terms from the synthetic corpus
    * vocabulary). qtf = 1 for every term, as in the reference's plain
    * topic format (`TrecRun.java:91-106`).
    */
  val querySet: Seq[(String, Seq[String])] = Seq(
    "51" -> Seq("spark", "join"),
    "52" -> Seq("window", "filter", "sort"),
    "53" -> Seq("fast", "data", "merge"),
    "54" -> Seq("stream", "batch"),
    "55" -> Seq("hash", "table", "scan"))

  /** (qid, term) rows as a DuckDB VALUES clause. */
  val duckQueryValues: String =
    querySet
      .flatMap { case (qid, ts) => ts.map(t => s"('$qid','$t')") }
      .mkString("(VALUES ", ",", ") v(qid, term)")

  /** Weighted query set (FIXTURES.md §4 weighted-topic semantics,
    * reference reader `RunQueryHBase.java:138-161`): explicit
    * per-term weights, e-notation literals for cross-engine parity.
    */
  val weightedQuerySet: Seq[(String, Seq[(String, Double)])] = Seq(
    "61" -> Seq("spark" -> 0.7, "join" -> 0.3),
    "62" -> Seq("window" -> 0.5, "filter" -> 0.25, "sort" -> 0.25),
    "63" -> Seq("stream" -> 0.9, "batch" -> 0.1))

  val duckWeightedQueryValues: String =
    weightedQuerySet
      .flatMap { case (qid, ts) =>
        ts.map { case (t, w) => s"('$qid','$t',CAST($w AS DOUBLE))" }
      }
      .mkString("(VALUES ", ",", ") v(qid, term, w)")

  // ---- scoring formulas (identical strings on both engines) ----
  // Row context: tf, dl, df, cf, qlen, n_docs, n_tokens (all BIGINT).

  /** LM no smoothing, log domain; conjunctive — docs missing any query
    * term are dropped by the `n_matched = qlen` gate.
    * Ref: `TrecRun.java:108-116` (product form with doc-length prior).
    */
  val lmnoPart = "ln(tf / dl)"
  val lmnoFinal = "round(score_sum + ln(dl), 6)"

  /** Jelinek-Mercer smoothing, λ=0.5, zero-floor semantics (only docs
    * matching ≥1 term emitted). Ref: `TrecRunBaselines.java:168-180`.
    * Fractional literals use e-notation — DOUBLE in both engines (bare
    * `0.5` would be DECIMAL in Spark; see IrQueries cross-engine rule).
    *
    * Association order (review r14): divide into DOUBLE before any
    * BIGINT×BIGINT product — the old `tf * n_tokens * λ / (cf * dl
    * * …)` grouped (tf·n_tokens) and (cf·dl) as Long products first,
    * which at the 100 TB design point (n_tokens ~ 2e13) overflows
    * Long: with ANSI off it silently WRAPS (mis-scoring the doc),
    * with ANSI on (this session's default) and in DuckDB it
    * hard-errors — wrong or dead exactly when it matters.
    * `(n_tokens / cf)` is the lmdirPart convention; the
    * string is SHARED with the oracle, so both engines carry the same
    * (floating-point-wise slightly re-associated) formula.
    */
  def lmjmPart(lam: String = "5e-1") =
    s"ln(1 + tf * $lam * (n_tokens / cf) / (dl * (1 - $lam)))"
  val lmjmFinal = "round(score_sum + ln(dl), 6)"

  /** Dirichlet smoothing, µ=2500. Ref: `TrecRunBaselines.java:210-220`. */
  val lmdirPart = "ln(tf * (n_tokens / cf) + 2500) - ln(dl + 2500)"
  val lmdirFinal = "round(score_sum, 6)"

  /** BM25, k1=1.2, b=0.75. Ref: `TrecRunBaselines.java:190-201,268`. */
  val bm25Part =
    "(1.2e0 + 1) * tf / (1.2e0 * ((1 - 7.5e-1) + 7.5e-1 * dl / (n_tokens / n_docs)) + tf)" +
      " * ln((n_docs - df + 5e-1) / (df + 5e-1))"
  val bm25Final = "round(score_sum, 6)"

  /** Two-stage smoothing (λ·cp mixed into Dirichlet), λ=0.3, µ=2500.
    * Ref: `RunQueryHBase.java:212-224`.
    */
  val twoStagePart =
    "ln((1 - 3e-1) * (tf + 2500 * (cf / n_tokens)) / (dl + 2500) + 3e-1 * (cf / n_tokens))"
  val twoStageFinal = "round(score_sum, 6)"

  /** Cross-entropy scoring (query-normalized log-ratio of the
    * Dirichlet-smoothed doc model to the collection model).
    * Ref: `RunQueryHBase.java:226-245`.
    */
  val xentPart =
    "(1e0 / qlen) * ln(((tf + 2500 * (cf / n_tokens)) / (dl + 2500)) / (cf / n_tokens))"
  val xentFinal = "round(score_sum, 6)"

  /** The matched (qid, doc, term) rows with all scoring stats attached,
    * for any corpus DataFrame with (doc_id, text) columns and query
    * DataFrame with (qid, term) rows.
    * Broadcast sides: the query set (tiny) and the per-query-term stats
    * (|query vocab| rows). The corpus side streams.
    */
  def matchedTermsFor(docs: DataFrame, q: DataFrame,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    matchedTermsFromTf(TextOps.termFreqs(docs, idCol, textCol), q, idCol)

  /** [[matchedTermsFor]] over an ALREADY-BUILT (idCol, term, tf) frame.
    * Queries that need the term-frequency table for their own math as
    * well as for scoring (ir29 VSM, ir30 Rocchio) pass the one tf in,
    * so the tokenize+aggregate subtree is the same logical object in
    * every branch and its exchange is provably reusable — rather than
    * trusting two independently-built subtrees to canonicalize equal.
    */
  def matchedTermsFromTf(tf: DataFrame, q: DataFrame,
                         idCol: String = "doc_id"): DataFrame = {
    // dl = Σ tf per doc (== token count) as a WINDOW over the tf frame,
    // not groupBy + join-back. The join-back formulation carried a 4th
    // tokenize subtree (Catalyst's pushdowns specialize the clones
    // apart, so ReusedExchange cannot merge them — the ir19/ir30
    // lesson) plus a sort-merge join of the full matched stream
    // against dl; the window replaces both with one exchange on
    // doc_id. tstats and cs keep their own (column-pruned) tokenize
    // branches — forcing them through the windowed frame was tried and
    // the optimizer correctly prunes the unused dl and un-shares them
    // again; 4 scans/12 exchanges → 3/9, measured 10.9–12.1 s →
    // 10.0–10.6 s over the six sequential-scan queries (r5, matched
    // conditions). At 100 TB this whole debate is moot: tf+dl are the
    // materialized doc-vector index (ir/Index.scala, scoreFromIndex) —
    // the sequential-scan path is reference parity, not deployment.
    val qlen = qlenOf(q)
    val tstats = tstatsFor(tf, q)
    // n_docs = docs with ≥1 token, n_tokens = Σ tf (long sums:
    // order-independent, exact)
    val cs = tf.agg(countDistinct(col(idCol)).as("n_docs"),
      sum("tf").as("n_tokens"))
    tf.withColumn("dl", expr(s"sum(tf) OVER (PARTITION BY $idCol)"))
      .join(broadcast(q), Seq("term"))
      .join(broadcast(tstats), Seq("term"))
      .join(broadcast(qlen), Seq("qid"))
      .crossJoin(broadcast(cs))
  }

  /** ONE definition of the per-query term count (review r19: this
    * one-liner existed verbatim here and in both Index scorers — a
    * qlen-convention change, e.g. deduping repeated query terms,
    * would have had to land in three places or the index and
    * sequential-scan paths silently diverge on the conjunctive gate).
    */
  private[graft] def qlenOf(q: DataFrame): DataFrame =
    q.groupBy("qid").agg(count(lit(1)).as("qlen"))

  /** ONE definition of the query-pruned per-term df/cf stats (same
    * r19 consolidation; shared by the sequential scan and
    * [[Index.scoreFromIndex]] — the inverted layout carries its stats
    * precomputed on the postings rows instead).
    */
  private[graft] def tstatsFor(tf: DataFrame, q: DataFrame): DataFrame =
    tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      .join(q.select("term").distinct(), Seq("term"), "left_semi")

  /** [[matchedTermsFor]] bound to the testdata corpus + [[querySet]]. */
  def matchedTerms(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val q = querySet.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("qid", "term")
    matchedTermsFor(Tables(spark, sfDir, "documents"), q)
  }

  /** Generic scoring pipeline → (qid, <idCol>, score, rank), top-k per
    * qid, for any (doc_id, text) corpus and (qid, term) query set.
    */
  def scoreFor(docs: DataFrame, q: DataFrame, partExpr: String,
               finalExpr: String, conjunctive: Boolean, k: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scoreMatched(matchedTermsFor(docs, q, idCol, textCol), partExpr,
      finalExpr, conjunctive, k, idCol)

  /** Scoring stage alone, over an already-built matched-terms table —
    * lets multi-model runs (TrecRunBaselines grid) persist the matched
    * stats ONCE and derive every model from the cache instead of
    * re-tokenizing the corpus per model.
    */
  def scoreMatched(matched: DataFrame, partExpr: String,
                   finalExpr: String, conjunctive: Boolean, k: Int,
                   idCol: String = "doc_id"): DataFrame = {
    val grouped = matched
      .withColumn("part", expr(partExpr))
      .groupBy(col("qid"), col(idCol), col("dl"), col("qlen"))
      .agg(sum("part").as("score_sum"), count(lit(1)).as("n_matched"))
    val gated =
      if (conjunctive) grouped.filter(col("n_matched") === col("qlen"))
      else grouped
    gated
      .withColumn("score", expr(finalExpr))
      .withColumn("rank",
        expr(s"row_number() OVER (PARTITION BY qid ORDER BY score DESC, $idCol)"))
      .filter(col("rank") <= k)
      .select("qid", idCol, "score", "rank")
  }

  /** Scoring with stats PROVIDED by an augmented topic file (the
    * TrecRunBaselines dataflow: QueryTermCount precomputes df/cf and
    * the collection header, job 2 never re-aggregates them —
    * `TrecRunBaselines.java:78-136`).
    *
    * @param qAug (qid, term, qtf, df, cf) rows from
    *             `Topics.readAugmented`
    */
  def scoreWithStats(docs: DataFrame, qAug: DataFrame, collLength: Long,
                     nDocs: Long, partExpr: String, finalExpr: String,
                     conjunctive: Boolean, k: Int,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = TextOps.termFreqs(docs, idCol, textCol)
    val qlen = qAug.groupBy("qid").agg(count(lit(1)).as("qlen"))
    // dl as a window — same rationale as matchedTermsFromTf; the
    // part->gate->rank block DELEGATES to scoreMatched (review r18:
    // this method carried a verbatim copy, so the Index.scala "one
    // definition" invariant for gating/tie-break was already false —
    // a future gate change would have silently missed the
    // TrecRunBaselines path)
    val matched = tf
      .withColumn("dl", expr(s"sum(tf) OVER (PARTITION BY $idCol)"))
      .join(broadcast(qAug), Seq("term"))
      .join(broadcast(qlen), Seq("qid"))
      .withColumn("n_tokens", lit(collLength))
      .withColumn("n_docs", lit(nDocs))
    scoreMatched(matched, partExpr, finalExpr, conjunctive, k, idCol)
  }

  /** [[scoreFor]] bound to the testdata corpus + [[querySet]]. */
  def score(spark: SparkSession, sfDir: String, partExpr: String,
            finalExpr: String, conjunctive: Boolean, k: Int): DataFrame = {
    import spark.implicits._
    val q = querySet.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("qid", "term")
    scoreFor(Tables(spark, sfDir, "documents"), q, partExpr, finalExpr,
      conjunctive, k)
  }

  /** DuckDB oracle for the same pipeline; `partExpr`/`finalExpr` are the
    * very strings given to `expr(...)` above.
    */
  def duckScore(partExpr: String, finalExpr: String, conjunctive: Boolean,
                k: Int): String =
    duckScoreCtes(partExpr, finalExpr, conjunctive) +
      s"\nSELECT qid, doc_id, score, rank FROM ranked WHERE rank <= $k"

  /** The WITH-chain through `ranked` (qid, doc_id, score, rank), for
    * oracles that post-process retrieval output (eval, feedback).
    */
  def duckScoreCtes(partExpr: String, finalExpr: String,
                    conjunctive: Boolean,
                    qValues: String = duckQueryValues,
                    weighted: Boolean = false): String = {
    val gate = if (conjunctive) "WHERE n_matched = qlen" else ""
    val wCol = if (weighted) ", q.w" else ""
    s"""WITH tokens AS (${TextOps.duckTokens}),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id),
       |cs AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS n_tokens FROM dl),
       |q AS (SELECT * FROM $qValues),
       |qlen AS (SELECT qid, count(*) AS qlen FROM q GROUP BY qid),
       |tstats AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
       |           FROM tf GROUP BY term),
       |matched AS (
       |  SELECT q.qid, tf.doc_id, tf.tf, dl.dl, tstats.df, tstats.cf,
       |         qlen.qlen, cs.n_docs, cs.n_tokens$wCol
       |  FROM tf JOIN q USING (term) JOIN dl USING (doc_id)
       |  JOIN tstats USING (term) JOIN qlen USING (qid) CROSS JOIN cs),
       |grouped AS (
       |  SELECT qid, doc_id, dl, qlen,
       |         sum($partExpr) AS score_sum, count(*) AS n_matched
       |  FROM matched GROUP BY qid, doc_id, dl, qlen),
       |scored AS (
       |  SELECT qid, doc_id, $finalExpr AS score FROM grouped $gate),
       |ranked AS (
       |  SELECT qid, doc_id, score,
       |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
       |  FROM scored)""".stripMargin
  }
}
