package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native Gaussian KDE temporal re-scoring (reference
  * `RKernelDensity.java:22-69` + `RunQueryKDEHBase.java:82-113`,
  * which round-trip each query's top-k epochs to an external R
  * process; here it is pure column math per SURVEY §7.1 item 9).
  *
  * kde(e_j) = (1/(k·bw))·Σ_i φ((e_j − e_i)/bw) over the group's
  * epochs; Silverman's-rule bandwidth (SJ-dpi needs an iterative
  * solver — documented divergence; rank-level equivalence is the
  * target); rescore = α·ln(kde) + (1−α)·score.
  *
  * Scale: the kernel matrix is k×k per query (k = top-k, bounded),
  * partitioned by qid — independent of corpus size.
  */
object Kde {

  val kdeTerm = "exp(-5e-1 * pow((ep - ep2) / bw, 2))"
  val kdeFinal = "ksum / (k * bw * sqrt(2 * pi()))"
  // assert_true guards the weighted path: retrieval scores used as
  // kernel weights must be positive (log-probability scorers emit
  // negative scores; silently dividing by a nonpositive weight sum
  // would NULL every ln(kde) and rank garbage without an error).
  val kdeFinalWeighted =
    "CASE WHEN assert_true(wtot > 0, 'weighted KDE requires positive " +
      "scores as weights (use exp(log-score) or the unweighted variant)') " +
      "IS NULL THEN ksum / (wtot * bw * sqrt(2 * pi())) END"
  val bwExpr = "greatest(1.06e0 * sd * pow(k, -2e-1), 1e0)"
  def rescoreExpr(alpha: String = "5e-1") =
    s"round($alpha * ln(kde) + (1 - $alpha) * score, 6)"

  /** Density per result row: (qid, doc_id, score, kde).
    *
    * `weighted = true` is the reference's exact shape — each kernel
    * weighted by its document's retrieval score, normalized per query
    * (`RKernelDensity.java:28-30`: weights = weights/sum(weights));
    * bandwidth stays score-independent, as R computes bw on the sample
    * alone. On the committed R golden the weighted variant reproduces
    * the reference ranking EXACTLY (KdeGoldenSpec); the unweighted
    * default remains the oracle-gated ir20/ir27 semantics.
    */
  def withDensity(ranked: DataFrame, weighted: Boolean = false): DataFrame = {
    // Every per-query statistic as a WINDOW and the k×k kernel sum as
    // a higher-order aggregate over the collected (ep, score) pairs:
    // ONE reference to the input plan. The former groupBy-stats +
    // self-join shape referenced `ranked` three times, and since
    // `ranked` is usually a whole retrieval pipeline, each reference
    // re-derived it (ir20 carried 9 parquet scans; 3 after this).
    // Legal because k is the bounded top-k: the collected array is
    // ≤ k elements per row. sort_array makes the kernel summation
    // order deterministic (the old hash-agg order was not).
    val w = "(PARTITION BY qid)"
    val term = (if (weighted) s"p.w2 * ($kdeTerm)" else kdeTerm)
      .replace("ep2", "p.ep2")
    ranked
      .withColumn("sd", expr(s"stddev_samp(ep) OVER $w"))
      .withColumn("k", expr(s"count(*) OVER $w"))
      .withColumn("wtot", expr(s"sum(score) OVER $w"))
      .withColumn("bw", expr(bwExpr))
      .withColumn("pts", expr(
        s"sort_array(collect_list(struct(ep AS ep2, score AS w2)) OVER $w)"))
      .withColumn("ksum", expr(
        s"aggregate(pts, CAST(0 AS DOUBLE), (s, p) -> s + $term)"))
      .withColumn("kde", expr(if (weighted) kdeFinalWeighted else kdeFinal))
      .select("qid", "doc_id", "score", "kde")
  }

  /** @param ranked (qid, doc_id, score, ep) rows — one per retained
    *               result, `ep` an epoch-seconds long
    * @return (qid, doc_id, new_score, new_rank)
    */
  def rescore(ranked: DataFrame, alpha: String = "5e-1",
              weighted: Boolean = false): DataFrame =
    withDensity(ranked, weighted)
      .withColumn("new_score", expr(rescoreExpr(alpha)))
      .withColumn("new_rank",
        expr("row_number() OVER (PARTITION BY qid ORDER BY new_score DESC, doc_id)"))
      .select("qid", "doc_id", "new_score", "new_rank")

  /** α-sweep rescoring (`RunQueryKDEHBase.java:30` sweeps α 0.1..0.9):
    * the k×k density is computed ONCE, the α grid only re-mixes it.
    */
  def rescoreSweep(ranked: DataFrame, alphas: DataFrame): DataFrame =
    withDensity(ranked)
      .crossJoin(broadcast(alphas))
      .withColumn("new_score", expr(rescoreExpr("alpha")))
      .withColumn("new_rank",
        expr("row_number() OVER (PARTITION BY qid, alpha ORDER BY new_score DESC, doc_id)"))
      .select("qid", "alpha", "doc_id", "new_score", "new_rank")
}
