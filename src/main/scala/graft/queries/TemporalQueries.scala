package graft.queries

import graft.ir.Retrieval._
import org.apache.spark.sql.functions._

/** Temporal KDE re-ranking (SURVEY.md §2.7; reference
  * `edu/gslis/hbase/trec/RKernelDensity.java:22-69` +
  * `RunQueryKDEHBase.java:82-113`).
  *
  * The reference ships top-k epochs to an external R process (Rserve)
  * and fits a weighted Gaussian KDE with `density(bw="SJ-dpi",
  * n=1024)`. We replace the process boundary with native column math:
  * per query, kde(e_j) = (1/(k·bw))·Σ_i φ((e_j − e_i)/bw) over the
  * top-k result epochs, Silverman's rule bandwidth (1.06·sd·k^(−1/5);
  * SJ needs an iterative solver — documented divergence, rank-level
  * equivalence is the target per SURVEY §7.3), then rescore
  * α·ln(kde) + (1−α)·score, α = 0.5.
  *
  * Scale: the k×k kernel matrix is per-query (k=10 → 100 rows) — the
  * self-join is partitioned by qid and never grows with corpus size.
  * Document epochs are synthesized deterministically from doc_id
  * (the corpus has no timestamp column).
  */
object TemporalQueries {

  import graft.temporal.Kde

  private val epochExpr = "1700000000 + (doc_id % 365) * 86400"
  private val kdeTerm = Kde.kdeTerm
  private val kdeFinal = Kde.kdeFinal
  private val rescoreExpr = Kde.rescoreExpr()
  private val bwExpr = Kde.bwExpr

  /** The ir20/ir27 shared DuckDB KDE chain (top-10 epochs -> Silverman
    * bandwidth -> k x k kernel sums). ONE string (review r14): the two
    * gated oracles used to carry character-identical 12-line copies
    * that could silently drift apart on any future bandwidth tweak.
    */
  private val kdeCtes: String =
    s"""top AS (SELECT qid, doc_id, score, $epochExpr AS ep
       |        FROM ranked WHERE rank <= 10),
       |stats AS (SELECT qid, stddev_samp(ep) AS sd, count(*) AS k
       |          FROM top GROUP BY qid),
       |bws AS (SELECT qid, k, $bwExpr AS bw FROM stats),
       |kdes AS (
       |  SELECT a.qid, a.doc_id, a.score, a.ep, bws.bw, bws.k,
       |         sum($kdeTerm) AS ksum
       |  FROM top a
       |  JOIN (SELECT qid, ep AS ep2 FROM top) b USING (qid)
       |  JOIN bws USING (qid)
       |  GROUP BY a.qid, a.doc_id, a.score, a.ep, bws.bw, bws.k)""".stripMargin

  val all: Seq[Decl] = Seq(
    Decl(
      "ir20_kde_rerank",
      (s, dir) =>
        Kde.rescore(
          score(s, dir, lmdirPart, lmdirFinal, conjunctive = false, 10)
            .withColumn("ep", expr(epochExpr))),
      Some(duckScoreCtes(lmdirPart, lmdirFinal, conjunctive = false) +
        s""",
           |$kdeCtes,
           |rescored AS (
           |  SELECT qid, doc_id, $kdeFinal AS kde, score FROM kdes)
           |SELECT qid, doc_id, $rescoreExpr AS new_score,
           |  row_number() OVER (PARTITION BY qid
           |    ORDER BY $rescoreExpr DESC, doc_id) AS new_rank
           |FROM rescored""".stripMargin),
      survey = Seq("KDE")),

    // α-sweep over the KDE mix (RunQueryKDEHBase.java:30): density
    // computed once, top-3 per (qid, α).
    Decl(
      "ir27_kde_alpha_sweep",
      (s, dir) => {
        val grid = s.range(0, 5).select(
          (col("id").cast("double") * 0.2 + 0.1).as("alpha"))
        Kde.rescoreSweep(
          score(s, dir, lmdirPart, lmdirFinal, conjunctive = false, 10)
            .withColumn("ep", expr(epochExpr)),
          grid)
          .filter(col("new_rank") <= 3)
      },
      Some(duckScoreCtes(lmdirPart, lmdirFinal, conjunctive = false) +
        s""",
           |$kdeCtes,
           |dens AS (SELECT qid, doc_id, score, $kdeFinal AS kde FROM kdes),
           |grid AS (SELECT unnest([0,1,2,3,4]) * CAST(0.2 AS DOUBLE)
           |         + CAST(0.1 AS DOUBLE) AS alpha),
           |mixed AS (
           |  SELECT qid, alpha, doc_id,
           |         ${Kde.rescoreExpr("alpha")} AS new_score
           |  FROM dens CROSS JOIN grid),
           |rr AS (
           |  SELECT qid, alpha, doc_id, new_score,
           |         row_number() OVER (PARTITION BY qid, alpha
           |           ORDER BY new_score DESC, doc_id) AS new_rank
           |  FROM mixed)
           |SELECT qid, alpha, doc_id, new_score, new_rank
           |FROM rr WHERE new_rank <= 3""".stripMargin),
      survey = Seq("KDE", "GRID"))
  )
}
