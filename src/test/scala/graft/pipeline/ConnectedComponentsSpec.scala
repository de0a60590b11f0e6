package graft.pipeline

import graft.SparkSpec

/** Exact CC vs the fixed-round approximation: a dup CHAIN (near-dup
  * transitivity A≈B≈C≈…) of diameter > 3 is exactly the case the
  * px19 3-round contract mislabels and the fixpoint must get right.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a diameter-7 chain collapses to one component (3 rounds cannot)") {
    import spark.implicits._
    // chain 1-2-3-4-5-6-7-8 plus isolated 100
    val docs = (Seq(100L) ++ (1L to 8L)).toDF("doc_id")
    val edges = (1L to 7L).map(i => (i, i + 1)).toDF("d1", "d2")

    val cc = labelsOf(Dedup.connectedComponents(docs, edges))
    assert((1L to 8L).forall(cc(_) == 1L), s"fixpoint must reach the end: $cc")
    assert(cc(100L) == 100L)

    // the 3-round approximation provably under-labels the chain tail —
    // documenting WHY px42 exists alongside px19's fixed contract
    val approx = labelsOf(Dedup.clusters(docs, edges, rounds = 3))
    assert(approx(8L) != 1L,
      "if 3 rounds suddenly solve diameter 7, px19's contract changed")
  }

  test("agrees with the fixed-round labels on an LSH graph already converged") {
    import spark.implicits._
    // two tight pairs + a triangle: diameter <= 2, so 3 rounds converge
    // and both algorithms must agree exactly
    val docs = (1L to 7L).toDF("doc_id")
    val edges = Seq((1L, 2L), (3L, 4L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("d1", "d2")
    val cc = labelsOf(Dedup.connectedComponents(docs, edges))
    val approx = labelsOf(Dedup.clusters(docs, edges, rounds = 3))
    assert(cc == approx)
    assert(cc(7L) == 5L && cc(2L) == 1L && cc(4L) == 3L)
  }
}
