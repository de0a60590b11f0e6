package graft.pipeline

import graft.{SparkEntry, SparkSpec}

/** SemDeDup invariants that hold regardless of the data: the pairwise
  * stage never leaves a cluster (the whole point of the algorithm),
  * and the drop rule can never claim a cluster's minimum id.
  */
class SemDedupSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("px44_semdedup")(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

  test("total partition: every vector labeled exactly once, keep is 0/1") {
    val n = spark.read.parquet(s"$sfTiny/embeddings.parquet").count()
    assert(rows.length == n)
    assert(rows.map(_._1).distinct.length == n)
    assert(rows.forall(r => r._3 == 0 || r._3 == 1))
  }

  test("each cluster's minimum vec_id is always kept") {
    val minPerCluster = rows.groupBy(_._2).map { case (_, g) =>
      g.minBy(_._1)
    }
    assert(minPerCluster.forall(_._3 == 1),
      "a cluster minimum has no lower-id neighbor, so it cannot drop")
  }

  test("pairwise stage is a within-cluster equi-join, never a cross join") {
    val p = SparkEntry.queries("px44_semdedup")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"SemDeDup must not materialize cross-cluster pairs:\n$p")
  }
}
