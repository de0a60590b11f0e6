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

  // ---- parameterized API (Dedup.semDedup) ----

  // 64 synthetic vectors in R⁴: 8 direction groups of 8, small in-group
  // perturbations — deterministic, k-means-friendly.
  private def synth = {
    import spark.implicits._
    (0L until 64L).map { id =>
      val g = (id % 8).toInt
      val base = Array.fill(4)(0.1f)
      base(g % 4) = if (g < 4) 1.0f else -1.0f
      base((g + 1) % 4) += 0.01f * (id / 8)
      (id, base)
    }.toDF("vec_id", "embedding")
  }

  private def pairCount(k: Int): Long = {
    val cents = Ann.kmeansCentroids(synth, k, iters = 2)
    val sizes = Ann.ivfAssign(synth, cents).groupBy("cid").count()
    sizes.selectExpr("CAST(sum(count * (count - 1) / 2) AS BIGINT) AS p")
      .collect()(0).getLong(0)
  }

  test("semDedup API: total partition, 0/1 keep, cluster minima kept") {
    val out = Dedup.semDedup(synth, kClusters = 4, iters = 2, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.length == 64 && out.map(_._1).distinct.length == 64)
    assert(out.forall(r => r._3 == 0 || r._3 == 1))
    val minPerCluster = out.groupBy(_._2).map { case (_, g) => g.minBy(_._1) }
    assert(minPerCluster.forall(_._3 == 1))
  }

  test("semDedup API: threshold 1-epsilon keeps near-everything, -1 keeps only minima") {
    val loose = Dedup.semDedup(synth, 4, 2, threshold = -1.0).collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    // cos >= -1 always: only each cluster's min id survives
    val kept = loose.filter(_._2 == 1)
    assert(kept.length == loose.map(_._1).distinct.length,
      s"threshold=-1 must keep exactly one (the min id) per cluster: $kept")
    // the other half of the title — without it, "drop everything but
    // the minima regardless of threshold" (an inverted or saturated
    // comparison) would pass this test. The synth perturbations cap
    // every within-cluster rounded cosine at ~0.99996 < 0.999999, so
    // just-under-1 must keep ALL 64 (deterministic: cos is rounded to
    // 6 dp before the compare).
    val tight = Dedup.semDedup(synth, 4, 2, threshold = 0.999999)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    val dropped = tight.filter(_._2 == 0)
    assert(dropped.isEmpty,
      s"threshold just under 1 must keep every distinct vector: " +
        s"dropped ${dropped.map(_._1).toSeq.sorted}")
  }

  test("pair count scales as k·(n/k)²/2 — more clusters, quadratically fewer pairs") {
    // n²/(2k): doubling k should roughly halve the pair count (exactly,
    // for balanced clusters). Assert the direction and a conservative
    // bound — this is the property that makes SemDeDup subquadratic,
    // and the reason a FIXED k is wrong at scale (round-3 verdict).
    val p2 = pairCount(2)
    val p8 = pairCount(8)
    assert(p8 < p2,
      s"pairs must shrink with k: k=2→$p2, k=8→$p8")
    assert(p8.toDouble / p2 < 0.55,
      s"4x clusters must cut pairs well below half (balanced ⇒ 1/4): k=2→$p2, k=8→$p8")
  }
}
