package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** PQ ADC search (px50): the table-lookup distance must satisfy the
  * ADC identity — for every (query, vector) pair,
  * Σ_blk lut(q, blk, code(v, blk)) == ||q − reconstruct(v)||², where
  * reconstruct(v) concatenates v's assigned sub-centroids. The right
  * side is computed here by an independent per-dimension formulation
  * (reconstruction join + one global sum), so a bookkeeping error in
  * the blocked lookup path (wrong block key, off-by-one dim split,
  * code/label mixup) cannot cancel out.
  */
class PqSpec extends SparkSpec {

  test("ADC lookup distance equals distance to the reconstructed vector") {
    val dir = sfTiny
    val run = SparkEntry.queries("px50_pq_adc_topk")
    val adc = run(spark, dir)
      .select(col("qid"), col("vid"), col("adc_dist2"))

    // independent reconstruction: codes → per-dim sub-centroid values
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"),
        posexplode(col("embedding")).as(Seq("i", "x0")))
      .withColumn("x", col("x0").cast("double")).drop("x0")
      .withColumn("blk", expr("CAST(i div 16 AS BIGINT)"))
    val lab = Tables(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("label"))
    val cb = e.join(lab, Seq("vid")).groupBy("label", "blk", "i")
      .agg(expr("sum(x) / count(x)").as("c"))
    val codes = e.join(cb, Seq("blk", "i"))
      .withColumn("d", expr("(x - c) * (x - c)"))
      .groupBy("vid", "blk", "label").agg(sum("d").as("dist2"))
      .withColumn("r", expr(
        "row_number() OVER (PARTITION BY vid, blk ORDER BY round(dist2, 6), label)"))
      .filter(col("r") === 1)
      .select(col("vid"), col("blk"), col("label").as("code"))
    val recon = codes
      .join(cb.select(col("label").as("code"), col("blk"), col("i"),
        col("c")), Seq("code", "blk"))
      .select(col("vid"), col("i"), col("c"))
    val q = e.filter(col("vid") < 4)
      .select(col("vid").as("qid"), col("i"), col("x").as("qx"))
    val exact = q.join(recon, Seq("i"))
      .groupBy("qid", "vid")
      .agg(expr("round(sum((qx - c) * (qx - c)), 4)").as("exact_dist2"))

    val joined = adc.join(exact, Seq("qid", "vid")).collect()
    assert(joined.length == adc.count(),
      "every ADC pair must have an exact twin")
    joined.foreach { r =>
      val (a, x) = (r.getDouble(2), r.getDouble(3))
      assert(math.abs(a - x) < 1e-3,
        s"ADC identity violated for (${r.getLong(0)}, ${r.getLong(1)}): adc=$a exact=$x")
    }
  }

  test("IVF+PQ results lie inside the probed partitions and agree with full ADC") {
    val dir = sfTiny
    val ivfpq = SparkEntry.queries("px51_ivf_pq_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivfpq.nonEmpty)
    val labels = Tables(spark, dir, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    // nprobe=2: per query the result vids span at most 2 labels
    ivfpq.groupBy(_._1).foreach { case (qid, rows) =>
      val probed = rows.map(r => labels(r._2)).toSet
      assert(probed.size <= 2, s"qid $qid results span $probed (> nprobe=2)")
    }
    // ADC agreement: px50's unpruned top-10 scores the same pairs
    // identically — IVF changes the candidate set, never the distance
    val adc = SparkEntry.queries("px50_pq_adc_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivfpq.foreach { case (qid, vid, d) =>
      adc.get((qid, vid)).foreach(d50 =>
        assert(d50 == d, s"ADC distance differs for ($qid, $vid)"))
    }
  }

  test("top-10 per query: exactly 4 query groups, ranks 1..10, sorted") {
    val out = SparkEntry.queries("px50_pq_adc_topk")(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq == (1 to 10))
      val sorted = rows.sortBy(_._4).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
        "ADC distance must be non-decreasing in rank")
    }
  }
}
