package graft.tools

import graft.{GraftSession, Tables}
import graft.pipeline.{Ann, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** px52 driver-delta isolation probe (round 15, the r14 verdict's
  * wrong-item 4): px52_semdedup_api moved +0.72 s driver-to-driver
  * (2.13 → 2.85, the round's biggest mover) while the review passes'
  * bench-neutrality decomposition measured its touched path at +0.04
  * in-suite. This probe runs the two code shapes INTERLEAVED in one
  * JVM on one host interval, so host drift cancels and the remaining
  * delta is code by construction:
  *
  *  - HEAD: Dedup.semDedup as shipped (r14 zero-norm filters na>0 /
  *    nb>0 on both pairing sides; Ann.ivfAssign's winner guard as a
  *    FILTER predicate).
  *  - R13: the 5eb3061 shape verbatim — pairing join WITHOUT the norm
  *    filters, ivfAssign with the winner guard as a projected CASE
  *    (the pre-guards-as-filters form), same kmeansCentroids (that
  *    function is byte-identical across the rounds).
  *
  * The two shapes are output-equivalent on this corpus (no zero-norm
  * embeddings, no NULL distances — asserted both directions before
  * timing). Usage: sbt "runMain graft.tools.ProbePx52 [reps]".
  * Results → probes/px52.log + one BENCH_NOTES line.
  */
object ProbePx52 {

  /** 5eb3061 ivfAssign: winner guard as a projected CASE. */
  private def ivfAssignR13(corpus: DataFrame, centroids: DataFrame)
      : DataFrame =
    corpus.select(col("vec_id").as("vid"), col("embedding").as("ve"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2", expr(
        "aggregate(zip_with(ve, centroid, (a, b) -> (CAST(a AS DOUBLE) - b)" +
          " * (CAST(a AS DOUBLE) - b)), CAST(0 AS DOUBLE)," +
          " (acc, v) -> acc + v)"))
      .withColumn("r",
        expr("row_number() OVER (PARTITION BY vid ORDER BY round(d2, 6), cid)"))
      .filter(col("r") === 1)
      .withColumn("cid", expr(
        "CASE WHEN d2 IS NULL THEN CAST(raise_error(concat(" +
          "'ivfAssign: NULL distance for vid ', CAST(vid AS STRING)" +
          ")) AS BIGINT) ELSE cid END"))
      .select("vid", "cid")

  /** 5eb3061 semDedup verbatim (no zero-norm pairing filters). */
  def semDedupR13(corpus: DataFrame, kClusters: Int, iters: Int,
                  threshold: Double): DataFrame = {
    val cents = Ann.kmeansCentroids(corpus, kClusters, iters, "vec_id",
      "embedding", allowFewer = true)
    val assign = ivfAssignR13(corpus, broadcast(cents))
    val arr = corpus
      .select(col("vec_id").as("vid"), col("embedding").as("emb"))
      .withColumn("nrm", expr("norm2_f64(emb)"))
      .join(assign, Seq("vid"))
    val a = arr.select(col("cid"), col("vid").as("v1"),
      col("emb").as("ea"), col("nrm").as("na"))
    val b = arr.select(col("cid"), col("vid").as("v2"),
      col("emb").as("eb"), col("nrm").as("nb"))
    val dropped = a.join(b, Seq("cid")).filter(col("v1") < col("v2"))
      .withColumn("cos",
        expr(s"round(dot_f64(ea, eb) / (sqrt(na) * sqrt(nb)), 6)"))
      .filter(col("cos") >= lit(threshold))
      .select(col("v2").as("vid")).distinct()
    a.select(col("v1").as("vid"), col("cid"))
      .join(dropped.withColumn("hit", lit(1)), Seq("vid"), "left")
      .withColumn("keep",
        expr("CAST(CASE WHEN hit IS NULL THEN 1 ELSE 0 END AS INT)"))
      .select("vid", "cid", "keep")
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables(spark, dir, "embeddings")

    def head(): DataFrame =
      Dedup.semDedup(emb, kClusters = 4, iters = 1, threshold = 0.4)
    def r13(): DataFrame = semDedupR13(emb, 4, 1, 0.4)

    val h = head(); val o = r13()
    require(h.exceptAll(o).isEmpty && o.exceptAll(h).isEmpty,
      "px52 HEAD and r13 shapes diverged on this corpus")

    def t(label: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val r = graft.Bench.materialize(df)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[px52] $label%-10s $dt%6.3f s rows=$r")
      dt
    }
    // warmup once each (codegen), then interleave with ORDER
    // ALTERNATION (the §0o discipline): a fixed head-first order
    // hands head the colder slot of any within-iteration drift
    t("warm-head")(head()); t("warm-r13")(r13())
    val (hs, os) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    for (i <- 0 until reps) {
      if (i % 2 == 0) {
        hs(i) = t(s"head-$i")(head())
        os(i) = t(s"r13-$i")(r13())
      } else {
        os(i) = t(s"r13-$i")(r13())
        hs(i) = t(s"head-$i")(head())
      }
    }
    println(f"[px52] SUMMARY head med=${hs.sorted.apply(reps / 2)}%6.3f " +
      f"min=${hs.min}%6.3f | r13 med=${os.sorted.apply(reps / 2)}%6.3f " +
      f"min=${os.min}%6.3f | delta(med)=${hs.sorted.apply(reps / 2) -
        os.sorted.apply(reps / 2)}%+6.3f s")
    spark.stop()
  }
}
