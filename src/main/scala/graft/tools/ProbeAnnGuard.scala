package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** A/B the winner-row NULL-distance guard's cost on the 1M-vector
  * ivfAssign shape (r13 continuation): bare round-then-rank assignment
  * vs the same plan with the post-filter CASE guard on cid, both via
  * Bench.materialize, alternating order, 2 reps each.
  */
object ProbeAnnGuard {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables(spark, dir, "embeddings")
    val big = spark.range(n).toDF("k").crossJoin(base)
      .select((col("vec_id") + col("k") * lit(10000000L)).as("vec_id"),
        col("embedding"))
      .repartition(32).localCheckpoint()
    println(s"[annguard] vecs=${big.count()}")
    val cent = graft.pipeline.Ann
      .kmeansCentroids(big, 16, 1, allowFewer = true).localCheckpoint()
    cent.count()

    def l2sq(vec: String, c: String): String =
      s"aggregate(zip_with($vec, $c, (a, b) ->" +
        s" (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b))," +
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    def assignPlan(guard: Boolean) = {
      val ranked = big.select(col("vec_id").as("vid"), col("embedding").as("ve"))
        .crossJoin(broadcast(cent))
        .withColumn("d2", expr(l2sq("ve", "centroid")))
        .withColumn("r", expr(
          "row_number() OVER (PARTITION BY vid ORDER BY round(d2, 6), cid)"))
        .filter(col("r") === 1)
      val out = if (guard)
        ranked.withColumn("cid", expr(
          "CASE WHEN d2 IS NULL THEN CAST(raise_error('x') AS BIGINT)" +
            " ELSE cid END"))
      else ranked
      out.select("vid", "cid")
    }
    for (r <- 1 to 2; g <- if (r % 2 == 1) Seq(false, true) else Seq(true, false)) {
      val t0 = System.nanoTime()
      val rows = graft.Bench.materialize(assignPlan(g))
      println(f"""[annguard] {"run":$r,"guard":$g,"rows":$rows,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    spark.stop()
  }
}
