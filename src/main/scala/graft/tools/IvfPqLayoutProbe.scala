package graft.tools

import graft.{GraftSession, Tables}
import graft.pipeline.Ann
import org.apache.spark.sql.functions._

/** IVFADC storage-layout probe (r16): measure what the cid-partitioned
  * CODES layout actually buys at 1M vectors — the same corpus
  * construction as AnnRecallProbe (N× replicated sf embeddings,
  * deterministic hash noise), residual codes written three ways:
  *
  *   flat codes        — one parquet dir, every search scans all of it
  *   partitioned codes — cid= directories, literal probed-cid pruning
  *   partitioned RAW   — writeIvfPartitioned (floats, the pre-PQ layout)
  *
  * and a k=10 nprobe=4 search timed against each, with the scan-side
  * bytes on disk reported per layout. The two cuts the PLANS.md entry
  * claims (nprobe/|lists| × codes-vs-floats) become measured numbers.
  *
  * Usage: `sbt "runMain graft.tools.IvfPqLayoutProbe [N]"` (default
  * 500 ⇒ 1M 64-dim vectors); SPARK_GRAFT_SF_DIR overrides the base.
  * Results → BENCH_NOTES §3m + probes/ivfpq_layout.log.
  */
object IvfPqLayoutProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(CAST(x AS DOUBLE)" +
          " / sqrt(norm2_f64(embedding)) AS FLOAT))").as("embedding"))
    val big = spark.range(n).toDF("k").crossJoin(base)
      .select((col("vec_id") + col("k") * lit(10000000L)).as("vec_id"),
        expr("""transform(embedding, (x, i) -> CAST(x +
          (CASE WHEN k = 0 THEN 0.0 ELSE 0.1 END) *
          ((pmod(xxhash64(vec_id + k * 10000000, i), 2001) - 1000) / 1000.0)
          AS FLOAT))""").as("e0"))
      .select(col("vec_id"), expr(
        "transform(e0, x -> CAST(CAST(x AS DOUBLE)" +
          " / sqrt(norm2_f64(e0)) AS FLOAT))").as("embedding"))
      .repartition(32).localCheckpoint()
    val nv = big.count()
    // few queries × many lists, or the union of probed cids spans
    // every partition and pruning has nothing to prune: 5 queries ×
    // nprobe 4 probe ≤ 20 of the 64 lists
    val queries = base.filter(col("vec_id") < 5)

    def t[A](w: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""[ivfpqlayout] {"phase":"$w","n":$n,"vecs":$nv,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }
    def du(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(p))
    }

    Tables(spark, dir, "lineitem").count() // session warmup

    val cent = t("kmeans_build")(
      Ann.kmeansCentroids(big, kClusters = 64, iters = 1).localCheckpoint())
    val resid = t("ivf_residuals")(
      Ann.ivfResiduals(big, cent).repartition(32).localCheckpoint())
    val rcb = t("pq_train_residual")(
      Ann.pqTrain(resid.filter(col("vid") % 499 === 0),
        blocks = 8, kCodes = 32, iters = 2,
        idCol = "vid", embCol = "res").localCheckpoint())

    val work = java.nio.file.Files.createTempDirectory("ivfpq_layout").toString
    t("write_flat_codes")(
      Ann.ivfPqEncode(resid, rcb)
        .write.mode("overwrite").parquet(s"$work/flat"))
    t("write_part_codes")(
      Ann.writeIvfPqPartitioned(resid, rcb, s"$work/part"))
    t("write_part_raw")(
      Ann.writeIvfPartitioned(big, cent, s"$work/raw"))
    println(s"""[ivfpqlayout] {"bytes_flat_codes":${du(s"$work/flat")},"bytes_part_codes":${du(s"$work/part")},"bytes_part_raw":${du(s"$work/raw")}}""")

    // searches: identical ranking guaranteed by spec; this probe times
    // the SCAN-side difference. Two passes each; second is the settled
    // one (first pays file listing + codegen for the new schemas).
    for (pass <- 1 to 2) {
      val flat = t(s"search_flat_codes_p$pass") {
        Ann.ivfAdcTopK(spark.read.parquet(s"$work/flat"), cent, rcb,
          queries, nprobe = 4, k = 10).count()
      }
      val part = t(s"search_part_codes_p$pass") {
        Ann.ivfAdcTopKPartitioned(spark, s"$work/part", cent, rcb,
          queries, nprobe = 4, k = 10).count()
      }
      val raw = t(s"search_part_raw_p$pass") {
        Ann.ivfTopKPartitioned(spark, s"$work/raw", cent,
          queries, nprobe = 4, k = 10).count()
      }
      println(s"""[ivfpqlayout] {"pass":$pass,"rows_flat":$flat,"rows_part":$part,"rows_raw":$raw}""")
    }
    spark.stop()
  }
}
