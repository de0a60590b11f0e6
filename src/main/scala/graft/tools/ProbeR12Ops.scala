package graft.tools

import graft.{Bench, GraftSession, Tables}
import graft.pipeline.TextMetrics
import org.apache.spark.sql.functions._

/** Scale rows for the late-r12 narrow/agg ops: `featureHashVectors`
  * (one (doc, bucket) map-side-combined agg + per-doc window over
  * ≤dim aggregated rows) and `compressionSignal` (pure narrow map
  * through the native deflate_len expression). Replicated corpus as
  * in the other probes; full-output forcing. The interesting numbers
  * are the scaling shape (docs × 4 ⇒ wall ≲ 4×) and deflate
  * throughput (MB/s of corpus bytes through zlib).
  *
  * Usage: `sbt "runMain graft.tools.ProbeR12Ops [N...]"`
  * (default 125 500 ⇒ 625k and 2.5M docs).
  */
object ProbeR12Ops {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(125, 500)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- ns) {
      val big = spark.range(n).toDF("k")
        .crossJoin(Tables(spark, dir, "documents").select("doc_id", "text"))
        .select((col("doc_id") + col("k") * lit(10000000L)).as("doc_id"),
          col("text"))
        .repartition(32).localCheckpoint()
      val docs = big.count()
      val mb = big.agg(sum(octet_length(col("text")))).head().getLong(0) / 1e6
      for (r <- 1 to 2) {
        var t0 = System.nanoTime()
        val fvRows = Bench.materialize(TextMetrics.featureHashVectors(big))
        val fvSec = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val csRows = Bench.materialize(TextMetrics.compressionSignal(big))
        val csSec = (System.nanoTime() - t0) / 1e9
        println(f"""[r12ops] {"n":$n,"docs":$docs,"run":$r,"fv_sec":$fvSec%.2f,"fv_rows":$fvRows,"cs_sec":$csSec%.2f,"cs_rows":$csRows,"corpus_mb":$mb%.0f,"deflate_mb_s":${mb / csSec}%.0f}""")
      }
      // free THIS replica's localCheckpoint blocks before building the
      // next (larger) one — catalog.clearCache() does not touch
      // checkpointed RDD blocks, and leaving them resident would put
      // the next scale row under avoidable memory pressure
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
