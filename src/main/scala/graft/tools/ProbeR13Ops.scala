package graft.tools

import graft.{Bench, GraftSession, Tables}
import graft.pipeline.TextMetrics
import org.apache.spark.sql.functions._

/** Scale row for the r13 banding op: `compressionBuckets` — the
  * deflate pass (narrow, ~490 MB/s across 32 threads, ProbeR12Ops)
  * feeding the px68 distributed prefix-sum bucketer over the
  * (lang, ratio) histogram. The claim to verify: banding adds only
  * near-constant histogram/cut machinery on top of the signal, so
  * wall scales ≲ linearly in docs and tracks compressionSignal's own
  * scale rows (r12ops: cs 2.6 s @ 625k, 6.5 s @ 2.5M).
  *
  * (The px84 hashed-cosine consumer deliberately has NO scale row: a
  * bucket self-join is quadratic at any dim on Zipfian text — its
  * scaladoc routes corpus-scale similarity to the gated SimHash/JL
  * paths instead, and those carry their own probes.)
  *
  * Replicated corpus + full-output forcing, ProbeR12Ops conventions.
  * Usage: `sbt "runMain graft.tools.ProbeR13Ops [N...]"`
  * (default 125 500 ⇒ 625k and 2.5M docs).
  */
object ProbeR13Ops {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(125, 500)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- ns) {
      val big = spark.range(n).toDF("k")
        .crossJoin(Tables(spark, dir, "documents")
          .select("doc_id", "lang", "text"))
        .select((col("doc_id") + col("k") * lit(10000000L)).as("doc_id"),
          col("lang"), col("text"))
        .repartition(32).localCheckpoint()
      val docs = big.count()
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        val cbRows = Bench.materialize(TextMetrics.compressionBuckets(big))
        val cbSec = (System.nanoTime() - t0) / 1e9
        println(f"""[r13ops] {"n":$n,"docs":$docs,"run":$r,"cb_sec":$cbSec%.2f,"cb_rows":$cbRows}""")
      }
      // The r13 headline change at scale: the leakage split's inline
      // labeling — STAR edges + exact-CC fixpoint + fold. Replication
      // is the adversarial case: every doc has n exact near-dup
      // copies, so LSH buckets are mega-buckets (the 100 TB
      // boilerplate shape) and components fuse across replicas — the
      // clique op would be O(bucket²) here; the star edges stay
      // linear and pointer jumping converges in O(log d) blocks.
      locally {
        import graft.pipeline.Dedup
        val t0 = System.nanoTime()
        val sp = Dedup.leakageSplit(
          Dedup.connectedComponents(big, Dedup.lshEdges(big)))
        val rows = Bench.materialize(sp)
        val sec = (System.nanoTime() - t0) / 1e9
        val nLbl = sp.select("lbl").distinct().count()
        println(f"""[r13ops] {"n":$n,"docs":$docs,"split_sec":$sec%.2f,"split_rows":$rows,"components":$nLbl}""")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
