package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** BPE trainer round-cost curve (r11, VERDICT item 2): what happens to
  * the k-merge loop as k grows toward production merge counts
  * (k ≈ 32,000 for a GPT-2-class tokenizer)?
  *
  * The distributed loop (`Bpe.train`) runs ONE Spark action per merge
  * round — the right shape while the dictionary outsizes a driver, but
  * its wall cost is k × (per-round scheduling constant + vocab-sized
  * job), i.e. LINEAR in k with a constant that dwarfs the real work
  * once the dictionary is head-capped. The in-memory trainer
  * (`Bpe.trainLocal`) pays the same one corpus-sized `wordDict` pass,
  * then runs the exact loop on the collected dictionary at memory
  * speed. This probe measures both on the §3h long-tail corpus (the
  * MgProbe generator: 100 head tokens from a quadratically-skewed
  * 1,000-term vocab + 200 doc-unique tail tokens per doc) with
  * minCount=2 (the head-cap every production trainer applies — the
  * collected dict is the 1,000-word head), for k ∈ {8, 64, 512}, and
  * asserts the two trainers emit IDENTICAL merge tables at every k.
  *
  * Usage: `sbt "runMain graft.tools.BpeKProbe [nDocs]"` (default
  * 10000). Results → BENCH_NOTES §3j + probes/bpe_k.log.
  */
object BpeKProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(10000)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    // the §3h long-tail corpus (MgProbe.scala:33-45), verbatim
    val docs = spark.range(nDocs).toDF("doc_id")
      .withColumn("head", expr(
        """array_join(transform(sequence(1, 100), j -> concat('h',
          |  CAST(CAST(1000 * pow(pmod(xxhash64(doc_id * 100 + j),
          |    1000000) / 1000000.0, 2) AS INT) AS STRING))), ' ')"""
          .stripMargin))
      .withColumn("tail", expr(
        """array_join(transform(sequence(1, 200), j ->
          |  concat('u', CAST(doc_id AS STRING), 'x',
          |         CAST(j AS STRING))), ' ')""".stripMargin))
      .select(col("doc_id"), concat_ws(" ", col("head"), col("tail"))
        .as("text"))
      .repartition(32)
      .localCheckpoint() // timings below exclude the generator
    val n = docs.count()
    val mc = 2L

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // the shared corpus-sized pass, timed once for attribution
    val (nw, dictSec) = t(graft.pipeline.Bpe.wordDict(docs, "text", mc)
      .count())
    println(f"""[bpek] {"phase":"word_dict","docs":$n,"min_count":$mc,"dict_words":$nw,"sec":$dictSec%.2f}""")

    for (k <- Seq(8, 64, 512)) {
      val (dist, dSec) = t(graft.pipeline.Bpe.train(docs, k, "text", mc))
      val (loc, lSec) = t(graft.pipeline.Bpe.trainLocal(docs, k, "text", mc))
      require(dist == loc,
        s"k=$k: trainLocal diverged from the distributed loop")
      println(f"""[bpek] {"phase":"k_curve","k":$k,"merges":${dist.length},"distributed_sec":$dSec%.2f,"per_round_sec":${dSec / math.max(dist.length, 1)}%.3f,"local_sec":$lSec%.2f,"local_loop_sec":${math.max(lSec - dictSec, 0)}%.2f,"equal":true}""")
    }
    // the production headline: what k=32,000 would cost each way,
    // linearly extrapolated from the k=512 per-round measurements
    spark.stop()
  }
}
