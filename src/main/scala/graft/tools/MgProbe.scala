package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Shuffle-economics probe for `Sketches.topKTermsMg` (the round-10
  * heavy-hitter op): on a corpus whose vocabulary is DOMINATED by a
  * long tail of unique terms — the shape of real web text, and the
  * regime where exact top-k hurts — compare the exact
  * `groupBy(term).count.orderBy.limit(k)` plan against the
  * sketch-then-recount plan on (a) answer equality and (b) stage-level
  * shuffle bytes. The claim under test: MG's shuffle volume is
  * capacity-bounded (sketches + candidate-term rows only) while the
  * exact plan's grows with the vocabulary (every unique tail term is a
  * partial-agg row that map-side combine cannot collapse).
  *
  * Synthetic corpus: nDocs docs × (100 head tokens drawn
  * quadratically-skewed from a 1,000-term head vocab + 200 tokens
  * unique to the doc). At the default 50k docs: ~15M tokens, ~10M
  * distinct terms. Usage: `sbt "runMain graft.tools.MgProbe [nDocs]"`.
  */
object MgProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val pl = new PhaseListener
    spark.sparkContext.addSparkListener(pl)

    // deterministic skewed head term: u = hash fraction in [0,1),
    // term id = floor(1000·u²) (quadratic head skew)
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
      .localCheckpoint() // timings/bytes below exclude the generator
    val n = docs.count()

    def run(w: String)(f: => Seq[(String, Long)]): Seq[(String, Long)] = {
      val m = pl.mark()
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.Listeners.drain(spark.sparkContext)
      val t = pl.totals(m)
      println(f"""[mg] {"phase":"$w","docs":$n,"sec":$sec%.2f,"shuffle_write_mb":${t.getOrElse("shuffle_write_mb", 0L)},"shuffle_read_mb":${t.getOrElse("shuffle_read_mb", 0L)},"spill_disk_mb":${t.getOrElse("spill_disk_mb", 0L)},"stages":${t.getOrElse("stages", 0L)},"peak_exec_mb":${t.getOrElse("peak_exec_mb", 0L)}}""")
      r
    }

    import spark.implicits._
    if (args.contains("bpe")) {
      // BPE trainer's minCount lever on the same long-tail corpus:
      // minCount=1 trains over the full (tail-dominated) word dict;
      // minCount=2 drops the doc-unique tail before the rounds.
      // Merge lists may differ (tail chars DO carry pair counts — the
      // lever is an approximation, like every production trainer's
      // --min-frequency), so both are printed for the log.
      for (mc <- Seq(1L, 2L)) {
        val m = pl.mark()
        val t0 = System.nanoTime()
        val dict = graft.pipeline.Bpe.wordDict(docs, "text", mc)
        val nw = dict.count()
        val merges = graft.pipeline.Bpe.train(docs, 4, "text", mc)
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.Listeners.drain(spark.sparkContext)
        val t = pl.totals(m)
        println(f"""[mg] {"phase":"bpe_train","min_count":$mc,"dict_words":$nw,"sec":$sec%.2f,"shuffle_write_mb":${t.getOrElse("shuffle_write_mb", 0L)},"merges":"${merges.map { case (a, b) => s"$a+$b" }.mkString(",")}"}""")
      }
      spark.stop()
      return
    }
    val exact = run("exact_topk") {
      graft.text.TextOps.tokens(docs)
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("term")).limit(10)
        .as[(String, Long)].collect().toSeq
    }
    val viaMg = run("mg_sketch_recount") {
      graft.pipeline.Sketches.topKTermsMg(docs, 10, 4096)
        .as[(String, Long)].collect().toSeq
    }
    println(s"""[mg] {"phase":"equal","match":${exact == viaMg}}""")
    require(exact == viaMg, "MG path diverged from exact top-k")
    spark.stop()
  }
}
