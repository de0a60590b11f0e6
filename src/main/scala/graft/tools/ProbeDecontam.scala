package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.DetHash
import graft.pipeline.TextMetrics
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Scale probe for px62's library op (TextMetrics.scrubContaminated):
  * replicate the sf0.1 corpus N× (disjoint ids, same text → the same
  * contamination structure per copy) against a FIXED benchmark hash
  * set — the realistic shape: eval suites don't grow with the corpus.
  * The claim under test: cost is one tokenize pass + one doc-keyed
  * shuffle, linear in corpus size, with the bench join a broadcast
  * whose build side is constant. Usage:
  * `sbt "runMain graft.tools.ProbeDecontam [N]"` (default 500 ⇒ 2.5M docs).
  */
object ProbeDecontam {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables(spark, dir, "documents").select("doc_id", "text")
    val bench = TextOps.shingleRows(base.filter(col("doc_id") < 50), 5)
      .select(DetHash.h60(col("s")).as("sh")).distinct()
      .localCheckpoint()
    val nBench = bench.count()

    val big = spark.range(n).toDF("k").crossJoin(base)
      .select((col("doc_id") + col("k") * lit(10000000L)).as("doc_id"),
        col("text"))
      .repartition(32)
      .localCheckpoint() // materialize: timings exclude the build
    val docs = big.count()

    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      val agg = TextMetrics.scrubContaminated(big, bench)
        .agg(count(lit(1)).as("n"),
          sum(expr("CASE WHEN n_removed > 0 THEN 1 ELSE 0 END")).as("touched"),
          sum("n_removed").as("removed")).head()
      println(f"""[decontam] {"rep":$r,"n":$n,"docs":${agg.getLong(0)},"bench_grams":$nBench,"touched":${agg.getLong(1)},"tokens_removed":${agg.getLong(2)},"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    // full-cost rep: force the clean_text rebuild too (the stats-only
    // aggregate above lets Catalyst prune the stitch — §0g lesson)
    for (r <- 3 to 4) {
      val t0 = System.nanoTime()
      val agg = TextMetrics.scrubContaminated(big, bench)
        .agg(expr("sum(length(clean_text))").as("chk"),
          expr("CAST(sum(n_removed) AS BIGINT)").as("removed")).head()
      println(f"""[decontam] {"rep":$r,"full_text":true,"n":$n,"chk":${agg.getLong(0)},"tokens_removed":${agg.getLong(1)},"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    spark.stop()
  }
}
