package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scale probe: replicate the sf0.1 corpus N× with disjoint id ranges
  * and time the dedup chain on it, so "would this hold at 100×?" is a
  * measurement, not an argument. The replicas keep the dup structure
  * (each copy carries the same near-dup components), so CC block
  * count must stay CONSTANT (diameter unchanged) while per-block work
  * grows — the O(log d) independence claim. Usage:
  * `sbt "runMain graft.tools.ScaleProbe [N]"` (default 20 ⇒ 100k docs).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables(spark, dir, "documents").select("doc_id", "text")
    val big = spark.range(n).toDF("k").crossJoin(base)
      .select((col("doc_id") + col("k") * lit(10000000L)).as("doc_id"),
        col("text"))
      .repartition(32)
      .localCheckpoint() // materialize: timings below exclude the build
    val docs = big.count()

    def t(w: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""[scale] {"phase":"$w","n":$n,"docs":$docs,"rows":$r,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }

    t("gopher_filter")(
      graft.pipeline.TextMetrics.gopherRules(big).count())
    t("minhash_narrow")(
      graft.pipeline.Dedup.minhashWideNarrow(big).count())
    var edges: org.apache.spark.sql.DataFrame = null
    t("lsh_candidates") {
      edges = graft.pipeline.Dedup.lshCandidates(big).localCheckpoint()
      edges.count()
    }
    t("connected_components")(
      graft.pipeline.Dedup.connectedComponents(big, edges).count())
    spark.stop()
  }
}
