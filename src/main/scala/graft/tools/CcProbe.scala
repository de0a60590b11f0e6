package graft.tools

import graft.{GraftSession, Tables}

/** Dev scratchpad: time the connected-components phases at an SF dir
  * (`sbt "runMain graft.tools.CcProbe"`; SPARK_GRAFT_SF_DIR overrides).
  * The sf0.1 LSH graph is the interesting case: 1942-doc giant
  * component, diameter ≥ 37 (BENCH_NOTES §"px42").
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, dir, "lineitem").count()
    def t[A](w: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $w: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    val docs = Tables(spark, dir, "documents")
    val edges = t("lshCandidates materialize")(
      graft.pipeline.Dedup.lshCandidates(docs).localCheckpoint())
    println("[ccprobe] edges=" + edges.count())
    val cc = t("connectedComponents total")(
      graft.pipeline.Dedup.connectedComponents(docs, edges))
    println("[ccprobe] labels=" + cc.count())
    spark.stop()
  }
}
