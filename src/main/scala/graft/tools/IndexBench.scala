package graft.tools

import graft.{GraftSession, Tables}
import graft.ir.{Index, Retrieval}

/** Head-to-head retrieval bench: raw-corpus scan vs materialized
  * doc-vector index vs inverted postings (VERDICT r2 item 9 — the
  * inverted layout is the repo's one novel physical structure; this
  * records its measured win instead of asserting it).
  *
  * `sbt "runMain graft.tools.IndexBench"`; SPARK_GRAFT_SF_DIR overrides
  * the corpus. Results go to BENCH_NOTES §"Inverted-index head-to-head".
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables(spark, dir, "documents")
    val work = java.nio.file.Files.createTempDirectory("idxbench").toString
    val q = Retrieval.querySet
      .flatMap { case (qid, ts) => ts.map(qid -> _) }.toDF("qid", "term")

    // one-time builds (timed separately — they are the amortized cost)
    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[idxbench] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    timed("build doc-vector index")(Index.write(docs, s"$work/dv", buckets = 32))
    timed("build inverted index")(Index.writeInverted(docs, s"$work/inv"))
    val dv = Index.load(spark, s"$work/dv")

    def bench(what: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      val times = (1 to 3).map { _ =>
        // full-output forcing: the three arms end in DIFFERENT final
        // plans, so count()-pruning would remove a different amount of
        // projection work per arm (§0g) — and clearCache stays outside
        // the timed region
        val t0 = System.nanoTime()
        graft.Bench.materialize(mk)
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      val med = times.sorted.apply(1)
      println(f"[idxbench] $what: median $med%.2f s (runs ${times.map(t => f"$t%.2f").mkString(", ")})")
      med
    }

    Tables(spark, dir, "lineitem").count() // session warmup
    val raw = bench("raw-scan scoreFor")(
      Retrieval.scoreFor(docs, q, Retrieval.lmdirPart, Retrieval.lmdirFinal,
        conjunctive = false, 10))
    val fromDv = bench("scoreFromIndex (doc vectors)")(
      Index.scoreFromIndex(dv, q, Retrieval.lmdirPart, Retrieval.lmdirFinal,
        conjunctive = false, 10))
    val fromInv = bench("scoreFromInverted (postings)")(
      Index.scoreFromInverted(spark, s"$work/inv", q, Retrieval.lmdirPart,
        Retrieval.lmdirFinal, conjunctive = false, 10))
    println(f"[idxbench] speedup vs raw: dv ${raw / fromDv}%.1fx, inverted ${raw / fromInv}%.1fx")
    spark.stop()
  }
}
