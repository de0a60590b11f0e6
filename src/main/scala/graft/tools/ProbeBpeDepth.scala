package graft.tools

import graft.GraftSession
import graft.pipeline.Bpe

/** encodeWords nesting-ceiling probe (review r14): each merge nests
  * one split(fold(...)) level into a single Catalyst expression, so a
  * large merge table must hit an analyzer/codegen wall somewhere —
  * this measures WHERE, so the shipped guard carries a measured
  * number instead of a guess. Synthetic merges chain 'aa', 'aaaa', …
  * (never matching the probe words, which is irrelevant to plan cost).
  *
  * Usage: sbt "runMain graft.tools.ProbeBpeDepth [k1 k2 ...]" →
  * probes/bpedepth.log.
  */
object ProbeBpeDepth {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(64, 128, 256, 512, 1024, 2048)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val words = Seq("interdependence", "tokenization", "aardvark")
      .toDF("w")
    for (k <- ks) {
      // realistic merge shapes: short distinct symbol pairs (real BPE
      // merges are a few chars each); literal size stays constant so
      // this measures expression DEPTH, not string length
      val merges = (1 to k).map(i => (s"q${i % 97}", s"z${i % 89}"))
      def run(label: String)(f: => Int): Unit = {
        val t0 = System.nanoTime()
        val r = try {
          f"ok rows=$f ${(System.nanoTime() - t0) / 1e9}%.1f s"
        } catch {
          case _: StackOverflowError => "STACK OVERFLOW"
          case e: Throwable => s"FAIL ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(100)}"
        }
        println(s"[bpedepth] $label k=$k $r")
      }
      run("expr")(Bpe.encodeWordsExpr(words, merges, "w").collect().length)
      run("bcast")(
        Bpe.encodeWordsBroadcast(words, merges, "w").collect().length)
    }
    spark.stop()
  }
}
