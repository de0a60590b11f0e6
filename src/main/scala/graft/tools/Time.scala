package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Dev scratchpad: time individual queries at an SF dir without running
  * the whole bench. `sbt "runMain graft.tools.Time px20_langid_ngram"`;
  * env SPARK_GRAFT_SF_DIR overrides the default sf0.1.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    Tables(spark, dir, "lineitem").count() // warmup
    args.foreach { name =>
      (1 to 2).foreach { i =>
        // same full-output yardstick as the committed bench — count()
        // would let Catalyst prune every column the row count doesn't
        // need (§0g), timing a smaller plan than Bench reports
        val t0 = System.nanoTime()
        val n = graft.Bench.materialize(SparkEntry.queries(name)(spark, dir))
        println(f"[time] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
