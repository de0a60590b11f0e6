package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev scratchpad: plan probes against the local testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.01"
    args.foreach { name =>
      println(s"======== PLAN $name ========")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
