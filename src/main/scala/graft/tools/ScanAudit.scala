package graft.tools

import graft.{GraftSession, SparkEntry}

/** Static plan-quality sweep (r15): for every declared query, count
  * the parquet-scan LEAVES per table in the ANALYZED logical plan —
  * no execution. A table appearing N times is (at most) N scans of
  * that table at runtime unless exchange reuse catches it, and the
  * px40 audit showed AQE reuse does NOT deduplicate identical agg
  * subtrees here — so high leaf counts flag recompute candidates the
  * way ir20's 9-scan KDE shape was found in r5. Prints every query
  * with > 2 leaves of one table, worst first.
  *
  * Usage: sbt "runMain graft.tools.ScanAudit [sfDir]".
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val rows = SparkEntry.decls.flatMap { d =>
      try {
        val plan = d.run(spark, dir).queryExecution.analyzed
        // leaf relations; LogicalRelation.toString carries the path
        val leaves = plan.collectLeaves()
        val byTable = leaves
          .map(_.toString.replaceAll("(?s)\\[.*", "").trim)
          .groupBy(identity).view.mapValues(_.size)
        val maxPer = if (byTable.isEmpty) 0 else byTable.values.max
        Some((d.name, leaves.size, maxPer))
      } catch { case e: Throwable =>
        System.err.println(s"[scanaudit] ${d.name} failed: ${e.getMessage}")
        None
      }
    }
    println(f"[scanaudit] ${rows.size} plans analyzed; " +
      f"total leaves ${rows.map(_._2).sum}")
    rows.filter(_._3 > 2).sortBy(-_._3).foreach { case (n, tot, mx) =>
      println(f"[scanaudit] $n%-34s leaves=$tot%2d max_per_table=$mx%2d")
    }
    spark.stop()
  }
}
