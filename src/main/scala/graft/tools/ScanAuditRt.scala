package graft.tools

import graft.{GraftSession, SparkEntry}

/** Runtime companion to [[ScanAudit]] (r15): the static leaf count is
  * an UPPER bound — lazy localCheckpoints, broadcast-exchange reuse,
  * and AQE stage reuse can all collapse repeated subtrees at runtime.
  * This probe executes the flagged queries and reports the bytes the
  * tasks ACTUALLY read (PhaseListener input sums) against the source
  * table size, so "N analyzed leaves" becomes "the table was scanned
  * ~X times for real".
  *
  * Usage: sbt "runMain graft.tools.ScanAuditRt [names...]"
  * (default: the top static offenders). SPARK_GRAFT_SF_DIR overrides
  * the corpus (default sf0.1).
  */
object ScanAuditRt {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "px27_minhash_estimate", "px52_semdedup_api",
      "px59_incremental_dedup", "px51_ivf_pq_topk", "px44_semdedup",
      "ir30_rocchio", "px40_shingle_novelty")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val pl = new PhaseListener
    spark.sparkContext.addSparkListener(pl)
    // warmup so codegen/classloading doesn't pollute the first row
    graft.Tables(spark, dir, "documents").count()
    names.foreach { n =>
      SparkEntry.decls.find(_.name == n) match {
        case None => System.err.println(s"[scanrt] unknown query $n")
        case Some(d) =>
          val from = pl.mark()
          spark.sparkContext.setJobDescription(n)
          graft.Bench.materialize(d.run(spark, dir))
          spark.catalog.clearCache()
          val t = pl.totals(from)
          println(f"[scanrt] $n%-28s input_mb=${t.getOrElse("input_mb", 0L)}%4d " +
            f"shuffle_write_mb=${t.getOrElse("shuffle_write_mb", 0L)}%4d " +
            f"stages=${t.getOrElse("stages", 0L)}%3d")
      }
    }
    spark.stop()
  }
}
