package graft.tools

import graft.{GraftSession, SparkEntry}

/** r17 weak-band re-adjudication (VERDICT r16 item 1): warm in-session
  * floors for the 11 rows in the >1 s & >2x-DuckDB band, measured
  * AFTER the §0x warmup amortized per-query JVM constants out of the
  * timed window. 4 reps each; rep 1 carries residual codegen, reps
  * 2–4 are the pure plan cost (build + plan + schedule + work). The
  * per-rep process-CPU delta separates real compute from scheduling
  * idle — a row whose user-cpu ≈ wall x 1 thread is serial work (the
  * single-row-group scan floor, §0m); a row whose user-cpu >> wall is
  * parallel compute.
  */
object ProbeWeakR17 {
  val weak = Seq(
    "px59_incremental_dedup", "px04_jaccard_top", "ir30_rocchio",
    "px82_removal_spans", "px75_exactsubstr_minlen", "px68_ccnet_buckets",
    "q27_cube_grouping", "px71_repetition_rules", "ir26_baselines_grid",
    "px51_ivf_pq_topk", "px85_compression_funnel")

  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    s.sparkContext.setLogLevel("WARN")
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val decls = SparkEntry.decls.filter(d => weak.contains(d.name))
    require(decls.size == weak.size, s"missing: ${weak.diff(decls.map(_.name))}")
    // §0x-style warmup at the sf0.001 sibling
    for (d <- decls) {
      try graft.Bench.materialize(d.run(s, "/root/testdata/sf0.001"))
      catch { case e: Throwable => println(s"[weak] warmup ${d.name}: $e") }
      s.catalog.clearCache()
    }
    for (d <- decls) {
      val times = (1 to 4).map { _ =>
        val c0 = os.getProcessCpuTime
        val t0 = System.nanoTime()
        graft.Bench.materialize(d.run(s, dir))
        val w = (System.nanoTime() - t0) / 1e9
        val c = (os.getProcessCpuTime - c0) / 1e9
        s.catalog.clearCache()
        (w, c)
      }
      val warm = times.drop(1)
      println(f"[weak] ${d.name}%-26s rep1=${times.head._1}%5.2f  " +
        f"warm=${warm.map(_._1).min}%5.2f/${warm.map(_._1).max}%5.2f s  " +
        f"cpu=${warm.map(_._2).min}%5.2f core-s")
    }
    s.stop()
  }
}
