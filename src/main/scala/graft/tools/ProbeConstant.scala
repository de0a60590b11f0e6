package graft.tools

import graft.{Bench, GraftSession, SparkEntry, Tables}

/** §0m probe: decompose the per-action constant that dominates the
  * sub-2 s band of the bench (r12 verdict item 2 — 40 queries >1 s
  * wall and >2× vs DuckDB purely on fixed DAG cost, ~57 s of the
  * 121 s pair).
  *
  * Splits each representative query into
  *   build — `Decl.run` (spark.read resolution: file listing + parquet
  *           footer schema read, plus DataFrame construction/analysis)
  *   plan  — forcing `executedPlan` (optimization + physical planning)
  *   exec  — `Bench.materialize` (codegen compile + AQE re-planning +
  *           job scheduling + the actual work)
  * across 5 in-session iterations (iteration 2+ hits the Janino
  * codegen cache — the exec delta between it1 and warm iterations
  * bounds the per-query compile cost), then re-runs the set with AQE
  * disabled on the same session to price adaptive re-planning, and
  * finally times a floor action (1-row local relation through the
  * same toRdd path) — the irreducible cost of ANY action.
  *
  * Codegen totals come from the global CodegenMetrics source
  * (compilation time is histogram-sampled; the generated-class COUNT
  * delta per query is exact).
  *
  * REPRODUCING THE PRE-LEVER DECOMPOSITION: since r13, Tables
  * memoizes resolution per (session, dir, table), so at HEAD the
  * build phase is a cache hit BY DESIGN (that is the shipped bench
  * reality). Run with GRAFT_TABLES_NOCACHE=1 to reproduce the
  * pre-lever ~50 ms/call resolution cost this probe originally
  * established (`probes/constant.log` keeps both labeled runs); the
  * final read-resolution section always bypasses the cache.
  */
object ProbeConstant {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Bench's warmup, verbatim-equivalent: JIT + Janino startup must
    // not land on the first probed query.
    {
      import org.apache.spark.sql.functions._
      val li = Tables(spark, sfDir, "lineitem")
      li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .withColumn("r", expr("row_number() OVER (ORDER BY n DESC)")).count()
      li.join(broadcast(Tables(spark, sfDir, "orders").limit(1000)),
        col("l_orderkey") === col("o_orderkey")).count()
      Tables(spark, sfDir, "documents")
        .select(explode(split(lower(col("text")), "[^0-9a-z]+")).as("t"))
        .filter(col("t") =!= "").groupBy("t").count().count()
      spark.catalog.clearCache()
    }

    val cg = org.apache.spark.metrics.source.CodegenMetrics
    def cgCount: Long = cg.METRIC_COMPILATION_TIME.getCount

    val names = Seq(
      "ir14_score_lmdir",     // the verdict's exemplar: 1.01 s vs 0.13
      "ir03_term_stats",      // tokenize + one agg
      "q10_global_stats",     // single HashAggregate
      "px81_feature_hashing", // agg + window
      "q02_join_multiway",    // broadcast join
      "px57_pii_redact")      // pure narrow map
    def one(n: String): (Double, Double, Double, Long) = {
      val d = SparkEntry.decls.find(_.name == n).getOrElse(
        sys.error(s"no decl $n"))
      spark.sparkContext.setJobDescription(n)
      val c0 = cgCount
      val t0 = System.nanoTime()
      val df = d.run(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      Bench.materialize(df)
      val t3 = System.nanoTime()
      spark.catalog.clearCache()
      ((t1 - t0) / 1e6, (t2 - t1) / 1e6, (t3 - t2) / 1e6, cgCount - c0)
    }

    println(s"[pc] === phase split, AQE on (5 iterations) ===")
    for (n <- names; it <- 1 to 5) {
      val (b, p, e, c) = one(n)
      println(f"[pc] $n%-24s it=$it build=$b%7.1f plan=$p%7.1f " +
        f"exec=$e%7.1f total=${b + p + e}%7.1f ms codegenClasses=$c")
    }

    println(s"[pc] === same queries, AQE off ===")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (n <- names; it <- 1 to 3) {
      val (b, p, e, c) = one(n)
      println(f"[pc] $n%-24s it=$it build=$b%7.1f plan=$p%7.1f " +
        f"exec=$e%7.1f total=${b + p + e}%7.1f ms codegenClasses=$c")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    println(s"[pc] === floor: 1-row local relation through toRdd ===")
    for (it <- 1 to 5) {
      import spark.implicits._
      val t0 = System.nanoTime()
      Bench.materialize(Seq(1L).toDF("x"))
      println(f"[pc] floor it=$it ${(System.nanoTime() - t0) / 1e6}%.1f ms")
    }

    println(s"[pc] === read resolution: spark.read.parquet cost alone " +
      s"(cache BYPASSED — Tables memoizes since r13, so going through " +
      s"it would time a map hit) ===")
    for (t <- Seq("lineitem", "documents", "orders"); it <- 1 to 3) {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/$t.parquet").schema
      println(f"[pc] read $t%-10s it=$it ${(System.nanoTime() - t0) / 1e6}%.1f ms")
    }
    spark.stop()
  }
}
