package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory for the engine.
  *
  * Local testing runs a single JVM (`local[N]`), but every knob here is
  * chosen for the 1000-executor / 100 TB deployment this engine targets:
  * AQE on (runtime shuffle-partition coalescing, broadcast-join demotion,
  * skew-join splitting), partition sizes that keep a 100 TB scan in
  * ~100k–800k tasks, and UTC everywhere so results are reproducible
  * across clusters.
  */
object GraftSession {

  def builder(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      : SparkSession.Builder = {
    // The event-log dir must exist BEFORE SparkContext starts — Spark
    // fails startup (FileNotFoundException) on a missing path, which
    // would kill the opt-in diagnostic run before any query executes.
    sys.env.get("SPARK_GRAFT_EVENTLOG")
      .foreach(d => new java.io.File(d).mkdirs())
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE coalescing knobs, env-overridable for A/B (§0s): with
      // parallelismFirst=true (Spark default) AQE refuses to coalesce
      // below the cluster's parallelism, so a kB-sized exchange still
      // schedules `cores` reduce tasks — a pure constant on tiny
      // intermediate shuffles (the px42 CC loop runs ~10 exchanges per
      // block over 5k rows). false coalesces by advisory size instead.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "64MB"))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // JVM-global generated-class cache: Spark's 100-entry default is
      // sized for a service replaying few plans, not an analytics
      // session running a broad query surface — at 142 queries the
      // suite's recurring sources fall out of a 100-entry cache and
      // recompile: 3,557 Janino compilations and 135.8 s at 100 vs
      // 2,212 and 119.8 s at 4096, a −16 s / −12% suite-level win on a
      // same-interval reverse A/B (BENCH_NOTES §0n). Cost is metaspace
      // for a few thousand compiled classes (tens of MB). Same story
      // on a 1000-executor cluster: every executor JVM carries this
      // cache, and a multi-tenant analytics driver replays far more
      // than 100 distinct plan shapes. Env-overridable.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      // Keep Spark's default 30min periodic-GC interval. Round 3 ran 90s
      // here to bound shuffle-file accumulation; thread-level capture of
      // the intermittent 5–25× per-query inflations showed the cost:
      // each forced System.gc() runs a G1 concurrent cycle that unloads
      // stale generated (Janino) classes, the code-cache sweeper then
      // flushes their nmethods, and the resulting code-page
      // mprotect/unmap churn burns KERNEL cpu (C2/sweeper threads
      // measured at ~1 core of sys time; TLB shootdowns are VM-exits
      // under virtualization) while query tasks sit idle. A/B over 11
      // full bench runs: 90s GC → totals 121–216s with 4 storm queries;
      // default → 107–154s with 1. Disk accumulation over a ~2min,
      // ~100-query run is a few hundred MB — not worth the storms.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "30min"))
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft-warehouse")
      // Some event parquet carries TIMESTAMP(NANOS), which Spark's
      // µs-based TimestampType cannot scan ([PARQUET_TYPE_ILLEGAL]);
      // with this conf a NANOS column arrives as raw int64 instead and
      // Tables.normalizeTs floor-converts it (matching DuckDB's own
      // ns→µs truncation). Harmless for µs/NTZ data — the conf only
      // affects NANOS-annotated columns.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // SPARK_GRAFT_EVENTLOG=/some/dir → per-run Spark event log, the
      // stage/task-level record needed to diagnose intermittent query
      // inflation (recompute vs stall is invisible in wall-clock alone).
      .config("spark.eventLog.enabled",
        sys.env.contains("SPARK_GRAFT_EVENTLOG").toString)
      .config("spark.eventLog.dir",
        sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "/tmp/spark-events"))
  }

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Loaders for the driver-generated TPC-H-ish tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed Parquet layouts; the
  * loader keeps that substitution local to one place.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Resolution cache (§0m): spark.read.parquet re-resolves the source
  // on EVERY call — file listing, Hadoop FS init, and a footer/schema
  // read measured at ~50 ms per call at sf0.1 (ProbeConstant), and the
  // bench surface makes ~300 such calls per suite run (~15 s of pure
  // re-resolution). The SF tables are immutable within a session
  // (driver-generated, read-only), so the ANALYZED DataFrame is safely
  // reusable: one resolution per (session, dir, table). This is the
  // local-mode analogue of a metastore-backed catalog table, whose
  // schema + file index the catalog caches — NOT a data cache (no
  // persist; execution still scans parquet every action, and
  // Bench/Verify's clearCache() doesn't touch it). Keyed by session so
  // a restarted session re-resolves; GRAFT_TABLES_NOCACHE=1 opts out
  // (needed only if a session ever reads a MUTATING path through
  // Tables — none does today).
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]
  // sessions whose stop-listener is registered: every hooked session
  // evicts its own entries when the CONTEXT ends (each listener fires,
  // so the union clears the whole cache). Precisely: eviction is
  // context-scoped — sessions cycled on one LIVE shared context keep
  // their entries until that context stops, bounded at ≤ #tables ×
  // #sfDirs entries per session; every in-repo consumer runs one
  // session per JVM, where context end ⇔ session end.
  private val hooked = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def nocache: Boolean = sys.env.get("GRAFT_TABLES_NOCACHE")
    .exists(v => v.nonEmpty && v != "0" && v != "false")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (nocache) resolve(spark, sfDir, name)
    else {
      if (hooked.add(spark))
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
              cache.keys.filter(_._1 eq spark).foreach(cache.remove)
              hooked.remove(spark)
            }
          })
      cache.getOrElseUpdate((spark, sfDir, name),
        resolve(spark, sfDir, name))
    }

  private def resolve(spark: SparkSession, sfDir: String,
                      name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize an event-time column to session-TZ `TimestampType`,
    * whatever physical type the parquet writer chose. Data producers
    * legitimately vary — TIMESTAMP(NANOS) (arrives as int64 under the
    * session's nanosAsLong conf), timestamp[us] without UTC adjustment
    * (arrives as TIMESTAMP_NTZ), or an adjusted-to-UTC timestamp — and
    * a 100 TB engine must read all of them identically. The session is
    * pinned to UTC, so NTZ≡UTC and every branch yields the same
    * instants (floor ns→µs matches DuckDB's own truncation).
    *
    * The int64 branch asserts the epoch-NANOSECOND contract at runtime:
    * a producer writing plain BIGINT epoch-micros would otherwise be
    * silently divided by 1000 and land near 1970. Any value that floors
    * to a pre-2000 instant (< 946684800e9 ns; the generators emit
    * nothing earlier) fails the whole read loudly instead.
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, expr(
          s"""timestamp_micros(CASE
             |  WHEN $colName IS NULL OR $colName >= 946684800000000000L
             |    THEN $colName div 1000
             |  ELSE raise_error(concat(
             |    'int64 event-time $colName=', CAST($colName AS STRING),
             |    ' is not epoch-nanoseconds (pre-2000 instant); ',
             |    'plain BIGINT epoch-micros is not supported — ',
             |    'write parquet TIMESTAMP or nanos'))
             |END)""".stripMargin))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"unsupported event-time type for '$colName': $other")
    }
  }
}
