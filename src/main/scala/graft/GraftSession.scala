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
      : SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Shuffle files and broadcast state are only reclaimed when their
      // dependency objects are GC'd; a multi-query run with heap headroom
      // may otherwise never collect, so local disk + driver metadata grow
      // monotonically across ~100 queries (the default interval, 30min,
      // never fires inside a bench run). 90s bounds the accumulation.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "90s"))
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft-warehouse")
      // events.parquet carries TIMESTAMP(NANOS), which Spark's µs-based
      // TimestampType cannot scan ([PARQUET_TYPE_ILLEGAL]); read the raw
      // int64 and convert with `timestamp_micros(ts div 1000)` (floor —
      // matching DuckDB's own ns→µs truncation) in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts arrives as int64 nanos (see GraftSession nanosAsLong);
    // floor-convert to µs TimestampType, bit-identical to DuckDB's read.
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions
        .expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
