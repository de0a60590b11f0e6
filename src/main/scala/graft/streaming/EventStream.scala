package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.8).
  *
  * The reference has no streaming runtime — its nearest analogues are
  * batch jobs over time-stamped data (KBA filtering, temporal KDE).
  * This module exposes the events pipeline in both forms with ONE
  * transformation definition, so the batch oracle-checked query
  * (q12_time_window) and the streaming query provably compute the
  * same thing.
  *
  * Scale: watermark + tumbling window keeps state bounded per
  * (window, event_type); at 100 TB/day the stateful shuffle partitions
  * by window×type, and late data beyond 10 minutes is dropped
  * deterministically.
  */
object EventStream {

  /** Raw events schema as read from parquet (ts arrives as int64
    * nanoseconds — see GraftSession nanosAsLong).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The shared transformation: hourly tumbling-window aggregate. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("sum_value"))
      .select(col("w.start").as("hour_ts"), col("event_type"), col("n"),
        col("sum_value"))

  /** Batch execution of the shared transformation. */
  def batch(spark: SparkSession, eventsDir: String): DataFrame =
    hourlyAgg(spark.read.schema(eventsSchema).parquet(eventsDir))

  /** Streaming execution into an in-memory sink named `queryName`;
    * caller drives with `processAllAvailable()` and reads
    * `spark.table(queryName)`.
    */
  def streamToMemory(spark: SparkSession, eventsDir: String,
                     queryName: String): StreamingQuery =
    hourlyAgg(
      spark.readStream.schema(eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(eventsDir))
      .writeStream
      // complete mode: emit every window at end-of-stream (append would
      // hold back windows the watermark hasn't closed — correct for an
      // unbounded stream, but this sink is used for finite replays)
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
}
