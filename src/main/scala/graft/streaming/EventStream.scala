package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
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

  /** Raw events schema as physically present in `eventsDir` — a
    * streaming read needs an explicit schema, and hard-coding one broke
    * the moment the data producer switched ts from TIMESTAMP(NANOS) to
    * timestamp[us]; infer from the parquet footers instead and let
    * `Tables.normalizeTs` absorb whichever type arrived. Inference
    * happens ONCE at stream start, so this fixes stream *restarts*
    * after a producer-side type switch; a type switch under an
    * already-running stream still mismatches the fixed source schema
    * (that requires a restart, as with any Structured Streaming
    * source schema change).
    *
    * If `eventsDir` is empty or absent (a stream started before the
    * first file lands), inference has nothing to read; fall back to
    * the producer's documented schema (timestamp[us] ts) so the query
    * can start and pick up files as they arrive.
    */
  def eventsSchema(spark: SparkSession, eventsDir: String): StructType =
    try spark.read.parquet(eventsDir).schema
    catch {
      case _: org.apache.spark.sql.AnalysisException => defaultEventsSchema
    }

  /** Fallback schema for a not-yet-populated events dir (matches the
    * driver generator's current layout; `Tables.normalizeTs` accepts
    * it unchanged).
    */
  val defaultEventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The shared transformation: hourly tumbling-window aggregate.
    *
    * NULL-ts events are EXCLUDED — explicitly, not as a side effect
    * (review r19): Spark's TimeWindowing rule already inserts an
    * IsNotNull(ts) filter under `window()`, so they could never form
    * a window group; the explicit filter makes that semantics visible
    * and pins it for the batch twin too. This is the one documented
    * divergence from the oracle-gated q12_time_window, whose
    * `date_trunc` grouping keeps a NULL hour_ts group — an event with
    * no event time has no place in watermark semantics.
    *
    * The money sum is [[graft.queries.Decl.decSumSql]] — the ONE
    * cross-engine exact-sum definition (review r19: this was a
    * verbatim inline copy that could silently diverge from the
    * oracle-checked batch query on any scale/cast edit).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    graft.Tables.normalizeTs(events)
      .filter(col("ts").isNotNull)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr(graft.queries.Decl.decSumSql("value")).as("sum_value"))
      .select(col("w.start").as("hour_ts"), col("event_type"), col("n"),
        col("sum_value"))

  /** Batch execution of the shared transformation. */
  def batch(spark: SparkSession, eventsDir: String): DataFrame =
    hourlyAgg(spark.read.parquet(eventsDir))

  // ---- stateful sessionization (flatMapGroupsWithState) ----

  final case class Ev(user_id: Long, ts_us: Long)
  final case class OpenSession(start_us: Long, last_us: Long, n: Int)
  final case class ClosedSession(user_id: Long, start_us: Long,
                                 end_us: Long, n_events: Int)

  val SessionGapUs: Long = 1800L * 1000000L // 30 min, as q13_sessionize

  /** Per-user gap-based sessionization with explicit state — the
    * Structured Streaming twin of the batch lag/cumsum query
    * (q13_sessionize). Sessions CLOSE when a later event arrives past
    * the 30-minute gap; the trailing open session stays in state (a
    * production deployment would add an event-time timeout to flush
    * it — finite replays in tests assert on closed sessions).
    *
    * Scale: state is one (start, last, n) triple per user — bounded;
    * the shuffle partitions by user_id exactly like the batch window.
    *
    * Late events: within a micro-batch, events are sorted, so order is
    * exact; ACROSS micro-batches Structured Streaming guarantees no
    * ordering, and a late event (ts before the open session's
    * last_us) is absorbed into the open session with start/last
    * CLAMPED (min/max) rather than overwritten — rewinding last_us to
    * the late timestamp would make the NEXT in-order event falsely
    * close the session (gap measured from the rewound point) with an
    * end_us earlier than events the session already counted. Batch
    * semantics (full sort, then gaps) remain the reference; a
    * pre-open-session late event that belonged to an ALREADY-CLOSED
    * session is absorbed best-effort into the open one — exact late
    * handling needs event-time buffering (a watermark + timeout
    * design), out of scope for this demo op.
    */
  def sessionize(evs: Dataset[Ev]): Dataset[ClosedSession] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[OpenSession]) =>
          val (closed, open) =
            advanceSession(uid, it.map(_.ts_us).toArray.sorted,
              state.getOption)
          open.foreach(state.update)
          closed.iterator
      }
  }

  /** One micro-batch's state transition, factored out so the
    * cross-batch cases (late arrivals, false-close regression) are
    * unit-testable without a streaming harness: fold the batch's
    * SORTED timestamps over the open session, emitting closures.
    */
  private[streaming] def advanceSession(uid: Long, sorted: Array[Long],
                                        init: Option[OpenSession])
      : (Seq[ClosedSession], Option[OpenSession]) = {
    var open = init
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { ts =>
      open match {
        case Some(s) if ts - s.last_us > SessionGapUs =>
          closed += ClosedSession(uid, s.start_us, s.last_us, s.n)
          open = Some(OpenSession(ts, ts, 1))
        case Some(s) => // absorb; clamp, never rewind (late arrivals)
          open = Some(OpenSession(math.min(s.start_us, ts),
            math.max(s.last_us, ts), s.n + 1))
        case None =>
          open = Some(OpenSession(ts, ts, 1))
      }
    }
    (closed.result(), open)
  }

  /** Streaming sessionization from a parquet directory into a memory
    * sink.
    */
  def sessionizeToMemory(spark: SparkSession, eventsDir: String,
                         queryName: String): StreamingQuery = {
    import spark.implicits._
    val evs = graft.Tables.normalizeTs(
      spark.readStream.schema(eventsSchema(spark, eventsDir))
        .parquet(eventsDir))
      // null ts/user_id would NPE the primitive-Long Ev encoder and
      // crash-loop the query from the checkpoint forever (the
      // NearDupStream.collisionLedger guard, applied here too —
      // review r16); both are nullable in the source schema
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us")).as[Ev]
    sessionize(evs)
      .writeStream.outputMode("append").format("memory")
      .queryName(queryName).trigger(Trigger.AvailableNow()).start()
  }

  /** Streaming exact dedup of a document stream: keep the FIRST
    * arrival per content hash. Twin of `Dedup.exactKeepers` at the
    * SET level only (review r14): the batch op keeps the min-doc_id
    * copy, while a stream can only keep what arrived first — the
    * surviving doc per hash is ARRIVAL-ORDER-determined (stable for a
    * fixed micro-batch sequence, but a different file listing or
    * maxFilesPerTrigger can change WHICH duplicate survives, where
    * the batch twin always picks the same one). Downstream logic must
    * key on the content hash, not the survivor's identity.
    * The watermark bounds the
    * dedup state the same way the 100 TB batch path bounds its
    * shuffle: hashes older than the horizon are dropped from state —
    * an unbounded-state dedup cannot run forever.
    * `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: with the
    * event-time column absent from the key set, plain dropDuplicates
    * defines no eviction predicate and the watermark would be a no-op
    * (state grows with every distinct hash ever seen).
    * `ingestCol` is the event-time column the watermark rides on.
    */
  def dedupStream(docs: DataFrame, ingestCol: String,
                  watermark: String = "1 hour"): DataFrame = {
    // reserved-name guard (review r14, the Sharding convention): the
    // internal hash column would silently OVERWRITE a user column
    // named h and leak the md5 under that name
    require(!docs.columns.exists(_.equalsIgnoreCase("h")),
      "dedupStream adds an internal column 'h'; the input already " +
        "carries one — rename it first")
    docs
      // NULL event time is undefined under watermark semantics — the
      // module-wide convention (collisionLedger, sessionizeToMemory;
      // review r19 closes the one remaining hole): unguarded, the
      // dedup operator reads the null event-time field as epoch 0, so
      // the hash's state expires at the watermark's FIRST advance and
      // later duplicates of that content re-emit silently. Dropped
      // here; route NULL-ingest docs through the batch exactKeepers.
      .filter(col(ingestCol).isNotNull)
      // coalesce NULL text to '' — the batch twin's contract
      // (Dedup.exactKeepers): md5(NULL) = NULL would otherwise group
      // every NULL-text doc under one key, "deduping" content that
      // was never compared, while splitting them from ''-text docs
      .withColumn("h", md5(coalesce(col("text"), lit(""))))
      .withWatermark(ingestCol, watermark)
      .dropDuplicatesWithinWatermark("h")
      .drop("h") // internal column, not part of the caller's schema
  }

  /** Streaming execution into an in-memory sink named `queryName`;
    * caller drives with `processAllAvailable()` and reads
    * `spark.table(queryName)`.
    */
  def streamToMemory(spark: SparkSession, eventsDir: String,
                     queryName: String): StreamingQuery =
    hourlyAgg(
      spark.readStream.schema(eventsSchema(spark, eventsDir))
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
