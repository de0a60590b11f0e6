package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Streaming ≡ batch: the same hourlyAgg over the same events must
  * agree between Structured Streaming (memory sink) and batch.
  */
class EventStreamSpec extends SparkSpec {

  test("streaming windowed agg matches batch result") {
    val dir = Files.createTempDirectory("events").toString
    Files.copy(Paths.get(s"$sfTiny/events.parquet"),
      Paths.get(dir, "events.parquet"))

    val q = EventStream.streamToMemory(spark, dir, "ev_out")
    assert(q.awaitTermination(120000), "stream did not terminate in 120s")

    val streamed = spark.table("ev_out")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = EventStream.batch(spark, dir)
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming exact-dedup: dropDuplicates on a doc stream") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("docs3").toString
    Files.copy(Paths.get(s"$sfTiny/documents.parquet"),
      Paths.get(dir, "documents.parquet"))
    val schema = spark.read.parquet(s"$sfTiny/documents.parquet").schema
    val q = spark.readStream.schema(schema).parquet(dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .dropDuplicates("h")
      .writeStream.outputMode("append").format("memory")
      .queryName("dd_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate in 120s")
    val streamedDistinct = spark.table("dd_out").count()
    val batchDistinct = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select(md5(col("text"))).distinct().count()
    assert(streamedDistinct == batchDistinct)
  }

  test("dedupStream: watermark-bounded first-arrival dedup ≡ batch keepers") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("docs5").toString
    val docs0 = spark.read.parquet(s"$sfTiny/documents.parquet")
    Files.copy(Paths.get(s"$sfTiny/documents.parquet"),
      Paths.get(dir, "a_originals.parquet"))
    // a SECOND file of exact dups (same text, shifted ids), arriving in
    // a later micro-batch (older mtime on the originals +
    // maxFilesPerTrigger=1 fixes the processing order): the dedup
    // state built from batch 1 must drop every row of batch 2
    docs0.withColumn("doc_id", col("doc_id") + 10000L)
      .coalesce(1).write.parquet(s"$dir/b_dups")
    Files.setLastModifiedTime(Paths.get(dir, "a_originals.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 600000))
    val schema = docs0.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/{a_originals.parquet,b_dups/*.parquet}")
      .withColumn("ingest_ts", timestamp_seconds(col("doc_id") + 1000000000L))
    val q = EventStream.dedupStream(stream, "ingest_ts")
      .select("doc_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("ddw_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate in 120s")
    val streamed = spark.table("ddw_out").collect().map(_.getLong(0)).toSet
    // first-arrival == originals == batch exactKeepers over the union
    val batch = graft.pipeline.Dedup
      .exactKeepers(docs0.unionByName(
        docs0.withColumn("doc_id", col("doc_id") + 10000L)))
      .collect().map(_.getLong(0)).toSet
    assert(streamed.nonEmpty && streamed == batch)
    assert(streamed.forall(_ < 10000L), "keepers must be the first arrivals")
  }

  test("TextMetrics.tokenCounts is streaming-safe (per-row curation op)") {
    val dir = Files.createTempDirectory("docs4").toString
    Files.copy(Paths.get(s"$sfTiny/documents.parquet"),
      Paths.get(dir, "documents.parquet"))
    val schema = spark.read.parquet(s"$sfTiny/documents.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = graft.pipeline.TextMetrics.tokenCounts(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("tc_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate in 120s")
    val streamed = spark.table("tc_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.pipeline.TextMetrics
      .tokenCounts(spark.read.parquet(s"$sfTiny/documents.parquet"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("TextMetrics.gopherRules is streaming-safe (shuffle-free filter)") {
    val dir = Files.createTempDirectory("docs5").toString
    Files.copy(Paths.get(s"$sfTiny/documents.parquet"),
      Paths.get(dir, "documents.parquet"))
    val schema = spark.read.parquet(s"$sfTiny/documents.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = graft.pipeline.TextMetrics.gopherRules(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("gr_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate in 120s")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getInt(5))
    val streamed = spark.table("gr_out").collect().map(key).toSet
    val batch = graft.pipeline.TextMetrics
      .gopherRules(spark.read.parquet(s"$sfTiny/documents.parquet"))
      .collect().map(key).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("stateful sessionization: closed sessions == batch sessions - open tail") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("events2").toString
    Files.copy(Paths.get(s"$sfTiny/events.parquet"),
      Paths.get(dir, "events.parquet"))

    val q = EventStream.sessionizeToMemory(spark, dir, "sess_out")
    assert(q.awaitTermination(120000), "stream did not terminate in 120s")
    val closedPerUser = spark.table("sess_out")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // batch truth: q13's n_sessions; the trailing session per user is
    // still open in state, so closed = n_sessions - 1
    val batch = graft.SparkEntry.queries("q13_sessionize")(spark, sfTiny)
      .collect().map(r => r.getLong(0) -> (r.getLong(1) - 1)).toMap
    val expected = batch.filter(_._2 > 0)
    assert(closedPerUser == expected)
    assert(closedPerUser.nonEmpty)

    // session integrity: start <= end, n_events >= 1
    spark.table("sess_out").collect().foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      assert(r.getInt(3) >= 1)
    }
  }

  test("dedupStream: NULL text keys as '' (batch twin contract), internal h dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("docs_null").toString + "/in"
    // NULL-text and ''-text docs are ONE content group (the
    // Dedup.exactKeepers contract); pre-r16 md5(NULL)=NULL grouped
    // the NULLs separately from '' and "deduped" them against each
    // other under a key that never compared content
    Seq((1L, null: String), (2L, null: String), (3L, ""), (4L, "alpha"))
      .toDF("doc_id", "text")
      .withColumn("ingest_ts",
        expr("timestamp_micros(1700000000000000 + doc_id)"))
      .coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val out = EventStream.dedupStream(
      spark.readStream.schema(schema).parquet(dir), "ingest_ts")
    // the internal hash column must not leak into the caller's schema
    assert(!out.columns.contains("h"), out.columns.mkString(","))
    val q = out.select("doc_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("ddn_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate in 120s")
    val kept = spark.table("ddn_out").collect().map(_.getLong(0)).toSet
    // one survivor for the NULL≡'' group, one for 'alpha'
    assert(kept.size == 2, s"kept $kept")
    assert(kept.contains(4L))
    assert(kept.exists(_ <= 3L))
  }

  test("dedupStream: a NULL-ingest row is dropped, never epoch-0 state " +
    "(review r19)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // unguarded, a NULL event time reads as epoch 0 in the dedup
    // operator's state: the hash's entry evicts at the watermark's
    // first advance and later duplicates re-emit silently — the
    // module-wide NULL-event-time convention applies here too
    val dir = Files.createTempDirectory("docs_nullts").toString + "/in"
    Seq((1L, "same text", Option.empty[Long]),
      (2L, "same text", Some(1700000000000000L)),
      (3L, "other words", Some(1700000001000000L)))
      .toDF("doc_id", "text", "us")
      .withColumn("ingest_ts", expr("timestamp_micros(us)")).drop("us")
      .coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = EventStream.dedupStream(
        spark.readStream.schema(schema).parquet(dir), "ingest_ts")
      .select("doc_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("ddnts_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate in 120s")
    val kept = spark.table("ddnts_out").collect().map(_.getLong(0)).toSet
    // the NULL-ingest row (doc 1) is excluded; docs 2 and 3 survive
    assert(kept == Set(2L, 3L), s"kept $kept")
  }

  test("sessionizeToMemory: a null-ts/null-user event is dropped, not a crash loop") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("events_null").toString + "/in"
    // one valid user with two events 40 min apart (closes a session)
    // plus a null-ts and a null-user row: unguarded, either NPEs the
    // primitive-Long Ev encoder and the checkpoint replay crash-loops
    Seq(
      (1L, Some(1700000000000000L), Some(7L), "click"),
      (2L, Some(1700000000000000L + 2400L * 1000000L), Some(7L), "click"),
      (3L, None, Some(7L), "click"),
      (4L, Some(1700000000000000L), None, "click"))
      .toDF("event_id", "ts_us0", "user_id", "event_type")
      .withColumn("ts", expr("timestamp_micros(ts_us0)")).drop("ts_us0")
      .withColumn("value", lit(1.0))
      .coalesce(1).write.parquet(dir)
    val q = EventStream.sessionizeToMemory(spark, dir, "sess_null_out")
    assert(q.awaitTermination(120000), "stream did not terminate in 120s")
    // the valid user's first session closed; the null rows vanished
    val rows = spark.table("sess_null_out").collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 7L, rows.mkString(";"))
  }

  test("sessionize: a late cross-batch event never rewinds or falsely closes") {
    import EventStream._
    val us = 1000000L
    // batch 1: events at t=0 and t=60min — gap (30 min) exceeded, so
    // the first session closes and the 60-min event opens a new one
    val (c1, o1) = advanceSession(7L, Array(0L, 3600 * us), None)
    assert(c1 == Seq(ClosedSession(7L, 0L, 0L, 1)))
    assert(o1.contains(OpenSession(3600 * us, 3600 * us, 1)))
    // batch 2 arrives UNORDERED across batches: a LATE event 20 min
    // before the open session's last, then an in-order event 20 min
    // after it. Both are within the gap of the session as it stands —
    // but the old rewind bug (last_us overwritten by the late ts) made
    // the in-order event measure a 40-min gap and FALSELY close the
    // session with end_us earlier than the 60-min event it had counted
    val late = 3600 * us - 1200 * us
    val next = 3600 * us + 1200 * us
    val (c2, o2) = advanceSession(7L, Array(late, next).sorted, o1)
    assert(c2.isEmpty, s"false close: $c2")
    assert(o2.contains(OpenSession(late, next, 3)))
  }

  test("stream-static enrichment join matches batch join") {
    import org.apache.spark.sql.functions._
    // static dim derived from the same data: per-user home event_type
    // (mode by count). The stream side joins it row-by-row — the
    // standard enrichment topology: static side is re-read per
    // micro-batch, no state, no watermark needed.
    val dir = Files.createTempDirectory("events3").toString
    Files.copy(Paths.get(s"$sfTiny/events.parquet"),
      Paths.get(dir, "events.parquet"))
    val batchEvents = spark.read.parquet(s"$sfTiny/events.parquet")
    val dim = batchEvents.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("r", expr(
        "row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type)"))
      .filter(col("r") === 1)
      .select(col("user_id"), col("event_type").as("home_type"))
    val q = spark.readStream
      .schema(EventStream.eventsSchema(spark, dir)).parquet(dir)
      .select("event_id", "user_id", "event_type")
      .join(dim, Seq("user_id"))
      .withColumn("is_home",
        (col("event_type") === col("home_type")).cast("int"))
      .select("event_id", "user_id", "event_type", "home_type", "is_home")
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate in 120s")
    val streamed = spark.table("enrich_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getInt(4))).toSet
    val batch = batchEvents.select("event_id", "user_id", "event_type")
      .join(dim, Seq("user_id"))
      .withColumn("is_home",
        (col("event_type") === col("home_type")).cast("int"))
      .select("event_id", "user_id", "event_type", "home_type", "is_home")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getInt(4))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
