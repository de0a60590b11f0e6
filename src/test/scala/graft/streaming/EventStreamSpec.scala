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
    q.awaitTermination(120000)

    val streamed = spark.table("ev_out")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = EventStream.batch(spark, dir)
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
