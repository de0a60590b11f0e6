package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Locks the round-8 event-time fix against the next testdata
  * regeneration: the same events fixture written THREE ways — int64
  * epoch-nanos, timestamp[us] without UTC adjustment (TIMESTAMP_NTZ),
  * and a UTC-adjusted timestamp — must normalize to identical instants
  * through `Tables.normalizeTs` and produce identical q12/q13 results.
  * Plain BIGINT epoch-MICROS (the one layout the contract rejects)
  * must fail loudly, not land in 1970.
  */
class EventsTypeSpec extends SparkSpec {

  private lazy val base = Tables(spark, sfTiny, "events")

  /** Write `base` with ts re-encoded by `enc` into its own dir laid
    * out like an sf dir (events.parquet), return the dir.
    */
  private def variant(name: String)(enc: org.apache.spark.sql.Column)
  : String = {
    val dir = Files.createTempDirectory(s"evt_$name").toString
    base.withColumn("ts", enc)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val dirs = Map(
    "utc" -> variant("utc")(col("ts")),
    "ntz" -> variant("ntz")(col("ts").cast(TimestampNTZType)),
    "nanos" -> variant("nanos")(
      (unix_micros(col("ts")) * 1000L).cast(LongType)))

  test("three physical ts encodings normalize to identical instants") {
    // each variant really did write a different physical type
    assert(spark.read.parquet(s"${dirs("nanos")}/events.parquet")
      .schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"${dirs("ntz")}/events.parquet")
      .schema("ts").dataType == TimestampNTZType)

    val expect = base.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for ((nm, d) <- dirs) {
      val got = Tables(spark, d, "events")
        .select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == expect, s"variant '$nm' shifted instants")
    }
  }

  test("q12/q13 results are identical across all three encodings") {
    for (q <- Seq("q12_time_window", "q13_sessionize")) {
      val ref = SparkEntry.queries(q)(spark, dirs("utc"))
        .collect().map(_.toString).sorted.toSeq
      assert(ref.nonEmpty)
      for (nm <- Seq("ntz", "nanos")) {
        val got = SparkEntry.queries(q)(spark, dirs(nm))
          .collect().map(_.toString).sorted.toSeq
        assert(got == ref, s"$q diverged on variant '$nm'")
      }
    }
  }

  test("plain BIGINT epoch-micros is rejected, not silently shifted") {
    val dir = Files.createTempDirectory("evt_micros").toString
    base.withColumn("ts", unix_micros(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[Exception] {
      Tables(spark, dir, "events").select(min(col("ts"))).collect()
    }
    assert(ex.getMessage != null)
  }
}
