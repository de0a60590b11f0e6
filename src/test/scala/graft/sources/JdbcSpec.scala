package graft.sources

import graft.{SparkSpec, Tables}
import graft.jobs.Jobs
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.DriverManager

/** S9 live-JDBC round trip against embedded Derby (already on Spark's
  * classpath — no new dependency): write a `waterloo_spam`-shaped score
  * table over JDBC, read it back with `spark.read.jdbc`, and assert the
  * JDBC-backed spam filter produces EXACTLY the parquet-join path's
  * output (`ClueWebSpamFilter.java:46-79` semantics, threshold ≥ 70).
  */
class JdbcSpec extends SparkSpec {

  test("spark.read.jdbc round-trips a spam table; filter == parquet path") {
    val work = Files.createTempDirectory("jdbc").toString
    val url = s"jdbc:derby:$work/spamdb;create=true"

    // spam scores derived deterministically from the tiny corpus
    val docs = Tables(spark, sfTiny, "documents")
    val scores = docs.select(col("doc_id"),
      (abs(hash(col("text"))) % 100).cast("int").as("score"))

    // write INTO Derby over jdbc (exercises the write path too)
    scores.write.mode("overwrite")
      .jdbc(url, "waterloo_spam", new java.util.Properties)

    // read back and compare contents exactly
    val back = JdbcSource.readTable(spark, url, "waterloo_spam")
    val a = scores.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = back.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b, "JDBC round-trip must preserve the score table")
    assert(a.nonEmpty)

    // parquet-join path vs JDBC path: identical kept corpus + report
    val scoresPq = s"$work/scores_pq"
    scores.write.mode("overwrite").parquet(scoresPq)
    val inSpec = s"parquet:$sfTiny/documents.parquet"
    Jobs.spamFilter(spark, inSpec, s"$work/kept_pq", scoresPq)
    Jobs.spamFilterJdbc(spark, inSpec, s"$work/kept_jdbc", url, "waterloo_spam")

    def kept(p: String) = spark.read.parquet(p)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kept(s"$work/kept_pq") == kept(s"$work/kept_jdbc"))
    assert(kept(s"$work/kept_pq").nonEmpty)
    def report(p: String) = spark.read.text(p).collect().map(_.getString(0)).toSeq
    assert(report(s"$work/kept_pq_report") == report(s"$work/kept_jdbc_report"))

    // shut the embedded engine down so the temp db releases its locks
    try DriverManager.getConnection(s"jdbc:derby:$work/spamdb;shutdown=true")
    catch { case _: java.sql.SQLException => () } // shutdown always throws
  }
}
