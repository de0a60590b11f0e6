package graft.ir

import graft.SparkSpec
import graft.sources.{Topics, Warc}
import org.apache.spark.sql.functions._

/** End-to-end slice mirroring the reference's `test/test.sh`: WARC →
  * anchors → sequential-scan retrieval against the WT2010 topics
  * (SURVEY §7.2: query 53 "discovery channel store" must hit the doc
  * whose anchors say exactly that).
  */
class RetrievalSpec extends SparkSpec {

  test("e2e: WARC → anchors → LMno TrecRun finds query 53") {
    val anchors = AnchorExtractJob.run(spark, resource("test.warc.gz"))
      .select(col("docid").as("doc_id"), col("anchortext").as("text"))
    val topics = Topics.readPlain(spark, resource("wt2010-topics.queries-only"))
    val run = Retrieval.scoreFor(anchors, topics,
      Retrieval.lmnoPart, Retrieval.lmnoFinal, conjunctive = true, 1000)
      .collect()
    val q53 = run.filter(_.getString(0) == "53")
    assert(q53.length == 1)
    assert(q53.head.getString(1) == "test2") // the "discovery channel store" target
    assert(q53.head.getInt(3) == 1)
  }

  test("topk: ranks are 1..k, scores non-increasing per query") {
    val ranked = Retrieval.score(spark, sfTiny,
      Retrieval.bm25Part, Retrieval.bm25Final, conjunctive = false, 10)
      .collect()
    ranked.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to byRank.length))
      val scores = byRank.map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("conjunctive LMno only returns docs containing every query term") {
    import spark.implicits._
    val docs = Seq((1L, "spark join window"), (2L, "spark spark only"),
      (3L, "join alone")).toDF("doc_id", "text")
    val q = Seq(("q1", "spark"), ("q1", "join")).toDF("qid", "term")
    val got = Retrieval.scoreFor(docs, q, Retrieval.lmnoPart,
      Retrieval.lmnoFinal, conjunctive = true, 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("dirichlet score increases with tf (monotonicity property)") {
    import spark.implicits._
    val docs = Seq((1L, "spark a b c"), (2L, "spark spark b c"))
      .toDF("doc_id", "text")
    val q = Seq(("q1", "spark")).toDF("qid", "term")
    val m = Retrieval.scoreFor(docs, q, Retrieval.lmdirPart,
      Retrieval.lmdirFinal, conjunctive = false, 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(m(2L) > m(1L))
  }
}
