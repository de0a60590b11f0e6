package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ir.Retrieval
import graft.text.TextOps
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streaming sequential scan ≡ batch: scoring a document stream with
  * provided stats must produce exactly the batch scores.
  */
class StreamingRetrievalSpec extends SparkSpec {

  test("streamed retrieval scores == batch scores (provided stats)") {
    import spark.implicits._
    val docs = Tables(spark, sfTiny, "documents")
    val q = Retrieval.querySet
      .flatMap { case (qid, ts) => ts.map(qid -> _) }.toDF("qid", "term")

    // provided stats, as a stats-file-driven job would have them
    val tf = TextOps.termFreqs(docs)
    val qAug = q
      .join(tf.groupBy("term")
        .agg(count(lit(1)).as("df"), sum("tf").as("cf")), Seq("term"))
    val Array(len, nd) = TextOps.docLengths(docs)
      .agg(sum("dl"), count(lit(1))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray

    // stream the corpus file-by-file
    val dir = Files.createTempDirectory("docs").toString
    Files.copy(Paths.get(s"$sfTiny/documents.parquet"),
      Paths.get(dir, "documents.parquet"))
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
      .select("doc_id", "text")
    val scored = StreamingRetrieval.scoreStream(stream, qAug, len, nd,
      Retrieval.lmdirPart, Retrieval.lmdirFinal)
    val sq = StreamingRetrieval.toMemory(scored, "sr_out")
    assert(sq.awaitTermination(120000), "stream did not terminate in 120s")

    val streamed = spark.table("sr_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Retrieval.scoreWithStats(docs, qAug, len, nd,
      Retrieval.lmdirPart, Retrieval.lmdirFinal, conjunctive = false,
      k = Int.MaxValue)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("conjunctive gate: streamed LMno drops partial-match docs like batch") {
    import spark.implicits._
    val docs = Tables(spark, sfTiny, "documents")
    val q = Retrieval.querySet
      .flatMap { case (qid, ts) => ts.map(qid -> _) }.toDF("qid", "term")
    val tf = TextOps.termFreqs(docs)
    val qAug = q
      .join(tf.groupBy("term")
        .agg(count(lit(1)).as("df"), sum("tf").as("cf")), Seq("term"))
    val Array(len, nd) = TextOps.docLengths(docs)
      .agg(sum("dl"), count(lit(1))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray

    val dir = Files.createTempDirectory("docs_conj").toString
    Files.copy(Paths.get(s"$sfTiny/documents.parquet"),
      Paths.get(dir, "documents.parquet"))
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
      .select("doc_id", "text")
    val scored = StreamingRetrieval.scoreStream(stream, qAug, len, nd,
      Retrieval.lmnoPart, Retrieval.lmnoFinal, conjunctive = true)
    val sq = StreamingRetrieval.toMemory(scored, "sr_conj")
    assert(sq.awaitTermination(120000), "stream did not terminate in 120s")

    val streamed = spark.table("sr_conj").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Retrieval.scoreWithStats(docs, qAug, len, nd,
      Retrieval.lmnoPart, Retrieval.lmnoFinal, conjunctive = true,
      k = Int.MaxValue)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    // and the gate BITES: some doc matches a strict subset of a
    // query's terms, so the ungated score set is strictly larger
    val ungated = Retrieval.scoreWithStats(docs, qAug, len, nd,
      Retrieval.lmnoPart, Retrieval.lmnoFinal, conjunctive = false,
      k = Int.MaxValue)
      .select("qid", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed.map(t => (t._1, t._2)).subsetOf(ungated))
    assert(streamed.size < ungated.size,
      "fixture has no partial-match doc; the gate is untested")
  }
}
