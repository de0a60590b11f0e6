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
    sq.awaitTermination(120000)

    val streamed = spark.table("sr_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Retrieval.scoreWithStats(docs, qAug, len, nd,
      Retrieval.lmdirPart, Retrieval.lmdirFinal, conjunctive = false,
      k = Int.MaxValue)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
