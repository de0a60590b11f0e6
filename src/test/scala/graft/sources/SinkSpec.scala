package graft.sources

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sinks (SURVEY §2.1 S11–S13): gzip text out, Parquet doc-vector
  * table (the HBase-index replacement) round-trip.
  */
class SinkSpec extends SparkSpec {

  test("S11: gzip text sink round-trips") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sink").toString + "/out"
    Seq("51\tdoc1\t3.14", "51\tdoc2\t2.71").toDF("value")
      .coalesce(1).write.option("compression", "gzip").text(dir)
    assert(Files.list(java.nio.file.Paths.get(dir)).toArray
      .exists(_.toString.endsWith(".txt.gz")))
    val back = spark.read.text(dir).as[String].collect().sorted
    assert(back.toSeq == Seq("51\tdoc1\t3.14", "51\tdoc2\t2.71"))
  }

  test("S13: parquet doc-vector table (HBase replacement) round-trips") {
    val dir = Files.createTempDirectory("dv").toString + "/docvec"
    val docs = graft.Tables(spark, sfTiny, "documents")
    // (docno, epoch, dv: Map[term→tf], len) — SURVEY §1.1 index schema
    val dv = TextOps.termFreqs(docs)
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("term"), col("tf"))))
        .as("dv"),
        sum("tf").as("len"))
    dv.write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == dv.count())
    val row = back.filter(col("doc_id") === 0).select("dv", "len").head()
    val m = row.getMap[String, Long](0)
    assert(m.values.sum == row.getLong(1)) // Σ tf == doc length
  }

  test("JSONL sink round-trips the corpus (LLM-data interchange)") {
    val dir = Files.createTempDirectory("jsonl").toString + "/docs"
    val docs = graft.Tables(spark, sfTiny, "documents")
    // gzip JSONL is the de-facto training-data interchange format;
    // per-file gzip keeps files atomic-splittable at the FILE level
    // (one task per file at scale, like WARC).
    docs.write.option("compression", "gzip").json(dir)
    assert(Files.list(java.nio.file.Paths.get(dir)).toArray
      .exists(_.toString.endsWith(".json.gz")))
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
