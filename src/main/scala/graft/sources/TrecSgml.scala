package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TREC-SGML collection reader (SURVEY.md §2.1 S3/S4).
  *
  * The reference carves `<DOC>…</DOC>` byte ranges out of huge
  * concatenated files with a custom splittable InputFormat
  * (`edu/gslis/hadoop/trec/XmlInputFormat.java:21-117`,
  * `TrecDocumentInputFormat.java:20-67`) and extracts fields by
  * substring (`TrecUtils.java:31-60`, epoch:
  * `IndexTrecToHBase.java:86-97`).
  *
  * Spark-first: `text` source with a custom record delimiter — the
  * scan stays splittable (Hadoop LineRecordReader handles delimiter
  * straddling across splits), so a 100 TB collection parallelizes by
  * HDFS block exactly like the reference's XmlInputFormat. Field
  * extraction is `regexp_extract` (codegen'd).
  */
object TrecSgml {

  /** (docno, epoch, text) rows; rows without a `<DOC` tag dropped. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", "</DOC>").text(path)
      .filter(col("value").contains("<DOC"))
      .select(
        regexp_extract(col("value"), "(?s)<DOCNO>\\s*(.*?)\\s*</DOCNO>", 1)
          .as("docno"),
        // try_cast: docs without an <EPOCH> tag extract "" — NULL, not
        // an ANSI cast error
        expr("try_cast(regexp_extract(value, '(?s)<EPOCH>\\\\s*(.*?)\\\\s*</EPOCH>', 1) AS BIGINT)")
          .as("epoch"),
        regexp_extract(col("value"), "(?s)<TEXT>\\s*(.*?)\\s*</TEXT>", 1)
          .as("text"))
}

/** Topic-file readers (FIXTURES.md §2/§3). */
object Topics {

  /** Plain `qid:term term …` topics → (qid, term) rows, reference
    * tokenization (`nl/utwente/mirex/TrecRun.java:91-106`).
    */
  def readPlain(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(
        split(col("value"), ":", 2).getItem(0).as("qid"),
        explode(split(lower(split(col("value"), ":", 2).getItem(1)),
          "[^0-9a-z]+")).as("term"))
      .filter(col("term") =!= "")
}
