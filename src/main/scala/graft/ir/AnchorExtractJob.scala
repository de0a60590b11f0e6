package graft.ir

import graft.sources.{Warc, WarcDoc}
import graft.text.Html
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Anchor-text extraction (SURVEY.md §3.1 step 0; reference
  * `nl/utwente/mirex/AnchorExtract.java`).
  *
  * Reference dataflow: mapper emits both `(url, MIREX-TREC-ID: id)`
  * marker records and `(url, anchorText)` payload records; a combiner
  * partially concatenates; the reducer splits markers from payloads at
  * each URL key and re-keys by TREC-ID (`AnchorExtract.java:109-209`).
  *
  * Spark-first shape: the tagged-union trick disappears — pages and
  * anchors are two typed DataFrames meeting in an equi inner join on
  * `url`; the capped string concat is `concat_ws(collect_list)` with a
  * `substring` guard (partial aggregation is automatic, replacing the
  * hand-written combiner).
  *
  * Scale notes: anchors shuffle once on `url` (hash partition). The
  * 10 MB per-URL cap (`AnchorExtract.java:71`) bounds reducer memory
  * exactly as in the reference; heavy-hitter URLs are handled by AQE
  * skew-join splitting on the join side and by the cap on the agg side.
  */
object AnchorExtractJob {

  val MaxAnchorBytes = 10000000

  /** (url, trecid) for every response page, URL-normalized. */
  def pages(warc: Dataset[WarcDoc]): DataFrame = {
    import warc.sparkSession.implicits._
    warc.filter((d: WarcDoc) => d.recordType == "response")
      .map(d => (Html.normalizePageUrl(d.targetUri), d.trecId))
      .toDF("url", "trecid")
  }

  /** (url, anchor) pairs — UDTF-style multi-emit flatMap. */
  def anchors(warc: Dataset[WarcDoc]): DataFrame = {
    import warc.sparkSession.implicits._
    warc.filter((d: WarcDoc) => d.recordType == "response")
      .flatMap(d => Html.extractAnchors(d.targetUri, d.content))
      .toDF("url", "anchor")
  }

  /** Full job: (docid, url, anchortext) for every crawled page that
    * received anchors, tab-separated and capped at 10 MB per URL.
    */
  def run(warc: Dataset[WarcDoc]): DataFrame = {
    // array_sort before gluing: collect_list order is nondeterministic
    // across runs/partitionings, and with the 10 MB cap the *retained*
    // anchor subset would be too. Sorted glue makes output and
    // truncation stable (the reference shares the flaw; we fix it).
    val glued = anchors(warc)
      .groupBy("url")
      .agg(substring(concat_ws("\t", array_sort(collect_list(col("anchor")))),
        1, MaxAnchorBytes).as("anchortext"))
    pages(warc).join(glued, Seq("url"))
      .select(col("trecid").as("docid"), col("url"), col("anchortext"))
  }

  def run(spark: SparkSession, warcPath: String): DataFrame =
    run(Warc.read(spark, warcPath))
}
