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

  /** Generic tag-delimited record scan — the configurable-tag surface
    * of the reference's `XmlInputFormat.java:21-117` (arbitrary
    * start/end tags from conf). One (record) column per
    * startTag…endTag block, tags inclusive, inter-record bytes
    * dropped. Still splittable: the `text` source's custom `lineSep`
    * handles delimiter straddling across splits exactly like the
    * reference's readUntilMatch across block boundaries.
    *
    * Documented divergence (advisor r5): the endTag is re-appended to
    * every startTag-bearing chunk, so a TRUNCATED file whose final
    * record lacks its closing tag is emitted as a syntactically
    * complete record, where the reference's `readUntilMatch`
    * (`XmlInputFormat.java:86-117`) silently discards the unterminated
    * tail. We keep the partial record: at 100 TB, dropping data
    * silently on a truncated shard is the worse failure mode, and
    * callers that want reference parity can filter records missing an
    * interior endTag-preceding structure themselves.
    */
  def readRecords(spark: SparkSession, path: String,
                  startTag: String, endTag: String): DataFrame =
    spark.read.option("lineSep", endTag).text(path)
      .filter(col("value").contains(startTag))
      .select(concat(
        col("value").substr(locate(startTag, col("value")),
          length(col("value"))),
        lit(endTag)).as("record"))

  /** (docno, epoch, text) rows; rows without a start tag dropped.
    * Tags default to TREC's `<DOC>`/`</DOC>` but are configurable
    * (reference parity: `XmlInputFormat` takes both from conf; the
    * default start is the open-bracket prefix so attributed tags like
    * `<DOC id=…>` still match).
    */
  def read(spark: SparkSession, path: String,
           startTag: String = "<DOC", endTag: String = "</DOC>"): DataFrame =
    // composes on readRecords — ONE definition of the record-carving
    // contract (review r18: this method carried its own lineSep +
    // contains prologue, which already diverged by extracting fields
    // from the whole chunk INCLUDING inter-record bytes before the
    // startTag; a future carving-policy change would have split the
    // two paths further)
    readRecords(spark, path, startTag, endTag)
      .select(
        regexp_extract(col("record"), "(?s)<DOCNO>\\s*(.*?)\\s*</DOCNO>", 1)
          .as("docno"),
        // try_cast: docs without an <EPOCH> tag extract "" — NULL, not
        // an ANSI cast error
        expr("try_cast(regexp_extract(record, '(?s)<EPOCH>\\\\s*(.*?)\\\\s*</EPOCH>', 1) AS BIGINT)")
          .as("epoch"),
        regexp_extract(col("record"), "(?s)<TEXT>\\s*(.*?)\\s*</TEXT>", 1)
          .as("text"))
}

/** Topic-file readers/writers (FIXTURES.md §2–§5). */
object Topics {

  /** Plain `qid:term term …` topics → (qid, term) rows, reference
    * tokenization (`nl/utwente/mirex/TrecRun.java:91-106`).
    */
  def readPlain(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(
        split(col("value"), ":", 2).getItem(0).as("qid"),
        // the CANONICAL tokenizer (review r18: this was a hand-inlined
        // copy of the split/lower/filter idiom — the r14 one-definition
        // rule exists because a tokenizer change that reaches the
        // corpus but not the query parse silently empties every
        // retrieval equi-join)
        explode(graft.text.TextOps.cleanTokensCol(
          split(col("value"), ":", 2).getItem(1))).as("term"))

  /** Stats-augmented topic format (FIXTURES §3): `#MIREX-LENGTH:`/
    * `#MIREX-NDOCS:` headers + `qid:term=qtf=df=cf …` rows — writer
    * `QueryTermCount.java:283-318`, parser
    * `TrecRunBaselines.java:105-136`. The "driver interlude" that
    * rewrites the topic file becomes a tiny collect + single-file
    * write (stats are |query vocab|-sized).
    */
  def writeAugmented(stats: DataFrame, collLength: Long, nDocs: Long,
                     path: String): Unit = {
    // stats: (qid, term, qtf, df, cf); term entries array_sort'ed so
    // the emitted file is byte-stable across runs/partitionings
    // (review r18 — the weighted-topic writer already does this;
    // collect_list order is task-order-dependent)
    val lines = stats
      .groupBy("qid")
      .agg(concat_ws(" ", array_sort(collect_list(
        concat_ws("=", col("term"), col("qtf"), col("df"), col("cf")))))
        .as("terms"))
      .select(concat_ws(":", col("qid"), col("terms")).as("value"))
      .collect().map(_.getString(0)).sorted
    val header = Seq(s"#MIREX-LENGTH:$collLength", s"#MIREX-NDOCS:$nDocs")
    val bytes = String.join("\n", (header ++ lines): _*)
      // explicit UTF-8 (review r16): every reader decodes UTF-8
      // (spark.read.text); the platform default would silently
      // mojibake non-ASCII terms on a non-UTF-8 JVM and they would
      // never equi-join against the corpus again
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // Hadoop FS, not java.nio (review r18): readAugmented and every
    // sibling reader resolve this path against Spark's DEFAULT
    // filesystem — a driver-local nio write breaks the
    // QueryTermCount -> TrecRunBaselines chain on any cluster whose
    // fs.defaultFS is not file:// (and nio refuses to create parents)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(
      stats.sparkSession.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Parse the augmented format back → header (length, ndocs) +
    * (qid, term, qtf, df, cf) rows.
    */
  def readAugmented(spark: SparkSession, path: String)
      : ((Long, Long), DataFrame) = {
    // no cache: a topic file is tiny and this frame escapes to the
    // caller lazily, so a cache here could never be unpersisted and
    // would leak one cached plan per call for the session's lifetime
    val raw = spark.read.text(path)
    val header = raw.filter(col("value").startsWith("#MIREX-"))
      .collect().map(_.getString(0))
    // a missing/mistyped stats header is a LOUD error (review r16):
    // the old 0 default flowed into every scoring formula as
    // n_tokens/n_docs — zeroed smoothing ratios and a 0/0 BM25 length
    // norm, silently wrong scores for every query
    def h(k: String): Long = header.collectFirst {
      case l if l.startsWith(s"#MIREX-$k:") => l.substring(k.length + 8).toLong
    }.getOrElse(throw new IllegalArgumentException(
      s"readAugmented: $path has no #MIREX-$k: header — collection " +
        s"stats are mandatory in the augmented format (headers found: " +
        s"${header.mkString("[", ", ", "]")})"))
    val rows = raw.filter(!col("value").startsWith("#"))
      .select(
        split(col("value"), ":", 2).getItem(0).as("qid"),
        explode(split(split(col("value"), ":", 2).getItem(1), " ")).as("t"))
      .filter(col("t") =!= "")
      .select(col("qid"),
        split(col("t"), "=").getItem(0).as("term"),
        expr("try_cast(split(t, '=')[1] AS BIGINT)").as("qtf"),
        expr("try_cast(split(t, '=')[2] AS BIGINT)").as("df"),
        expr("try_cast(split(t, '=')[3] AS BIGINT)").as("cf"))
    ((h("LENGTH"), h("NDOCS")), rows)
  }

  /** Weighted topic format (FIXTURES §4): `qid<TAB>term:w term:w …` —
    * parser `RunQueryHBase.java:138-161`, writer
    * `GenerateFeedbackQueriesHBase.java:309-354`.
    */
  def readWeighted(spark: SparkSession, path: String): DataFrame =
    // text + split, NOT the csv source (review r16): csv's default
    // quote/escape handling silently rewrites field content (a terms
    // field starting with '"' triggers quoted-field parsing,
    // backslashes are eaten) — the sibling readers are all
    // byte-transparent, and the reference parser splits verbatim
    spark.read.text(path)
      .select(
        split(col("value"), "\t", 2).getItem(0).as("qid"),
        split(col("value"), "\t", 2).getItem(1).as("terms"))
      .select(col("qid"), explode(split(col("terms"), " ")).as("tw"))
      .filter(col("tw") =!= "")
      .select(col("qid"),
        split(col("tw"), ":").getItem(0).as("term"),
        expr("try_cast(split(tw, ':')[1] AS DOUBLE)").as("w"))

  /** KEYVAL parsed-document format (FIXTURES §5): gz TSV
    * `TREC-ID \t URL \t text…` — AnchorExtract output, TrecRun KEYVAL
    * input (`TrecRun.java:242-244`).
    */
  def readKeyval(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(
        split(col("value"), "\t", 3).getItem(0).as("doc_id"),
        split(col("value"), "\t", 3).getItem(1).as("url"),
        split(col("value"), "\t", 3).getItem(2).as("text"))
}
