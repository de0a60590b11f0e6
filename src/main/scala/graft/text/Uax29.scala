package graft.text

import java.text.BreakIterator
import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UAX#29 word-segmentation tokenizer — the exact-parity alternate to
  * the default regex split.
  *
  * The reference's `TrecWordCount.java:50-77` tokenizes with Lucene's
  * `StandardAnalyzer(LUCENE_43)`, whose tokenizer implements Unicode
  * UAX#29 word boundaries (plus lowercasing and an English stop set).
  * No Lucene jar ships in this environment, but the JDK's
  * `java.text.BreakIterator.getWordInstance` implements the same
  * UAX#29 algorithm, so parity needs no new dependency. One JDK
  * deviation is corrected here: the JDK joins hyphenated compounds
  * ("state-of-the-art" → one token) where UAX#29 — and therefore
  * Lucene — breaks at HYPHEN-MINUS; we post-split segments on
  * hyphen/dash characters. `TokenizerDivergenceSpec` asserts this
  * path reproduces the documented Lucene output on every recorded
  * divergence case (possessives, acronyms, emails, decimals,
  * underscores, hyphens).
  *
  * This path is a per-row JVM function (BreakIterator is inherently
  * stateful), so it runs as a UDF — deliberately OFF the default
  * path. The codegen'd regex split in [[TextOps.tokensCol]] stays the
  * default because (a) it's whole-stage-codegen'd and (b) the same
  * rule is expressible in the DuckDB oracle, keeping every query
  * cross-checkable. Select this path with
  * `spark.conf.set("spark.graft.tokenizer", "uax29")` (read by
  * [[TextOps.tokensSelected]]).
  */
object Uax29 {

  /** UAX#29 word segments of `text`, lowercased, non-word segments
    * (whitespace/punctuation-only) dropped. Pure JVM function — also
    * usable outside Spark.
    */
  // BreakIterator is stateful but clone-from-prototype is expensive
  // (provider lookup per getWordInstance); one instance per executor
  // thread, reset per document (review r18 — the per-row allocation
  // was pure garbage on the whole-corpus parity path)
  private val localBi = new ThreadLocal[BreakIterator] {
    override def initialValue(): BreakIterator =
      BreakIterator.getWordInstance(Locale.ROOT)
  }

  def tokenize(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    val bi = localBi.get()
    bi.setText(text)
    val out = Seq.newBuilder[String]
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      val seg = text.substring(start, end)
      if (seg.codePoints().anyMatch(c => Character.isLetterOrDigit(c))) {
        // JDK quirk fix: BreakIterator joins letter-hyphen-letter
        // ("state-of-the-art"); UAX#29 has no MidLetter rule for
        // HYPHEN-MINUS, so Lucene emits the parts. Split them out.
        seg.toLowerCase(Locale.ROOT).split("[-‐-―]+").foreach {
          p => if (p.nonEmpty) out += p
        }
      }
      start = end
      end = bi.next()
    }
    out.result()
  }

  /** Lucene `StandardAnalyzer`'s default English stop set
    * (`StopAnalyzer.ENGLISH_STOP_WORDS_SET` — published, 33 words).
    * Exposed so callers can reproduce the reference analyzer's full
    * tokenize→lowercase→stop pipeline; the engine's own stop filter
    * (P9, [[TextOps.stopwords]]) remains a separate explicit step.
    */
  val luceneStopSet: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with")

  /** Full `StandardAnalyzer` pipeline parity: UAX#29 tokenize +
    * lowercase + English stop removal.
    */
  def analyze(text: String): Seq[String] =
    tokenize(text).filterNot(luceneStopSet)

  /** Array-of-tokens column (UDF — see scaladoc above for why this
    * path is not codegen'd). The UDF object is hoisted (review r18:
    * per-call construction re-created the closure wrapper for every
    * tokensCol reference).
    */
  private val tokenizeUdf = udf((s: String) => tokenize(s))

  def tokensCol(text: Column): Column = tokenizeUdf(text)

  /** (doc_id, term) rows — drop-in for [[TextOps.tokens]] with UAX#29
    * semantics.
    */
  def tokens(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(tokensCol(col(textCol))).as("term"))
}
