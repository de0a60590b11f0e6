package graft.pipeline

import graft.SparkSpec

/** Each Gopher rule (Rae et al. 2021 §A1.1) must bind on a doc
  * constructed to violate exactly that rule, and a clean doc passes.
  */
class GopherRulesSpec extends SparkSpec {

  private def verdicts(texts: Seq[String]): Map[Long, Row] = {
    import spark.implicits._
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    TextMetrics.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> Row(r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5))).toMap
  }
  private case class Row(nWords: Long, mwl: Double, alphaFrac: Double,
      symRatio: Double, keep: Int)

  test("each rule binds on its violating doc; a clean doc passes") {
    val clean = Seq.fill(40)("plain").mkString(" ")          // mwl 5.0
    val tooShort = Seq.fill(10)("plain").mkString(" ")       // < 30 words
    val shortWords = Seq.fill(40)("ab cd").mkString(" ")     // mwl 2.0
    val longWords = Seq.fill(40)("pneumonoultramicroscopic").mkString(" ")
    val symbols = Seq.fill(40)("plain #tag ...").mkString(" ") // sym > 0.1
    val numeric = Seq.fill(40)("12345 67890 plain").mkString(" ") // alpha < 0.8

    val v = verdicts(Seq(clean, tooShort, shortWords, longWords,
      symbols, numeric))
    assert(v(0).keep == 1, s"clean doc must pass: ${v(0)}")
    assert(v(1).keep == 0 && v(1).nWords == 10)
    assert(v(2).keep == 0 && v(2).mwl == 2.0)
    assert(v(3).keep == 0 && v(3).mwl > 10.0)
    assert(v(4).keep == 0 && v(4).symRatio > 0.1,
      s"'#' + '...' must both count: ${v(4)}")
    assert(v(5).keep == 0 && v(5).alphaFrac < 0.8)
  }

  test("stats are exact on a known doc") {
    val v = verdicts(Seq("one two three four"))
    assert(v(0) == Row(4L, 3.75, 1.0, 0.0, 0))  // 15 chars / 4 words
  }

  test("repetitionSignals: hand-computed top-2gram and dup-5gram coverage") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e a b c d e"), // the 5-gram "a b c d e" repeats:
                                   // its two spans cover ALL 10 tokens
      (2L, "ab ab ab"),            // top pair (ab,ab) ×2, overlap-counted
      (3L, "one two three four five six seven"), // all pairs unique
      (4L, ""),                    // empty -> all zeros
      (5L, "x"))                   // sub-pair -> zeros
      .toDF("doc_id", "text")
    val m = TextMetrics.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(m(1L) == (10L, 10L, 0.4, 1.0))       // top (a,b): 2·2/10
    // Gopher's top-n-gram frac counts every occurrence, so overlapping
    // repeats can push it past 1 — a signal, not a probability
    assert(m(2L) == (3L, 6L, 1.333333, 0.0))    // 2·4/6; < 5 tokens
    // all-unique pairs tie at cnt=1 -> lexicographic ("five","six"),
    // 7 chars over the 27-char doc
    assert(m(3L) == (7L, 27L, 0.259259, 0.0))
    assert(m(4L) == (0L, 0L, 0.0, 0.0))
    assert(m(5L) == (1L, 1L, 0.0, 0.0))
  }

  test("compressionSignal: ordering properties, zlib-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val docs = Seq(
      (0L, "spam " * 400),                                 // pure repetition
      (1L, ("the quick brown fox jumps over a lazy dog " +
        "while autumn rain settles on quiet rooftops ") * 25),  // natural-ish
      (2L, Seq.fill(2000)(rnd.nextPrintableChar()).mkString), // noise
      (3L, "")                                             // empty
    ).toDF("doc_id", "text")
    val m = TextMetrics.compressionSignal(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    // repetition compresses hardest, random text barely at all —
    // orderings hold for ANY zlib build, unlike absolute byte counts
    assert(m(0L)._3 < m(1L)._3 && m(1L)._3 < m(2L)._3, m.toString)
    assert(m(0L)._3 < 0.05, s"pure repetition must crush: ${m(0L)}")
    assert(m(2L)._3 > 0.8, s"random text must not: ${m(2L)}")
    assert(m(3L)._3.isNaN && m(3L)._1 == 0L) // empty: ratio NULL
    // deterministic within this JVM, and the SQL-text form agrees
    val viaSql = docs.filter($"doc_id" === 1L)
      .select(expr("deflate_len(text)")).head().getLong(0)
    assert(viaSql == m(1L)._2)
  }

  test("compressionBuckets: zlib-invariant band ordering, per-language, " +
    "keep-band composition (the px85 funnel stage)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // per language: 3 repetitive, 3 natural, 3 noise docs — the bands
    // must separate them by ORDERING alone (no absolute byte counts,
    // so the assertion holds for any zlib build)
    val rnd = new scala.util.Random(11)
    val natural = "the quick brown fox jumps over a lazy dog while " +
      "autumn rain settles gently on the quiet rooftops tonight "
    val docs = (for {
      (lang, off) <- Seq(("en", 0L), ("de", 100L))
      i <- 0L until 3L
      (kind, text) <- Seq(
        (0L, s"spam$i " * 300),
        (1L, (natural + s"variant $i ") * 12),
        (2L, Seq.fill(1500)(rnd.nextPrintableChar()).mkString))
    } yield (off + kind * 10 + i, lang, text)).toDF("doc_id", "lang", "text")
    val b = TextMetrics.compressionBuckets(docs, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    for (off <- Seq(0L, 100L); i <- 0L until 3L) {
      assert(b(off + i) == 1L, s"repetitive doc ${off + i}: ${b(off + i)}")
      assert(b(off + 10 + i) == 2L, s"natural doc: ${b(off + 10 + i)}")
      assert(b(off + 20 + i) == 3L, s"noise doc: ${b(off + 20 + i)}")
    }
    // funnel composition: the middle band is the keep-band, so only
    // the natural docs survive a band-2 gate — per language
    val kept = TextMetrics.compressionBuckets(docs, 3)
      .filter(col("bucket") === 2).select("doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(10L, 11L, 12L, 110L, 111L, 112L), kept.toString)
    // deterministic rerun
    val again = TextMetrics.compressionBuckets(docs, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == b)
  }

  test("featureHashVectors: unit norms, bucket range, sparse empties") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "alpha beta beta gamma"),
      (1L, "alpha alpha alpha alpha"), // one bucket, w = 1 exactly
      (2L, ""),                        // no tokens -> no rows
      (3L, "??? !!!")                  // punctuation-only -> no rows
    ).toDF("doc_id", "text")
    val v = TextMetrics.featureHashVectors(docs, dim = 8)
      .select("doc_id", "j", "c", "w")
      .as[(Long, Long, Long, Double)].collect()
    assert(v.forall(r => r._2 >= 0 && r._2 < 8))
    assert(!v.exists(r => r._1 == 2L || r._1 == 3L))
    // doc 1 collapses to a single bucket with weight exactly 1
    val d1 = v.filter(_._1 == 0L)
    assert(d1.map(_._3).sum == 4L) // occurrence counts, not distinct
    val one = v.filter(_._1 == 1L)
    assert(one.length == 1 && one.head._3 == 4L && one.head._4 == 1.0)
    // L2 norms are 1 up to the 6-dp rounding of each component
    val norm0 = math.sqrt(d1.map(r => r._4 * r._4).sum)
    assert(math.abs(norm0 - 1.0) < 1e-5, s"norm $norm0")
    // deterministic rerun, bit for bit
    val again = TextMetrics.featureHashVectors(docs, dim = 8)
      .select("doc_id", "j", "c", "w")
      .as[(Long, Long, Long, Double)].collect()
    assert(v.sortBy(r => (r._1, r._2)).sameElements(
      again.sortBy(r => (r._1, r._2))))
  }

  test("quality: punct_ratio pinned on a punctuation fixture (the gated " +
    "corpora carry ZERO punctuation, so the oracle only ever compares " +
    "0 = 0 there)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length}
    // "a, b! c? a": 10 chars, 3 punctuation chars ([^0-9a-zA-Z\s]),
    // tokens a/b/c/a -> n_tokens 4, n_types 3, stopwords {a, the} ->
    // n_stop 2; ttr 0.75, stop_ratio 0.5, punct_ratio 0.3,
    // quality = 0.75*0.5 + (1 - 0.5)*0.5 = 0.625 — all hand-computed.
    val docs = Seq((1L, "a, b! c? a")).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val r = TextMetrics.quality(docs).head()
    assert(r.getLong(1) == 10L, s"n_chars: $r")
    assert(r.getLong(2) == 4L && r.getLong(3) == 3L, s"counts: $r")
    assert(r.getDouble(4) == 0.75 && r.getDouble(5) == 0.5, s"ratios: $r")
    assert(r.getDouble(6) == 0.3, s"punct_ratio: $r")
    assert(r.getDouble(7) == 0.625, s"quality: $r")
  }

  test("quality: ONE row per input doc — token-less docs score NULL, " +
    "not silently dropped (r18: the inner join let them bypass any " +
    "funnel keyed on this frame without a verdict)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length}
    val docs = Seq((1L, "a b c"), (2L, "!!! ???"), (3L, null: String))
      .toDF("doc_id", "text")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.coalesce(
          length(col("text")).cast("long"),
          org.apache.spark.sql.functions.lit(0L)))
    val out = TextMetrics.quality(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"one row per doc: ${out.keys}")
    assert(!out(1L).isNullAt(7), "tokenful doc scores")
    assert(out(2L).isNullAt(2) && out(2L).isNullAt(7),
      "punct-only doc: NULL token stats and NULL score")
    assert(out(3L).isNullAt(2) && out(3L).isNullAt(7),
      "NULL-text doc: NULL token stats and NULL score")
    // ADVICE r19: NULL text must give NULL n_punct/punct_ratio (the
    // tokenCounts nullif convention) — the bare size() idiom emitted
    // the -1 sentinel, a NEGATIVE punct_ratio whenever n_chars > 0,
    // where the oracle's len(NULL) is NULL
    assert(out(3L).isNullAt(6), "NULL-text doc: NULL punct_ratio")
    assert(!out(2L).isNullAt(6) && out(2L).getDouble(6) > 0,
      "punct-only doc still gets a real punct_ratio")
  }
}
