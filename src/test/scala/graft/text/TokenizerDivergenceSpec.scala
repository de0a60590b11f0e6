package graft.text

import graft.SparkSpec

/** Golden file of tokenizer divergences vs the reference's Lucene
  * `StandardAnalyzer(LUCENE_43)` (`TrecWordCount.java:50-77`:
  * UAX#29 word break + lowercase + English stop set).
  *
  * Our engine tokenizes with the codegen'd split on `[^0-9a-z]+` of
  * the lowercased text (P3/P4, `TextOps.tokensCol`) — deliberately,
  * so the SAME rule runs in Spark and the DuckDB oracle. This spec is
  * the per-case record of where that diverges from UAX#29: each row
  * asserts OUR output (so a tokenizer change surfaces here) and
  * documents the Lucene StandardAnalyzer output for the same input.
  * Stopword behavior is orthogonal: the reference's analyzer drops
  * English stop words at tokenize time; we keep tokenization pure and
  * apply `TextOps.stopwords` as an explicit filter step (P9).
  */
class TokenizerDivergenceSpec extends SparkSpec {

  /** (input, our tokens, Lucene StandardAnalyzer tokens). */
  private val golden: Seq[(String, Seq[String], Seq[String])] = Seq(
    // possessives / internal apostrophes: UAX#29 keeps them
    ("O'Brien's book", Seq("o", "brien", "s", "book"),
      Seq("o'brien's", "book")),
    ("can't stop", Seq("can", "t", "stop"), Seq("can't", "stop")),
    // acronyms with periods: UAX#29 keeps letter.letter chains
    ("U.S.A. policy", Seq("u", "s", "a", "policy"),
      Seq("u.s.a", "policy")),
    // emails / hostnames: letter.letter joins in UAX#29
    ("mail bob@example.com now", Seq("mail", "bob", "example", "com", "now"),
      Seq("mail", "bob", "example.com", "now")),
    // decimal numbers: UAX#29 keeps them (the reference then drops
    // pure numerics with its \d+(\.\d+)? filter — P4 twin px15/px16)
    ("pi is 3.14 exactly", Seq("pi", "is", "3", "14", "exactly"),
      Seq("pi", "exactly" /* 'is' stopped, 3.14 number-filtered */ )),
    // underscores: ExtendNumLet joins in UAX#29
    ("the foo_bar flag", Seq("the", "foo", "bar", "flag"),
      Seq("foo_bar", "flag" /* 'the' stopped */ )),
    // hyphens: BOTH split (agreement case)
    ("state-of-the-art", Seq("state", "of", "the", "art"),
      Seq("state", "art" /* 'of','the' stopped */ )),
    // plain prose: identical modulo stop handling
    ("Spark engines scale", Seq("spark", "engines", "scale"),
      Seq("spark", "engines", "scale")))

  test("our tokens match the documented golden for every divergence case") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // index zipped INTO the input rows: monotonically_increasing_id
    // encodes partitionId<<33 + offset, so it is 0..n-1 only while the
    // local relation stays in one partition — a parallelism or Spark
    // slicing change would silently break the golden lookup
    val df = golden.map(_._1).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextOps.tokens(df.select(col("doc_id"), col("text")))
      .groupBy("doc_id").agg(collect_list("term").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    golden.zipWithIndex.foreach { case ((in, ours, _), i) =>
      assert(got.getOrElse(i.toLong, Nil) == ours,
        s"tokenization of '$in' changed: ${got.get(i.toLong)}")
    }
  }

  test("UAX#29 path reproduces the Lucene StandardAnalyzer golden " +
    "on every divergence case") {
    // The golden's Lucene column records the FULL analyzer pipeline
    // (UAX#29 tokenize + lowercase + English stop set) followed by the
    // reference's numeric filter (\d+(\.\d+)? — TrecWordCount's
    // number-drop, see the in-line case notes). Reproduce exactly that
    // pipeline through Uax29 and require bit-identical output.
    val numeric = "\\d+(\\.\\d+)?".r
    golden.foreach { case (in, _, lucene) =>
      val got = Uax29.analyze(in)
        .filterNot(t => numeric.pattern.matcher(t).matches())
      assert(got == lucene,
        s"UAX#29 pipeline diverges from Lucene golden on '$in': $got")
    }
  }

  test("spark.graft.tokenizer=uax29 selects the UAX#29 path") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((0L, "O'Brien's U.S.A. state-of-the-art foo_bar"))
      .toDF("doc_id", "text")
    try {
      spark.conf.set("spark.graft.tokenizer", "uax29")
      val ts = TextOps.tokensSelected(spark, df)
        .select("term").as[String].collect().toSeq
      assert(ts == Seq("o'brien's", "u.s.a", "state", "of", "the",
        "art", "foo_bar"))
      spark.conf.set("spark.graft.tokenizer", "regex")
      val rs = TextOps.tokensSelected(spark, df)
        .select("term").as[String].collect().toSeq
      assert(rs == Seq("o", "brien", "s", "u", "s", "a", "state", "of",
        "the", "art", "foo", "bar"))
    } finally spark.conf.unset("spark.graft.tokenizer")
  }

  test("UAX#29 path is null/empty/degenerate safe") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    assert(Uax29.tokenize(null) == Nil)
    assert(Uax29.tokenize("") == Nil)
    assert(Uax29.tokenize("   \t\n ... --- !!!") == Nil)
    val df = Seq((0L, null: String), (1L, ""), (2L, "ok"))
      .toDF("doc_id", "text")
    // null/empty docs contribute zero rows, not nulls or crashes
    val rows = Uax29.tokens(df).select("doc_id", "term")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((2L, "ok")))
  }

  // ---- UAX#29 property suite (r5 verdict item 4): fuzz the JDK
  // BreakIterator path over random unicode with fixed seeds (same
  // deterministic Gen pattern as Hamming64Spec), asserting the
  // invariants every consumer of Uax29.tokenize relies on. No Lucene
  // jar ships in this container, so parity beyond the recorded golden
  // is pinned by invariants, not by a live differential.

  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  /** Valid (non-surrogate) codepoints, weighted toward the scripts and
    * punctuation where segmentation rules actually differ.
    */
  private val codepoint: Gen[Int] = Gen.frequency(
    6 -> Gen.choose(0x20, 0x7e),       // ASCII printable
    2 -> Gen.choose(0xa0, 0x2fff),     // Latin supplements … general punct
    1 -> Gen.choose(0x3000, 0xd7ff),   // CJK and friends
    1 -> Gen.choose(0x10000, 0x1ffff)) // astral: emoji, math alphanumerics
  private val unicodeString: Gen[String] =
    Gen.listOf(codepoint).map(cps => new String(cps.toArray, 0, cps.length))
  private def samples(g: Gen[String], n: Int): Seq[String] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(i.toLong)))

  test("property: tokens are non-empty, lowercase, hyphen-free, and " +
    "carry a letter or digit on arbitrary unicode") {
    val hyphens = ('‐' to '―').toSet + '-'
    samples(unicodeString, 400).foreach { s =>
      Uax29.tokenize(s).foreach { t =>
        assert(t.nonEmpty, s"empty token from ${s.codePoints().toArray.toSeq}")
        assert(t == t.toLowerCase(java.util.Locale.ROOT),
          s"non-lowercase token '$t' from '$s'")
        assert(!t.exists(hyphens), s"hyphen survived in '$t' from '$s'")
        assert(t.codePoints().anyMatch(Character.isLetterOrDigit),
          s"letterless token '$t' from '$s'")
      }
    }
  }

  test("property: token order follows text order (ASCII)") {
    val ascii = Gen.listOf(Gen.choose(0x20, 0x7e))
      .map(cs => new String(cs.toArray, 0, cs.length))
    samples(ascii, 400).foreach { s =>
      val lower = s.toLowerCase(java.util.Locale.ROOT)
      var from = 0
      Uax29.tokenize(s).foreach { t =>
        val i = lower.indexOf(t, from)
        assert(i >= 0, s"token '$t' out of order in '$s'")
        from = i + t.length
      }
    }
  }

  test("property: UAX#29 agrees with the default regex path on " +
    "ASCII-alphanumeric text") {
    val alnumSpace = Gen.listOf(Gen.frequency(
      4 -> Gen.alphaNumChar, 1 -> Gen.const(' '))).map(_.mkString)
    samples(alnumSpace, 400).foreach { s =>
      val regexPath = s.toLowerCase(java.util.Locale.ROOT)
        .split("[^0-9a-z]+").toSeq.filter(_.nonEmpty)
      assert(Uax29.tokenize(s) == regexPath,
        s"paths diverge on pure-alphanumeric '$s'")
    }
  }

  test("property: tokenization distributes over space concatenation") {
    // a space is always a word break, so tokenize(a + \" \" + b) must
    // equal tokenize(a) ++ tokenize(b) — the invariant that makes
    // per-split tokenization safe on chunked input
    val pairs = samples(unicodeString, 400).grouped(2)
      .collect { case Seq(a, b) => (a, b) }.toSeq
    pairs.foreach { case (a, b) =>
      assert(Uax29.tokenize(a + " " + b) ==
        Uax29.tokenize(a) ++ Uax29.tokenize(b),
        s"concat broke on ${a.codePoints().toArray.toSeq} / " +
          s"${b.codePoints().toArray.toSeq}")
    }
  }

  test("divergence inventory is explicit") {
    // Structural divergences are exactly the cases where UAX#29 emits a
    // token containing a joiner our split treats as a boundary
    // (apostrophe, period, underscore). Stop/number filtering is
    // pipeline policy, not tokenizer divergence.
    val diverging = golden.count { case (_, _, lucene) =>
      lucene.exists(t => t.exists(c => c == '\'' || c == '.' || c == '_'))
    }
    // o'brien's, can't, u.s.a, example.com, foo_bar
    assert(diverging == 5, s"known diverging cases must stay 5, got $diverging")
  }
}
