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
    val df = golden.map(_._1).toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
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
