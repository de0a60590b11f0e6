package graft.pipeline

import graft.SparkSpec

/** Closed-form classifier math on constructed corpora: Naive Bayes
  * log-odds must separate two vocabularies with known counts, and DSIR
  * weights must up-weight docs drawn from the target distribution.
  */
class ClassifySpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def docsOf(rows: Seq[(Long, String, Int)]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val docs = rows.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val labels = rows.map { case (id, _, y) => (id, y) }.toDF("doc_id", "y")
    (docs, labels)
  }

  test("NB log-odds separates disjoint class vocabularies and matches closed form") {
    val (docs, labels) = docsOf(Seq(
      (1L, "good good fine", 1),
      (2L, "good fine", 1),
      (3L, "bad bad awful", 0),
      (4L, "good bad", 0)))
    val out = Classify.naiveBayesLogOdds(docs, labels).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toMap

    // hand-computed: V=4 {good,fine,bad,awful}; N1=5 (good 3, fine 2),
    // N0=5 (bad 3, awful 1, good 1); priors 2/2 → lp = 0.
    // P(good|1)=4/9, P(good|0)=2/9 → doc1 s = 2·ln(4/9·9/2) + ln(3/9·9/1)
    val lnGood = math.log(4.0 / 9) - math.log(2.0 / 9)
    val lnFine = math.log(3.0 / 9) - math.log(1.0 / 9)
    val lnBad = math.log(1.0 / 9) - math.log(4.0 / 9)
    val exp1 = BigDecimal(2 * lnGood + lnFine)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1)._1 == 3L)
    assert(math.abs(out(1)._2 - exp1) < 1e-9, s"got ${out(1)._2}, want $exp1")
    assert(out(1)._3 == 1 && out(2)._3 == 1, "positive-vocab docs → pred 1")
    assert(out(3)._3 == 0, "negative-vocab doc → pred 0")
    val exp4 = BigDecimal(lnGood + lnBad)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(4)._2 - exp4) < 1e-9, "mixed doc uses both likelihoods")
  }

  test("NB partial labels: OOV terms score fully smoothed, all-OOV docs kept (r16)") {
    import spark.implicits._
    // labels cover docs 1-4 only; doc 5 mixes known + unknown terms,
    // doc 6 is ALL out-of-vocabulary. Pre-r16 the inner class-count
    // join dropped OOV rows (doc 5 undercounted, doc 6 vanished).
    val (docs, _) = docsOf(Seq(
      (1L, "good good fine", 1),
      (2L, "good fine", 1),
      (3L, "bad bad awful", 0),
      (4L, "good bad", 0),
      (5L, "good zzz yyy", 0), // y ignored below
      (6L, "zzz yyy xxx", 0)))
    val labels = Seq((1L, 1), (2L, 1), (3L, 0), (4L, 0)).toDF("doc_id", "y")
    val out = Classify.naiveBayesLogOdds(docs, labels).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // every tokened doc appears, with FULL token counts
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(out(5L)._1 == 3L, s"OOV tokens must count: ${out(5L)}")
    assert(out(6L)._1 == 3L)
    // closed form: V=4, N1=5, N0=5, lp=0; OOV term = ln(1/9)-ln(1/9)=0
    val lnGood = math.log(4.0 / 9) - math.log(2.0 / 9)
    assert(math.abs(out(5L)._2 - BigDecimal(lnGood)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      s"doc 5 = one 'good' + two zero-contribution OOV terms: ${out(5L)}")
    assert(out(6L)._2 == 0.0, s"all-OOV doc scores the bare prior: ${out(6L)}")
  }

  test("NB with single-class labels yields NULL scores, not a runtime error") {
    val (docs, labels) = docsOf(Seq(
      (1L, "good good fine", 1),
      (2L, "good fine", 1)))
    val rows = Classify.naiveBayesLogOdds(docs, labels).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.isNullAt(2) && r.isNullAt(3)),
      "degenerate prior odds must surface as NULL log_odds/pred")
  }

  test("NB with all-negative labels yields NULL scores (ln(0) guarded)") {
    // d1 = 0 → prior odds ln(0/d): without the numerator nullif this is
    // NULL in Spark but an out-of-range ERROR in DuckDB's mirrored SQL —
    // the guard makes both engines agree on NULL.
    val (docs, labels) = docsOf(Seq(
      (1L, "good good fine", 0),
      (2L, "good fine", 0)))
    val rows = Classify.naiveBayesLogOdds(docs, labels).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.isNullAt(2) && r.isNullAt(3)),
      "all-negative labels must surface as NULL log_odds/pred")
  }

  test("DSIR up-weights target-distribution docs, weights sum over buckets") {
    val (docs, labels) = docsOf(Seq(
      (1L, "alpha alpha beta", 1),
      (2L, "alpha beta beta", 1),
      (3L, "gamma delta gamma", 0),
      (4L, "alpha gamma", 0)))
    val out = Classify.dsirLogWeights(docs, labels, buckets = 64).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out.size == 4)
    assert(out(1)._1 == 3L)
    // target-vocab docs must score strictly above the off-target doc
    assert(out(1)._2 > out(3)._2 && out(2)._2 > out(3)._2,
      s"target docs must out-weight off-target: $out")
    // avg is sum / n_tokens (rounding both at 6dp keeps them within 1e-6)
    assert(math.abs(out(4)._3 - out(4)._2 / out(4)._1) < 2e-6)
  }

  test("dupSpans merges overlapping duplicated 5-grams into maximal spans") {
    import spark.implicits._
    // docs 1 and 2 share tokens 1..8 (a run of four duplicated 5-grams
    // with starts 1..4 → ONE merged span of length 8); doc 3 is unique
    // so it must not appear at all.
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"$shared tail1a tail1b tail1c tail1d tail1e"),
      (2L, s"$shared tail2a tail2b tail2c tail2d tail2e"),
      (3L, "lone tokens that never repeat anywhere else at all ok"))
      .toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .toMap
    assert(out.keySet == Set(1L, 2L), s"only dup docs appear: $out")
    val (nG, nSpans, dupToks, dl, frac) = out(1)
    assert(nG == 4L, s"four duplicated 5-grams, got $nG")
    assert(nSpans == 1L, "overlapping hits merge into one span")
    assert(dupToks == 8L, s"span covers tokens 1..8, got $dupToks")
    assert(dl == 13L)
    assert(math.abs(frac - 8.0 / 13) < 1e-5)
  }

  test("dupSpans separates non-adjacent spans") {
    import spark.implicits._
    // the two shared runs sit far apart inside doc 1 → two islands
    val run1 = "r1a r1b r1c r1d r1e"
    val run2 = "r2a r2b r2c r2d r2e"
    val docs = Seq(
      (1L, s"$run1 gapa gapb gapc gapd gape gapf $run2"),
      (2L, s"$run1 other2a other2b other2c other2d other2e"),
      (3L, s"$run2 other3a other3b other3c other3d other3e"))
      .toDF("doc_id", "text")
    val d1 = Dedup.dupSpans(docs, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(d1(1L) == 2L, s"doc 1 must carry two distinct spans: $d1")
    assert(d1(2L) == 1L && d1(3L) == 1L)
  }
}
