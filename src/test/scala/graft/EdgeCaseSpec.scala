package graft

import graft.ir.Retrieval
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Degenerate-input robustness: empty corpora, all-stopword docs,
  * unmatched queries — paths a 100 TB pipeline hits daily (empty
  * partitions, filtered-out shards) and must survive quietly.
  */
class EdgeCaseSpec extends SparkSpec {

  import spark.implicits._

  test("retrieval on an empty corpus returns empty, not an error") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val q = Seq(("q1", "spark")).toDF("qid", "term")
    assert(Retrieval.scoreFor(docs, q, Retrieval.lmdirPart,
      Retrieval.lmdirFinal, conjunctive = false, 10).count() == 0)
  }

  test("query with no matching terms yields no results (zero-floor)") {
    val docs = Seq((1L, "spark join window")).toDF("doc_id", "text")
    val q = Seq(("q1", "zzzznotaword")).toDF("qid", "term")
    assert(Retrieval.scoreFor(docs, q, Retrieval.bm25Part,
      Retrieval.bm25Final, conjunctive = false, 10).count() == 0)
  }

  test("docs of only separators tokenize to nothing and drop out") {
    val docs = Seq((1L, "!!! ... ---"), (2L, "real words here"))
      .toDF("doc_id", "text")
    val toks = TextOps.tokens(docs)
    assert(toks.filter(col("doc_id") === 1).count() == 0)
    assert(TextOps.docLengths(docs).filter(col("doc_id") === 1)
      .head().getLong(1) == 0L)
    // NULL text = zero tokens too, never the non-ANSI size() sentinel
    // -1 (a negative dl silently corrupts any length-normalized score)
    val withNull = Seq((1L, Option("a b")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    assert(TextOps.docLengths(withNull).filter(col("doc_id") === 2)
      .head().getLong(1) == 0L)
  }

  test("shingles/minhash path survives empty and sub-k docs") {
    val docs = Seq((1L, ""), (2L, "one two"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val sh = TextOps.shingleRows(docs, 3).collect()
    assert(sh.map(_.getLong(0)).toSet == Set(3L))
  }

  test("semDedup survives an empty corpus and kClusters > n") {
    import graft.pipeline.Dedup
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.semDedup(empty, 4, 1, 0.9).count() == 0)
    // more requested clusters than vectors: every vector seeds its own
    // cluster — a total partition with nothing to pair
    val three = Seq(
      (10L, Array(1.0f, 0.0f)), (20L, Array(0.0f, 1.0f)),
      (30L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Dedup.semDedup(three, 10, 1, 0.9).collect()
    assert(out.length == 3)
    assert(out.forall(_.getInt(2) == 1), "singleton clusters keep everything")
  }

  test("eval metrics on a query with zero relevant docs stay defined") {
    val results = Seq(("q1", "d1", 1), ("q1", "d2", 2))
      .toDF("qid", "doc_id", "rank")
    val qrels = Seq(("q2", "dx", 1)).toDF("qid", "doc_id", "rel")
    val m = graft.eval.Eval.metrics(results, qrels).head()
    assert(m.getAs[Double]("recall") == 0.0)
    assert(m.getAs[Double]("ap") == 0.0)
    assert(!m.anyNull)
  }

  test("NULL-text docs: defined semantics everywhere (no -1 sentinels, " +
    "no accidental dedup)") {
    import org.apache.spark.sql.functions.col
    // review r14: Spark's non-ANSI size(NULL) = -1 leaked into several
    // ops as a negative "count" (gopherRules even scored alpha_frac =
    // (-1)/(-1) = 1.0, a perfect-looking stat for a doc with no text)
    val docs = Seq((1L, Some("plain text here")), (2L, None), (3L, None),
      (4L, Some(""))).toDF("doc_id", "text")
    val g = graft.pipeline.TextMetrics.gopherRules(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(g(2L).isNullAt(1) && g(2L).isNullAt(3),
      s"NULL text must yield NULL stats: ${g(2L)}")
    assert(g(2L).getInt(5) == 0, "NULL text must not pass the keep gate")
    val t = graft.pipeline.TextMetrics.tokenCounts(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(t(2L).isNullAt(1) && t(2L).isNullAt(2),
      s"NULL text must yield NULL token counts: ${t(2L)}")
    assert(t(1L).getLong(1) == 3L)
    // exactKeepers: NULL conflates with '' (the scrub-kernel reading),
    // so docs 2, 3 and 4 form ONE group with keeper 2 — never a
    // NULL-key group that dedups separately from empty text
    val k = graft.pipeline.Dedup.exactKeepers(docs)
      .collect().map(_.getLong(0)).toSet
    assert(k == Set(1L, 2L), s"keepers: $k")
  }

  test("semDedup: zero-norm embeddings always keep (undefined cosine), " +
    "documented — exact dups go through exactKeepers") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)), (3L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val v = graft.pipeline.Dedup.semDedup(rows, kClusters = 4, iters = 1,
      threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // identical all-zero vectors 2 and 3 both keep: their cosine is
    // undefined (NULL), never >= threshold — the pinned, documented rule
    assert(v(2L) == 1 && v(3L) == 1, v.toString)
  }

  test("semDedup/cosineTopK: a NaN embedding sits out, never drops " +
    "mates or tops rankings (review r19)") {
    import org.apache.spark.sql.functions.col
    // Spark orders NaN ABOVE every double: unguarded, a NaN norm
    // passed `> 0`, its NaN cosine passed `>= threshold` (dropping
    // every higher-id cluster-mate in semDedup) and outranked every
    // real neighbor in cosineTopK's DESC window
    val nan = Float.NaN
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(nan, 1.0f)),
      (3L, Seq(0.9f, 0.1f)), (4L, Seq(0.8f, 0.2f)))
      .toDF("vec_id", "embedding")
    val v = graft.pipeline.Dedup.semDedup(rows, kClusters = 1, iters = 1,
      threshold = -10.0) // everything pairs; only NaN sits out
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // the NaN row keeps AND cannot drop others; 3/4 drop against 1
    assert(v(2L) == 1, v.toString)
    assert(v(1L) == 1 && v(3L) == 0 && v(4L) == 0, v.toString)
    val topk = graft.pipeline.Ann
      .cosineTopK(rows, rows.filter(col("vec_id") === 1L), k = 3)
      .collect().map(_.getLong(1)).toSeq
    assert(!topk.contains(2L), s"NaN vector ranked: $topk")
    assert(topk == Seq(3L, 4L), topk.toString)
  }

  test("dedup misparameterization and reserved columns refuse loudly " +
    "(review r19)") {
    import graft.pipeline.Dedup
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val edges = Seq((1L, 1L)).toDF("d1", "d2")
    intercept[IllegalArgumentException](Dedup.clusters(docs, edges, 0))
    // reserved signature names in the passthrough input
    val e = intercept[IllegalArgumentException](
      Dedup.minhashWideNarrow(docs.withColumn("m3",
        org.apache.spark.sql.functions.lit(1))))
    assert(e.getMessage.contains("m3"), e.getMessage)
    // non-identifier passthrough names flow through bandSigs (the
    // selectExpr form parsed `event-time` as an expression)
    val sigs = Dedup.minhashWideNarrow(
      docs.withColumn("event-time", org.apache.spark.sql.functions.lit(7)))
    val bands = Dedup.bandSigs(sigs)
    assert(bands.columns.contains("event-time") &&
      bands.select("event-time", "band", "sig").count() == 4)
    // fingerprint: NULL text keys as '' (the exactKeepers convention)
    val fp = Seq((1L, Option.empty[String]), (2L, Some("")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L), fp.toString)
  }

  test("eval: tied ranks cannot inflate AP past 1 (ROWS frame, not RANGE)") {
    // two docs sharing rank 1 (raw-score ranks): the default RANGE
    // frame counted BOTH rows' rel into each peer's cum_rel, summing
    // ap_num = 2/1 + 2/1 = 4 and reporting ap = 2.0 silently
    val results = Seq(("q1", "d1", 1), ("q1", "d2", 1))
      .toDF("qid", "doc_id", "rank")
    val qrels = Seq(("q1", "d1", 1), ("q1", "d2", 1))
      .toDF("qid", "doc_id", "rel")
    val m = graft.eval.Eval.metrics(results, qrels).head()
    val ap = m.getAs[Double]("ap")
    assert(ap > 0.0 && ap <= 1.0, s"tied-rank ap = $ap")
  }

  test("eval: metricsAtKs computes several cutoffs in one pass, " +
    "matching per-k metrics()") {
    val results = Seq(("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3))
      .toDF("qid", "doc_id", "rank")
    val qrels = Seq(("q1", "d1", 1), ("q1", "d3", 1))
      .toDF("qid", "doc_id", "rel")
    val multi = graft.eval.Eval.metricsAtKs(results, qrels, Seq(1, 2)).head()
    assert(multi.getAs[Double]("p_at_1") ==
      graft.eval.Eval.metrics(results, qrels, k = 1)
        .head().getAs[Double]("p_at_k"))
    assert(multi.getAs[Double]("p_at_2") ==
      graft.eval.Eval.metrics(results, qrels, k = 2)
        .head().getAs[Double]("p_at_k"))
  }

  test("weighted KDE refuses MIXED-sign scores, not just a negative sum") {
    // wtot = 0.2 > 0, but the -4.9 kernel weight can drive some docs'
    // density <= 0 -> NULL ln(kde) -> silent garbage ranks; the guard
    // is on the per-query MINIMUM weight
    val ranked = Seq(
      ("q1", 1L, 5.1, 1700000000L), ("q1", 2L, -4.9, 1700000600L))
      .toDF("qid", "doc_id", "score", "ep")
    val e = intercept[Exception] {
      graft.temporal.Kde.rescore(ranked, weighted = true).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("positive")), e.toString)
  }

  test("kde rescore with a single result per query (sd undefined) holds") {
    val ranked = Seq(("q1", 7L, -3.5, 1700000000L))
      .toDF("qid", "doc_id", "score", "ep")
    val out = graft.temporal.Kde.rescore(ranked).collect()
    assert(out.length == 1)
    // stddev of one row is NULL; greatest(…, 1.0) must rescue the
    // bandwidth so the score stays finite
    assert(!out.head.isNullAt(2) && !out.head.getDouble(2).isNaN)
    assert(out.head.getInt(3) == 1)
  }

  test("gopherRules on empty / whitespace-only docs: dropped, no error") {
    val docs = Seq((1L, ""), (2L, "   \t  "), (3L, "one normal doc here"))
      .toDF("doc_id", "text")
    val v = graft.pipeline.TextMetrics.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(5)).toMap
    // zero-word docs divide by zero in every ratio; whatever the stat
    // columns carry (NaN/null), the verdict must be a quiet drop
    assert(v(1L) == 0 && v(2L) == 0)
    assert(v(3L) == 0) // 4 words < the 30-word floor, also dropped
    assert(v.size == 3, "every input doc must get a verdict row")
  }

  test("tokenizeAndPack: book-length doc cuts losslessly with bounded buffers") {
    // the r12 packing shape aggregates by (doc, example#), so no
    // collect_list buffer ever holds more than seqLen ids — a long doc
    // must cut into exactly-full examples (short tail allowed) whose
    // concatenation decodes back to the document
    val w = java.nio.file.Files
      .createTempDirectory("tokpack_long").toString
    val words = (0 until 3000).map(i => s"w${i % 7}")
    Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      .write.parquet(s"$w/in")
    graft.jobs.Jobs.tokenizeAndPack(spark, s"parquet:$w/in", s"$w/out",
      kMerges = 4, seqLen = 16, seed = 1, nShards = 2)
    val inv = spark.read.parquet(s"$w/out_vocab").select("sym", "id")
      .as[(String, Long)].collect().map(_.swap).toMap
    val ex = spark.read.parquet(s"$w/out")
      .select("example_id", "ids").as[(String, Seq[Long])].collect()
      .sortBy(_._1.split("_")(1).toInt)
    assert(ex.length >= 100, s"expected many examples, got ${ex.length}")
    ex.init.foreach { case (id, ids) =>
      assert(ids.size == 16, s"$id not full: ${ids.size}") }
    assert(ex.last._2.nonEmpty && ex.last._2.size <= 16)
    assert(ex.flatMap(_._2).map(inv).mkString("") == words.mkString(""))
  }

  test("chunkWindows: packed-win_id overflow fails LOUDLY, not silently") {
    import graft.pipeline.TextMetrics
    // a doc pushed past MaxWindowsPerDoc windows (win=stride=1 makes
    // every token a window) must raise, because px61 and
    // prepareTrainingData pack doc_id·2^20 + win_id into one bigint
    val tokens = TextMetrics.MaxWindowsPerDoc + 1
    val long = spark.range(1).select(lit(7L).as("doc_id"),
      concat_ws(" ", array_repeat(lit("a"), tokens)).as("text"))
    val e = intercept[Exception] {
      TextMetrics.chunkWindows(long, 1, 1).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("overflows")), e.toString)
    // and the guard boundary itself is fine: exactly 2^20 windows pass
    val atMax = spark.range(1).select(lit(7L).as("doc_id"),
      concat_ws(" ", array_repeat(lit("a"), tokens - 1)).as("text"))
    assert(TextMetrics.chunkWindows(atMax, 1, 1).count() ==
      TextMetrics.MaxWindowsPerDoc.toLong)
  }

  test("r12 op parameter guards fail loudly; empty corpora stay empty") {
    import graft.pipeline.{Dedup, Sharding, TextMetrics}
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // parameter contracts raise at build time, not deep in a job
    intercept[IllegalArgumentException](
      Sharding.repeatBudgetPlan(empty, maxRepeat = 0))
    intercept[IllegalArgumentException](
      Dedup.leakageSplit(empty.withColumnRenamed("text", "lbl"), nFolds = 1))
    intercept[IllegalArgumentException](
      Dedup.leakageSplit(empty.withColumnRenamed("text", "lbl"),
        nFolds = 10, nVal = 10))
    intercept[IllegalArgumentException](
      TextMetrics.featureHashVectors(empty, dim = 1))
    // r19 hand-off finding 4: the winnowing/repetition/scrub params
    // refuse like their siblings — w = 0 built an invalid window
    // frame, k = 0 made sequence(i, i-1) DESCEND and excise a wrong
    // token, n = 0 a degenerate shingle stream
    intercept[IllegalArgumentException](
      TextMetrics.winnowingFingerprints(empty, k = 4, w = 0))
    intercept[IllegalArgumentException](
      TextMetrics.winnowingSelection(empty, k = 0, w = 5))
    intercept[IllegalArgumentException](
      TextMetrics.repetitionRatio(empty, n = 0))
    intercept[IllegalArgumentException](
      TextMetrics.scrubContaminated(empty,
        Seq(1L).toDF("sh"), k = 0))
    // empty corpora flow through to empty results, no crash
    val el = empty.withColumn("lang", lit("en"))
    assert(Sharding.repeatBudgetMix(el).isEmpty)
    assert(Sharding.repeatBudgetPlan(el).isEmpty)
    assert(Dedup.dupRemovalSpans(empty).isEmpty)
    assert(TextMetrics.featureHashVectors(empty).isEmpty)
    // custom fold split: nFolds=5, nVal=2 -> folds 3 and 4 are val
    val lbls = Seq((1L, 10L), (2L, 11L), (3L, 12L), (4L, 13L))
      .toDF("doc_id", "lbl")
    val sp = Dedup.leakageSplit(lbls, nFolds = 5, nVal = 2)
      .select("fold", "split").as[(Long, String)].collect()
    assert(sp.forall { case (f, s) => (s == "val") == (f >= 3) },
      sp.mkString(","))
  }

  test("packSequences shard column resolves as a NAME, not as SQL " +
    "(r19 hand-off finding 5)") {
    import graft.pipeline.TextMetrics
    import spark.implicits._
    // a column name with a space: the old raw-SQL window interpolation
    // failed to parse it; the Column API resolves it as an identifier
    val docs = Seq((1L, "a b c", "s-1"), (2L, "d e", "s-1"),
      (3L, "f", "s 2")).toDF("doc_id", "text", "shard group")
    val got = TextMetrics.packSequences(docs, 3, "shard group")
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 0L), got.toString)
  }

  test("gated queries survive zero-norm embeddings, NULL text, and " +
    "zero-weight docs (review r19)") {
    // A corpus with the degenerate rows a 100 TB pipeline meets daily:
    // all-zero embeddings (padding/dead docs) and NULL/empty text.
    // Before r19, the inline cosine kernels in px06/07/09/44 raised
    // ANSI DIVIDE_BY_ZERO on the first zero-norm pair, and px37's
    // Efraimidis–Spirakis key did the same on n_chars = 0 — one bad
    // row killed the whole query while the DuckDB oracle kept running.
    val dirF = java.nio.file.Files
      .createTempDirectory("graft-degenerate").toFile
    dirF.deleteOnExit()
    val dir = dirF.getAbsolutePath
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextFloat() - 0.5f)
    }
    // zero-norm at vids 5, 10, 17 (all inside the vid < 20 probe sets
    // AND the candidate sides)
    val emb = (0L until 30L).map { v =>
      val e = if (v == 5L || v == 10L || v == 17L) Array.fill(8)(0f)
              else vec(v.toInt)
      (v, e, (v % 2).toInt)
    }.toDF("vec_id", "embedding", "label")
    emb.repartition(1).write.parquet(s"$dir/embeddings.parquet")
    val docs = ((0L until 12L).map { d =>
      val txt = "alpha beta gamma delta " + rnd.nextInt(100)
      (d, txt, "en", "web", txt.length.toLong)
    } ++ Seq(
      (12L, null.asInstanceOf[String], "en", "web", 0L), // NULL text
      (13L, "", "en", "web", 0L)))                       // zero weight
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(1).write.parquet(s"$dir/documents.parquet")

    def run(name: String) = SparkEntry.queries(name)(spark, dir)

    // cosine kernels: complete, and no zero-norm id appears in a pair
    val zeroIds = Set(5L, 17L, 10L)
    val p6 = run("px06_embed_dups")
      .select("a", "b").as[(Long, Long)].collect()
    assert(p6.nonEmpty &&
      p6.forall { case (a, b) => !zeroIds(a) && !zeroIds(b) })
    val p7 = run("px07_cosine_topk")
      .select("qid", "vid").as[(Long, Long)].collect()
    assert(p7.nonEmpty &&
      p7.forall { case (q, v) => !zeroIds(q) && !zeroIds(v) })
    assert(run("px09_ivf_topk").count() > 0)
    // semDedup verdict: zero-norm docs sit OUT the pairing but are
    // KEPT in the verdict (the Dedup.semDedup r14 rule)
    val p44 = run("px44_semdedup")
      .select("vid", "keep").as[(Long, Int)].collect().toMap
    assert(p44.size == 30 && zeroIds.forall(p44(_) == 1))
    // E-S weighted sample: the zero-weight docs (12, 13) are never
    // selected — their key is +Infinity, ranked past every real doc
    val p37 = run("px37_weighted_sample")
      .select("doc_id").as[Long].collect()
    assert(p37.length == 5 && !p37.contains(12L) && !p37.contains(13L))
    // scrub summary treats NULL text as ZERO tokens, not NULL
    // (tokArrayCol convention; the oracle's duckToksList now matches)
    val p72 = run("px72_exact_substr_dedup")
      .filter(col("doc_id") === 12L)
      .select("clean_text", "n_kept", "n_removed")
      .as[(String, Long, Long)].collect()
    assert(p72.sameElements(Array(("", 0L, 0L))))
    // exact-dedup composition: NULL text and '' text land in ONE
    // md5(coalesce) group (the exactKeepers contract px60/px66's
    // oracles now share)
    val p60 = run("px60_curation_e2e")
    assert(p60.count() > 0)
    // px11 quality on n_chars = 0 (r19 hand-off finding 1): the old
    // punct_ratio divided by raw n_chars — doc 13 (text = '',
    // n_chars = 0) threw ANSI DIVIDE_BY_ZERO and killed the query.
    // Now: one row per doc, NULL ratio on the degenerate rows.
    val p11 = run("px11_quality")
      .select("doc_id", "punct_ratio")
      .as[(Long, Option[Double])].collect().toMap
    assert(p11.size == 14, s"px11 rows=${p11.size}")
    assert(p11(13L).isEmpty, "n_chars=0 doc must get NULL punct_ratio")
    assert(p11(12L).isEmpty, "NULL-text doc must get NULL punct_ratio")
    assert(p11(0L).nonEmpty)
    // px68 buckets on token-less docs (r19 hand-off finding 2): the
    // old inner join dropped docs 12/13 from the banding without a
    // verdict; the left join buckets their NULL ppl nulls-first, so
    // every input doc is counted in exactly one band.
    val p68 = run("px68_ccnet_buckets")
      .agg(sum("n_docs")).as[Long].collect().head
    assert(p68 == 14L, s"px68 banded docs=$p68, want all 14")
  }
}
