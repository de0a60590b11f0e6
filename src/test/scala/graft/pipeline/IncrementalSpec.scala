package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the round-11 batch-prep / incremental-dedup APIs:
  * sliding-window chunking ([[TextMetrics.chunkWindows]]) and the
  * incremental near-dup check ([[Dedup.incrementalNearDups]]).
  */
class IncrementalSpec extends SparkSpec {

  import spark.implicits._

  // ---- chunkWindows ----

  private def doc(id: Long, n: Int) =
    (id, (0 until n).map(i => s"t$i").mkString(" "))

  test("chunkWindows: every token covered, starts advance by stride, " +
    "only the last window may run short") {
    val docs = Seq(doc(1, 70), doc(2, 32), doc(3, 33), doc(4, 5))
      .toDF("doc_id", "text")
    val w = TextMetrics.chunkWindows(docs, 32, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).groupBy(_._1)

    // n=70: nw = 1 + ceil(38/16) = 4; starts 0,16,32,48; last has 22
    assert(w(1L).sortBy(_._2).map(x => (x._3, x._4)).toSeq ==
      Seq((0L, 32L), (16L, 32L), (32L, 32L), (48L, 22L)))
    // n=win exactly: one full window
    assert(w(2L).map(x => (x._3, x._4)).toSeq == Seq((0L, 32L)))
    // n=win+1: second window starts at stride and holds the tail
    assert(w(3L).sortBy(_._2).map(x => (x._3, x._4)).toSeq ==
      Seq((0L, 32L), (16L, 17L)))
    // n<win: one short window
    assert(w(4L).map(x => (x._3, x._4)).toSeq == Seq((0L, 5L)))
    // coverage: for every doc the last window contains the last token
    for ((id, n) <- Seq(1L -> 70, 2L -> 32, 3L -> 33, 4L -> 5)) {
      val last = w(id).maxBy(_._3)
      assert(last._3 + last._4 == n, s"doc $id must cover token ${n - 1}")
    }
  }

  test("chunkWindows: window fingerprints equal whole-doc fingerprint " +
    "composition — identical texts collide windowwise") {
    val docs = Seq(doc(10, 40), doc(11, 40), doc(12, 41))
      .toDF("doc_id", "text")
    val wh = TextMetrics.chunkWindows(docs, 32, 16)
      .select("doc_id", "win_id", "wh")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val by = wh.groupBy(_._1).map { case (k, v) =>
      k -> v.sortBy(_._2).map(_._3).toSeq
    }
    assert(by(10L) == by(11L), "identical docs → identical window hashes")
    // doc 12 shares window 0 (same first 32 tokens) but not the tail
    assert(by(12L).head == by(10L).head)
    assert(by(12L).last != by(10L).last)
  }

  test("chunkWindows is shuffle-free (narrow plan, no Exchange)") {
    val docs = Seq(doc(1, 70)).toDF("doc_id", "text")
    val plan = TextMetrics.chunkWindows(docs, 32, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking must stream at scan speed:\n$plan")
  }

  // ---- incrementalNearDups ----

  // existing corpus: two docs; batch: one near-dup of doc 1 (one token
  // changed out of 40), one novel doc. Shingle Jaccard of the dup pair
  // is well above 0.5; the novel doc shares nothing.
  private val existingDocs = Seq(
    doc(1, 40),
    (2L, (0 until 40).map(i => s"u$i").mkString(" ")))
    .toDF("doc_id", "text")
  private val batchDocs = Seq(
    (100L, ((0 until 39).map(i => s"t$i") :+ "zz").mkString(" ")),
    (101L, (0 until 40).map(i => s"v$i").mkString(" ")))
    .toDF("doc_id", "text")

  test("incrementalNearDups: near-dup flagged against the corpus, " +
    "novel doc passes with zero candidates") {
    val out = Dedup.incrementalNearDups(existingDocs, batchDocs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(100L, 101L),
      "one verdict row per batch doc")
    val (dup, novel) = (out(0), out(1))
    assert(dup._2 >= 1 && dup._3 == 1L,
      s"doc 100 must match existing doc 1, got $dup")
    assert(novel._2 == 0 && novel._3 == -1L,
      s"doc 101 must be novel, got $novel")
  }

  test("incrementalNearDups: signature-store path gives identical " +
    "verdicts to the inline path") {
    val inline = Dedup.incrementalNearDups(existingDocs, batchDocs, 0.5)
    val stored = Dedup.incrementalNearDupsFromSigs(
      Dedup.minhashWide(existingDocs), existingDocs,
      Dedup.minhashWide(batchDocs), batchDocs, 0.5)
    assert(inline.exceptAll(stored).isEmpty &&
      stored.exceptAll(inline).isEmpty)
  }

  test("incrementalNearDups: batch side never pairs with itself " +
    "(intra-batch dups are out of scope by contract)") {
    // two identical batch docs, nothing matching in the corpus
    val batch2 = Seq(
      (200L, (0 until 40).map(i => s"w$i").mkString(" ")),
      (201L, (0 until 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDups(existingDocs, batch2, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2)))
    assert(out.forall(r => r._2 == 0 && r._3),
      s"identical batch twins must both read novel vs the CORPUS: " +
        out.mkString(", "))
  }

  test("a redone batch never reads as its own duplicate " +
    "(self-candidates excluded at the band stage)") {
    // the store already holds this very batch (crash after the admit
    // append, before the caller's commit marker): every doc's only
    // band match is its own stored copy
    val store = existingDocs.unionAll(batchDocs)
    val out = Dedup.incrementalNearDupsFromSigs(
      Dedup.minhashWide(store), store,
      Dedup.minhashWide(batchDocs), batchDocs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.isNullAt(3)))
      .sortBy(_._1)
    // doc 100 still matches its REAL near-dup (doc 1) but never
    // itself; its self-pair is not in n_cand either
    assert(out(0) == ((100L, 1L, 1L, false)), out.mkString(", "))
    // doc 101's only stored match is itself: zero candidates, novel,
    // jac NULL — the row an uncrashed run would produce
    assert(out(1) == ((101L, 0L, -1L, true)), out.mkString(", "))
  }

  test("a redone batch never candidates against its stored BATCH-MATES " +
    "(redo == uncrashed, bit-identical, r12 advice)") {
    // batch of two near-identical docs (intra-batch dups are out of
    // scope by contract: both read novel in an uncrashed run). After
    // a crash-after-append the store holds BOTH, so a replay that only
    // dropped self-pairs would see doc 300 candidate against stored
    // 301 (n_cand 1, dup_of 301) — a verdict the uncrashed run never
    // produced. The band-stage anti-join on the batch id set makes the
    // redo bit-identical.
    val batch2 = Seq(
      (300L, (0 until 40).map(i => s"w$i").mkString(" ")),
      (301L, (0 until 41).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val uncrashed = Dedup.incrementalNearDups(existingDocs, batch2, 0.5)
      .collect().sortBy(_.getLong(0))
    val redoStore = existingDocs.unionAll(batch2)
    val redo = Dedup.incrementalNearDupsFromSigs(
      Dedup.minhashWide(redoStore), redoStore,
      Dedup.minhashWide(batch2), batch2, 0.5)
      .collect().sortBy(_.getLong(0))
    assert(uncrashed.sameElements(redo),
      s"redo diverged: ${uncrashed.mkString(",")} vs ${redo.mkString(",")}")
    // and the uncrashed verdicts really are both-novel (non-vacuity)
    assert(uncrashed.map(r => (r.getLong(1), r.isNullAt(2))).toSeq ==
      Seq((0L, true), (0L, true)))
  }

  test("incrementalNearDups: corpus re-read is pruned to candidates " +
    "before shingling (semi-join below the explode)") {
    val plan = Dedup.incrementalNearDups(existingDocs, batchDocs, 0.5)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"existing side must be candidate-pruned before tokenize:\n$plan")
  }
}
