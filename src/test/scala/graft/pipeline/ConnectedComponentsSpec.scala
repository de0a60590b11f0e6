package graft.pipeline

import graft.SparkSpec

/** Exact CC vs the fixed-round approximation: a dup CHAIN (near-dup
  * transitivity A≈B≈C≈…) of diameter > 3 is exactly the case the
  * px19 3-round contract mislabels and the fixpoint must get right.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a diameter-7 chain collapses to one component (3 rounds cannot)") {
    import spark.implicits._
    // chain 1-2-3-4-5-6-7-8 plus isolated 100
    val docs = (Seq(100L) ++ (1L to 8L)).toDF("doc_id")
    val edges = (1L to 7L).map(i => (i, i + 1)).toDF("d1", "d2")

    val cc = labelsOf(Dedup.connectedComponents(docs, edges))
    assert((1L to 8L).forall(cc(_) == 1L), s"fixpoint must reach the end: $cc")
    assert(cc(100L) == 100L)

    // the 3-round approximation provably under-labels the chain tail —
    // documenting WHY px42 exists alongside px19's fixed contract
    val approx = labelsOf(Dedup.clusters(docs, edges, rounds = 3))
    assert(approx(8L) != 1L,
      "if 3 rounds suddenly solve diameter 7, px19's contract changed")
  }

  test("star lshEdges give the same components as the all-pairs clique") {
    import graft.Tables
    // the r6 mega-bucket fix: per-bucket star edges must produce
    // byte-identical component labels to the quadratic pair list on a
    // real LSH graph (they connect exactly the same signature buckets)
    val docs = Tables(spark, sfTiny, "documents").select("doc_id", "text")
    val viaClique = labelsOf(
      Dedup.connectedComponents(docs, Dedup.lshCandidates(docs)))
    val viaStar = labelsOf(
      Dedup.connectedComponents(docs, Dedup.lshEdges(docs)))
    assert(viaStar == viaClique)
    // and the edge list is never larger than the clique's
    val nStar = Dedup.lshEdges(docs).count()
    val nClique = Dedup.lshCandidates(docs).count()
    assert(nStar <= nClique, s"star $nStar > clique $nClique")
  }

  test("star edges stay linear where the clique is quadratic (mega-bucket)") {
    import spark.implicits._
    // 200 identical docs = one LSH bucket per band: clique pairs are
    // b(b-1)/2, the star is b-1 — the 100 TB boilerplate shape
    val same = (1L to 200L).map(i => (i, "the same boilerplate text " * 8))
      .toDF("doc_id", "text")
    assert(Dedup.lshEdges(same).count() == 199L)
    assert(Dedup.lshCandidates(same).count() == 200L * 199 / 2)
    // and the keepers collapse to the min id
    val keep = Dedup.nearDupKeepers(same).collect().map(_.getLong(0)).toSeq
    assert(keep == Seq(1L))
  }

  test("star edges: degenerate corpora (empty, single doc, no dups)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.lshEdges(empty).count() == 0)
    assert(Dedup.nearDupKeepers(empty).count() == 0)
    val one = Seq((7L, "just one document here")).toDF("doc_id", "text")
    assert(Dedup.lshEdges(one).count() == 0)
    assert(Dedup.nearDupKeepers(one).collect().map(_.getLong(0)).toSeq
      == Seq(7L))
    // all-distinct corpus: no bucket ever has 2 members -> no edges,
    // every doc its own keeper
    val distinctDocs = (1L to 20L)
      .map(i => (i, s"totally unique document number $i with words " +
        ("x" + i) * 3)).toDF("doc_id", "text")
    assert(Dedup.lshEdges(distinctDocs).count() == 0)
    assert(Dedup.nearDupKeepers(distinctDocs).count() == 20)
  }

  test("agrees with the fixed-round labels on an LSH graph already converged") {
    import spark.implicits._
    // two tight pairs + a triangle: diameter <= 2, so 3 rounds converge
    // and both algorithms must agree exactly
    val docs = (1L to 7L).toDF("doc_id")
    val edges = Seq((1L, 2L), (3L, 4L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("d1", "d2")
    val cc = labelsOf(Dedup.connectedComponents(docs, edges))
    val approx = labelsOf(Dedup.clusters(docs, edges, rounds = 3))
    assert(cc == approx)
    assert(cc(7L) == 5L && cc(2L) == 1L && cc(4L) == 3L)
  }

  test("Jobs LeakageSplit labels with EXACT components: deep chains land in one fold") {
    import spark.implicits._
    // The r12 verdict's case: a dup chain of diameter > 3 converges
    // to SEVERAL labels under 3-round min-label propagation, which
    // hash to independent folds — silently violating the job's "no
    // dup group straddles train/val" contract. The CLI now labels
    // with the exact fixpoint; this drives the CLI's precomputed-edge
    // path (the 100 TB shape: the LSH edge list is a written artifact
    // of the dedup pass) with a diameter-7 chain 8-9-…-15 plus
    // isolated docs and a tight pair.
    val docs = (1L to 20L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    val edges = ((8L to 14L).map(i => (i, i + 1)) ++ Seq((3L, 5L)))
      .toDF("d1", "d2")
    val w = java.nio.file.Files.createTempDirectory("leakcc").toString
    docs.write.parquet(s"$w/in")
    edges.write.parquet(s"$w/edges")

    // non-vacuity guard: 3-round labeling provably splits this chain
    val approx = labelsOf(Dedup.clusters(docs, edges, rounds = 3))
    assert((8L to 15L).map(approx).toSet.size > 1,
      s"if 3 rounds solve diameter 7, the fixture is vacuous: $approx")

    graft.jobs.Jobs.leakageSplit(spark, s"parquet:$w/in", s"$w/split",
      edgesIn = Some(s"$w/edges"))
    val sp = spark.read.parquet(s"$w/split")
      .select("doc_id", "cluster", "fold", "split")
      .as[(Long, Long, Long, String)].collect()
    val byDoc = sp.map(r => r._1 -> r).toMap
    assert(sp.length == 20)
    // the whole chain carries ONE exact label, ONE fold, ONE split
    assert((8L to 15L).map(byDoc(_)._2).toSet == Set(8L))
    assert((8L to 15L).map(byDoc(_)._3).toSet.size == 1)
    assert((8L to 15L).map(byDoc(_)._4).toSet.size == 1)
    // the pair stays together; isolated docs keep their own label
    assert(byDoc(5L)._2 == 3L && byDoc(5L)._3 == byDoc(3L)._3)
    assert(byDoc(1L)._2 == 1L && byDoc(20L)._2 == 20L)
  }

  test("leakageSplit: cluster members never straddle the split") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, sfTiny, "documents")
    val labels = Dedup.clusters(docs, Dedup.lshCandidates(docs))
    val sp = Dedup.leakageSplit(labels)
    // the no-leak guarantee: one fold and one split per cluster label
    assert(sp.groupBy("lbl")
      .agg(countDistinct("fold").as("nf"), countDistinct("split").as("ns"))
      .filter($"nf" > 1 || $"ns" > 1).isEmpty)
    val rows = sp.select("doc_id", "fold", "split")
      .as[(Long, Long, String)].collect()
    assert(rows.forall(r => r._2 >= 0 && r._2 < 10))
    // nVal=1 of 10: only fold 9 is val, and both sides are populated
    assert(rows.forall(r => (r._3 == "val") == (r._2 == 9L)))
    assert(rows.exists(_._3 == "val") && rows.exists(_._3 == "train"))
    // deterministic rerun
    val again = Dedup.leakageSplit(labels)
      .select("doc_id", "fold", "split").as[(Long, Long, String)].collect()
    assert(rows.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // a real multi-doc cluster exists at this SF and stays together
    val multi = sp.groupBy("lbl").agg(count(lit(1)).as("n"),
        countDistinct("split").as("ns"))
      .filter($"n" > 1).select("ns").as[Long].collect()
    assert(multi.nonEmpty && multi.forall(_ == 1L))
  }

  test("connectedComponents releases superseded checkpoint blocks " +
    "(review r19: at most the returned frame's own checkpoint survives)") {
    import spark.implicits._
    // a long chain forces multiple blocks; pre-fix, every block's
    // localCheckpoint plus the edge frame stayed pinned for the session
    val n = 600L
    val docs = spark.range(n).select($"id".as("doc_id"))
    val edges = spark.range(n - 1)
      .select($"id".as("d1"), ($"id" + 1L).as("d2"))
    val before = spark.sparkContext.getPersistentRDDs.size
    val labels = Dedup.connectedComponents(docs, edges)
    assert(labels.select("lbl").distinct().count() == 1L)
    val after = spark.sparkContext.getPersistentRDDs.size
    // one chain of blocks ran; only the RETURNED labels' final
    // checkpoint may remain pinned (+1), everything superseded and
    // the bi edge frame released
    assert(after <= before + 1,
      s"persistent RDDs grew $before -> $after: superseded " +
        "connectedComponents checkpoints are leaking")
  }
}
