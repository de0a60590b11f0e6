package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** The streaming LSH ledger must agree with the batch MinHash/LSH
  * chain it mirrors: same signatures, same keepers, and its collision
  * pairs are exactly batch candidate pairs.
  */
class NearDupStreamSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfTiny/documents.parquet")

  test("minhashWideNarrow emits exactly minhashWide's signatures") {
    val wide = Dedup.minhashWide(docs).collect()
      .map(_.toSeq.map(String.valueOf)).map(_.mkString("|")).sorted
    val narrow = Dedup.minhashWideNarrow(docs.select("doc_id", "text"))
      .drop("text") // narrow passes input columns through; wide doesn't
      .collect().map(_.toSeq.map(String.valueOf)).map(_.mkString("|")).sorted
    assert(narrow.nonEmpty && (narrow.toSeq == wide.toSeq))
  }

  // Shared fixture: ONE collision-ledger stream run, consumed by both
  // the ledger==batch test and the collision-pairs test — a lazy val,
  // not a leftover memory table from whichever test ran first (that
  // coupling made the pairs test fail confusingly under testOnly -z
  // or after an earlier failure).
  // Two files, ids aligned with arrival order (listing order): the
  // cross-batch state must resolve the same keepers as one batch.
  // One row carries a NULL ingest_ts and one a NULL doc_id: both are
  // undefined under the ledger's contract (watermark semantics / the
  // id-keyed state) and NOT caught by the late-row filter — unguarded
  // either NPEs the state function or the primitive-Long BandRow
  // encoder and crash-loops the checkpoint replay; the ledger must
  // drop them and stay alive.
  private lazy val ledgerRows: Array[(Int, String, Long, Long)] = {
    val dir = Files.createTempDirectory("neardup").toString
    val ts = expr("timestamp_micros(1700000000000000 + doc_id * 1000000)")
    docs.filter(col("doc_id") < 250).withColumn("ingest_ts", ts)
      .unionByName(docs.filter(col("doc_id") < 250).limit(1)
        .withColumn("ingest_ts", lit(null).cast("timestamp")))
      .unionByName(docs.filter(col("doc_id") < 250).limit(1)
        .withColumn("ingest_ts",
          expr("timestamp_micros(1700000000000000)"))
        .withColumn("doc_id", lit(null).cast("long")))
      .coalesce(1).write.parquet(s"$dir/a=1")
    docs.filter(col("doc_id") >= 250).withColumn("ingest_ts", ts)
      .coalesce(1).write.parquet(s"$dir/b=2")

    val schema = spark.read.parquet(s"$dir/a=1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/{a=1,b=2}")
    val q = NearDupStream.collisionLedger(stream, "ingest_ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("ndl_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000), "stream did not terminate in 180s")
    spark.table("ndl_out").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
  }

  test("streamed ledger == batch keepers, across two micro-batches") {
    val streamed = ledgerRows

    // batch truth: every (doc, band) row, keeper = min doc_id per sig
    val bands = Dedup.bandSigs(Dedup.minhashWide(docs))
    val expected = bands
      .join(bands.groupBy("band", "sig").agg(min("doc_id").as("keeper")),
        Seq("band", "sig"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))

    // last-batch keepers can only be EARLIER (ids arrive in order), so
    // cross-batch state must reproduce the global min exactly
    assert(streamed.nonEmpty && streamed.toSet == expected.toSet)
    assert(streamed.length == expected.length, "one ledger row per (doc, band)")
  }

  test("storeAdmitStream: admits persist across separate stream runs") {
    import spark.implicits._
    val work = Files.createTempDirectory("storeadmit").toString
    val textX = "cat dog emu fox gnu hen ibis jay kiwi lark moth newt" +
      " owl pig quail rat swan toad vole wolf"
    val textB = "red blue gree yellow purple orange black white brown" +
      " pink cyan teal navy gold silver maroon olive coral beige plum"
    val corpus = Seq((1L, textX)).toDF("doc_id", "text")
    corpus.write.parquet(s"$work/corpus")
    Dedup.minhashWide(corpus).write.parquet(s"$work/sigs")

    def runRound(file: String, rows: Seq[(Long, String)]): Unit = {
      rows.toDF("doc_id", "text").coalesce(1)
        .write.parquet(s"$work/in/$file")
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$work/in/$file").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
      NearDupStream.storeAdmitStream(stream, s"$work/sigs",
        s"$work/corpus", s"$work/verdicts", s"$work/ckpt")
        .awaitTermination()
    }
    // run 1: one dup of the corpus doc, one novel doc (admitted);
    // run 2 is a SEPARATE stream instance from the same checkpoint —
    // its dup verdict can only trace to run 1's admitted doc if the
    // admit writes are durable
    runRound("f=1", Seq((10L, textX), (11L, textB)))
    runRound("f=2", Seq((20L, textB)))
    val v = spark.read.parquet(s"$work/verdicts")
      .select("doc_id", "dup_of").as[(Long, Option[Long])]
      .collect().toMap
    assert(v(10L).contains(1L) && v(11L).isEmpty)
    assert(v(20L).contains(11L), s"round-2 verdict lost the admit: $v")
  }

  test("reversed arrival: a later SMALLER id re-points the old keeper (r16)") {
    import spark.implicits._
    // The case the aligned-id fixture above cannot exercise: a
    // cross-batch near-dup pair whose smaller doc_id arrives LATER.
    // Pre-r16 both its rows were self-keeper rows (batch 1 emitted
    // (100, keeper=100); batch 2 emitted (1, keeper=1)) and the pair
    // was silently lost — append mode cannot retract. The ledger now
    // emits a reassignment row re-pointing the displaced keeper, and
    // its documented read is the MIN-REDUCTION per (band, sig, doc).
    val textX = "cat dog emu fox gnu hen ibis jay kiwi lark moth newt" +
      " owl pig quail rat swan toad vole wolf"
    val textY = "red blue green yellow purple orange black white brown" +
      " pink cyan teal navy gold silver maroon olive coral beige plum"
    val dir = Files.createTempDirectory("neardup_rev").toString
    val ts = expr("timestamp_micros(1700000000000000 + doc_id * 1000000)")
    val all = Seq((100L, textX), (101L, textY), (1L, textX), (2L, textY))
      .toDF("doc_id", "text")
    all.filter(col("doc_id") >= 100L).withColumn("ingest_ts", ts)
      .coalesce(1).write.parquet(s"$dir/a=1")
    all.filter(col("doc_id") < 100L).withColumn("ingest_ts", ts)
      .coalesce(1).write.parquet(s"$dir/b=2")
    // pin processing order: the high-id file is the OLDER arrival
    for (f <- new java.io.File(s"$dir/a=1").listFiles())
      f.setLastModified(System.currentTimeMillis() - 600000)
    val schema = spark.read.parquet(s"$dir/a=1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/{a=1,b=2}")
    val q = NearDupStream.collisionLedger(stream, "ingest_ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("ndl_rev")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000), "stream did not terminate in 180s")
    val rows = spark.table("ndl_rev").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // the fixture really exercised a reassignment: some doc carries
    // both its stale self-keeper row and the re-pointing row
    assert(rows.groupBy(r => (r._1, r._2, r._3))
      .exists(_._2.map(_._4).distinct.length > 1),
      "fixture must exercise keeper reassignment")
    // documented read: resolveKeepers == batch truth (with only two
    // batches the chains have length 1, but the read contract is the
    // transitive one — see the 3-batch test for where min alone fails)
    val reduced = NearDupStream.resolveKeepers(spark.table("ndl_rev"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val bands = Dedup.bandSigs(Dedup.minhashWide(all))
    val expected = bands
      .join(bands.groupBy("band", "sig").agg(min("doc_id").as("keeper")),
        Seq("band", "sig"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(reduced == expected)
    // and the near-dup pairs are recoverable again: every min-reduced
    // non-self row pairs a doc with the batch keeper
    val dupDocs = reduced.filter(r => r._3 != r._4).map(r => (r._3, r._4))
    assert(dupDocs == Set((100L, 1L), (101L, 2L)),
      s"cross-batch pairs must surface: $dupDocs")
  }

  test("3-batch decreasing ids: resolveKeepers follows keeper chains; " +
    "plain min-reduction demonstrably cannot (ADVICE r16)") {
    import spark.implicits._
    // ids 100+80 (batch 1), 50 (batch 2), 1 (batch 3), one near-dup
    // cluster. Append mode leaves doc 100's only row saying keeper 80
    // and doc 80's newest row saying keeper 50 — batch truth (keeper 1
    // for all) is reachable ONLY through the chain 100→80→50→1. This
    // is the fixture the two-batch tests above cannot exercise.
    val textX = "cat dog emu fox gnu hen ibis jay kiwi lark moth newt" +
      " owl pig quail rat swan toad vole wolf"
    val dir = Files.createTempDirectory("neardup_chain").toString
    val ts = expr("timestamp_micros(1700000000000000 + doc_id * 1000000)")
    val all = Seq((100L, textX), (80L, textX), (50L, textX), (1L, textX))
      .toDF("doc_id", "text")
    all.filter(col("doc_id") >= 80L).withColumn("ingest_ts", ts)
      .coalesce(1).write.parquet(s"$dir/a=1")
    all.filter(col("doc_id") === 50L).withColumn("ingest_ts", ts)
      .coalesce(1).write.parquet(s"$dir/b=2")
    all.filter(col("doc_id") === 1L).withColumn("ingest_ts", ts)
      .coalesce(1).write.parquet(s"$dir/c=3")
    // pin processing order: strictly decreasing ids across batches
    val now = System.currentTimeMillis()
    for ((sub, age) <- Seq("a=1" -> 900000L, "b=2" -> 600000L, "c=3" -> 300000L);
         f <- new java.io.File(s"$dir/$sub").listFiles())
      f.setLastModified(now - age)
    val schema = spark.read.parquet(s"$dir/a=1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/{a=1,b=2,c=3}")
    val q = NearDupStream.collisionLedger(stream, "ingest_ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("ndl_chain")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000), "stream did not terminate in 180s")
    val ledger = spark.table("ndl_chain")
    val rows = ledger.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // plain min-per-doc reduction is WRONG here — doc 100 only ever
    // saw keeper 80 (this is the hazard the transitive read fixes; if
    // this assert starts failing, the ledger began emitting full
    // re-point fan-out and resolveKeepers is no longer load-bearing)
    val minReduced = rows.groupBy(r => (r._1, r._2, r._3))
      .map { case ((_, _, d), vs) => d -> vs.map(_._4).min }
    assert(minReduced.exists { case (d, k) => d == 100L && k != 1L },
      s"fixture must exercise a stale chained keeper: $minReduced")
    // the documented read recovers batch truth for every doc
    val resolved = NearDupStream.resolveKeepers(ledger).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val bands = Dedup.bandSigs(Dedup.minhashWide(all))
    val expected = bands
      .join(bands.groupBy("band", "sig").agg(min("doc_id").as("keeper")),
        Seq("band", "sig"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(resolved == expected)
  }

  test("resolveKeepers raises loudly on a ledger whose keeper has no " +
    "doc_id row (r18 advice fix: the inner self-join silently DROPPED " +
    "the doc instead — a filtered or retention-trimmed ledger shrank " +
    "the result without error)") {
    import spark.implicits._
    // doc 80 points at keeper 50, but 50's own self-keeper row was
    // trimmed away — a contract-violating ledger
    val bad = Seq((0, "sigA", 80L, 50L), (0, "sigA", 99L, 99L))
      .toDF("band", "sig", "doc_id", "keeper")
    val e = intercept[IllegalStateException] {
      NearDupStream.resolveKeepers(bad).collect()
    }
    assert(e.getMessage.contains("80") && e.getMessage.contains("50"),
      e.getMessage)
    // a well-formed ledger resolves identically through the left join
    val ok = Seq((0, "sigA", 80L, 50L), (0, "sigA", 50L, 50L))
      .toDF("band", "sig", "doc_id", "keeper")
    assert(NearDupStream.resolveKeepers(ok).collect()
      .map(r => r.getLong(2) -> r.getLong(3)).toMap ==
      Map(80L -> 50L, 50L -> 50L))
  }

  test("storeAdmitStream: marker-less partial partition replays; marked one skips") {
    import spark.implicits._
    val work = Files.createTempDirectory("storeadmit_marker").toString
    val textX = "cat dog emu fox gnu hen ibis jay kiwi lark moth newt" +
      " owl pig quail rat swan toad vole wolf"
    val textB = "red blue gree yellow purple orange black white brown" +
      " pink cyan teal navy gold silver maroon olive coral beige plum"
    val corpus = Seq((1L, textX)).toDF("doc_id", "text")
    corpus.write.parquet(s"$work/corpus")
    Dedup.minhashWide(corpus).write.parquet(s"$work/sigs")
    // the crash-mid-commit state: batch 0's partition directory exists
    // (FileOutputCommitter moved task files in) but the job never
    // committed — no _COMMITTED marker. The _CHECKPOINT identity tag
    // was written at stream start, BEFORE the batch ran, so it is part
    // of the crash state too (without it, an untagged ledger holding
    // batches is the never-auto-adopted legacy case, tested below).
    val part = new java.io.File(s"$work/verdicts/batch_id=0")
    part.mkdirs()
    val stale = new java.io.File(part, "part-stale.parquet")
    stale.createNewFile()
    locally {
      val p = new org.apache.hadoop.fs.Path(s"$work/verdicts")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val qualified = fs.makeQualified(
        new org.apache.hadoop.fs.Path(s"$work/ckpt1")).toString
      val o = fs.create(new org.apache.hadoop.fs.Path(p, "_CHECKPOINT"), false)
      try o.write(qualified.getBytes("UTF-8")) finally o.close()
    }

    Seq((10L, textX), (11L, textB)).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$work/in")
    def run(ckpt: String): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$work/in").schema)
        .parquet(s"$work/in")
      NearDupStream.storeAdmitStream(stream, s"$work/sigs",
        s"$work/corpus", s"$work/verdicts", s"$work/$ckpt")
        .awaitTermination()
    }
    run("ckpt1")
    // the partial partition was deleted and the batch redone in full
    assert(!stale.exists(), "stale partial file must not survive replay")
    assert(new java.io.File(part, "_COMMITTED").exists(), "marker written")
    val v1 = spark.read.parquet(s"$work/verdicts")
      .select("doc_id", "dup_of").as[(Long, Option[Long])].collect()
    assert(v1.length == 2 &&
      v1.toMap == Map(10L -> Some(1L), 11L -> None), v1.mkString(", "))
    // a FRESH checkpoint against the existing ledger must REFUSE to
    // start (not silently skip): its batch ids restart from 0, so the
    // old run's markers would drop every new batch — arriving docs
    // neither checked nor admitted
    val sigRows = spark.read.parquet(s"$work/sigs").count()
    val e = intercept[IllegalArgumentException] { run("ckpt2") }
    assert(e.getMessage.contains("belongs to checkpoint"), e.getMessage)
    assert(spark.read.parquet(s"$work/verdicts").count() == 2,
      "refused run must not have touched the ledger")
    assert(spark.read.parquet(s"$work/sigs").count() == sigRows)
    // ...while a restart with the SAME checkpoint passes the guard and
    // the marker still absorbs the replayed batch
    run("ckpt1")
    assert(spark.read.parquet(s"$work/verdicts").count() == 2,
      "marked batch must not append again under the owning checkpoint")
    assert(spark.read.parquet(s"$work/sigs").count() == sigRows)
  }

  test("storeAdmitStream: a pre-guard ledger (batches, no tag) is never " +
    "auto-adopted") {
    import spark.implicits._
    // r13 advice: auto-tagging an untagged root that ALREADY holds
    // batch_id= partitions would stamp the old markers with a fresh
    // checkpoint — the new run's batches then silently skip, the exact
    // hazard the tag exists to prevent. The stream must refuse and
    // tell the operator to assert the pairing explicitly.
    val work = Files.createTempDirectory("storeadmit_legacy").toString
    val textX = "cat dog emu fox gnu hen ibis jay kiwi lark moth newt" +
      " owl pig quail rat swan toad vole wolf"
    val corpus = Seq((1L, textX)).toDF("doc_id", "text")
    corpus.write.parquet(s"$work/corpus")
    Dedup.minhashWide(corpus).write.parquet(s"$work/sigs")
    val part = new java.io.File(s"$work/verdicts/batch_id=0")
    part.mkdirs()
    new java.io.File(part, "_COMMITTED").createNewFile()
    Seq((10L, textX)).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$work/in")
    def run(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$work/in").schema)
        .parquet(s"$work/in")
      NearDupStream.storeAdmitStream(stream, s"$work/sigs",
        s"$work/corpus", s"$work/verdicts", s"$work/ckpt")
        .awaitTermination()
    }
    val e = intercept[IllegalArgumentException] { run() }
    assert(e.getMessage.contains("Never auto-adopted"), e.getMessage)
    assert(!new java.io.File(s"$work/verdicts/_CHECKPOINT").exists(),
      "refused run must not have tagged the legacy ledger")
    // the operator asserts the pairing explicitly -> the stream runs,
    // and batch 0's legacy marker is (correctly, per the assertion)
    // honored as already-committed
    val p = new org.apache.hadoop.fs.Path(s"$work/verdicts")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val qualified = fs.makeQualified(
      new org.apache.hadoop.fs.Path(s"$work/ckpt")).toString
    val o = fs.create(new org.apache.hadoop.fs.Path(p, "_CHECKPOINT"), false)
    try o.write(qualified.getBytes("UTF-8")) finally o.close()
    run()
    assert(spark.read.parquet(s"$work/sigs").count() == 1,
      "batch 0 marked committed must not append under the asserted tag")
  }

  test("storeAdmitStream: redo AFTER the store append committed reads clean") {
    import spark.implicits._
    // The worst crash window: admitCycle already appended the novel
    // doc's text + signature, then died before the ledger's
    // _COMMITTED marker. The redo finds the novel doc's OWN copy in
    // the store — the nid =!= oid band filter must keep the rewritten
    // verdict rows identical to an uncrashed run's (novel, jac NULL,
    // zero candidates), never "duplicate of itself".
    val work = Files.createTempDirectory("storeadmit_redo").toString
    val textX = "cat dog emu fox gnu hen ibis jay kiwi lark moth newt" +
      " owl pig quail rat swan toad vole wolf"
    val textB = "red blue gree yellow purple orange black white brown" +
      " pink cyan teal navy gold silver maroon olive coral beige plum"
    val corpus = Seq((1L, textX)).toDF("doc_id", "text")
    corpus.write.parquet(s"$work/corpus")
    Dedup.minhashWide(corpus).write.parquet(s"$work/sigs")
    // the crashed run's completed half: novel doc 11 already admitted
    val novel = Seq((11L, textB)).toDF("doc_id", "text")
    novel.write.mode("append").parquet(s"$work/corpus")
    Dedup.minhashWide(novel).write.mode("append").parquet(s"$work/sigs")
    // ...and its un-committed half: marker-less partial partition
    // (plus the _CHECKPOINT identity tag the crashed run wrote at
    // start — without it this is the never-auto-adopted legacy state)
    val part = new java.io.File(s"$work/verdicts/batch_id=0")
    part.mkdirs()
    new java.io.File(part, "part-stale.parquet").createNewFile()
    locally {
      val p = new org.apache.hadoop.fs.Path(s"$work/verdicts")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val qualified = fs.makeQualified(
        new org.apache.hadoop.fs.Path(s"$work/ckpt")).toString
      val o = fs.create(new org.apache.hadoop.fs.Path(p, "_CHECKPOINT"), false)
      try o.write(qualified.getBytes("UTF-8")) finally o.close()
    }

    Seq((10L, textX), (11L, textB)).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$work/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$work/in").schema)
      .parquet(s"$work/in")
    NearDupStream.storeAdmitStream(stream, s"$work/sigs",
      s"$work/corpus", s"$work/verdicts", s"$work/ckpt")
      .awaitTermination()
    val v = spark.read.parquet(s"$work/verdicts")
      .select("doc_id", "n_cand", "dup_of", "jac")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          r.isNullAt(3)))).toMap
    // doc 10 still dups against the REAL corpus doc...
    assert(v(10L) == ((1L, 1L, false)), v.toString)
    // ...and doc 11's only stored match is itself: the redo row is
    // the uncrashed row — novel, zero candidates, NULL jac
    assert(v(11L) == ((0L, -1L, true)), v.toString)
  }

  test("collision pairs are exactly the batch LSH candidate pairs") {
    // (doc_id, band, keeper) rows from the shared stream fixture;
    // pairs link each doc to its signature's keeper
    val streamPairs = ledgerRows.collect {
      case (_, _, docId, keeper) if docId != keeper => (keeper, docId)
    }.toSet
    val batchPairs = Dedup.lshCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ledger pairs link docs to their signature's KEEPER only, so they
    // are a subset of the all-pairs batch candidates — and any doc the
    // batch chain pairs up must show a collision in the ledger
    assert(streamPairs.nonEmpty && streamPairs.subsetOf(batchPairs),
      s"ledger emitted a pair batch LSH would not: ${streamPairs -- batchPairs}")
    val batchDupDocs = batchPairs.flatMap(p => Seq(p._1, p._2))
    val ledgerDupDocs = streamPairs.flatMap(p => Seq(p._1, p._2))
    assert(batchDupDocs == ledgerDupDocs,
      "every batch-candidate doc must appear in some ledger collision")
  }

  test("PROPERTY: resolveKeepers == batch-truth keepers over RANDOM " +
    "valid ledgers (r18 verdict item 5 — generator-side pinning of the " +
    "monotone-refinement contract, not curated fixtures)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // A random VALID ledger: per (band, sig) group, an arbitrary
    // micro-batch sequence of doc-id sets, with ledger rows produced
    // by simulating the operator's documented per-batch emission —
    // keeper = min(prev, batchMin), a re-point row whenever the prior
    // keeper is displaced, a (doc -> keeper) row per sighting. Small
    // id domain (0..50) forces heavy duplication, re-arrivals of the
    // same doc under different keepers, and multi-step displacement
    // chains — the interleavings the curated fixtures can't cover.
    // Batch truth: every doc of a group resolves to the group's
    // global-min id.
    val genGroup = for {
      nBatches <- Gen.choose(1, 8)
      batches <- Gen.listOfN(nBatches,
        Gen.nonEmptyListOf(Gen.choose(0L, 50L)))
    } yield batches
    val genLedger = Gen.listOfN(8, genGroup)
    val params = Gen.Parameters.default
    (0 until 10).foreach { trial =>
      val groups = genLedger(params, Seed(9000L + trial)).get
      val rows = scala.collection.mutable
        .ArrayBuffer.empty[(Int, String, Long, Long)]
      val truth = scala.collection.mutable
        .Set.empty[(Int, String, Long, Long)]
      groups.zipWithIndex.foreach { case (batches, gi) =>
        val (band, sig) = (gi, s"s$gi")
        var keeper: Option[Long] = None
        batches.foreach { b =>
          val nk = keeper.fold(b.min)(math.min(_, b.min))
          keeper.filter(_ > nk)
            .foreach(old => rows += ((band, sig, old, nk)))
          b.foreach(d => rows += ((band, sig, d, nk)))
          keeper = Some(nk)
        }
        val all = batches.flatten
        all.distinct.foreach(d => truth += ((band, sig, d, all.min)))
      }
      val ledger = rows.toSeq.toDF("band", "sig", "doc_id", "keeper")
      val resolved = NearDupStream.resolveKeepers(ledger).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(resolved == truth.toSet,
        s"trial $trial diverges from batch truth: extra=" +
          s"${resolved -- truth} missing=${truth.toSet -- resolved}")
    }
  }

  test("a late-but-in-watermark sighting never REWINDS the eviction " +
    "deadline (review r19: horizon = max event time seen)") {
    import spark.implicits._
    // Batch 1: doc 100 (sig S) at 12:00 — deadline 13:00.
    // Batch 2: doc 101 (S) LATE at 11:10 (>= watermark 11:00, passes)
    //          + doc 500 (sig U) at 13:30 → watermark becomes 12:30.
    //   Pre-fix, the deadline was reset from THIS batch alone:
    //   11:10 + 1h = 12:10 < 12:30 — rewound inside the horizon.
    // Batch 3: doc 501 (U) at 13:40; S has NO data, so the timeout
    //   can fire: pre-fix S is evicted here; fixed, deadline is
    //   max(12:00, 11:10) + 1h = 13:00 > 12:30 and S survives.
    // Batch 4: doc 102 (S) at 12:45 (>= watermark 12:40) — fixed, it
    //   pairs with keeper 100; pre-fix it started a fresh epoch as
    //   its own keeper inside the promised horizon.
    val dir = Files.createTempDirectory("ndl_rewind").toString
    val S = "alpha beta gamma delta epsilon"
    val U = "omega psi chi phi upsilon"
    val B = 1700000000000000L // "12:00" in epoch micros
    def mins(m: Long) = B + m * 60000000L
    def write(sub: String, rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("doc_id", "text", "us")
        .withColumn("ingest_ts", expr("timestamp_micros(us)")).drop("us")
        .coalesce(1).write.parquet(s"$dir/$sub")
    write("m1", Seq((100L, S, mins(0))))
    write("m2", Seq((101L, S, mins(-50)), (500L, U, mins(90))))
    write("m3", Seq((501L, U, mins(100))))
    write("m4", Seq((102L, S, mins(45))))
    val schema = spark.read.parquet(s"$dir/m1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/{m1,m2,m3,m4}")
    val q = NearDupStream.collisionLedger(stream, "ingest_ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("ndl_rewind")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000), "stream did not terminate in 180s")
    val resolved = NearDupStream
      .resolveKeepers(spark.table("ndl_rewind"))
      .filter(col("doc_id") === 102L)
      .select("keeper").collect().map(_.getLong(0)).toSet
    assert(resolved == Set(100L),
      s"doc 102 should keep pairing with 100 inside the horizon, " +
        s"got keepers $resolved")
  }
}
