package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.DetHash
import graft.pipeline.Dedup
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** px18 first-gating adjudication probe (round 14, §0q): px18 was the
  * only weak-band query (1.43 s vs 0.26 = 5.5× in the committed pair)
  * that never carried an adjudication line. Both levers SHIPPED into
  * Dedup at the §0q HEAD; [[simhashOld]] preserves the pre-§0q
  * baseline verbatim so the A/B stays reproducible. Decomposition +
  * levers:
  *
  *  - stage prefixes, each full-output forced: termFreqs → 48-bit
  *    simhash agg → band stack → banded self-join + distinct →
  *    hamming verify (the declared query);
  *  - lever DIRECT: drop the termFreqs exchange — every token
  *    OCCURRENCE votes ±1 directly (Σ_terms ±tf ≡ Σ_occurrences ±1,
  *    same signatures bit-for-bit), so the signature build is ONE
  *    doc-keyed aggregation instead of (doc,term)-keyed + doc-keyed;
  *  - lever LATE-DISTINCT: hamming-filter the candidate pairs BEFORE
  *    the pair distinct (both orders are correct — hd is a pure
  *    function of the pair — but the distinct then shuffles only
  *    hd ≤ 3 survivors);
  *  - plan audit: the banded self-join's two sides must resolve to ONE
  *    reused exchange (a regression here re-runs the 48-vote agg).
  *
  * Usage: sbt "runMain graft.tools.ProbePx18 [N]" — N replicas of the
  * sf0.1 documents table. Results → probes/px18.log + BENCH_NOTES §0q.
  */
object ProbePx18 {

  /** The PRE-§0q termFreqs signature build, kept VERBATIM as the A/B
    * baseline: the direct per-occurrence form SHIPPED into
    * Dedup.simhash at the §0q HEAD, so without this local copy the
    * probe would compare the shipped code with itself and the
    * recorded 0.53 → 0.42 s delta would be unreproducible (review
    * r14). tf-weighted per-term votes over a (doc, term) exchange.
    */
  def simhashOld(docs: DataFrame, bits: Int): DataFrame = {
    val votes = (0 until bits).map(b =>
      sum(expr(Dedup.voteExpr(b))).as(s"v$b"))
    val packed = (0 until bits)
      .map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString("CAST(", " + ", " AS BIGINT)")
    TextOps.termFreqs(docs)
      .withColumn("h", DetHash.h60(col("term")))
      .groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), expr(packed).as("simhash"))
  }

  def bandsOf(sim: DataFrame): DataFrame =
    sim.selectExpr("doc_id", "simhash",
      "stack(3, 0, simhash % 65536, 1, (simhash div 65536) % 65536," +
        " 2, simhash div 4294967296) AS (bi, bv)")

  def candidates(bands: DataFrame): DataFrame =
    bands.alias("a")
      .join(bands.alias("c"),
        col("a.bi") === col("c.bi") && col("a.bv") === col("c.bv") &&
          col("a.doc_id") < col("c.doc_id"))
      .select(col("a.doc_id").as("d1"), col("a.simhash").as("s1"),
        col("c.doc_id").as("d2"), col("c.simhash").as("s2"))

  /** Full px18 with swappable signature source and distinct placement. */
  def full(sim: DataFrame, lateDistinct: Boolean): DataFrame = {
    val cand = candidates(bandsOf(sim))
    val out =
      if (lateDistinct)
        cand.withColumn("hd", expr("hamming64(s1, s2)"))
          .filter(col("hd") <= 3).distinct()
      else
        cand.distinct()
          .withColumn("hd", expr("hamming64(s1, s2)"))
          .filter(col("hd") <= 3)
    out.select("d1", "d2", "hd")
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables(spark, dir, "documents").select("doc_id", "text")
    val docs = (if (n == 1) base
      else spark.range(n).toDF("k").crossJoin(base)
        .select((col("doc_id") + col("k") * lit(10000000L)).as("doc_id"),
          concat(col("text"), lit(" r"), col("k")).as("text")))
      .localCheckpoint()
    val nd = docs.count()

    // equivalence gates, both directions, before any timing: the
    // shipped direct-vote form vs the preserved termFreqs baseline
    val simA = Dedup.simhash(docs, 48)
    val simB = simhashOld(docs, 48)
    require(simA.exceptAll(simB).isEmpty && simB.exceptAll(simA).isEmpty,
      "shipped direct-vote simhash diverged from the termFreqs form")
    val fA = Dedup.simhashNearDups(docs).select("d1", "d2", "hd")
    for (f <- Seq(full(simA, lateDistinct = true),
        full(simB, lateDistinct = true), full(simB, lateDistinct = false)))
      require(fA.exceptAll(f).isEmpty && f.exceptAll(fA).isEmpty,
        "px18 lever output diverged")

    // plan audit: one reused exchange under the banded self-join —
    // under AQE the reuse materializes at RUNTIME (stage-level), so
    // execute first and read the final adaptive plan
    for ((label, f) <- Seq(
        ("shipped", Dedup.simhashNearDups(docs)),
        ("oldform", full(simhashOld(docs, 48), lateDistinct = false)))) {
      graft.Bench.materialize(f)
      val plan = f.queryExecution.executedPlan.toString
      val reused = plan.contains("ReusedExchange") ||
        plan.contains("table cache") || {
          // AQE reuses whole shuffle stages: the same stage id showing
          // up under both join sides is the runtime form of reuse
          val ids = "ShuffleQueryStage (\\d+)".r
            .findAllMatchIn(plan).map(_.group(1)).toSeq
          ids.distinct.size < ids.size
        }
      println(s"[px18] plan[$label]: exchange reuse = $reused")
    }

    def t(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = graft.Bench.materialize(df)
      println(f"[px18] $label%-16s n=$n docs=$nd " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$r")
    }
    for (r <- 1 to 3) {
      // stage prefixes: tf + simold are the PRE-§0q baseline stages;
      // sim48/full:shipped are the shipped direct-vote + late-distinct
      t(s"stage:tf-$r")(TextOps.termFreqs(docs))
      t(s"stage:simold-$r")(simhashOld(docs, 48))
      t(s"stage:sim48-$r")(Dedup.simhash(docs, 48))
      t(s"stage:bands-$r")(bandsOf(Dedup.simhash(docs, 48)))
      t(s"stage:cand-$r")(candidates(bandsOf(Dedup.simhash(docs, 48))).distinct())
      t(s"full:shipped-$r")(Dedup.simhashNearDups(docs).select("d1", "d2", "hd"))
      // the pre-§0q full shape (old signatures + early distinct)
      t(s"full:oldform-$r")(full(simhashOld(docs, 48), lateDistinct = false))
      // isolating the late-distinct lever on the old signature build
      t(s"lever:late-$r")(full(simhashOld(docs, 48), lateDistinct = true))
    }
    spark.stop()
  }
}
