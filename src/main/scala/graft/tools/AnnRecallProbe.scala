package graft.tools

import graft.{GraftSession, Tables}
import graft.pipeline.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN recall×speed probe (r8 verdict item 6): recall@10 vs exact
  * brute force for IVF nprobe ∈ {1,2,4} × PQ {off,on} at an N×
  * replicated corpus (N=500 ⇒ 1M 64-dim vectors), turning the IVF/PQ
  * quality trade-off from claim into measurement.
  *
  * Corpus construction: the sf embeddings are unit-normalized (cosine
  * ordering == L2 ordering, so the ADC's L2 lookup ranks on the same
  * geometry the cosine APIs do), then replicated with DETERMINISTIC
  * per-(vid, dim) hash noise (xxhash64 — no RNG), amplitude `eps`, and
  * re-normalized. Replica clouds at eps=0.1 sit at cos≈0.9 around
  * their base, the same order as inter-base similarities — so top-10
  * sets genuinely compete across bases and recall is informative
  * rather than a degenerate 1.0 (exact-duplicate replication) or a
  * per-cloud coin flip (eps → 0).
  *
  * Queries are the 20 smallest base ids; their k=0 replica is kept
  * noise-free so each query exists verbatim in the corpus (excluded
  * from its own top-k by the qid != vid guard, as in Ann.cosineTopK).
  *
  * Usage: `sbt "runMain graft.tools.AnnRecallProbe [N] [eps]"`
  * (default 500, eps 0.1); SPARK_GRAFT_SF_DIR overrides the base
  * corpus. eps is the replica-noise amplitude: 0.1 is the ADVERSARIAL
  * replica-cloud regime (every quantization cell a 500-deep cloud of
  * near-ties — the worst case for exact-id recall); eps >= 1 makes
  * the noise dominate the base signal, i.e. a PLAIN spread corpus of
  * ~independent unit vectors — the realistic-recall companion table
  * (r15, the r14 verdict's optional item). Results → BENCH_NOTES
  * §3f/§3m + probes/ann_recall.log / ann_recall_plain.log.
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val eps = args.drop(1).headOption.map(_.toDouble).getOrElse(0.1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(CAST(x AS DOUBLE)" +
          " / sqrt(norm2_f64(embedding)) AS FLOAT))").as("embedding"))
    val big = spark.range(n).toDF("k").crossJoin(base)
      .select((col("vec_id") + col("k") * lit(10000000L)).as("vec_id"),
        expr(s"""transform(embedding, (x, i) -> CAST(x +
          (CASE WHEN k = 0 THEN 0.0 ELSE $eps END) *
          ((pmod(xxhash64(vec_id + k * 10000000, i), 2001) - 1000) / 1000.0)
          AS FLOAT))""").as("e0"))
      .select(col("vec_id"), expr(
        "transform(e0, x -> CAST(CAST(x AS DOUBLE)" +
          " / sqrt(norm2_f64(e0)) AS FLOAT))").as("embedding"))
      .repartition(32).localCheckpoint()
    val nv = big.count()
    val queries = base.filter(col("vec_id") < 20)

    def t[A](w: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""[annrecall] {"phase":"$w","n":$n,"eps":$eps,"vecs":$nv,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }
    def topk(df: DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(approx: Set[(Long, Long)], exact: Set[(Long, Long)]): Double =
      approx.intersect(exact).size.toDouble / exact.size
    // Cloud-level recall: same sets with vec_id folded to its BASE id
    // (vid % 10M — the replica-cloud identity). Exact-id recall asks
    // the scorer to rank eps-amplitude noise WITHIN a cloud, which PQ
    // quantization deliberately discards (the codebook resolution is
    // the cloud radius), so ADC's exact-id number collapses by
    // construction on this synthetic corpus; the cloud number is
    // whether the scorer retrieved the right NEIGHBORHOODS, the thing
    // a candidate-generation stage is for.
    def clouds(st: Set[(Long, Long)]): Set[(Long, Long)] =
      st.map { case (q, v) => (q, v % 10000000L) }
    def cloudRecall(approx: Set[(Long, Long)],
                    exact: Set[(Long, Long)]): Double = {
      val e = clouds(exact)
      clouds(approx).intersect(e).size.toDouble / e.size
    }

    Tables(spark, dir, "lineitem").count() // session warmup

    val exact = t("brute_exact")(topk(Ann.cosineTopK(big, queries, 10)))

    // one-time builds
    val cent = t("kmeans_build")(
      Ann.kmeansCentroids(big, kClusters = 16, iters = 1).localCheckpoint())
    val assign = t("ivf_assign")(
      Ann.ivfAssign(big, cent).repartition(32).localCheckpoint())
    val cb = t("pq_train")(
      Ann.pqTrain(base, blocks = 8, kCodes = 32, iters = 2).localCheckpoint())
    val codes = t("pq_encode")(
      Ann.pqEncode(big, cb).repartition(32).localCheckpoint())
    println(s"""[annrecall] {"codes_rows":${codes.count()}}""")

    // ADC LUT: |queries| x blocks x kCodes (20*8*32 rows), broadcast
    val lut = queries.select(col("vec_id").as("qid"), col("embedding").as("ve"))
      .crossJoin(broadcast(cb))
      .withColumn("pd", expr(
        "aggregate(zip_with(slice(ve, CAST(blk * size(centroid) + 1 AS INT)," +
          " size(centroid)), centroid, (a, b) ->" +
          " (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b))," +
          " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
      .select("qid", "blk", "code", "pd")

    def probesFor(nprobe: Int): DataFrame =
      queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
        .crossJoin(broadcast(cent))
        .withColumn("d2", expr(
          "aggregate(zip_with(qe, centroid, (a, b) ->" +
            " (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b))," +
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
        .withColumn("pr", expr(
          "row_number() OVER (PARTITION BY qid ORDER BY round(d2, 6), cid)"))
        .filter(col("pr") <= nprobe)
        .select("qid", "cid")

    for (nprobe <- Seq(1, 2, 4)) {
      val ivf = t(s"ivf_exact_np$nprobe")(
        topk(Ann.ivfTopK(big, cent, assign, queries, nprobe, 10)))
      println(f"""[annrecall] {"variant":"ivf_exact","nprobe":$nprobe,"recall_at_10":${recall(ivf, exact)}%.3f,"cloud_recall_at_10":${cloudRecall(ivf, exact)}%.3f}""")
      // IVF+PQ: same candidate cut, ADC scoring over codes only
      val cand = assign.join(broadcast(probesFor(nprobe)), Seq("cid"))
        .filter(col("qid") =!= col("vid")).select("qid", "vid")
      val adc = t(s"ivf_adc_np$nprobe")(topk(
        cand.join(codes, Seq("vid"))
          .join(broadcast(lut), Seq("qid", "blk", "code"))
          .groupBy("qid", "vid")
          .agg(expr("round(sum(pd), 6)").as("adc_dist2"))
          .withColumn("rank", expr(
            "row_number() OVER (PARTITION BY qid ORDER BY adc_dist2, vid)"))
          .filter(col("rank") <= 10)))
      println(f"""[annrecall] {"variant":"ivf_adc","nprobe":$nprobe,"recall_at_10":${recall(adc, exact)}%.3f,"cloud_recall_at_10":${cloudRecall(adc, exact)}%.3f}""")
    }
    // Residual (IVF-centered) PQ — IVFADC proper (r16 verdict item 4):
    // the codebook is trained on x − c_cid, so its kCodes resolve
    // WITHIN-cell structure (here: the eps-noise clouds) instead of
    // re-describing cell positions. Training sample: a deterministic
    // ~1/500 slice ACROSS replicas (the k=0-only slice would see only
    // near-zero residuals and learn nothing about the cloud radius);
    // the modulus scales with the corpus (~2k training rows), kept odd
    // and off multiples of 5 so it is coprime to the 10M replica
    // stride — the slice crosses bases AND replicas.
    val sampleMod = {
      var m = math.min(499L, math.max(1L, nv / 2000L))
      if (m % 2 == 0) m += 1
      if (m % 5 == 0) m += 2
      m
    }
    val resid = t("ivf_residuals")(
      Ann.ivfResiduals(big, cent).repartition(32).localCheckpoint())
    val rcb = t("pq_train_residual")(
      Ann.pqTrain(resid.filter(col("vid") % sampleMod === 0),
        blocks = 8, kCodes = 32, iters = 2,
        idCol = "vid", embCol = "res").localCheckpoint())
    val rcodes = t("pq_encode_residual")(
      Ann.ivfPqEncode(resid, rcb).repartition(32).localCheckpoint())
    for (nprobe <- Seq(1, 2, 4)) {
      val radc = t(s"ivfadc_residual_np$nprobe")(
        topk(Ann.ivfAdcTopK(rcodes, cent, rcb, queries, nprobe, 10)))
      println(f"""[annrecall] {"variant":"ivfadc_residual","nprobe":$nprobe,"recall_at_10":${recall(radc, exact)}%.3f,"cloud_recall_at_10":${cloudRecall(radc, exact)}%.3f}""")
    }
    // residual IVFADC+R: the production path with the residual books
    for (bigR <- Seq(50, 200)) {
      val topR = Ann.ivfAdcTopK(rcodes, cent, rcb, queries,
        nprobe = 4, k = bigR)
      val refined = t(s"ivfadc_residual_refine_R$bigR")(
        topk(Ann.adcRefine(topR, big, queries, 10)))
      println(f"""[annrecall] {"variant":"ivfadc_residual_refine","nprobe":4,"R":$bigR,"recall_at_10":${recall(refined, exact)}%.3f,"cloud_recall_at_10":${cloudRecall(refined, exact)}%.3f}""")
    }
    // 8-bit codes (r17): kCodes=256, the STANDARD IVFADC setting
    // (Jégou et al. use 8-bit sub-quantizers throughout) — made
    // affordable by the argmin-fold encode (the old window shape
    // would have sorted 2×10⁹ rows here). Finer codebooks resolve
    // within-cell structure the 5-bit books tie on, which is exactly
    // what bounds the R-shortlist's coverage on this corpus.
    val rcb8 = t("pq_train_residual_k256")(
      Ann.pqTrain(resid.filter(col("vid") % sampleMod === 0),
        blocks = 8, kCodes = 256, iters = 2,
        idCol = "vid", embCol = "res").localCheckpoint())
    val rcodes8 = t("pq_encode_residual_k256")(
      Ann.ivfPqEncode(resid, rcb8).repartition(32).localCheckpoint())
    for (nprobe <- Seq(4)) {
      val radc = t(s"ivfadc_residual_k256_np$nprobe")(
        topk(Ann.ivfAdcTopK(rcodes8, cent, rcb8, queries, nprobe, 10)))
      println(f"""[annrecall] {"variant":"ivfadc_residual_k256","nprobe":$nprobe,"recall_at_10":${recall(radc, exact)}%.3f,"cloud_recall_at_10":${cloudRecall(radc, exact)}%.3f}""")
    }
    for (bigR <- Seq(50, 200)) {
      val topR = Ann.ivfAdcTopK(rcodes8, cent, rcb8, queries,
        nprobe = 4, k = bigR)
      val refined = t(s"ivfadc_residual_k256_refine_R$bigR")(
        topk(Ann.adcRefine(topR, big, queries, 10)))
      println(f"""[annrecall] {"variant":"ivfadc_residual_k256_refine","nprobe":4,"R":$bigR,"recall_at_10":${recall(refined, exact)}%.3f,"cloud_recall_at_10":${cloudRecall(refined, exact)}%.3f}""")
    }
    // OPQ on the residuals (r17, Ge et al. 2014): learn the rotation
    // on the same training slice, rotate residuals, retrain the books
    // in rotated space, search with the rotated query path. Same R
    // sweep as the unrotated residual rows above for a like-for-like
    // read of what the rotation buys on THIS corpus geometry.
    val opq = t("opq_train")(
      Ann.opqTrainRotation(resid.filter(col("vid") % sampleMod === 0),
        blocks = 8, kCodes = 32, lloydIters = 2, opqIters = 8,
        idCol = "vid", embCol = "res"))
    println(f"""[annrecall] {"variant":"opq_train","mse":${opq.mse}%.6f}""")
    val residRot = t("opq_rotate")(
      Ann.rotateVec(resid, opq.rotation, "res", "res")
        .repartition(32).localCheckpoint())
    val ocb = t("pq_train_opq")(
      Ann.pqTrain(residRot.filter(col("vid") % sampleMod === 0),
        blocks = 8, kCodes = 32, iters = 2,
        idCol = "vid", embCol = "res").localCheckpoint())
    val ocodes = t("pq_encode_opq")(
      Ann.ivfPqEncode(residRot, ocb).repartition(32).localCheckpoint())
    for (nprobe <- Seq(1, 2, 4)) {
      val oadc = t(s"ivfadc_opq_np$nprobe")(
        topk(Ann.ivfAdcTopK(ocodes, cent, ocb, queries, nprobe, 10,
          rotation = opq.rotation)))
      println(f"""[annrecall] {"variant":"ivfadc_opq","nprobe":$nprobe,"recall_at_10":${recall(oadc, exact)}%.3f,"cloud_recall_at_10":${cloudRecall(oadc, exact)}%.3f}""")
    }
    for (bigR <- Seq(50, 200)) {
      val topR = Ann.ivfAdcTopK(ocodes, cent, ocb, queries,
        nprobe = 4, k = bigR, rotation = opq.rotation)
      val refined = t(s"ivfadc_opq_refine_R$bigR")(
        topk(Ann.adcRefine(topR, big, queries, 10)))
      println(f"""[annrecall] {"variant":"ivfadc_opq_refine","nprobe":4,"R":$bigR,"recall_at_10":${recall(refined, exact)}%.3f,"cloud_recall_at_10":${cloudRecall(refined, exact)}%.3f}""")
    }

    // PQ without the IVF cut: full-corpus ADC scan over codes
    val fulladc = t("full_adc")(topk(Ann.pqAdcTopK(codes, cb, queries, 10)))
    println(f"""[annrecall] {"variant":"full_adc","nprobe":16,"recall_at_10":${recall(fulladc, exact)}%.3f,"cloud_recall_at_10":${cloudRecall(fulladc, exact)}%.3f}""")
    // ADC + exact refine (r14): re-rank ADC's top-R by exact distance
    // over the R fetched raw vectors (Ann.adcRefine). Exact-id recall
    // after refine == the SHORTLIST's coverage of the true top-10: on
    // this synthetic corpus every quantization cell is a 500-replica
    // cloud whose ADC distances tie exactly (vid tie-break), so
    // coverage grows ~linearly in R/cloudSize — the R sweep shows
    // refine converting shortlist coverage into exact recall, which a
    // real corpus (small cells) gets at small R.
    for (bigR <- Seq(10, 50, 200)) {
      val topR = Ann.pqAdcTopK(codes, cb, queries, bigR)
      val refined = t(s"full_adc_refine_R$bigR")(
        topk(Ann.adcRefine(topR, big, queries, 10)))
      println(f"""[annrecall] {"variant":"full_adc_refine","R":$bigR,"recall_at_10":${recall(refined, exact)}%.3f,"cloud_recall_at_10":${cloudRecall(refined, exact)}%.3f}""")
    }
    // IVFADC+R proper (Jégou et al. 2011 §V): the IVF candidate cut,
    // ADC over codes inside the probed lists, exact refine of that
    // shortlist — the production path end to end
    locally {
      val nprobe = 4
      val cand = assign.join(broadcast(probesFor(nprobe)), Seq("cid"))
        .filter(col("qid") =!= col("vid")).select("qid", "vid")
      val adcTopR = cand.join(codes, Seq("vid"))
        .join(broadcast(lut), Seq("qid", "blk", "code"))
        .groupBy("qid", "vid")
        .agg(expr("round(sum(pd), 6)").as("adc_dist2"))
        .withColumn("rank", expr(
          "row_number() OVER (PARTITION BY qid ORDER BY adc_dist2, vid)"))
        .filter(col("rank") <= 200)
      val refined = t(s"ivfadc_r_np$nprobe")(
        topk(Ann.adcRefine(adcTopR, big, queries, 10)))
      println(f"""[annrecall] {"variant":"ivfadc_refine","nprobe":$nprobe,"R":200,"recall_at_10":${recall(refined, exact)}%.3f,"cloud_recall_at_10":${cloudRecall(refined, exact)}%.3f}""")
    }
    spark.stop()
  }
}
