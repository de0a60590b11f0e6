package graft

/** Results must be bit-identical under different parallelism — the
  * property the cross-engine rules (DECIMAL sums, round-then-rank,
  * md5-derived hashes; Decl.scala) exist to guarantee. A raw
  * double-sum plan would fail this under a different partition count.
  */
class DeterminismSpec extends SparkSpec {

  // one query per determinism-sensitive family: decimal money sums,
  // float scoring + rank, hash-ordered sampling, iterative dedup
  // labels, round-then-rank pair expansion, persisted-cache estimator,
  // fixpoint CC labels, rounded-cosine threshold (SemDeDup), rounded
  // quality ranking (survivor choice), libm-pow mixture weights
  // ... plus the round-3 additions: windowed span islands (px47),
  // ln-sum log-odds with round-then-pred (px48), bucket-LM ln-sums
  // (px49), and round-then-rank ADC distances (px50/px51)
  private val names = Seq("q01_agg_sums", "ir14_score_lmdir",
    "px26_stratified_sample", "px19_dup_clusters", "px04_jaccard_top",
    "px27_minhash_estimate", "px42_connected_components",
    "px44_semdedup", "px45_quality_survivors", "px46_temperature_mix",
    "px47_dup_spans", "px48_nb_quality", "px49_dsir_weights",
    "px50_pq_adc_topk", "px51_ivf_pq_topk",
    // round 4: trained-cluster SemDeDup — Lloyd means are parallel
    // double sums feeding a round-then-rank assignment, then a
    // rounded-cosine drop threshold; both boundaries must hold under
    // repartitioning
    "px52_semdedup_api",
    // round 5: the window-normalization rewrites — RM3's window
    // totals (ir19), the stacked four-model CASE scoring (ir26), and
    // the KDE kernel as aggregate() over a sort_array'd collect_list
    // (ir20: the sort pins the double-summation order, which the old
    // hash-agg shape left partition-dependent)
    "ir19_rm3", "ir26_baselines_grid", "ir20_kde_rerank")

  private def rows(name: String): Seq[String] =
    try SparkEntry.queries(name)(spark, sfTiny)
      .collect().map(_.toString).sorted.toSeq
    // px04/px27 persist() subtrees: drop them so the second
    // partition-count run actually recomputes instead of reading the
    // first run's cache (which would make the comparison vacuous)
    finally spark.catalog.clearCache()

  for (name <- names)
    test(s"$name is identical under shuffle.partitions 4 vs 13") {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        val a = rows(name)
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        val b = rows(name)
        assert(a.nonEmpty && a === b)
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
}
