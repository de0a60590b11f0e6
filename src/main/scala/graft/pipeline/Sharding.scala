package graft.pipeline

import graft.functions.DetHash
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic, reproducible training-epoch shuffling.
  *
  * A training run over a 100 TB corpus needs a GLOBAL permutation of
  * examples that is (a) reproducible bit-for-bit across reruns and
  * engines, (b) computable without a total sort of the corpus, and
  * (c) addressable shard-by-shard so a 1000-worker data loader can pull
  * its slice without coordination. The standard construction is hashed
  * sharding + hashed in-shard order: shard = h(seed, id) mod S, order
  * within the shard by an independent hash. Changing the seed changes
  * the permutation (a new epoch), changing nothing else.
  *
  * Scale shape: `epochAssign` is a pure narrow map (two md5-derived
  * hashes per row, no shuffle, no state); the only wide operation in
  * [[epochShuffle]] is the one repartition every resharding inherently
  * needs. There is no global sort anywhere — in-shard order is settled
  * by `sortWithinPartitions`, i.e. per-partition spillable sorts.
  */
object Sharding {

  /** Loud NULL-id guard (review r16): every op here keys on the
    * deterministic hash h60(seed|id), which is NULL for a NULL id —
    * in the temperature cut the row would count NULLS-FIRST into the
    * histogram yet never match the cut's rank join, silently shifting
    * the selection boundary (or, when the NULL group absorbs the
    * quota, selecting NOTHING); in the epoch layout it lands in a
    * NULL shard. FILTER predicate, not a projection (the Ann guard
    * convention — survives column pruning).
    */
  private def requireIdNotNull(idCol: String,
                               who: String): org.apache.spark.sql.Column =
    expr(s"CASE WHEN $idCol IS NULL THEN CAST(raise_error(" +
      s"'$who: NULL $idCol — the deterministic (hash, id) key is " +
      s"undefined; assign ids upstream') AS BOOLEAN) ELSE true END")

  /** Adds deterministic (shard, ord) columns: shard = h60(seed|id) mod
    * nShards, ord = h60(seed+1|id) — an independent member of the same
    * hash family (seeded h60), so in-shard order is uncorrelated with
    * shard choice. Narrow map; engine-portable (DetHash).
    */
  def epochAssign(docs: DataFrame, idCol: String, seed: Int,
                  nShards: Int): DataFrame = {
    // driver-side refusals (review r18, the targetDiv rule): 0 shards
    // is a plan-buried `% 0` — ANSI DIVIDE_BY_ZERO mid-task, or
    // silent NULL shards non-ANSI; and a pre-existing shard/ord
    // column would be silently clobbered (the requireNoReserved
    // contract its sibling mix ops already enforce)
    require(nShards >= 1, s"epochAssign needs nShards >= 1, got $nShards")
    requireNoReserved(docs, Seq("shard", "ord"), "epochAssign")
    docs
      .filter(requireIdNotNull(idCol, "epochAssign"))
      .withColumn("shard",
        DetHash.h60(col(idCol).cast("string"), seed) % nShards)
      .withColumn("ord", DetHash.h60(col(idCol).cast("string"), seed + 1))
  }

  /** The corpus physically resharded into the epoch layout: one
    * hash-partitioned exchange on `shard`, then per-partition sorts on
    * (shard, ord, id). Reading partitions in order replays the epoch
    * permutation. Hash partitioning may co-locate several shard ids in
    * one task partition (they stay contiguous via the sort); use
    * [[writeEpochShards]] for a strict one-directory-per-shard layout.
    */
  def epochShuffle(docs: DataFrame, idCol: String, seed: Int,
                   nShards: Int): DataFrame =
    epochAssign(docs, idCol, seed, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col(idCol))

  /** Per-language quota table for the temperature mix: (lang, n_docs,
    * quota) with quota = round(w6 · (total div targetDiv)) where w6 is
    * the 6-dp-rounded α-flattened weight (the px46 cross-engine
    * contract) — the float path is pinned, so reruns and engines agree
    * bit-for-bit. Tiny: one per-language count + two global windows
    * over the language table.
    */
  private def tempQuotas(docs: DataFrame, langCol: String,
                         alphaE: String, targetDiv: Int): DataFrame = {
    // driver-side, not a plan-buried 'div 0': under ANSI that error
    // would kill the job at its LAST aggregation, after the full
    // corpus scan; with ANSI off, quotas would go silently NULL and
    // the selection would return an empty frame (review r16)
    require(targetDiv >= 1,
      s"targetDiv must be >= 1 (total div targetDiv is the mix " +
        s"budget), got $targetDiv")
    docs.groupBy(langCol)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("pa", expr(
        s"power(n_docs / CAST(sum(n_docs) OVER () AS DOUBLE), $alphaE)"))
      .withColumn("quota", expr(
        s"CAST(round(round(pa / sum(pa) OVER (), 6) * " +
          s"(sum(n_docs) OVER () div $targetDiv)) AS BIGINT)"))
      .select(col(langCol), col("n_docs"), col("quota"))
  }

  /** Materialize a temperature-resampled training mix (the mT5/XLM-R
    * w_l ∝ p_l^α rule px46 computes the WEIGHTS for, turned into an
    * actual document selection): per-language quota = round(w6 ·
    * (total div targetDiv)), members = the quota smallest docs by
    * (h60(seed|id), id) — so reruns, engines, and incremental
    * rebuilds pick the identical mix, and a new seed is a fresh
    * deterministic redraw.
    *
    * Scale shape (NOT a per-language window): ranking the corpus
    * with `row_number() OVER (PARTITION BY lang ...)` exchanges
    * everything on a handful of language keys — a 70%-English 100 TB
    * corpus would push ~70 TB through ONE task's sort. Instead the
    * quota-th smallest (hash, id) pair — the selection CUT — is
    * found exactly in two cheap passes: (1) a per-(lang, bucket)
    * histogram over the top 16 bits of the hash (map-side combined
    * to ≤ 65536 rows per language) locates the bucket containing
    * the quota-th pair and how deep in it (`need`); (2) only that
    * boundary bucket's rows (~n/65536 per language, broadcast-inner-
    * joined out of the corpus) are ranked — partitioned by
    * (lang, bkt), never bare lang — to read off the exact cut pair.
    * Selection is then one NARROW filter against the broadcast cut:
    * keep iff (h, id) ≤ (cut_h, cut_id), or everything when
    * quota ≥ n_docs. No corpus-sized exchange anywhere; PlanShapeSpec
    * pins it.
    *
    * SELECTION, not resampling: a language whose quota exceeds its
    * doc count contributes everything it has and stops — this op
    * materializes the DOWNSAMPLING half of the temperature rule
    * (sampling without replacement). Upsampling a minority language
    * past its own size means repeating examples, which belongs to
    * the training loader's epoch schedule, not the corpus build;
    * [[temperatureReport]] surfaces the capped languages as data.
    */
  def temperatureSample(docs: DataFrame, langCol: String = "lang",
                        alphaE: String = "3e-1", targetDiv: Int = 2,
                        seed: Int = 7,
                        idCol: String = "doc_id"): DataFrame = {
    // Loud reserved-name guard: the selection joins internal columns
    // onto the corpus, and `quota` rides into the OUTPUT as a declared
    // sampling diagnostic (px69 aggregates it). A corpus already
    // carrying one of these names would either hit an ambiguous-
    // reference AnalysisException in the keep predicate or have its
    // own column silently dropped by the cleanup — refuse instead.
    requireNoReserved(docs,
      Seq("_tsl", "_tsh", "n_docs", "quota", "cut_h", "cut_id"),
      "temperatureSample")
    // NULL-language docs are a language of their own (grouping already
    // treats them so; plain equi-joins would silently drop them — the
    // r10 shape's bug). Every internal join is NULL-SAFE (`<=>`) on
    // the language value itself (r12) — the r11 NUL sentinel was
    // documented as reserved but still collided with a real NUL-string
    // language value; perplexityBucketsFromScores' <=> join is the
    // convention. Internal frames carry the language as `_tsl`;
    // original columns ride through untouched, plus the language's
    // `quota` (the allocation diagnostic px69 aggregates — an OUTPUT
    // column, hence reserved above).
    val quotas = tempQuotas(docs, langCol, alphaE, targetDiv)
      .select(col(langCol).as("_tsl"), col("n_docs"), col("quota"))
    val keyed = docs
      .filter(requireIdNotNull(idCol, "temperatureSample"))
      .withColumn("_tsh", DetHash.h60(col(idCol).cast("string"), seed))
    val sel = cutBounds(keyed, quotas, langCol, idCol)
    keyed.join(broadcast(sel), col(langCol) <=> col("_tsl"))
      .filter(cutKeep(idCol))
      .drop("_tsl", "_tsh", "n_docs", "cut_h", "cut_id")
  }

  /** Refuse an input frame whose columns collide with an op's
    * internal join columns or added output columns — the collision
    * otherwise surfaces as an ambiguous-reference AnalysisException
    * deep in the plan, or worse, as the USER's column silently
    * dropped by the internal cleanup.
    */
  private def requireNoReserved(docs: DataFrame, reserved: Seq[String],
                                who: String): Unit = {
    // case-INsensitive: Spark resolution is case-insensitive by
    // default, so a user column `Quota` collides with the internal
    // `quota` exactly like a lowercase one would
    val res = reserved.map(_.toLowerCase)
    val clash = docs.columns.toSeq.filter(c => res.contains(c.toLowerCase))
    require(clash.isEmpty,
      s"$who: input column(s) ${clash.mkString(", ")} collide with " +
        s"reserved internal/output names (${reserved.mkString(", ")}); " +
        s"rename them before calling")
  }

  /** The keep predicate against a [[cutBounds]] row: everything when
    * the quota covers the language, else (h, id) ≤ (cut_h, cut_id).
    * A language with no cut row (quota 0, or ≥ n_docs with the first
    * disjunct) keeps nothing through the second disjunct. */
  private def cutKeep(idCol: String): Column =
    col("quota") >= col("n_docs") ||
      (col("cut_h").isNotNull &&
        (col("_tsh") < col("cut_h") ||
          (col("_tsh") === col("cut_h") &&
            col(idCol) <= col("cut_id"))))

  /** The exact selection CUT per language — the two-pass histogram
    * trick shared by [[temperatureSample]] and [[repeatBudgetMix]].
    * `keyed` is the corpus with the seeded `_tsh` hash; `quotas` is
    * the tiny (_tsl, n_docs, quota) table. Returns one broadcastable
    * row per language: (_tsl, n_docs, quota, cut_h, cut_id), where
    * (cut_h, cut_id) is the quota-th smallest pair (NULL when quota
    * is 0 or ≥ n_docs). No corpus-sized exchange: pass 1 is a
    * map-side-combined 16-bit-bucket histogram, pass 2 ranks ONLY the
    * boundary bucket's rows (partitioned by (lang, bkt), never bare
    * lang — PlanShapeSpec pins it).
    */
  private def cutBounds(keyed: DataFrame, quotas: DataFrame,
                        langCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the histogram and cut passes need only (lang, id, hash) — a
    // ~25 B/row projection, lazily checkpointed so the two passes
    // share one scan+hash; the final full-width selection pass stays
    // a plain narrow scan (checkpointing the whole corpus would be
    // the wrong shape at scale)
    val slim = keyed
      .select(col(langCol).as("_tsl"), col(idCol), col("_tsh"),
        expr("shiftright(_tsh, 44)").as("bkt"))
      .localCheckpoint(false)
    val hist = slim
      .groupBy("_tsl", "bkt").agg(count(lit(1)).as("c"))
    // the bucket holding the quota-th smallest pair, + depth inside it
    val bounds = hist
      .withColumn("cum", sum("c").over(
        Window.partitionBy("_tsl").orderBy("bkt")))
      .join(quotas.select(col("_tsl").as("_tsq"), col("quota")),
        col("_tsl") <=> col("_tsq"))
      .filter(col("cum") - col("c") < col("quota") &&
        col("quota") <= col("cum"))
      .select(col("_tsl").as("_tsb"), col("bkt").as("_tsbk"),
        (col("quota") - col("cum") + col("c")).as("need"))
    // exact cut pair: the need-th smallest (h, id) inside that bucket
    val cut = slim
      .join(broadcast(bounds), col("_tsl") <=> col("_tsb") &&
        col("bkt") === col("_tsbk"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("_tsl"), col("bkt"))
          .orderBy(col("_tsh"), col(idCol))).cast("bigint"))
      .filter(col("rk") === col("need"))
      .select(col("_tsl").as("_tsc"), col("_tsh").as("cut_h"),
        col(idCol).as("cut_id"))
    quotas.join(cut, col("_tsl") <=> col("_tsc"), "left")
      .drop("_tsc")
  }

  /** Per-language plan for a REPEAT-BUDGET mix — the upsampling half
    * [[temperatureSample]] deliberately leaves out, under the
    * data-constrained-scaling contract (Muennighoff et al. 2023:
    * repeating data pays off up to ~4 epochs; UniMax, Chung et al.
    * 2023: temperature sampling with a per-language epoch cap).
    * Desired quota is [[tempQuotas]]' temperature rule, allowed to
    * EXCEED a language's corpus; `allocated = min(quota,
    * maxRepeat · n_docs)` caps the repetition; `full_epochs` whole
    * passes plus an `n_partial`-doc partial epoch realize it exactly.
    * `capped` marks a language that hit the epoch cap (its quota is
    * unmet — the data card's "need more data here" signal).
    * → (lang, n_docs, quota, allocated, full_epochs, n_partial,
    * capped). Tiny: the [[tempQuotas]] aggregate plus narrow integer
    * math.
    */
  def repeatBudgetPlan(docs: DataFrame, langCol: String = "lang",
                       alphaE: String = "3e-1", targetDiv: Int = 2,
                       maxRepeat: Int = 4): DataFrame = {
    require(maxRepeat >= 1, s"need maxRepeat >= 1, got $maxRepeat")
    tempQuotas(docs, langCol, alphaE, targetDiv)
      .withColumn("allocated",
        least(col("quota"), lit(maxRepeat.toLong) * col("n_docs")))
      .withColumn("full_epochs", expr("allocated div n_docs"))
      .withColumn("n_partial", expr("allocated % n_docs"))
      .withColumn("capped", col("quota") > col("allocated"))
  }

  /** Materialize the repeat-budget mix as per-doc repeat counts:
    * every doc of a language appears `full_epochs` times, and the
    * `n_partial` smallest docs by (h60(seed|id), id) — the same
    * seeded-hash order [[temperatureSample]] selects by — appear once
    * more; docs with a zero count are dropped. Output = the original
    * columns + `rep`. Deterministic across reruns, engines, and
    * incremental rebuilds; a new seed redraws the partial epoch.
    *
    * Scale shape: the partial-epoch membership is decided by the
    * broadcast [[cutBounds]] pair — one narrow filter expression, the
    * same no-corpus-exchange construction as [[temperatureSample]];
    * the epoch replication itself belongs to the epoch assembly
    * ([[epochShuffle]] per epoch seed), not here — emitting
    * `rep`-exploded rows would multiply the corpus before the
    * resharding that actually needs it.
    */
  def repeatBudgetMix(docs: DataFrame, langCol: String = "lang",
                      alphaE: String = "3e-1", targetDiv: Int = 2,
                      maxRepeat: Int = 4, seed: Int = 7,
                      idCol: String = "doc_id"): DataFrame = {
    // same reserved-name rule as temperatureSample; `rep` is this
    // op's output column
    requireNoReserved(docs,
      Seq("_tsl", "_tsh", "_rbl", "n_docs", "quota", "cut_h", "cut_id",
        "full_epochs", "rep"),
      "repeatBudgetMix")
    val plan = repeatBudgetPlan(docs, langCol, alphaE, targetDiv,
      maxRepeat)
    val keyed = docs
      .filter(requireIdNotNull(idCol, "repeatBudgetMix"))
      .withColumn("_tsh", DetHash.h60(col(idCol).cast("string"), seed))
    val pq = plan.select(col(langCol).as("_tsl"), col("n_docs"),
      col("n_partial").as("quota"))
    // cut row per language (quota = n_partial < n_docs always), plus
    // the full-epoch count riding along — still |languages| rows
    val sel = cutBounds(keyed, pq, langCol, idCol)
      .join(plan.select(col(langCol).as("_rbl"), col("full_epochs")),
        col("_tsl") <=> col("_rbl"))
      .drop("_rbl")
    keyed.join(broadcast(sel), col(langCol) <=> col("_tsl"))
      .withColumn("rep",
        (col("full_epochs") +
          when(cutKeep(idCol), 1L).otherwise(0L)).cast("bigint"))
      .filter(col("rep") > 0)
      .drop("_tsl", "_tsh", "n_docs", "quota", "cut_h", "cut_id",
        "full_epochs")
  }

  /** Data-card telemetry for [[temperatureSample]]: per language
    * (lang, n_docs, quota, n_sel, capped). The selection keeps
    * exactly min(quota, n_docs) docs — the cut pair is the quota-th
    * smallest hash when quota ≤ n, everything otherwise — so the
    * report derives entirely from the quota table: ONE per-language
    * count aggregate over the corpus (narrow scan, map-side combined
    * to |languages| rows), never a pass over the selection itself.
    * `capped = true` marks a language whose quota exceeded its
    * corpus (the upsampling the selection deliberately does NOT do);
    * surfacing it here lets data cards report exhaustion without
    * re-deriving it from the selection.
    */
  def temperatureReport(docs: DataFrame, langCol: String = "lang",
                        alphaE: String = "3e-1",
                        targetDiv: Int = 2): DataFrame =
    tempQuotas(docs, langCol, alphaE, targetDiv)
      .select(col(langCol), col("n_docs"), col("quota"),
        least(col("quota"), col("n_docs")).as("n_sel"),
        (col("quota") > col("n_docs")).as("capped"))

  /** Writes the epoch layout as parquet partitioned by `shard` — the
    * addressable form: worker w reads `path/shard=w/` and sorts its
    * (vastly smaller) slice by (ord, id), or relies on the sorted
    * write order within each directory.
    */
  def writeEpochShards(docs: DataFrame, idCol: String, seed: Int,
                       nShards: Int, path: String): Unit =
    epochShuffle(docs, idCol, seed, nShards)
      .write.partitionBy("shard").mode("overwrite").parquet(path)
}
