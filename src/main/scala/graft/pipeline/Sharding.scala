package graft.pipeline

import graft.functions.DetHash
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

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

  /** Adds deterministic (shard, ord) columns: shard = h60(seed|id) mod
    * nShards, ord = h60(seed+1|id) — an independent member of the same
    * hash family (seeded h60), so in-shard order is uncorrelated with
    * shard choice. Narrow map; engine-portable (DetHash).
    */
  def epochAssign(docs: DataFrame, idCol: String, seed: Int,
                  nShards: Int): DataFrame =
    docs
      .withColumn("shard",
        DetHash.h60(col(idCol).cast("string"), seed) % nShards)
      .withColumn("ord", DetHash.h60(col(idCol).cast("string"), seed + 1))

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

  /** Materialize a temperature-resampled training mix (the mT5/XLM-R
    * w_l ∝ p_l^α rule px46 computes the WEIGHTS for, turned into an
    * actual document selection): per-language quota = round(w6 ·
    * (total div targetDiv)), members chosen deterministically by
    * seeded-hash order — so reruns, engines, and incremental rebuilds
    * pick the identical mix. Everything stays in one plan: the
    * language table is tiny (broadcast), the selection is one window
    * over the corpus partitioned by language.
    *
    * Determinism note: the quota multiplies the 6-dp ROUNDED weight
    * (the px46 cross-engine contract) by an integer target, so the
    * float path is pinned; ties inside a language break on doc id.
    *
    * SELECTION, not resampling: a language whose quota exceeds its
    * doc count contributes everything it has and stops — this op
    * materializes the DOWNSAMPLING half of the temperature rule
    * (sampling without replacement). Upsampling a minority language
    * past its own size means repeating examples, which belongs to the
    * training loader's epoch schedule, not the corpus build; detect
    * the capped case from the output itself (`quota` rides every row
    * — a language with max(rk) < quota was exhausted).
    */
  def temperatureSample(docs: DataFrame, langCol: String = "lang",
                        alphaE: String = "3e-1", targetDiv: Int = 2,
                        seed: Int = 7,
                        idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quotas = docs.groupBy(langCol)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("pa", expr(
        s"power(n_docs / CAST(sum(n_docs) OVER () AS DOUBLE), $alphaE)"))
      .withColumn("quota", expr(
        s"CAST(round(round(pa / sum(pa) OVER (), 6) * " +
          s"(sum(n_docs) OVER () div $targetDiv)) AS BIGINT)"))
      .select(col(langCol), col("quota"))
    val w = Window.partitionBy(langCol)
      .orderBy(DetHash.h60(col(idCol).cast("string"), seed), col(idCol))
    docs.join(broadcast(quotas), Seq(langCol))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= col("quota"))
  }

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
