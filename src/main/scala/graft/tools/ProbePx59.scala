package graft.tools

import graft.{GraftSession, Tables}
import graft.pipeline.Dedup
import graft.text.TextOps
import graft.functions.DetHash
import org.apache.spark.sql.functions._

/** Round-11 decomposition of px59_incremental_dedup (~2.8 s warm vs
  * DuckDB ~0.9 s at sf0.1): which sub-DAG carries the cost — corpus
  * signing, the band join, or the exact-verify stage?
  */
object ProbePx59 {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables(s, dir, "documents")
    val cut = broadcast(docs.agg(
      expr("CAST(ceil(8e-1 * (max(doc_id) + 1)) AS BIGINT)").as("c")))
    def existing = docs.crossJoin(cut).filter(col("doc_id") < col("c")).drop("c")
    def batch = docs.crossJoin(cut).filter(col("doc_id") >= col("c")).drop("c")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    docs.count() // warmup
    for (r <- 1 to 3) {
      // full-output forcing: count() over minhashWide's groupBy prunes
      // the 16 min() aggregates AND the md5 hashing (only the grouping
      // key survives — ProbePx27's scaladoc'd mechanism), which would
      // attribute the signing cost to downstream stages instead
      t(s"sigEx-$r") { graft.Bench.materialize(Dedup.minhashWide(existing)) }
      t(s"sigBatch-$r") { graft.Bench.materialize(Dedup.minhashWide(batch)) }
      t(s"cand-$r") {
        Dedup.bandSigs(Dedup.minhashWide(batch))
          .select(col("doc_id").as("nid"), col("band"), col("sig"))
          .join(Dedup.bandSigs(Dedup.minhashWide(existing))
            .select(col("doc_id").as("oid"), col("band"), col("sig")),
            Seq("band", "sig"))
          .select("nid", "oid").distinct().count()
      }
      t(s"dshBatch-$r") {
        TextOps.shingleRows(batch, 3)
          .select(col("doc_id"), DetHash.h60(col("s")).as("sh"))
          .distinct().count()
      }
      t(s"full-$r") {
        graft.Bench.materialize(Dedup.incrementalNearDups(existing, batch, 0.5))
      }
    }
    // The production path: corpus signatures precomputed in a parquet
    // signature store — what a user actually pays PER BATCH once the
    // store exists (signing the corpus is a one-time cost the gated
    // query keeps re-paying inline).
    val store = "/tmp/px59_sigstore"
    Dedup.minhashWide(existing).write.mode("overwrite").parquet(store)
    for (r <- 1 to 3) {
      t(s"storePath-$r") {
        graft.Bench.materialize(Dedup.incrementalNearDupsFromSigs(
          s.read.parquet(store), existing,
          Dedup.minhashWide(batch), batch, 0.5))
      }
    }
    // one-pass signing split: the two sides' agg subtrees must share
    // one exchange (ReusedExchange), not tokenize the corpus twice
    val sigs = Dedup.minhashWide(docs)
    val c = 4000L
    val split = Dedup.incrementalNearDupsFromSigs(
      sigs.filter(col("doc_id") < c), docs.filter(col("doc_id") < c),
      sigs.filter(col("doc_id") >= c), docs.filter(col("doc_id") >= c), 0.5)
    println("[probe] split plan has ReusedExchange: " +
      split.queryExecution.executedPlan.toString.contains("ReusedExchange"))
    s.stop()
  }
}
