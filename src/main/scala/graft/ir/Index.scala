package graft.ir

import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized doc-vector index (SURVEY §3.3: the HBase stack
  * `IndexTrecToHBase → CollectionStatsHBase → RunQueryHBase` becomes
  * a Parquet table + DataFrame joins).
  *
  * Schema: (doc_id, dv: Map[term→tf], len) — the reference's
  * Java-serialized `FeatureVector` becomes a typed MapType column
  * (`IndexTrecToHBase.java:106-146`); HBase point-Gets become joins.
  *
  * Scale: the index write is one tokenize+aggregate pass; retrieval
  * from the index skips re-tokenization entirely (explode of the map
  * column is cheaper than regex-splitting raw text and prunes to the
  * `dv` column at the parquet scan). Partition the write by a stable
  * doc-id hash for co-located joins at 100 TB.
  */
object Index {

  /** Build the doc-vector table from (doc_id, text) docs. */
  def buildDocVectors(docs: DataFrame): DataFrame =
    TextOps.termFreqs(docs)
      .groupBy("doc_id")
      .agg(
        map_from_entries(collect_list(struct(col("term"), col("tf")))).as("dv"),
        sum("tf").as("len"))

  def write(docs: DataFrame, path: String, buckets: Int = 32): Unit =
    buildDocVectors(docs)
      .repartition(buckets, col("doc_id"))
      .write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Per-term collection stats straight from the index
    * (CollectionStatsHBase re-explode, `CollectionStatsHBase.java:45-70`).
    */
  def termStats(dv: DataFrame): DataFrame =
    dv.select(explode(col("dv")).as(Seq("term", "tf")))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))

  /** Retrieval from the materialized index — identical semantics to
    * [[Retrieval.scoreFor]] on the raw corpus (asserted in IndexSpec),
    * without re-tokenizing.
    */
  def scoreFromIndex(dv: DataFrame, q: DataFrame, partExpr: String,
                     finalExpr: String, conjunctive: Boolean, k: Int): DataFrame = {
    val tf = dv.select(col("doc_id"), explode(col("dv")).as(Seq("term", "tf")))
    val dl = dv.select(col("doc_id"), col("len").as("dl"))
    val qlen = q.groupBy("qid").agg(count(lit(1)).as("qlen"))
    val tstats = termStats(dv)
      .join(q.select("term").distinct(), Seq("term"), "left_semi")
    val cs = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_tokens"))
    val grouped = tf.join(broadcast(q), Seq("term"))
      .join(dl, Seq("doc_id"))
      .join(broadcast(tstats), Seq("term"))
      .join(broadcast(qlen), Seq("qid"))
      .crossJoin(broadcast(cs))
      .withColumn("part", expr(partExpr))
      .groupBy("qid", "doc_id", "dl", "qlen")
      .agg(sum("part").as("score_sum"), count(lit(1)).as("n_matched"))
    val gated =
      if (conjunctive) grouped.filter(col("n_matched") === col("qlen"))
      else grouped
    gated
      .withColumn("score", expr(finalExpr))
      .withColumn("rank",
        expr("row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)"))
      .filter(col("rank") <= k)
      .select("qid", "doc_id", "score", "rank")
  }
}
