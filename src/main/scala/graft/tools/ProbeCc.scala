package graft.tools
import graft.{GraftSession, Tables}
import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 check of the connectedComponents certifying-propagate
  * change (VERDICT r4 item 4): A/B the NEW loop (certify rides the
  * block's last propagation — one action per block) against the OLD
  * loop (3 propagations + 2 jumps, then a separate bi⋈l⋈l count
  * action per block), order-controlled, 3 alternating rounds at
  * sf0.1. Both must produce identical labels.
  */
object ProbeCc {

  /** The r4 loop shape, inlined verbatim for the A/B (the live
    * implementation is [[Dedup.connectedComponents]]).
    */
  def oldCc(docs: DataFrame, edges: DataFrame): DataFrame = {
    val ids = docs.select("doc_id")
    val bi = edges.select(col("d1").as("node"), col("d2").as("other"))
      .unionByName(edges.select(col("d2").as("node"), col("d1").as("other")))
      .unionByName(ids.select(col("doc_id").as("node"),
        col("doc_id").as("other")))
      .localCheckpoint()
    def step(l: DataFrame): DataFrame = bi
      .join(l.select(col("doc_id").as("other"), col("lbl").as("olbl")),
        Seq("other"))
      .groupBy(col("node").as("doc_id"))
      .agg(min("olbl").as("lbl"))
    def jump(l: DataFrame): DataFrame = l
      .join(l.select(col("doc_id").as("lbl"), col("lbl").as("plbl")),
        Seq("lbl"))
      .select(col("doc_id"), col("plbl").as("lbl"))
    var labels = ids.select(col("doc_id"), col("doc_id").as("lbl"))
    var block = 0
    var inconsistent = 1L
    while (inconsistent > 0 && block < 50) {
      labels = jump(jump(step(step(step(labels))))).localCheckpoint()
      inconsistent = bi
        .join(labels.select(col("doc_id").as("node"), col("lbl")),
          Seq("node"))
        .join(labels.select(col("doc_id").as("other"),
          col("lbl").as("olbl")), Seq("other"))
        .filter(col("lbl") =!= col("olbl")).count()
      block += 1
    }
    require(inconsistent == 0)
    labels
  }

  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables(s, dir, "documents")
    // Warmup: tokenize + hash-agg codegen, as in Bench.
    docs.select(explode(split(lower(col("text")), "[^0-9a-z]+")).as("t"))
      .filter(col("t") =!= "").groupBy("t").count().count()
    // Candidate edges are THE SAME written-artifact input for both
    // variants (at scale they'd be a parquet table): checkpoint once
    // so the A/B times the fixpoint loops, not the LSH subtree.
    val edges = Dedup.lshCandidates(docs).localCheckpoint()
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-8s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    val ba = sys.env.get("SPARK_GRAFT_AB_ORDER").contains("ba")
    for (r <- 1 to 3) {
      if (ba) {
        t(s"old-$r") { oldCc(docs, edges).count() }
        t(s"new-$r") { Dedup.connectedComponents(docs, edges).count() }
      } else {
        t(s"new-$r") { Dedup.connectedComponents(docs, edges).count() }
        t(s"old-$r") { oldCc(docs, edges).count() }
      }
    }
    val a = Dedup.connectedComponents(docs, edges)
      .collect().map(_.toString).sorted
    val b = oldCc(docs, edges).collect().map(_.toString).sorted
    println(s"[probe] equal=${a.sameElements(b)}")
    s.stop()
  }
}
