package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.DetHash
import graft.pipeline.Dedup
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** px59 persist-matrix re-adjudication (round 12): the r11 "lazy
  * beats eager localCheckpoint on cand" A/B never tried the LAZY
  * checkpoint (the px27/§0h winner), and the decl's whole-corpus
  * signature pass is consumed by four filter branches the same way
  * px27's was by three joins. Matrix:
  *   none      — shipped r11 shape (all lazy, reused exchanges)
  *   sigs      — lazy localCheckpoint on the ONE whole-corpus
  *               signature pass (decl level)
  *   cand      — lazy localCheckpoint on the candidate pair list
  *               (library level, three consumers)
  *   sigs+cand — both
  * Full-output forcing; outputs asserted identical across modes.
  */
object ProbePx59b {

  def body(s: SparkSession, dir: String, lcpSigs: Boolean,
           lcpCand: Boolean): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val c = docs.agg(
      expr("CAST(ceil(8e-1 * (max(doc_id) + 1)) AS BIGINT)").as("c"))
      .head().getLong(0)
    val sigs0 = Dedup.minhashWide(docs)
    val sigs = if (lcpSigs) sigs0.localCheckpoint(false) else sigs0
    val existingSigs = sigs.filter(col("doc_id") < c)
    val batchSigs = sigs.filter(col("doc_id") >= c)
    val existing = docs.filter(col("doc_id") < c)
    val batch = docs.filter(col("doc_id") >= c)
    val threshold = 0.5
    // inlined incrementalNearDupsFromSigs with the cand knob
    val exBands = Dedup.bandSigs(existingSigs)
      .select(col("doc_id").as("oid"), col("band"), col("sig"))
    val newBands = Dedup.bandSigs(batchSigs)
      .select(col("doc_id").as("nid"), col("band"), col("sig"))
    val cand0 = newBands.join(exBands, Seq("band", "sig"))
      .select("nid", "oid").distinct()
    val cand = if (lcpCand) cand0.localCheckpoint(false) else cand0
    val candDocs = existing.join(
      broadcast(cand.select(col("oid").as("doc_id")).distinct()),
      Seq("doc_id"), "left_semi")
    def hashedShingles(d: DataFrame, id: String): DataFrame =
      TextOps.shingleRows(d, 3)
        .select(col("doc_id").as(id), DetHash.h60(col("s")).as("sh"))
        .distinct()
    val shN = hashedShingles(batch, "nid")
    val shO = hashedShingles(candDocs, "oid")
    val szN = shN.groupBy("nid").agg(count(lit(1)).as("sa"))
    val szO = shO.groupBy("oid").agg(count(lit(1)).as("sb"))
    val inter = cand.join(shN, Seq("nid"))
      .join(shO, Seq("oid", "sh"))
      .groupBy("nid", "oid").agg(count(lit(1)).as("inter"))
    val best = inter.join(szN, Seq("nid")).join(szO, Seq("oid"))
      .withColumn("jac", expr("round(inter / (sa + sb - inter), 6)"))
      .filter(col("jac") >= lit(threshold))
      .withColumn("r", expr(
        "row_number() OVER (PARTITION BY nid ORDER BY jac DESC, oid)"))
      .filter(col("r") === 1)
      .select(col("nid").as("doc_id"), col("oid").as("dup_of"), col("jac"))
    val nCand = cand.groupBy("nid").agg(count(lit(1)).as("n_cand"))
      .select(col("nid").as("doc_id"), col("n_cand"))
    batch.select("doc_id")
      .join(nCand, Seq("doc_id"), "left")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        col("dup_of"), col("jac"))
  }

  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Tables(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^0-9a-z]+")).as("t"))
      .filter(col("t") =!= "").groupBy("t").count().count()
    val ref = body(s, dir, lcpSigs = false, lcpCand = false)
    for ((sg, cd) <- Seq((true, false), (false, true), (true, true))) {
      val v = body(s, dir, sg, cd)
      require(ref.exceptAll(v).isEmpty && v.exceptAll(ref).isEmpty,
        s"px59 outputs diverged at sigs=$sg cand=$cd")
    }
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[px59] $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    val modes = Seq(("none", false, false), ("sigs", true, false),
      ("cand", false, true), ("sigs+cand", true, true))
    for (r <- 1 to 3; (label, sg, cd) <- modes) {
      // clearCache outside the timer — it is real unpersist work only
      // in the persisting arms (the ProbePx27 rule)
      t(s"$label-$r")(graft.Bench.materialize(body(s, dir, sg, cd)))
      s.catalog.clearCache()
    }
    s.stop()
  }
}
