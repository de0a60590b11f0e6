package graft.tools

import graft.{Bench, GraftSession, SparkEntry, Tables}
import graft.functions.DetHash
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** First-gating adjudication for the four r12 queries (px74 dup-run
  * spans, px75 ExactSubstr minLen, px76 cluster-balanced mix, px77
  * contamination fraction): isolated-cold full-output reps at sf0.1
  * plus a per-stage decomposition of the three ≥2×-vs-oracle ones,
  * so the wall can be attributed to a named stage instead of guessed
  * at. Stages are the queries' own subtrees re-declared here (probe
  * tooling may duplicate decl internals; the decls stay canonical).
  */
object ProbeNewQs {

  /** px75 detection subtree: covered-position islands ≥ minLen, the
    * input the scrub kernel stitches from (everything except the
    * stitch itself). */
  def px75Islands(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = 5; val minLen = 15
    val docs = Tables(s, dir, "documents")
    val tk = docs.select(col("doc_id"),
      coalesce(org.apache.spark.sql.functions.filter(
          TextOps.tokensCol(col("text")), t => t =!= ""),
        org.apache.spark.sql.functions.array().cast("array<string>"))
        .as("tk"))
    val sh = tk
      .select(col("doc_id"),
        posexplode(TextOps.shinglesFromToks(col("tk"), n))
          .as(Seq("i0", "s")))
      .select(col("doc_id"), (col("i0") + 1).as("pos"),
        DetHash.h60(col("s")).as("h"))
    val firsts = sh.groupBy("h")
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("pos"))).as("f"))
      .filter(col("c") >= 2)
      .select(col("h"), col("f.doc_id").as("fdoc"), col("f.pos").as("fpos"))
    val covered = sh.join(firsts, Seq("h"))
      .filter(!(col("doc_id") === col("fdoc") && col("pos") === col("fpos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos"))
    covered.distinct()
      .withColumn("_ds_g", col("pos") - row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .groupBy(col("doc_id"), col("_ds_g"))
      .agg(min("pos").as("s"), max("pos").as("e"))
      .filter(col("e") - col("s") + 1 >= minLen)
  }

  /** px76 label subtree: the two-round deterministic k-means chain
    * (as in the decl, minus the final temperatureSample). */
  def px76Labels(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
      .select(col("vec_id").as("vid"),
        posexplode(col("embedding")).as(Seq("i", "x0")))
      .withColumn("x", col("x0").cast("double")).drop("x0")
    def assign(cent: DataFrame) =
      e.join(cent, Seq("i"))
        .withColumn("d", expr("(x - c) * (x - c)"))
        .groupBy("vid", "cid").agg(sum("d").as("dist2"))
        .withColumn("r", expr(
          "row_number() OVER (PARTITION BY vid ORDER BY round(dist2, 6), cid)"))
        .filter(col("r") === 1).select("vid", "cid")
    val c0 = e.filter(col("vid") < 4)
      .select(col("vid").as("cid"), col("i"), col("x").as("c"))
    val c1 = e.join(assign(c0), Seq("vid"))
      .groupBy("cid", "i").agg(expr("sum(x) / count(x)").as("c"))
    assign(c1)
  }

  /** px77 distinct-shingle subtree: the corpus-wide per-doc distinct
    * 5-gram table both the total and the hit aggregations consume. */
  def px77Dsh(s: SparkSession, dir: String): DataFrame =
    TextOps.shingleRows(Tables(s, dir, "documents"), 5)
      .select(col("doc_id"), DetHash.h60(col("s")).as("sh"))
      .distinct()

  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warmup: corpus tokenize (JIT + page cache), as in the other probes
    Tables(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^0-9a-z]+")).as("t"))
      .filter(col("t") =!= "").groupBy("t").count().count()
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[newqs] $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      s.catalog.clearCache()
    }
    val stages: Seq[(String, () => DataFrame)] = Seq(
      "px74_full" -> (() => SparkEntry.queries("px74_dup_run_spans")(s, dir)),
      "px75_islands" -> (() => px75Islands(s, dir)),
      "px75_full" -> (() => SparkEntry.queries("px75_exactsubstr_minlen")(s, dir)),
      "px72_minlen1" -> (() => graft.pipeline.Dedup.scrubDupSpans(
        Tables(s, dir, "documents"), 5, 1)),
      "px76_labels" -> (() => px76Labels(s, dir)),
      "px76_full" -> (() => SparkEntry.queries("px76_cluster_balanced_mix")(s, dir)),
      "px77_dsh" -> (() => px77Dsh(s, dir)),
      "px77_full" -> (() => SparkEntry.queries("px77_contam_fraction")(s, dir)))
    for (r <- 1 to 3; (label, mk) <- stages)
      t(s"$label-$r")(Bench.materialize(mk()))
    s.stop()
  }
}
