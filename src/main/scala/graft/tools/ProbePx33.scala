package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.DetHash
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** px33 shape adjudication probe (round 14): the r13 de-vacuation
  * (whole-text md5 → shared distinct 5-gram shingles) was correct but
  * landed priced, not lever-A/B'd (1.17 s vs 0.31 = 3.8× in the
  * committed pair). Candidate levers:
  *
  *  - SHIPPED: per-source distinct (exchange on (source, h)) → h-keyed
  *    self-join (re-exchange on h, both sides reused) → pair groupBy.
  *    Three exchanges, one join; the join key is already the 8-byte
  *    h60 BIGINT (the "hash first" claim holds — verified here).
  *  - SETAGG: one h-keyed collect_set(source) aggregation (map-side
  *    partial merge, the set bounded by the SOURCE COUNT — a handful
  *    of constants, not corpus-sized), pairs expanded IN-ROW
  *    (s1 < s2), then the pair groupBy. Two exchanges, NO join, and
  *    the per-source distinct disappears into the set semantics.
  *
  * Usage: sbt "runMain graft.tools.ProbePx33 [N]" — N replicas of the
  * sf0.1 documents table (replicas keep their source so per-source
  * shingle mass grows N×). Results → probes/px33.log + BENCH_NOTES.
  */
object ProbePx33 {

  def shipped(docs: DataFrame): DataFrame = {
    val hs = TextOps.shingleRows(docs.select("source", "text"),
        5, idCol = "source")
      .select(col("source"), DetHash.h60(col("s")).as("h"))
      .distinct()
    hs.alias("a")
      .join(hs.alias("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("shared_hashes"))
  }

  def setAgg(docs: DataFrame): DataFrame =
    TextOps.shingleRows(docs.select("source", "text"), 5, idCol = "source")
      .select(col("source"), DetHash.h60(col("s")).as("h"))
      .groupBy("h").agg(collect_set("source").as("srcs"))
      .select(explode(expr(
        """flatten(transform(srcs,
          |  a -> transform(filter(srcs, b -> b > a),
          |    b -> struct(a AS s1, b AS s2))))""".stripMargin)).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(count(lit(1)).as("shared_hashes"))

  /** Lever HPART: hash-partition on h ALONE before the distinct —
    * hashpartitioning(h) satisfies the (source, h) aggregation's
    * clustered distribution AND the self-join's h-distribution, so the
    * dedup and the join share ONE data exchange (the shipped shape
    * pays an (source,h) exchange then re-shuffles on h).
    */
  def hpart(docs: DataFrame): DataFrame = {
    val hs = TextOps.shingleRows(docs.select("source", "text"),
        5, idCol = "source")
      .select(col("source"), DetHash.h60(col("s")).as("h"))
      .repartition(col("h"))
      .dropDuplicates("source", "h")
    hs.alias("a")
      .join(hs.alias("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("shared_hashes"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables(spark, dir, "documents").select("source", "text")
    val docs = (if (n == 1) base
      else spark.range(n).toDF("k").crossJoin(base)
        .select(col("source"),
          concat(col("text"), lit(" r"), col("k")).as("text")))
      .localCheckpoint()
    val nd = docs.count()

    val a = shipped(docs)
    for ((nm, b) <- Seq("setAgg" -> setAgg(docs), "hpart" -> hpart(docs)))
      require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"px33 $nm diverged from the shipped self-join form")

    def t(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = graft.Bench.materialize(df)
      println(f"[px33] $label%-12s n=$n docs=$nd " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$r")
    }
    for (r <- 1 to 3) {
      t(s"shipped-$r")(shipped(docs))
      t(s"setagg-$r")(setAgg(docs))
      t(s"hpart-$r")(hpart(docs))
    }
    spark.stop()
  }
}
