package graft.tools

import graft.{GraftSession, Tables}
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** px71 first-gating adjudication probe (round 12): the r11
  * `repetitionSignals` computed per-doc math through FIVE exchanges
  * (pair groupBy, doc-keyed row_number window, per-(doc,shingle)
  * count window, a positional distinct, and a positional join); the
  * r12 kernel is a pure narrow map (sorted in-row arrays + fold
  * scans). This probe times both on the same corpus with full-output
  * forcing and asserts their outputs identical.
  *
  * Usage: sbt "runMain graft.tools.ProbePx71 [N]" — N replicas of the
  * sf0.1 documents table (default 1 = plain sf0.1; larger N shows the
  * gap under corpus growth). Results → probes/px71.log + BENCH_NOTES.
  */
object ProbePx71 {

  /** The r11 shuffle shape, verbatim (kept here for the A/B only). */
  def oldShape(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = docs.select(col("doc_id"),
      coalesce(filter(TextOps.tokensCol(col("text")), t => t =!= ""),
        array().cast("array<string>")).as("tk"))
      .withColumn("tot", expr(
        "aggregate(tk, CAST(0 AS BIGINT), (a, x) -> a + length(x))"))
    val pairs = tk
      .select(col("doc_id"), col("tot"), explode(expr(
        """zip_with(slice(tk, 1, greatest(size(tk) - 1, 0)),
          |         slice(tk, 2, greatest(size(tk) - 1, 0)),
          |  (x, y) -> struct(x AS a, y AS b))""".stripMargin)).as("p"))
      .groupBy(col("doc_id"), col("tot"),
        col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val top2 = pairs
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(desc("cnt"), asc("a"), asc("b"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), expr(
        "round(cnt * (length(a) + length(b)) / CAST(tot AS DOUBLE), 6)")
        .as("top2_frac"))
    val sh = tk.select(col("doc_id"),
      posexplode(TextOps.shinglesFromToks(col("tk"), 5)).as(Seq("i0", "s")))
    val dupPos = sh
      .withColumn("c", count(lit(1)).over(
        Window.partitionBy("doc_id", "s")))
      .filter(col("c") >= 2)
      .select(col("doc_id"),
        explode(sequence(col("i0") + 1, col("i0") + 5)).as("pos"))
      .distinct()
    val tkpos = tk
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"),
        length(col("tok")).as("len"))
    val dupChars = tkpos.join(dupPos, Seq("doc_id", "pos"))
      .groupBy("doc_id")
      .agg(expr("CAST(sum(len) AS BIGINT)").as("dchars"))
    tk.select(col("doc_id"), expr("CAST(size(tk) AS BIGINT)").as("n_tok"),
        col("tot"))
      .join(top2, Seq("doc_id"), "left")
      .join(dupChars, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"), col("tot").as("tot_chars"),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"),
        coalesce(expr(
          "round(dchars / CAST(nullif(tot, 0) AS DOUBLE), 6)"), lit(0.0))
          .as("dup5_char_frac"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables(spark, dir, "documents").select("doc_id", "text")
    val docs = (if (n == 1) base
      else spark.range(n).toDF("k").crossJoin(base)
        .select((col("doc_id") + col("k") * lit(10000000L)).as("doc_id"),
          col("text")))
      .localCheckpoint()
    val nd = docs.count()

    // outputs identical (checked once, full equality both directions)
    val a = graft.pipeline.TextMetrics.repetitionSignals(docs)
    val b = oldShape(docs)
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "px71 shapes diverged")

    def t(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = graft.Bench.materialize(df)
      println(f"[px71] $label%-12s n=$n docs=$nd ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$r")
    }
    for (r <- 1 to 3) {
      t(s"narrow-$r")(graft.pipeline.TextMetrics.repetitionSignals(docs))
      t(s"shuffle-$r")(oldShape(docs))
    }
    spark.stop()
  }
}
