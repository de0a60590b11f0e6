package graft.tools

import graft.GraftSession

/** Dev scratchpad: schema/plan probes against the local testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val p11 = "((n11 + 0.25) / (n_docs + 1.0))"
    val px = "((df1 + 0.5) / (n_docs + 1.0))"
    val py = "((df2 + 0.5) / (n_docs + 1.0))"
    val p10 = "((df1 - n11 + 0.25) / (n_docs + 1.0))"
    val p01 = "((df2 - n11 + 0.25) / (n_docs + 1.0))"
    val p00 = "((n_docs - df1 - df2 + n11 + 0.25) / (n_docs + 1.0))"
    val emim = s"$p11 * log2($p11 / ($px * $py)) + $p10 * log2($p10 / ($px * (1 - $py))) + $p01 * log2($p01 / ((1 - $px) * $py)) + $p00 * log2($p00 / ((1 - $px) * (1 - $py)))"
    val npmi = s"log2($p11 / ($px * $py)) / (-log2($p11))"
    val df = spark.sql(
      s"""SELECT $emim AS emim, $npmi AS npmi,
         |  $p11 AS p11v, log2($p11) AS l2,
         |  $p11 * log2($p11 / ($px * $py)) AS t11
         |FROM (SELECT CAST(319 AS BIGINT) AS n11, CAST(388 AS BIGINT) AS df1,
         |      CAST(397 AS BIGINT) AS df2, CAST(500 AS BIGINT) AS n_docs)""".stripMargin)
    df.collect().foreach(r => println("PROBE: " + (0 until r.length).map(i => r.get(i)).mkString(" | ")))
    spark.stop()
  }
}
