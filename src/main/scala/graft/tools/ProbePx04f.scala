package graft.tools
import graft.{GraftSession, Tables}
import graft.functions.DetHash
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Stage-cost breakdown for px04 (round 9): which part of the warm
  * 2.8 s is the shingle subtree, the distinct, the sh-agg, the pair
  * expand, the pair re-agg? Each count() below adds one stage over the
  * previous line; deltas localize the cost.
  */
object ProbePx04f {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cap = 1000
    Tables(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^0-9a-z]+")).as("t"))
      .filter(col("t") =!= "").groupBy("t").count().count()
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    // every stage forced with the full-output yardstick: count() lets
    // Catalyst prune whatever the row count doesn't need (the tokens
    // line's sum(n) is a 1-row agg whose count is a constant, so the
    // tokenize itself vanished; sh-agg's collect_list was pruned to
    // dfs) — the deltas then mislocate the cost between stages (§0g)
    def m(df: org.apache.spark.sql.DataFrame): Long =
      graft.Bench.materialize(df)
    def shingles = TextOps.shingleRows(Tables(s, dir, "documents"), 3)
      .select(col("doc_id"), DetHash.h60(col("s")).as("sh"))
    for (r <- 1 to 2) {
      t(s"scan-only-$r") { m(Tables(s, dir, "documents")) }
      t(s"tokens-$r") {
        m(Tables(s, dir, "documents")
          .select(col("doc_id"),
            size(split(lower(col("text")), "[^0-9a-z]+")).as(("n")))
          .agg(sum("n")))
      }
      t(s"shingle-rows-$r") { m(shingles) }
      t(s"distinct-$r") { m(shingles.distinct()) }
      t(s"sh-agg-$r") {
        m(shingles.distinct().groupBy("sh")
          .agg(sort_array(collect_list(col("doc_id"))).as("ids"),
            count(lit(1)).as("dfs"))
          .filter(col("dfs") <= cap))
      }
      t(s"pair-expand-$r") {
        m(shingles.distinct().groupBy("sh")
          .agg(sort_array(collect_list(col("doc_id"))).as("ids"),
            count(lit(1)).as("dfs"))
          .filter(col("dfs") <= cap)
          .select(explode(expr(
            "flatten(transform(ids, (x, i) -> " +
              "transform(slice(ids, i + 2, size(ids)), " +
              "y -> struct(x AS d1, y AS d2))))")).as("p")))
      }
      t(s"pair-agg-$r") {
        m(shingles.distinct().groupBy("sh")
          .agg(sort_array(collect_list(col("doc_id"))).as("ids"),
            count(lit(1)).as("dfs"))
          .filter(col("dfs") <= cap)
          .select(explode(expr(
            "flatten(transform(ids, (x, i) -> " +
              "transform(slice(ids, i + 2, size(ids)), " +
              "y -> struct(x AS d1, y AS d2))))")).as("p"))
          .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
          .groupBy("d1", "d2").agg(count(lit(1)).as("inter")))
      }
    }
    s.stop()
  }
}
