package graft.tools
import graft.{GraftSession, Tables}
import graft.functions.DetHash
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ProbePx04c {
  def body(s: SparkSession, dir: String, eager: Boolean): DataFrame = {
    val ds0 = TextOps.shingleRows(Tables(s, dir, "documents"), 3)
      .select(col("doc_id"), DetHash.h60(col("s")).as("sh"))
      .distinct()
    val ds = if (eager) { val p = ds0.persist(); p.count(); p } else ds0
    val sizes = ds.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = ds.groupBy("sh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"),
        count(lit(1)).as("dfs"))
      .filter(col("dfs") <= 1000)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), " +
          "y -> struct(x AS d1, y AS d2))))")).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sa")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sb")), Seq("d2"))
      .withColumn("jac", expr("round(inter / (sa + sb - inter), 6)"))
      .orderBy(desc("jac"), asc("d1"), asc("d2"))
      .limit(20).select("d1", "d2", "inter", "jac")
  }
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Tables(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^0-9a-z]+")).as("t"))
      .filter(col("t") =!= "").groupBy("t").count().count()
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    for (r <- 1 to 3) {
      // materialize (not count — the jac/inter output columns must
      // stay in the timed plan, §0g); clearCache outside the timer —
      // unpersist is real work only in the eager arm
      t(s"eager-$r")(graft.Bench.materialize(body(s, dir, eager = true)))
      s.catalog.clearCache()
      t(s"lazy-$r")(graft.Bench.materialize(body(s, dir, eager = false)))
      s.catalog.clearCache()
    }
    s.stop()
  }
}
