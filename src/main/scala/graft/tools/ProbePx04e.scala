package graft.tools
import graft.{GraftSession, Tables}
import graft.functions.DetHash
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 A/B of px04_jaccard_top (VERDICT r8 item 2 — the one
  * perf-weak query: ~2.7 s warm vs DuckDB ~0.5 s).
  *
  * Hypothesis: the cost is the shingle subtree (scan + tokenize +
  * shingle + distinct) computed ONCE PER CONSUMER — `sizes` and
  * `inter` each recompute it (round-4 A/B rejected persist, but never
  * tried restructuring so only one subtree exists).
  *
  * C (setagg): ONE doc-keyed `collect_set` pass replaces `distinct`;
  *   sizes fall out of the same aggregate for free, and the
  *   (sh, doc_id) stream for pair expansion is re-derived by exploding
  *   the set — the scan/tokenize feeds exactly one exchange, which AQE
  *   can reuse across both consumers (same subtree, same exchange).
  * D (arrays): the r6 sketch — per-doc sorted shingle arrays, DISTINCT
  *   candidate pairs, join pairs to the two array columns, intersection
  *   as `size(array_intersect)` (one narrow kernel, no pair re-agg).
  */
object ProbePx04e {
  private def finishJac(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("jac", expr("round(inter / (sa + sb - inter), 6)"))
      .orderBy(desc("jac"), asc("d1"), asc("d2"))
      .limit(20).select("d1", "d2", "inter", "jac")

  /** A: committed px04 shape (baseline). */
  def grouped(s: SparkSession, dir: String, cap: Int): DataFrame = {
    val ds = TextOps.shingleRows(Tables(s, dir, "documents"), 3)
      .select(col("doc_id"), DetHash.h60(col("s")).as("sh"))
      .distinct()
    val sizes = ds.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = ds.groupBy("sh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"),
        count(lit(1)).as("dfs"))
      .filter(col("dfs") <= cap)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), " +
          "y -> struct(x AS d1, y AS d2))))")).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    finishJac(inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sa")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sb")), Seq("d2")))
  }

  /** Per-doc shingle-set aggregate — the single subtree C and D share. */
  private def docSets(s: SparkSession, dir: String): DataFrame =
    TextOps.shingleRows(Tables(s, dir, "documents"), 3)
      .select(col("doc_id"), DetHash.h60(col("s")).as("sh"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("sh"))).as("arr"))
      .withColumn("sz", size(col("arr")))

  /** C: single-subtree restructure of A. */
  def setagg(s: SparkSession, dir: String, cap: Int): DataFrame = {
    val dsets = docSets(s, dir)
    val inter = dsets
      .select(col("doc_id"), explode(col("arr")).as("sh"))
      .groupBy("sh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"),
        count(lit(1)).as("dfs"))
      .filter(col("dfs") <= cap)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), " +
          "y -> struct(x AS d1, y AS d2))))")).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    finishJac(inter
      .join(dsets.select(col("doc_id").as("d1"), col("sz").as("sa")), Seq("d1"))
      .join(dsets.select(col("doc_id").as("d2"), col("sz").as("sb")), Seq("d2")))
  }

  /** D: candidate pairs + array_intersect (r6 sketch). The intersect
    * must count only sub-cap shingles to match the oracle, so the
    * joined arrays are the CAPPED ones; sizes stay exact.
    */
  def arrays(s: SparkSession, dir: String, cap: Int): DataFrame = {
    val dsets = docSets(s, dir)
    val exploded = dsets.select(col("doc_id"), explode(col("arr")).as("sh"))
    val ok = exploded.groupBy("sh").agg(count(lit(1)).as("dfs"))
      .filter(col("dfs") <= cap).select("sh")
    val capped = exploded.join(ok, Seq("sh"))
      .groupBy("doc_id").agg(sort_array(collect_set(col("sh"))).as("carr"))
    val cands = exploded.join(ok, Seq("sh"))
      .groupBy("sh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), " +
          "y -> struct(x AS d1, y AS d2))))")).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
    finishJac(cands
      .join(capped.select(col("doc_id").as("d1"), col("carr").as("a1")), Seq("d1"))
      .join(capped.select(col("doc_id").as("d2"), col("carr").as("a2")), Seq("d2"))
      .withColumn("inter", size(array_intersect(col("a1"), col("a2"))))
      .join(dsets.select(col("doc_id").as("d1"), col("sz").as("sa")), Seq("d1"))
      .join(dsets.select(col("doc_id").as("d2"), col("sz").as("sb")), Seq("d2"))
      .select("d1", "d2", "inter", "sa", "sb"))
  }

  /** E: no `distinct` exchange at all — dedupe happens inside each
    * aggregate (`collect_set` within sh groups ≡ distinct (doc_id, sh)
    * then collect_list; per-doc distinct count ≡ set size). The raw
    * shingle stream is narrow, so each branch re-derives it cheaply.
    */
  def setNoDistinct(s: SparkSession, dir: String, cap: Int): DataFrame = {
    val raw = TextOps.shingleRows(Tables(s, dir, "documents"), 3)
      .select(col("doc_id"), DetHash.h60(col("s")).as("sh"))
    val sizes = raw.groupBy("doc_id")
      .agg(size(collect_set(col("sh"))).as("sz"))
    val inter = raw.groupBy("sh")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= cap)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), " +
          "y -> struct(x AS d1, y AS d2))))")).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    finishJac(inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sa")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sb")), Seq("d2")))
  }

  /** F: E + ordered pairs packed into ONE bigint (d1<<32 | d2) so the
    * pair shuffle moves half the bytes and aggregates on a single long
    * key; unpacked only for the final 20 rows.
    */
  def packed(s: SparkSession, dir: String, cap: Int): DataFrame = {
    val raw = TextOps.shingleRows(Tables(s, dir, "documents"), 3)
      .select(col("doc_id"), DetHash.h60(col("s")).as("sh"))
    val sizes = raw.groupBy("doc_id")
      .agg(size(collect_set(col("sh"))).as("sz"))
    val inter = raw.groupBy("sh")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= cap)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), " +
          "y -> shiftleft(x, 32) + y)))")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("inter"))
      .select(expr("shiftright(pk, 32)").as("d1"),
        expr("pk & 4294967295").as("d2"), col("inter"))
    finishJac(inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sa")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sb")), Seq("d2")))
  }

  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cap = 1000
    Tables(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^0-9a-z]+")).as("t"))
      .filter(col("t") =!= "").groupBy("t").count().count()
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    val order = sys.env.getOrElse("SPARK_GRAFT_AB_ORDER", "acd")
    for (r <- 1 to 3; v <- order) v match {
      case 'a' => t(s"grouped-$r") { grouped(s, dir, cap).count() }
      case 'c' => t(s"setagg-$r") { setagg(s, dir, cap).count() }
      case 'd' => t(s"arrays-$r") { arrays(s, dir, cap).count() }
      case 'e' => t(s"nodistinct-$r") { setNoDistinct(s, dir, cap).count() }
      case 'f' => t(s"packed-$r") { packed(s, dir, cap).count() }
      case _ =>
    }
    val a = grouped(s, dir, cap).collect().map(_.toString).sorted
    for ((nm, f) <- Seq("c" -> setagg _, "d" -> arrays _,
        "e" -> setNoDistinct _, "f" -> packed _)) {
      val v = f(s, dir, cap).collect().map(_.toString).sorted
      println(s"[probe] equal a==$nm: ${a.sameElements(v)}")
    }
    s.stop()
  }
}
