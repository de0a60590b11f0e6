package graft.tools
import graft.{GraftSession, Tables}
import graft.functions.DetHash
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** px04 round-10 A/B — the one untested lever from the r9 verdict:
  * materialize the hashed (doc_id, sh) stream ONCE per action
  * (`localCheckpoint`, eager) so the sizes branch and the pair branch
  * read it instead of each recomputing tokenize→shingle→h60, vs the
  * shipped recompute-both-branches shape. Earlier A/Bs retired lazy
  * `.persist()` (storms, ProbePx04c); eager localCheckpoint is the
  * remaining variant. Prints warm pairs for both shapes.
  */
object ProbePx04g {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cap = 1000

    def raw = TextOps.shingleRows(Tables(s, dir, "documents"), 3)
      .select(col("doc_id"), DetHash.h60(col("s")).as("sh"))

    def finish(src: DataFrame): Long = {
      val sizes = src.groupBy("doc_id")
        .agg(size(collect_set(col("sh"))).as("sz"))
      val inter = src.groupBy("sh")
        .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) <= cap)
        .select(explode(expr(
          "flatten(transform(ids, (x, i) -> " +
            "transform(slice(ids, i + 2, size(ids)), " +
            "y -> shiftleft(x, 32) + y)))")).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("inter"))
        .select(expr("shiftright(pk, 32)").as("d1"),
          expr("pk & 4294967295").as("d2"), col("inter"))
      val out = inter
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sa")), Seq("d1"))
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sb")), Seq("d2"))
        .withColumn("jac", expr("round(inter / (sa + sb - inter), 6)"))
        .orderBy(desc("jac"), asc("d1"), asc("d2"))
        .limit(20).select("d1", "d2", "inter", "jac")
      // full-output forcing (r12; BENCH_NOTES 0g) — the r10 runs of
      // this probe drove with count(), which pruned the jac column
      graft.Bench.materialize(out)
    }

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    Tables(s, dir, "documents").count() // warmup
    // pass `ckptfirst` to flip the order: round 1 carries the session's
    // first-codegen cost, so each shape must be measured holding lane 1
    val ckptFirst = args.contains("ckptfirst")
    def one(r: Int, mode: String): Unit = mode match {
      case "eager" => t(s"ckptE-$r") {
        val m = raw.localCheckpoint() // eager: build cost inside the timer
        val n = finish(m)
        m.unpersist(blocking = true)
        n
      }
      case "lazy" => t(s"ckptL-$r") {
        // r12: the px27 re-adjudication (BENCH_NOTES 0h) showed LAZY
        // localCheckpoint beating both recompute and the eager build
        val m = raw.localCheckpoint(false)
        val n = finish(m)
        m.unpersist(blocking = true)
        n
      }
      case _ => t(s"recompute-$r") { finish(raw) }
    }
    val modes0 = Seq("recompute", "eager", "lazy")
    val modes = if (ckptFirst) modes0.reverse else modes0
    for (r <- 1 to 3; m <- modes) one(r, m)
    s.stop()
  }
}
