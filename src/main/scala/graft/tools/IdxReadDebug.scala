package graft.tools

import graft.GraftSession
import graft.ir.{Index, Retrieval}
import org.apache.spark.sql.functions._

/** One-off read-side debug over an EXISTING sharded layout (no
  * rebuild): per-pass fs bytes for head / skewed / tail query sets,
  * plus the pushed-filter line of each scan — the disambiguator for
  * the r19 probe's byte-identical skewed pass.
  */
object IdxReadDebug {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def fsRead: Long = {
      import scala.jdk.CollectionConverters._
      org.apache.hadoop.fs.FileSystem.getAllStatistics.asScala
        .filter(_.getScheme == "file").map(_.getBytesRead).sum
    }
    val headQ = Retrieval.querySet
      .flatMap { case (qid, ts) => ts.map(qid -> _) }.toDF("qid", "term")
    val tailQ = Retrieval.querySet.map(_._1).flatMap(qid => Seq(
      qid -> s"w${qid.toInt % 1000}x0",
      qid -> s"w${qid.toInt % 1000}x${n / 2}")).toDF("qid", "term")
    val skewQ = headQ.unionByName(tailQ)
    def pass(name: String, q: org.apache.spark.sql.DataFrame): Unit = {
      val df = Index.scoreFromInverted(spark, path, q,
        Retrieval.lmdirPart, Retrieval.lmdirFinal, conjunctive = false, 10)
      val pushed = df.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("PushedFilters")).take(1)
        .mkString.replaceAll(".*PushedFilters", "PushedFilters").take(600)
      val f0 = fsRead
      val c = df.count()
      println(s"[dbg] $name rows=$c kb=${(fsRead - f0) >> 10}")
      println(s"[dbg] $name pushed: $pushed")
    }
    pass("head", headQ)
    pass("tail", tailQ)
    pass("skew", skewQ)
    // decisive: every (qid, doc) pair the tail-only pass matches must
    // also appear in the UNION query's un-truncated output — absence
    // means the tail postings were never read in the union pass
    val tailPairs = Index.scoreFromInverted(spark, path, tailQ,
      Retrieval.lmdirPart, Retrieval.lmdirFinal, conjunctive = false, 10)
      .select("qid", "doc_id")
    val skewAll = Index.scoreFromInverted(spark, path, skewQ,
      Retrieval.lmdirPart, Retrieval.lmdirFinal, conjunctive = false,
      10000000)
      .select("qid", "doc_id")
    val missing = tailPairs.join(skewAll, Seq("qid", "doc_id"),
      "left_anti").count()
    println(s"[dbg] tail pairs missing from union output: $missing")
    spark.stop()
  }
}
