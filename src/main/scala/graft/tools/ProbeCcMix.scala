package graft.tools
import graft.{GraftSession, Tables}
import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 exploration: px42's per-block work mix. Each block is
  * `steps` min-propagations + `jumps` pointer-jumps + the certifying
  * propagate; more work per block ⇒ fewer blocks (each an action +
  * checkpoint) but more shuffles per block. Sweeps a few mixes on the
  * sf0.1 candidate graph to find the knee.
  */
object ProbeCcMix {

  def cc(docs: DataFrame, edges: DataFrame, steps: Int, jumps: Int)
      : (DataFrame, Int) = {
    val ids = docs.select("doc_id")
    val bi = edges.select(col("d1").as("node"), col("d2").as("other"))
      .unionByName(edges.select(col("d2").as("node"), col("d1").as("other")))
      .unionByName(ids.select(col("doc_id").as("node"),
        col("doc_id").as("other")))
      .localCheckpoint()
    def step(l: DataFrame): DataFrame = bi
      .join(l.select(col("doc_id").as("other"), col("lbl").as("olbl")),
        Seq("other"))
      .groupBy(col("node").as("doc_id"))
      .agg(min("olbl").as("lbl"))
    def jump(l: DataFrame): DataFrame = l
      .join(l.select(col("doc_id").as("lbl"), col("lbl").as("plbl")),
        Seq("lbl"))
      .select(col("doc_id"), col("plbl").as("lbl"))
    def certify(l: DataFrame): DataFrame = bi
      .join(l.select(col("doc_id").as("other"), col("lbl").as("olbl")),
        Seq("other"))
      .groupBy(col("node").as("doc_id"))
      .agg(min("olbl").as("lbl"), max("olbl").as("mx"))
    var labels = ids.select(col("doc_id"), col("doc_id").as("lbl"))
    var block = 0
    var inconsistent = 1L
    while (inconsistent > 0 && block < 50) {
      var l = labels
      for (_ <- 1 to steps) l = step(l)
      for (_ <- 1 to jumps) l = jump(l)
      val flagged = certify(l).localCheckpoint()
      inconsistent = flagged.filter(col("lbl") =!= col("mx")).count()
      labels = flagged.drop("mx")
      block += 1
    }
    require(inconsistent == 0)
    (labels, block)
  }

  def main(args: Array[String]): Unit = {
    val s = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables(s, dir, "documents")
    docs.select(explode(split(lower(col("text")), "[^0-9a-z]+")).as("t"))
      .filter(col("t") =!= "").groupBy("t").count().count()
    val edges = Dedup.lshCandidates(docs).localCheckpoint()
    val mixes = Seq((3, 2), (4, 2), (2, 2), (3, 3), (5, 2), (2, 3))
    var golden: Array[String] = null
    for (r <- 1 to 2; (st, j) <- mixes) {
      val t0 = System.nanoTime()
      val (l, blocks) = cc(docs, edges, st, j)
      val n = l.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] steps=$st jumps=$j blocks=$blocks $dt%6.2f s rows=$n")
      if (r == 1 && (st, j) == mixes.head) golden = l.collect().map(_.toString).sorted
      else if (r == 1) {
        val got = l.collect().map(_.toString).sorted
        println(s"[probe]   equal=${golden.sameElements(got)}")
      }
    }
    s.stop()
  }
}
