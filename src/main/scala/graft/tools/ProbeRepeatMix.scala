package graft.tools

import graft.{Bench, GraftSession, Tables}
import graft.pipeline.Sharding
import org.apache.spark.sql.functions._

/** Scale check for `Sharding.repeatBudgetMix` (px79): the op is
  * [[Sharding.temperatureSample]]'s cut machinery (probe-measured at
  * 10M skewed docs, `probes/skew.log`) plus a broadcast full-epoch
  * join and a narrow rep indicator — so its wall should track the
  * px69 cut-point numbers, not grow a new bottleneck. Same corpus
  * construction as SkewProbe: N× replicas, 90% of docs forced into
  * one dominant language (the web-corpus regime the de-skew exists
  * for). The plan/mix invariant (Σ rep = Σ allocated) is asserted at
  * every N.
  *
  * Usage: `sbt "runMain graft.tools.ProbeRepeatMix [N...]"`
  * (default 500 2000 ⇒ 2.5M and 10M docs).
  */
object ProbeRepeatMix {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(500, 2000)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- ns) {
      // lang+id only: the mix never reads text, and at real scale the
      // language column rides the metadata, not the payload
      val big = spark.range(n).toDF("k")
        .crossJoin(Tables(spark, dir, "documents").select("doc_id", "lang"))
        .select((col("doc_id") + col("k") * lit(10000000L)).as("doc_id"),
          when(pmod(xxhash64(col("doc_id") + col("k") * lit(10000000L)),
            lit(10)) < 9, lit("en")).otherwise(col("lang")).as("lang"))
        .repartition(32).localCheckpoint()
      val docs = big.count()
      val alloc = Sharding.repeatBudgetPlan(big, targetDiv = 1)
        .agg(sum("allocated")).head().getLong(0)
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        val mix = Sharding.repeatBudgetMix(big, targetDiv = 1)
        val rows = Bench.materialize(mix)
        val sec = (System.nanoTime() - t0) / 1e9
        val reps = mix.agg(sum("rep")).head().getLong(0)
        require(reps == alloc, s"rep accounting broke at n=$n: $reps != $alloc")
        println(f"""[repeatmix] {"n":$n,"docs":$docs,"run":$r,"sec":$sec%.2f,"rows":$rows,"sum_rep":$reps}""")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
