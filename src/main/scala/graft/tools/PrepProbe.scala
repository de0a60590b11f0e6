package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scale rehearsal for `Jobs.PrepareTrainingData` (the composed
  * last-mile job): replicate the sf0.1 corpus N× with disjoint id
  * ranges (N=500 ⇒ 2.5M docs, the same treatment as the r6
  * `curateCorpus` rehearsal), run the WHOLE job — gate → exact+near
  * dedup → decontam → chunk → example dedup → epoch shards — and
  * report per-phase wall/cpu/shuffle/spill via the `prep:*` job
  * descriptions and `PhaseListener`. Usage:
  * `sbt "runMain graft.tools.PrepProbe [N]"`.
  */
object PrepProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val pl = new PhaseListener
    spark.sparkContext.addSparkListener(pl)

    val work = java.nio.file.Files.createTempDirectory("prep").toString
    val base = Tables(spark, dir, "documents").select("doc_id", "text")
    // Two corpus shapes:
    //  - plain replicas: byte-identical copies — exact dedup collapses
    //    500× immediately, so the rehearsal stresses the GATE and the
    //    collapsed dedup (the boilerplate-heavy-corpus regime);
    //  - `salt` mode: every 4th token carries a replica tag, so the
    //    copies are near-dup-DISTINCT (3-gram jaccard ~0.14) and the
    //    full doc population flows through chunk/example-dedup/reshard
    //    (the distinct-corpus regime).
    val replicated = spark.range(n).toDF("k").crossJoin(base)
      .select((col("doc_id") + col("k") * lit(10000000L)).as("doc_id"),
        col("k"), col("text"))
    val shaped =
      if (args.contains("salt"))
        replicated.select(col("doc_id"),
          expr("""array_join(transform(split(text, ' '),
                 |  (x, i) -> CASE WHEN i % 4 = 0
                 |    THEN concat(x, 'k', CAST(k AS STRING)) ELSE x END),
                 |  ' ')""".stripMargin).as("text"))
      else replicated.select("doc_id", "text")
    shaped.repartition(64)
      .write.mode("overwrite").parquet(s"$work/in")
    base.filter(col("doc_id") < 50)
      .write.mode("overwrite").parquet(s"$work/bench")
    val docs = spark.read.parquet(s"$work/in").count()

    val m = pl.mark()
    pl.resetHeap()
    val t0 = System.nanoTime()
    graft.jobs.Jobs.prepareTrainingData(spark, s"parquet:$work/in",
      s"$work/out", s"parquet:$work/bench", seed = 1, nShards = 64,
      win = 64, stride = 32)
    val sec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.Listeners.drain(spark.sparkContext)

    println(f"""[prep] {"n":$n,"docs":$docs,"total_sec":$sec%.1f,"peak_heap_mb":${pl.peakHeapMb}}""")
    pl.phaseTable(m).foreach { case (desc, t) =>
      println(s"""[prep] {"phase":"$desc","stage_wall_ms":${t.getOrElse("stage_wall_ms", 0L)},"cpu_s":${t.getOrElse("cpu_s", 0L)},"shuffle_write_mb":${t.getOrElse("shuffle_write_mb", 0L)},"spill_disk_mb":${t.getOrElse("spill_disk_mb", 0L)},"input_mb":${t.getOrElse("input_mb", 0L)},"peak_exec_mb":${t.getOrElse("peak_exec_mb", 0L)}}""")
    }
    val report = spark.read.text(s"$work/out_report")
      .collect().map(_.getString(0)).mkString
    println(s"""[prep] {"report":"$report"}""")
    spark.stop()
  }
}
