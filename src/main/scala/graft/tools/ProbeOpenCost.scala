package graft.tools

import graft.{Bench, GraftSession, SparkEntry, Tables}

/** §0m probe, part 2: at sf0.1 every table is ONE small parquet file
  * (documents 594 KB), and the default
  * spark.sql.files.openCostInBytes = 4 MB makes maxSplitBytes =
  * max(4 MB, bytes/parallelism) — so the whole file is a single scan
  * partition and the entire NARROW chain above it (tokenize → explode
  * → hash, the expensive part of the px text family) runs on one core
  * of 32 until the first exchange. Lowering open-cost splits small
  * files; at 100 TB files exceed maxPartitionBytes and the knob is
  * irrelevant, so this is scale-neutral, not SF-specific tuning.
  *
  * Measures scan-heavy queries under openCost ∈ {4 MB (default),
  * 256 KB, 64 KB, 16 KB}, 3 iterations each, plus scan partition
  * counts.
  */
object ProbeOpenCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    locally {
      import org.apache.spark.sql.functions._
      Tables(spark, sfDir, "documents")
        .select(explode(split(lower(col("text")), "[^0-9a-z]+")).as("t"))
        .filter(col("t") =!= "").groupBy("t").count().count()
      spark.catalog.clearCache()
    }
    val names = Seq("px04_jaccard_top", "px71_repetition_rules",
      "ir03_term_stats", "px68_ccnet_buckets", "px27_minhash_estimate",
      "px57_pii_redact", "q01_agg_sums")
    for (oc <- Seq(4L << 20, 256L << 10, 64L << 10, 16L << 10)) {
      spark.conf.set("spark.sql.files.openCostInBytes", oc.toString)
      // fresh read each time — the Tables cache (and the Dataset's own
      // lazy QueryExecution) would replay the FIRST setting's split
      // plan; and count non-EMPTY partitions too, because parquet
      // assigns a row group to the split holding its midpoint: with
      // single-row-group files, extra splits are empty tasks, not
      // parallelism
      val rdd = spark.read.parquet(s"$sfDir/documents.parquet")
        .queryExecution.toRdd
      val nonEmpty = rdd.mapPartitions(
        it => Iterator.single(if (it.hasNext) 1 else 0)).sum().toLong
      println(s"[oc] openCost=$oc documents scan partitions=" +
        s"${rdd.getNumPartitions} nonEmpty=$nonEmpty")
      for (n <- names; it <- 1 to 3) {
        val d = SparkEntry.decls.find(_.name == n).get
        spark.sparkContext.setJobDescription(s"$n oc=$oc")
        val t0 = System.nanoTime()
        Bench.materialize(d.run(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e6
        spark.catalog.clearCache()
        println(f"[oc] oc=$oc $n%-24s it=$it $dt%8.1f ms")
      }
    }
    spark.stop()
  }
}
