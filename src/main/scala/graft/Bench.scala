package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * A warmup action first — JVM/classloader/codegen startup otherwise
  * lands entirely on whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: exercise the scan + hash-agg + window + broadcast-join +
    // tokenize/explode + native-kernel codegen paths once, so JIT and
    // Janino startup don't land on whichever queries run first (q01–q03
    // measured ~1 s high with a bare count() warmup).
    {
      import org.apache.spark.sql.functions._
      val li = Tables(spark, sfDir, "lineitem")
      li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"))
        .withColumn("r", expr("row_number() OVER (ORDER BY n DESC)"))
        .count()
      li.join(broadcast(Tables(spark, sfDir, "orders").limit(1000)),
        col("l_orderkey") === col("o_orderkey")).count()
      Tables(spark, sfDir, "documents")
        .select(explode(split(lower(col("text")), "[^0-9a-z]+")).as("t"))
        .filter(col("t") =!= "").groupBy("t").count().count()
      Tables(spark, sfDir, "embeddings")
        .select(expr("norm2_f64(embedding)").as("n")).agg(sum("n")).count()
      spark.catalog.clearCache()
    }

    val results = SparkEntry.decls.map { d =>
      val t0 = System.nanoTime()
      try d.run(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${d.name} failed: ${e.getMessage}")
        -1L
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Queries with shared subtrees persist() them; drop those caches
      // before the next query so timings stay independent (no
      // cross-query subsidy) and memory doesn't accumulate.
      spark.catalog.clearCache()
      d.name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
