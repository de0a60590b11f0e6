package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Partition-pruned layout — the 100 TB table design (SURVEY §7,
  * builder brief "partition pruning"): a corpus written partitioned by
  * a predicate column is scanned with only the matching directories
  * touched, and the pruning is visible in the scan node.
  */
class PartitionPruningSpec extends SparkSpec {

  test("lang-partitioned corpus scan prunes to the filtered partition") {
    val dir = java.nio.file.Files.createTempDirectory("docs_bylang").toString
    Tables(spark, sfTiny, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)

    val langs = Tables(spark, sfTiny, "documents")
      .select("lang").distinct().count()
    assert(langs > 1, "need >1 partition for pruning to mean anything")

    // AQE wraps executed stages in leaf QueryStageExec nodes that hide
    // the scan from plan traversal; turn it off for this inspection.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val scan =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val q = spark.read.parquet(dir).filter(col("lang") === "en")
          .groupBy("source").agg(count(lit(1)).as("n"))
        // collect() drives THIS queryExecution so its scan metrics
        // populate (count() would spawn a separate execution).
        assert(q.collect().nonEmpty)
        q.queryExecution.executedPlan
          .collect { case s: FileSourceScanExec => s }.head
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    // partitionFilters carries the lang predicate...
    assert(scan.partitionFilters.nonEmpty,
      "lang filter must be a partition filter, not a data filter")
    // ...and the scan's numFiles metric (populated by the count above)
    // shows only the lang=en directory was read.
    def countFiles(sub: String): Int = {
      val d = new java.io.File(dir)
      d.listFiles().filter(f => sub.isEmpty || f.getName.startsWith(sub))
        .flatMap(f => if (f.isDirectory) f.listFiles() else Array(f))
        .count(_.getName.endsWith(".parquet"))
    }
    val enFiles = countFiles("lang=en")
    val allFiles = countFiles("")
    assert(allFiles > enFiles, "other lang partitions must exist")
    assert(scan.metrics("numFiles").value == enFiles,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"expected only the $enFiles lang=en files (of $allFiles)")
  }

  test("IVF cid-partitioned corpus: probe query scans ONLY the probed lists") {
    // The deployed billion-vector layout end-to-end: centroid
    // assignment as the parquet partition column, probe query's
    // literal cid IN (...) predicate pruning non-probed lists at the
    // scan — the storage realization of IVF's candidate cut.
    import graft.pipeline.Ann
    val emb = Tables(spark, sfTiny, "embeddings")
    val cents = Ann.kmeansCentroids(emb, kClusters = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf_bycid").toString
    Ann.writeIvfPartitioned(emb, cents, dir)
    val queries = emb.filter(col("vec_id") < 3)

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val (scan, rows) =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val q = Ann.ivfTopKPartitioned(spark, dir, cents, queries,
          nprobe = 2, k = 5)
        val rows = q.collect()
        (q.queryExecution.executedPlan
          .collect { case s: FileSourceScanExec => s }.head, rows)
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)

    assert(rows.nonEmpty)
    assert(scan.partitionFilters.nonEmpty,
      "cid IN (...) must land as a partition filter, not a data filter")
    // ≤ 3 queries × nprobe=2 distinct lists of the 8 written
    val probedDirs = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cid="))
    assert(probedDirs == 8, s"8 inverted-list partitions written: $probedDirs")
    val filesRead = scan.metrics("numFiles").value
    def filesUnder(sub: String): Int = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(sub))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(filesRead < filesUnder("cid="),
      s"pruned scan must read a strict subset of the $probedDirs lists " +
        s"(read $filesRead of ${filesUnder("cid=")} files)")

    // ranking semantics identical to the in-memory ivfTopK
    val asg = Ann.ivfAssign(emb, cents)
    val expected = Ann.ivfTopK(emb, cents, asg, queries, nprobe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      == expected, "partitioned path must reproduce ivfTopK's ranking")
  }

  test("IVFADC cid-partitioned CODES: probe query scans only the probed lists") {
    // The billion-vector IVFADC storage shape: residual codes (blocks
    // bytes per vector) partitioned by list id, probe query's literal
    // cid IN (...) pruning non-probed lists — the IVF candidate cut
    // and the 32x codes-only storage cut composed in one layout.
    import graft.pipeline.Ann
    val emb = Tables(spark, sfTiny, "embeddings")
    val cents = Ann.kmeansCentroids(emb, kClusters = 8, iters = 1)
    val resid = Ann.ivfResiduals(emb, cents)
    val rcb = Ann.pqTrain(resid, blocks = 8, kCodes = 8, iters = 2,
      idCol = "vid", embCol = "res")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_bycid").toString
    Ann.writeIvfPqPartitioned(resid, rcb, dir)
    val queries = emb.filter(col("vec_id") < 3)

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val (scan, rows) =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val q = Ann.ivfAdcTopKPartitioned(spark, dir, cents, rcb, queries,
          nprobe = 2, k = 5)
        val rows = q.collect()
        (q.queryExecution.executedPlan
          .collect { case s: FileSourceScanExec => s }.head, rows)
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)

    assert(rows.nonEmpty)
    assert(scan.partitionFilters.nonEmpty,
      "cid IN (...) must land as a partition filter, not a data filter")
    val listDirs = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cid="))
    assert(listDirs == 8, s"8 inverted-list partitions written: $listDirs")
    def filesUnder(sub: String): Int = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(sub))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(scan.metrics("numFiles").value < filesUnder("cid="),
      s"pruned scan must read a strict subset of the $listDirs lists " +
        s"(read ${scan.metrics("numFiles").value} of " +
        s"${filesUnder("cid=")} files)")

    // ranking identical to the in-memory ivfAdcTopK over the same codes
    val expected = Ann.ivfAdcTopK(Ann.ivfPqEncode(resid, rcb), cents, rcb,
      queries, nprobe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      == expected,
      "partitioned codes path must reproduce ivfAdcTopK's ranking")
  }

  test("OPQ-rotated IVFADC over the cid-partitioned layout: pruning " +
    "holds and ranking matches the in-memory rotated path (r17 " +
    "verdict item 3 — the deployed layout's parity with a NON-empty " +
    "rotation, not just the in-memory one)") {
    import graft.pipeline.Ann
    val emb = Tables(spark, sfTiny, "embeddings")
    val cents = Ann.kmeansCentroids(emb, kClusters = 8, iters = 1)
    val resid = Ann.ivfResiduals(emb, cents)
    val m = Ann.opqTrainRotation(resid, blocks = 8, kCodes = 8,
      lloydIters = 2, opqIters = 4, idCol = "vid", embCol = "res")
    assert(m.rotation.zipWithIndex.exists { case (row, i) =>
      row.zipWithIndex.exists { case (v, j) =>
        math.abs(v - (if (i == j) 1.0 else 0.0)) > 1e-9 } },
      "the learned rotation must be non-trivial for this case to pin " +
        "anything the identity case doesn't")
    val residRot = Ann.rotateVec(resid, m.rotation, "res", "res")
    val rcb = Ann.pqTrain(residRot, blocks = 8, kCodes = 8, iters = 2,
      idCol = "vid", embCol = "res")
    val dir =
      java.nio.file.Files.createTempDirectory("ivfpq_opq_bycid").toString
    Ann.writeIvfPqPartitioned(residRot, rcb, dir)
    val queries = emb.filter(col("vec_id") < 3)

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val (scan, rows) =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val q = Ann.ivfAdcTopKPartitioned(spark, dir, cents, rcb, queries,
          nprobe = 2, k = 5, rotation = m.rotation)
        val rows = q.collect()
        (q.queryExecution.executedPlan
          .collect { case s: FileSourceScanExec => s }.head, rows)
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)

    assert(rows.nonEmpty)
    assert(scan.partitionFilters.nonEmpty,
      "cid IN (...) must stay a partition filter on the rotated path")
    def filesUnder(sub: String): Int = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(sub))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(scan.metrics("numFiles").value < filesUnder("cid="),
      "rotated probe query must still read a strict subset of lists")

    // parity with the in-memory rotated search over the same codes
    val expected = Ann.ivfAdcTopK(Ann.ivfPqEncode(residRot, rcb), cents,
      rcb, queries, nprobe = 2, k = 5, rotation = m.rotation)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      == expected,
      "partitioned rotated path must reproduce the in-memory rotated " +
        "ranking")
  }
}
