package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 provider for WARC files: `spark.read.format("warc")
  * .load(path)` (SURVEY §2.1 S1's DSv2 option; parser shared with
  * [[Warc]]).
  *
  * One InputPartition per file — the correct granularity for a
  * non-splittable gzipped container: a 100 TB crawl of ~1 GB WARC
  * files yields ~100k parallel partitions, and Spark schedules them
  * like any other scan. Pushdown is structurally impossible for this
  * format (whole-file framing), so the ScanBuilder is deliberately
  * plain; column pruning still happens in the Project above the scan.
  *
  * Local-filesystem paths (file:// or bare). A production build would
  * thread the Hadoop configuration through a SerializableConfiguration
  * for HDFS/S3 — the connector surface is identical.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // load() with zero or several paths stores them under "paths"
    // (a JSON array), leaving "path" null — new Path(null) would then
    // fail at plan time with a message naming neither the source nor
    // the real problem (review r14). Name it: one path, use a glob
    // for many (the path spec expands through Hadoop globbing).
    val path = properties.get("path")
    require(path != null,
      "the warc source takes exactly ONE load(path) argument (got " +
        "none or several); pass one path — a directory or a glob " +
        "such as dir/*.warc.gz covers multiple files")
    // .option("allowEmpty", "true") downgrades a matched-but-empty
    // directory from a plan-time failure to a legal empty scan
    // (ADVICE r16): empty crawl segments are routine in incremental
    // layouts, but silent-empty stays opt-IN — a typo'd glob that
    // matches a real-but-empty dir should still fail loudly by default.
    val allowEmpty = java.lang.Boolean.parseBoolean(
      properties.getOrDefault("allowEmpty", "false"))
    new WarcTable(path, allowEmpty)
  }
}

object WarcDataSource {
  val schema: StructType = StructType(Seq(
    StructField("recordType", StringType),
    StructField("targetUri", StringType),
    StructField("trecId", StringType),
    StructField("date", StringType),
    StructField("contentType", StringType),
    StructField("headers", MapType(StringType, StringType)),
    StructField("content", StringType)))

  /** Expand a path spec (file, directory, or glob) into concrete
    * files — through Hadoop's FileSystem, like every other Spark
    * source: a `*.warc.gz`-style glob expands, a directory lists its
    * files, an unreadable/missing path fails LOUDLY at plan time
    * (FileNotFoundException) instead of per-task. java.io.File would
    * treat a glob as one literal non-existent file and NPE on an
    * unlistable directory.
    */
  def listFiles(path: String, allowEmpty: Boolean = false): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).filter(_.nonEmpty)
      .map(_.toSeq)
      // no glob match / literal path: getFileStatus throws
      // FileNotFoundException — the loud plan-time failure we want
      .getOrElse(Seq(fs.getFileStatus(p)))
    // RECURSE into subdirectories (review r16): crawls arrive as
    // per-segment directory trees, and the one-level listing silently
    // returned an EMPTY scan for /crawl/seg-*/part.warc.gz layouts —
    // the silent-empty failure mode this source's own comments argue
    // against. Hidden entries (_SUCCESS, .crc) skipped, as in Spark's
    // built-in file sources.
    // Symlink-cycle guard (ADVICE r16): on a local filesystem a
    // looping symlink under the scanned tree would otherwise recurse
    // to stack overflow. Directories are deduped by canonical identity
    // (resolves symlinks on file: paths); the depth bound backstops
    // schemes where no canonical form is available.
    val visited = scala.collection.mutable.Set[String]()
    def canonical(p: org.apache.hadoop.fs.Path): String = {
      val uri = p.toUri
      if (uri.getScheme == null || uri.getScheme == "file")
        try new java.io.File(uri.getPath).getCanonicalPath
        catch { case _: java.io.IOException => p.toString }
      else p.toString
    }
    def filesUnder(st: org.apache.hadoop.fs.FileStatus,
                   depth: Int): Seq[String] =
      if (st.isDirectory) {
        require(depth < 64,
          s"warc source: directory tree under '$path' exceeds depth 64 " +
            s"at '${st.getPath}' — likely a symlink cycle")
        if (!visited.add(canonical(st.getPath))) Seq.empty // cycle: seen
        else fs.listStatus(st.getPath).toSeq
          .filterNot { s =>
            val n = s.getPath.getName
            n.startsWith("_") || n.startsWith(".")
          }
          .flatMap(filesUnder(_, depth + 1))
      } else Seq(st.getPath.toString)
    val files = matched.flatMap(filesUnder(_, 0)).sorted
    require(allowEmpty || files.nonEmpty,
      s"warc source: path '$path' matched but contains no files " +
        "(pass .option(\"allowEmpty\", \"true\") if empty segments " +
        "are expected)")
    files
  }
}

final class WarcTable(path: String, allowEmpty: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"warc:$path"
  override def schema(): StructType = WarcDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = WarcDataSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        WarcDataSource.listFiles(path, allowEmpty)
          .map(WarcFilePartition(_): InputPartition)
          .toArray
      override def createReaderFactory(): PartitionReaderFactory = {
        // plan-time listing and run-time reads must resolve paths
        // against the SAME Hadoop conf: executors have no active
        // session, so a bare Configuration there would drop every
        // spark.hadoop.* setting (object-store credentials, fs
        // overrides) the driver-side listFiles used. Ship the
        // session's effective conf as plain serializable entries.
        import scala.jdk.CollectionConverters._
        val entries = org.apache.spark.sql.SparkSession.active
          .sessionState.newHadoopConf()
          .iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
        new WarcReaderFactory(entries)
      }
    }
}

final case class WarcFilePartition(file: String) extends InputPartition

final class WarcReaderFactory(val confEntries: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[WarcFilePartition].file
    new PartitionReader[InternalRow] {
      // open through Hadoop FS so the partition paths listFiles
      // produced (file:/…, hdfs://…) resolve on executors too, and
      // STREAM the records (review r16: this path used to materialize
      // the whole file AND an eager Seq of every record — a per-file
      // 2 GiB ceiling plus O(file + all records) memory, exactly what
      // the Warc.parseStream rework removed; one record in memory at
      // a time now, files unbounded, only an oversized RECORD hits
      // Warc.MaxRecordBytes). The conf is the driver session's
      // effective Hadoop conf, rebuilt from shipped entries —
      // Configuration(false) + a full entry copy, so credentials and
      // fs overrides behave exactly as they did at plan time.
      private val in = {
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val p = new org.apache.hadoop.fs.Path(file)
        p.getFileSystem(conf).open(p)
      }
      private val it = Warc.parseStream(in)
      private var cur: WarcDoc = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = {
        def s(v: String) = UTF8String.fromString(v)
        // one entry traversal for both arrays — mapping `Map.keys` (a
        // Set) to UTF8String would re-hash and scramble the key order
        // independently of the values
        val kvs = cur.headers.toArray
        val keys = new GenericArrayData(kvs.map(kv => s(kv._1): Any))
        val vals = new GenericArrayData(kvs.map(kv => s(kv._2): Any))
        InternalRow(s(cur.recordType), s(cur.targetUri), s(cur.trecId),
          s(cur.date), s(cur.contentType), new ArrayBasedMapData(keys, vals),
          s(cur.content))
      }
      // parseStream closes the stream on exhaustion and on parse
      // errors; this covers the abandoned-early case (LIMIT, task
      // kill) — closing twice is a safe no-op
      override def close(): Unit =
        try in.close() catch { case _: Throwable => () }
    }
  }
}
