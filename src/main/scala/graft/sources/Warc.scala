package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream,
  InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{Dataset, SparkSession}

/** One WARC record (schema per SURVEY.md §1.1).
  *
  * `content` is the raw record payload — for `response` records that is
  * the HTTP response (headers + body), exactly what the reference's
  * `WarcRecord.getContentUTF8` hands downstream.
  */
final case class WarcDoc(
    recordType: String,
    targetUri: String,
    trecId: String,
    date: String,
    contentType: String,
    headers: Map[String, String],
    content: String)

/** WARC 0.18 reader (clean-room; behavior of
  * `edu/cmu/lemurproject/WarcRecord.java:88-308` +
  * `WarcFileRecordReader.java:73-162`).
  *
  * Format (public spec, WarcFileFormat-0.18): records start with a
  * `WARC/<version>` line, then `Key: Value` header lines up to a blank
  * line, then exactly `Content-Length` bytes of payload.
  *
  * Scale design: WARC.gz is non-splittable (the reference forces one
  * map task per file, `WarcFileInputFormat.java:52-55`); the unit of
  * parallelism is the *file* — thousands of parts in parallel on a
  * cluster. Records are framed DIRECTLY off the (gunzipping) input
  * stream (r16, closing the r15 verdict's item 3): the parser holds
  * one record in memory at a time, so file size is unbounded — only a
  * single oversized RECORD hits the loud [[MaxRecordBytes]] ceiling.
  * For repeated analytics, materialize the parsed result to Parquet
  * once (SURVEY §7.4 risk 5).
  *
  * Divergence note: the reference hand-rolls a byte-wise UTF-8 line
  * reader tolerant of malformed ClueWeb09 headers
  * (`WarcRecord.java:88-167`); we decode ISO-8859-1 (byte-transparent,
  * so Content-Length byte counts stay valid) and tolerate colon-less
  * header lines by skipping them.
  */
object Warc {

  /** Per-RECORD size ceiling of this parser: a record's payload is
    * surfaced as one ISO-8859-1 String, so the JVM array cap applies
    * to the record. Records declaring more than this fail loudly
    * rather than being silently truncated/emptied. Files have NO
    * ceiling — records are framed off the stream one at a time.
    */
  val MaxRecordBytes: Long = Int.MaxValue.toLong - 16

  private val Magic: Array[Byte] =
    "WARC/".getBytes(StandardCharsets.ISO_8859_1)

  /** Frame every record off an input stream (gzip auto-detected by
    * magic bytes; multi-member .gz concatenations decompress fully,
    * as `GZIPInputStream` chains members). One record is held in
    * memory at a time. The stream is closed on exhaustion and on any
    * parse error; a consumer that ABANDONS the iterator early owns
    * the close (Spark callers below register a task-completion hook).
    *
    * Junk bytes before/between records are skipped (scan to the next
    * `WARC/` magic), mirroring the reference reader's resync
    * behavior; a trailing `WARC/` with no version-line newline is
    * dropped silently (EOF mid-magic-line), also as before.
    */
  def parseStream(in0: InputStream): Iterator[WarcDoc] = {
    val pb = new PushbackInputStream(in0, 2)
    // the sniff reads and the GZIPInputStream constructor (which
    // consumes the gzip header) can all throw — close the stream on
    // the way out or the caller leaks an fd per corrupt file
    val in: InputStream =
      try {
        val b0 = pb.read(); val b1 = pb.read()
        if (b1 >= 0) pb.unread(b1)
        if (b0 >= 0) pb.unread(b0)
        if (b0 == 0x1f && b1 == 0x8b)
          new BufferedInputStream(new GZIPInputStream(pb, 1 << 16), 1 << 16)
        else new BufferedInputStream(pb, 1 << 16)
      } catch {
        case e: Throwable =>
          try pb.close() catch { case _: Throwable => () }
          throw e
      }

    new Iterator[WarcDoc] {
      // pos = DECOMPRESSED byte offset consumed so far; error messages
      // carry the record-start offset, same coordinate system as the
      // pre-r16 whole-file parser used
      private var pos = 0L
      private var closed = false
      private var nextDoc: WarcDoc = _
      private var ready = false

      private def closeIn(): Unit =
        if (!closed) { closed = true; try in.close() catch { case _: Throwable => () } }

      private def read1(): Int = {
        val b = in.read()
        if (b >= 0) pos += 1
        b
      }

      /** Scan to just past the next `WARC/` magic; false at EOF. The
        * pattern's bytes are pairwise distinct, so the restart rule on
        * mismatch is exact: re-match from 1 iff the byte is 'W'.
        */
      private def seekMagic(): Boolean = {
        var m = 0
        while (m < Magic.length) {
          val b = read1()
          if (b < 0) return false
          if (b == Magic(m)) m += 1
          else m = if (b == Magic(0)) 1 else 0
        }
        true
      }

      /** One ISO-8859-1 line (terminator consumed, `\r` stripped);
        * null at EOF-before-any-byte; EOF mid-line yields the partial
        * line (the caller's blank-line bookkeeping then refuses, same
        * as the whole-file parser's headers-past-EOF path).
        */
      private def readLine(): String = {
        val sb = new java.lang.StringBuilder(64)
        var b = read1()
        if (b < 0) return null
        while (b >= 0 && b != '\n') { sb.append(b.toChar); b = read1() }
        val n = sb.length
        if (n > 0 && sb.charAt(n - 1) == '\r') sb.setLength(n - 1)
        sb.toString
      }

      private def advance(): Unit = {
        ready = false
        if (closed) return
        // the WHOLE advance is close-on-error (review r16): a gzip
        // CRC/format error surfaces from read1() inside seekMagic or
        // the version-line scan too, not only from the header/payload
        // section — the doc contract is "closed on any parse error"
        try {
        if (!seekMagic()) { closeIn(); return }
        val start = pos - Magic.length
        // rest of the WARC/<version> line; EOF before its newline =
        // no record (trailing fragment dropped, pre-r16 behavior)
        var b = read1()
        var sawEol = false
        while (b >= 0 && !sawEol) { if (b == '\n') sawEol = true else b = read1() }
        if (!sawEol) { closeIn(); return }
          val headers = scala.collection.mutable.LinkedHashMap[String, String]()
          var blank = false
          var line = readLine()
          while (!blank && line != null) {
            if (line.isEmpty) blank = true
            else {
              val c = line.indexOf(':')
              if (c > 0)
                headers(line.substring(0, c).trim) = line.substring(c + 1).trim
              // colon-less header lines tolerated (skipped), mirroring
              // the reference's malformed-header tolerance.
              line = readLine()
            }
          }
          if (!blank)
            throw new IllegalArgumentException(
              s"WARC record at offset $start is TRUNCATED: headers run " +
                "past EOF with no blank separator line — partial " +
                "file/shard; re-fetch or drop the trailing record")
          def h(key: String): String =
            headers.collectFirst {
              case (k, v) if k.equalsIgnoreCase(key) => v
            }.getOrElse("")
          // Length stays Long until bounded: a record >= 2 GiB must not
          // silently wrap to a negative Int. Missing/unparsable/negative
          // Content-Length is ALSO loud (the header is mandatory per
          // ISO 28500): a zero guess both loses the payload AND resumes
          // the scan INSIDE it, so any literal "WARC/" in the body would
          // be minted into a fake record — silent corpus corruption.
          // (The reference's Lemur reader silently stops the file at the
          // first such record — truncation instead of corruption; we
          // refuse instead.)
          val rawLen = h("Content-Length")
          val len = rawLen.toLongOption.filter(_ >= 0).getOrElse(
            throw new IllegalArgumentException(
              s"WARC record at offset $start has missing/unparsable/" +
                s"negative Content-Length '$rawLen' (mandatory header); " +
                "refusing to guess — fix or drop the record upstream"))
          if (len > MaxRecordBytes)
            throw new IllegalArgumentException(
              s"WARC record at offset $start declares Content-Length $len " +
                s"> supported per-record ceiling $MaxRecordBytes (the " +
                "record surfaces as one String; split oversized records " +
                "upstream)")
          val payload = new Array[Byte](len.toInt)
          val got = in.readNBytes(payload, 0, payload.length)
          pos += got
          if (got < len)
            throw new IllegalArgumentException(
              s"WARC record at offset $start is TRUNCATED: declares " +
                s"Content-Length $len but only $got bytes remain — " +
                "partial file/shard; re-fetch or drop the trailing record")
          nextDoc = WarcDoc(
            recordType = h("WARC-Type"),
            targetUri = h("WARC-Target-URI"),
            trecId = h("WARC-TREC-ID"),
            date = h("WARC-Date"),
            contentType = h("Content-Type"),
            headers = headers.toMap,
            content = new String(payload, StandardCharsets.ISO_8859_1))
          ready = true
        } catch { case e: Throwable => closeIn(); throw e }
      }

      override def hasNext: Boolean = {
        if (!ready && !closed) advance()
        ready
      }
      override def next(): WarcDoc = {
        if (!hasNext) throw new NoSuchElementException("exhausted WARC stream")
        ready = false
        nextDoc
      }
    }
  }

  /** Parse every record in one in-memory WARC file (optionally
    * gzipped). Kept for golden tests and small-file callers; the
    * distributed paths below stream.
    */
  def parseRecords(raw: Array[Byte]): Seq[WarcDoc] =
    parseStream(new ByteArrayInputStream(raw)).toSeq

  /** Register stream close with the running task (executor-side): a
    * `limit`/early-exit consumer abandons flatMap iterators, and the
    * file handle must not wait for GC.
    */
  private def closeOnTaskEnd(close: () => Unit): Unit =
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => close()))

  /** Distributed read: one task per (possibly gzipped) WARC file,
    * ALWAYS through the streaming [[readLarge]] path (VERDICT r16
    * item 3): the former `binaryFile`-based variant materialized each
    * file's bytes, inheriting Spark's ~2 GiB per-file cap on the
    * COMPRESSED size — a cap a caller could hit simply by picking the
    * wrong method on a big crawl shard. There is no caller-visible
    * difference: same records, same order within a file, one task per
    * file either way (gzip is not splittable), and only one record is
    * in memory at a time instead of the whole file.
    */
  def read(spark: SparkSession, path: String): Dataset[WarcDoc] =
    readLarge(spark, path)

  /** Fully-streaming distributed read: one task per file, the file
    * NEVER materialized — compressed or decompressed size is
    * unbounded (per-record ceiling only). Built on
    * `sparkContext.binaryFiles`' `PortableDataStream`, the handle-only
    * file abstraction; this is the genuine per-partition imperative
    * case where the RDD API is the right tool.
    */
  def readLarge(spark: SparkSession, path: String,
                minPartitions: Int = 0): Dataset[WarcDoc] = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions
             else spark.sparkContext.defaultParallelism
    val rdd = spark.sparkContext.binaryFiles(path, mp)
      .flatMap { case (_, pds) =>
        val in = pds.open()
        closeOnTaskEnd(() => in.close())
        parseStream(in)
      }
    spark.createDataset(rdd)
  }

  /** Only `WARC-Type: response` records, as the reference's record
    * reader yields (`WarcFileRecordReader.java:152`, §2.2 P7).
    */
  def responses(spark: SparkSession, path: String): Dataset[WarcDoc] = {
    import spark.implicits._
    read(spark, path).filter((d: WarcDoc) => d.recordType == "response")
  }
}
