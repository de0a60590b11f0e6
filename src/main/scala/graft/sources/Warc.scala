package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
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
  * map task per file, `WarcFileInputFormat.java:52-55`); we read via
  * `binaryFile` — one Spark task per file, thousands of files in
  * parallel on a cluster. For repeated analytics, materialize the
  * parsed result to Parquet once (SURVEY §7.4 risk 5).
  *
  * Divergence note: the reference hand-rolls a byte-wise UTF-8 line
  * reader tolerant of malformed ClueWeb09 headers
  * (`WarcRecord.java:88-167`); we decode ISO-8859-1 (byte-transparent,
  * so Content-Length byte counts stay valid) and tolerate colon-less
  * header lines by skipping them.
  */
object Warc {

  /** Per-record (and effectively per-file) size ceiling of this parser:
    * the decompressed file is held as one ISO-8859-1 String, so the JVM
    * 2G-char array cap applies. Records declaring more than this fail
    * loudly rather than being silently truncated/emptied. At 100 TB
    * scale the unit of parallelism is the *file* (thousands of <1 GiB
    * WARC.gz parts), so the ceiling binds per task, not per corpus.
    */
  val MaxRecordBytes: Long = Int.MaxValue.toLong - 16

  private def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte) {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      // initial-size hint clamped in LONG arithmetic: `length * 4`
      // overflows Int for .gz parts over ~512 MiB — an in-contract
      // input ("<1 GiB parts") that would throw Negative initial size
      // on every task retry
      val out = new ByteArrayOutputStream(
        math.min(bytes.length.toLong * 4, MaxRecordBytes).toInt)
      val buf = new Array[Byte](65536)
      var total = 0L
      var n = in.read(buf)
      while (n >= 0) {
        total += n
        // the file-length guard upstream sees the COMPRESSED size;
        // enforce the parser ceiling on the DECOMPRESSED stream too,
        // with the designed message instead of an array-size OOM deep
        // in the copy loop
        if (total > MaxRecordBytes)
          throw new IllegalArgumentException(
            s"gzipped warc input decompresses past the per-file parser " +
              s"ceiling $MaxRecordBytes (String-based parser; split the " +
              s"file upstream)")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } else bytes

  /** Parse every record in one WARC file (optionally gzipped). */
  def parseRecords(raw: Array[Byte]): Seq[WarcDoc] = {
    val text = new String(gunzipIfNeeded(raw), StandardCharsets.ISO_8859_1)
    val out = Seq.newBuilder[WarcDoc]
    var pos = 0
    var done = false
    while (!done) {
      val start = text.indexOf("WARC/", pos)
      if (start < 0) done = true
      else {
        var p = text.indexOf('\n', start)
        if (p < 0) done = true
        else {
          p += 1
          val headers = scala.collection.mutable.LinkedHashMap[String, String]()
          var blank = false
          while (!blank && p < text.length) {
            val eol = text.indexOf('\n', p) match {
              case -1 => text.length
              case e  => e
            }
            val line = text.substring(p, eol).stripSuffix("\r")
            p = eol + 1
            if (line.isEmpty) blank = true
            else {
              val c = line.indexOf(':')
              if (c > 0)
                headers(line.substring(0, c).trim) = line.substring(c + 1).trim
              // colon-less header lines tolerated (skipped), mirroring the
              // reference's malformed-header tolerance.
            }
          }
          def h(key: String): String =
            headers.collectFirst {
              case (k, v) if k.equalsIgnoreCase(key) => v
            }.getOrElse("")
          // Length stays Long until bounded: a record >= 2 GiB must not
          // silently wrap to a negative Int (and could not fit the
          // String-based parser anyway — see ceiling note below). Such a
          // record fails loudly instead of emitting empty content.
          // Missing/unparsable/negative Content-Length is ALSO loud
          // (the header is mandatory per ISO 28500): a zero guess both
          // loses the payload AND resumes the scan INSIDE it, so any
          // literal "WARC/" in the body would be minted into a fake
          // record — silent corpus corruption. (The reference's Lemur
          // reader silently stops the file at the first such record —
          // truncation instead of corruption; we refuse instead.)
          val rawLen = h("Content-Length")
          val len = rawLen.toLongOption.filter(_ >= 0).getOrElse(
            throw new IllegalArgumentException(
              s"WARC record at offset $start has missing/unparsable/" +
                s"negative Content-Length '$rawLen' (mandatory header); " +
                "refusing to guess — fix or drop the record upstream"))
          if (len > MaxRecordBytes)
            throw new IllegalArgumentException(
              s"WARC record at offset $start declares Content-Length $len " +
                s"> supported ceiling $MaxRecordBytes (String-based parser; " +
                "split oversized records upstream)")
          // TRUNCATION is loud, not a crash and not a silent clamp
          // (review r14, confirmed by execution): headers running past
          // EOF without their blank line left p = length + 1 and the
          // substring below threw a raw StringIndexOutOfBounds; a
          // declared Content-Length overrunning EOF was silently
          // clamped — a half-record emitted as if complete. Both are
          // the truncated-shard condition this parser's design says
          // must refuse.
          if (!blank)
            throw new IllegalArgumentException(
              s"WARC record at offset $start is TRUNCATED: headers run " +
                "past EOF with no blank separator line — partial " +
                "file/shard; re-fetch or drop the trailing record")
          if (p + len > text.length.toLong)
            throw new IllegalArgumentException(
              s"WARC record at offset $start is TRUNCATED: declares " +
                s"Content-Length $len but only ${text.length - p} bytes " +
                "remain — partial file/shard; re-fetch or drop the " +
                "trailing record")
          val end = (p + len).toInt
          out += WarcDoc(
            recordType = h("WARC-Type"),
            targetUri = h("WARC-Target-URI"),
            trecId = h("WARC-TREC-ID"),
            date = h("WARC-Date"),
            contentType = h("Content-Type"),
            headers = headers.toMap,
            content = text.substring(p, end))
          pos = end
        }
      }
    }
    out.result()
  }

  /** Distributed read: one task per (possibly gzipped) WARC file. */
  def read(spark: SparkSession, path: String): Dataset[WarcDoc] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap(parseRecords _)
  }

  /** Only `WARC-Type: response` records, as the reference's record
    * reader yields (`WarcFileRecordReader.java:152`, §2.2 P7).
    */
  def responses(spark: SparkSession, path: String): Dataset[WarcDoc] = {
    import spark.implicits._
    read(spark, path).filter((d: WarcDoc) => d.recordType == "response")
  }
}
