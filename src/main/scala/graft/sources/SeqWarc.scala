package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.io.BytesWritable
import org.apache.hadoop.mapred.{JobConf, SequenceFileAsBinaryInputFormat, SequenceFileAsBinaryOutputFormat}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Legacy `SequenceFile<LongWritable, WritableWarcRecord>` ingest — the
  * reference's spam-filtered ClueWeb corpus format (written by
  * `ClueWebSpamFilter.java:146`'s SequenceFileOutputFormat job, read
  * back at `ClueWebRunQueries.java:298`).
  *
  * Clean-room from the public Writable WIRE contract
  * (`WritableWarcRecord.java:64-75` delegating to
  * `WarcRecord.java:330-343,512-522`): the value payload is
  *   `writeUTF(contentType) writeUTF(uuid) writeUTF(dateString)
  *    writeUTF(recordType) writeInt(n) n×(writeUTF(k) writeUTF(v))
  *    writeInt(contentLength)` followed by the raw content bytes —
  * Java modified-UTF-8 throughout (DataOutput#writeUTF), which
  * `DataInputStream.readUTF` decodes byte-exactly. The key is a
  * LongWritable file offset the reference itself never uses
  * (`ClueWebRunQueries.java:176-200` keys its output on the
  * `WARC-TREC-ID` metadata item); it is ignored here.
  *
  * Content DECODE is UTF-8 — the reference consumer's own semantics
  * (`ClueWebRunQueries.java:181` reads every record through
  * `WarcRecord.getContentUTF8`, `WarcRecord.java:485-491`). This is a
  * deliberate DIVERGENCE from the raw-WARC scan ([[Warc]]), which
  * decodes ISO-8859-1 for byte transparency: the two paths model
  * different contracts — [[Warc]] parses raw crawl containers where
  * Content-Length byte math must stay valid, while this source
  * ingests the reference's already-cooked pipeline format exactly as
  * the reference's own jobs read it. Non-UTF-8 bytes in a legacy
  * payload become replacement chars here, as they do in the
  * reference.
  *
  * The read path goes through `SequenceFileAsBinaryInputFormat`, which
  * hands over raw record payloads WITHOUT instantiating the declared
  * value class — so files whose headers name
  * `edu.cmu.lemurproject.WritableWarcRecord` load with no Lemur jar on
  * the classpath, and record/block compression is decoded by the
  * Hadoop reader before we see the bytes. Splittable via SequenceFile
  * sync markers, so a 100 TB legacy corpus scans with full
  * parallelism.
  */
object SeqWarc {

  /** One parsed record; `doc_id` follows the reference's convention
    * (`WARC-TREC-ID` metadata item, falling back to the header uuid).
    */
  final case class Rec(doc_id: String, record_type: String,
                       content_type: String, date: String, uuid: String,
                       metadata: Map[String, String], text: String)

  /** Decode one WritableWarcRecord value payload. */
  def parseValue(bytes: Array[Byte]): Rec = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val contentType = in.readUTF()
    val uuid = in.readUTF()
    val date = in.readUTF()
    val recordType = in.readUTF()
    val n = in.readInt()
    val md = (0 until n).map(_ => in.readUTF() -> in.readUTF()).toMap
    val len = in.readInt()
    val content = new Array[Byte](len)
    in.readFully(content)
    Rec(md.getOrElse("WARC-TREC-ID", uuid), recordType, contentType, date,
      uuid, md, new String(content, StandardCharsets.UTF_8))
  }

  /** Encode a record to the same wire layout (round-trip tests and
    * interop export back to reference-consuming tooling).
    */
  def serialize(rec: Rec): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeUTF(rec.content_type)
    out.writeUTF(rec.uuid)
    out.writeUTF(rec.date)
    out.writeUTF(rec.record_type)
    val md =
      if (rec.metadata.contains("WARC-TREC-ID")) rec.metadata
      else rec.metadata + ("WARC-TREC-ID" -> rec.doc_id)
    out.writeInt(md.size)
    md.toSeq.sortBy(_._1).foreach { case (k, v) =>
      out.writeUTF(k); out.writeUTF(v)
    }
    val content = rec.text.getBytes(StandardCharsets.UTF_8)
    out.writeInt(content.length)
    out.write(content)
    out.flush()
    bos.toByteArray
  }

  /** Full-fidelity scan: every header field + metadata map + content. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .hadoopFile(path, classOf[SequenceFileAsBinaryInputFormat],
        classOf[BytesWritable], classOf[BytesWritable])
      .map { case (_, v) => parseValue(v.copyBytes()) }
      .toDF()
  }

  /** Export (doc_id, text) rows as a binary SequenceFile whose value
    * payloads follow the WritableWarcRecord contract. Stays
    * partitioned — one part file per task, like every other sink here.
    *
    * `compress = true` writes BLOCK-compressed with the default codec
    * — the reference's own output shape for its spam-filtered corpus
    * (`ClueWebSpamFilter.java:140-146`,
    * `SequenceFileOutputFormat.setOutputCompressionType(job, BLOCK)`);
    * the read path decodes either transparently (JobsSpec fixtures).
    *
    * Header/interop honesty: the KEY side is fully reference-shaped —
    * the header declares `LongWritable` and each key is a real 8-byte
    * long (record index; the reference keys on byte offsets but
    * "never uses" them, see the class doc). The VALUE bytes in the
    * container are ALSO reference-exact — SequenceFile frames each
    * value by the record length, and Writable serialization adds no
    * prefix of its own, so the payload laid down here is
    * byte-identical to a `SequenceFileOutputFormat<LongWritable,
    * WritableWarcRecord>` file. The one divergence is the header's
    * value-class STRING: it says `BytesWritable`, not
    * `edu.cmu.lemurproject.WritableWarcRecord`, because naming that
    * class requires it on the writer's classpath (Hadoop loads header
    * classes by name) and vendoring it is out of bounds. Consumers
    * therefore read values header-blind
    * (`SequenceFileAsBinaryInputFormat`, as [[read]] does); a
    * reference job instantiating header classes directly refuses the
    * value — loudly, not wrongly — until a one-line header-rewrite
    * pass with the Lemur jar present renames the value class.
    */
  def write(docs: DataFrame, out: String, compress: Boolean = false): Unit = {
    val rdd = docs.select("doc_id", "text").na.fill("").rdd
      .mapPartitions { it =>
        var i = 0L
        it.map { r =>
          val rec = Rec(r.getString(0), "response", "text/html", "", "",
            Map("WARC-TREC-ID" -> r.getString(0)), r.getString(1))
          // key = LongWritable wire form (8-byte big-endian), so the
          // declared header key class and the key bytes agree
          val key = java.nio.ByteBuffer.allocate(8).putLong(i).array()
          i += 1
          (new BytesWritable(key), new BytesWritable(serialize(rec)))
        }
      }
    val conf = new JobConf(rdd.sparkContext.hadoopConfiguration)
    SequenceFileAsBinaryOutputFormat.setSequenceFileOutputKeyClass(
      conf, classOf[org.apache.hadoop.io.LongWritable])
    if (compress) {
      conf.setBoolean(org.apache.hadoop.mapreduce.lib.output
        .FileOutputFormat.COMPRESS, true)
      conf.set(org.apache.hadoop.mapreduce.lib.output
        .FileOutputFormat.COMPRESS_TYPE,
        org.apache.hadoop.io.SequenceFile.CompressionType.BLOCK.toString)
    }
    rdd.saveAsHadoopFile(out, classOf[BytesWritable], classOf[BytesWritable],
      classOf[SequenceFileAsBinaryOutputFormat], conf)
  }
}
