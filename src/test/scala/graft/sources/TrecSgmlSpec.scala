package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class TrecSgmlSpec extends SparkSpec {

  test("splits <DOC> blocks and extracts DOCNO/EPOCH/TEXT") {
    val tmp = Files.createTempDirectory("trec").toString
    Files.writeString(Paths.get(tmp, "c.trectext"),
      """<DOC><DOCNO>FT911-1</DOCNO><EPOCH>666392400</EPOCH>
        |<TEXT>first doc body</TEXT></DOC>
        |<DOC><DOCNO> FT911-2 </DOCNO>
        |<TEXT>second
        |doc</TEXT></DOC>
        |""".stripMargin)
    val rows = TrecSgml.read(spark, tmp).collect().sortBy(_.getString(0))
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "FT911-1")
    assert(rows(0).getLong(1) == 666392400L)
    assert(rows(0).getString(2) == "first doc body")
    assert(rows(1).getString(0) == "FT911-2") // whitespace trimmed
    assert(rows(1).isNullAt(1)) // no epoch tag
    assert(rows(1).getString(2) == "second\ndoc")
  }

  test("configurable tags: non-DOC records via readRecords and read") {
    val tmp = Files.createTempDirectory("xml").toString
    Files.writeString(Paths.get(tmp, "pages.xml"),
      """<header>junk between records is dropped</header>
        |<PAGE><DOCNO>P1</DOCNO><TEXT>alpha</TEXT></PAGE>
        |noise
        |<PAGE><DOCNO>P2</DOCNO><TEXT>beta</TEXT></PAGE>
        |trailer""".stripMargin)

    // XmlInputFormat parity: raw records, tags inclusive, junk dropped
    val recs = TrecSgml.readRecords(spark, tmp, "<PAGE>", "</PAGE>")
      .collect().map(_.getString(0)).sorted
    assert(recs.length == 2)
    assert(recs(0) == "<PAGE><DOCNO>P1</DOCNO><TEXT>alpha</TEXT></PAGE>")
    assert(recs(1) == "<PAGE><DOCNO>P2</DOCNO><TEXT>beta</TEXT></PAGE>")

    // field extraction over custom-tag records
    val rows = TrecSgml.read(spark, tmp, "<PAGE", "</PAGE>")
      .collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq == Seq("P1", "P2"))
    assert(rows.map(_.getString(2)).toSeq == Seq("alpha", "beta"))
  }

  test("readRecords is splittable: records straddling split boundaries survive") {
    val tmp = Files.createTempDirectory("xmlsplit").toString
    // ~400 KB of records, then read with 32 KB splits: dozens of
    // records straddle a boundary; the text source's lineSep handling
    // must reassemble every one exactly once (the reference's
    // readUntilMatch-across-blocks behavior)
    val n = 2000
    val body = (1 to n).map { i =>
      s"<PAGE><DOCNO>P$i</DOCNO><TEXT>${"x" * (50 + i % 130)}</TEXT></PAGE>"
    }.mkString("\n")
    Files.writeString(Paths.get(tmp, "big.xml"), body)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (32 * 1024).toString)
      val recs = TrecSgml.readRecords(spark, tmp, "<PAGE>", "</PAGE>")
      assert(recs.rdd.getNumPartitions > 1, "test must actually split the file")
      assert(recs.count() == n)
      // no record torn or duplicated: every docno present exactly once
      val ids = TrecSgml.read(spark, tmp, "<PAGE", "</PAGE>")
        .select("docno").collect().map(_.getString(0))
      assert(ids.length == n && ids.toSet.size == n)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("topics reader: qid + tokenized terms") {
    val rows = Topics.readPlain(spark, resource("wt2010-topics.queries-only"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.count(_._1 == "53") == 3)
    assert(rows.filter(_._1 == "53").map(_._2).toSeq
      == Seq("discovery", "channel", "store"))
    assert(rows.map(_._1).distinct.length == 50)
  }
}
