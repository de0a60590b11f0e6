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

  test("topics reader: qid + tokenized terms") {
    val rows = Topics.readPlain(spark, resource("wt2010-topics.queries-only"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.count(_._1 == "53") == 3)
    assert(rows.filter(_._1 == "53").map(_._2).toSeq
      == Seq("discovery", "channel", "store"))
    assert(rows.map(_._1).distinct.length == 50)
  }
}
