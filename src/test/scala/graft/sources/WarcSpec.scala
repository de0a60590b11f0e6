package graft.sources

import graft.SparkSpec
import graft.ir.AnchorExtractJob
import graft.text.Html

/** WARC parsing goldens against the reference's own fixture
  * (`test/test.warc.gz`: 1 warcinfo + 3 response records — the e2e
  * expectation in SURVEY §7.4 risk 1).
  */
class WarcSpec extends SparkSpec {

  lazy val all = Warc.read(spark, resource("test.warc.gz")).collect()

  test("parses all 4 records of test.warc.gz") {
    assert(all.length == 4)
    assert(all.count(_.recordType == "response") == 3)
    assert(all.head.recordType == "warcinfo")
  }

  test("response records carry TREC ids and URIs") {
    val resp = all.filter(_.recordType == "response").sortBy(_.trecId)
    assert(resp.map(_.trecId).toSeq == Seq("test1", "test2", "test3"))
    assert(resp.head.targetUri == "http://test1.com/index.html")
    assert(resp.forall(_.contentType.startsWith("application/http")))
  }

  test("content framing honors Content-Length and keeps the HTTP payload") {
    val t1 = all.find(_.trecId == "test1").get
    assert(t1.content.startsWith("HTTP/1.1 200 OK"))
    assert(t1.content.contains("discovery channel store"))
    assert(t1.content.length == 452)
  }

  test("oversize Content-Length fails loudly instead of truncating") {
    val rec = ("WARC/0.18\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${Int.MaxValue.toLong + 5}\r\n\r\nbody")
      .getBytes("ISO-8859-1")
    val e = intercept[IllegalArgumentException](Warc.parseRecords(rec))
    assert(e.getMessage.contains("Content-Length"))
    // negative / garbage lengths clamp to 0 (empty content), no crash
    val neg = ("WARC/0.18\r\nWARC-Type: response\r\n" +
      "Content-Length: -7\r\n\r\nbody").getBytes("ISO-8859-1")
    assert(Warc.parseRecords(neg).head.content.isEmpty)
  }

  test("anchor extraction resolves and normalizes URLs (AnchorExtract semantics)") {
    // page /index.html → normalized host; absolute hrefs keep their host
    assert(Html.makeAbsoluteUrl("http://test1.com/index.html",
      "http://test2.com/") == "http://test2.com")
    assert(Html.makeAbsoluteUrl("http://a.com/x/page.html", "/b.html")
      == "http://a.com/b.html")
    assert(Html.makeAbsoluteUrl("http://a.com/x/page.html", "b.html")
      == "http://a.com/x/b.html")
    assert(Html.normalizePageUrl("http://test1.com/index.html")
      == "http://test1.com")
  }

  test("anchors: nofollow skipped, inner tags stripped") {
    val pairs = Html.extractAnchors("http://x.com/",
      """<a href="http://a.com/">plain</a>
        |<a href="http://b.com/" rel="nofollow">skipme</a>
        |<a href="http://c.com/"><b>MIREX</b> rocks</a>""".stripMargin)
    assert(pairs.map(_._1) == Seq("http://a.com", "http://c.com"))
    // inner-tag strip leaves a double space — reference-observable
    // behavior (AnchorExtractTest golden "MIREX  rocks")
    assert(pairs.last._2 == " MIREX  rocks")
  }

  test("DSv2: spark.read.format(\"warc\") matches the programmatic reader") {
    val viaDsv2 = spark.read.format("warc").load(resource("test.warc.gz"))
      .collect()
    assert(viaDsv2.length == 4)
    val dsv2Set = viaDsv2.map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(6).length)).toSet
    val apiSet = all.map(d => (d.recordType, d.targetUri, d.trecId,
      d.content.length)).toSet
    assert(dsv2Set == apiSet)
    // headers survive as a typed map column
    val hm = viaDsv2.find(_.getString(2) == "test1").get
      .getMap[String, String](5)
    assert(hm("WARC-Type") == "response")
  }

  test("anchor job: anchors reach their target TREC docs") {
    val out = AnchorExtractJob.run(spark, resource("test.warc.gz"))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    // test1's page links to test2 with "discovery channel store"
    assert(out.contains("test2"))
    assert(out("test2").contains("discovery channel store"))
  }
}
