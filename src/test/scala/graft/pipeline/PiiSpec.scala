package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Realistic-text goldens for the PII masking pass — the oracle query
  * (px57) verifies the cross-engine formula on the corpus; this spec
  * pins the behavior users actually care about: what masks, what
  * doesn't, and the documented false positives of the naive patterns.
  */
class PiiSpec extends SparkSpec {

  private def redact(texts: String*): Seq[(String, Long, Long, Long)] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(
        (TextMetrics.redactPii(col("text")).as("r") +:
          TextMetrics.piiCounts(col("text"))): _*)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("emails mask, including subdomains, plus-tags and dotted locals") {
    val Seq((r, ne, _, _)) =
      redact("Contact John.Doe+spam@sub.example.co.uk today")
    assert(r == "Contact <EMAIL> today")
    assert(ne == 1)
  }

  test("NANP phones mask with - or . separators; bare digit runs do not") {
    val Seq((r, _, np, _)) =
      redact("call 555-867-5309 or 555.867.5309 not 5558675309")
    assert(r == "call <PHONE> or <PHONE> not 5558675309")
    assert(np == 2)
  }

  test("word boundaries hold: 4-3-4 digit groups are not phones") {
    val Seq((r, _, np, _)) = redact("order 1234-567-8901 shipped")
    assert(r == "order 1234-567-8901 shipped" && np == 0)
  }

  test("IPv4 masks; the documented false positive on version strings") {
    val Seq((r, _, _, ni)) = redact("host 192.168.0.1 runs v 1.2.3.4")
    // any 1-3-digit dotted quad masks — callers who care pre-filter
    // version-like contexts; the naive pattern is the standard one.
    assert(r == "host <IP> runs v <IP>" && ni == 2)
  }

  test("counts reconcile with redaction: one count per replacement") {
    val Seq((r, ne, np, ni)) =
      redact("a@b.co then 555-867-5309 from 10.0.0.1")
    assert(r == "<EMAIL> then <PHONE> from <IP>")
    assert((ne, np, ni) == ((1L, 1L, 1L)))
  }

  test("overlapping kinds count what redaction actually masks (r18: " +
    "a digit-local-part email is ONE email, not also a phone)") {
    val Seq((r, ne, np, ni)) =
      redact("mail 555-867-5309@mail.example.com today")
    // the email pattern eats the whole address (digits/hyphens are
    // legal local-part chars), so redaction performs ONE replacement —
    // and the counts must say exactly that (the old raw-text counting
    // reported a phantom phone that was never masked)
    assert(r == "mail <EMAIL> today", r)
    assert((ne, np, ni) == ((1L, 0L, 0L)))
  }

  test("text without PII passes through byte-identical") {
    val in = "no secrets here, just words and the number 42"
    val Seq((r, ne, np, ni)) = redact(in)
    assert(r == in && ne + np + ni == 0)
  }
}
