package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML→text projection and anchor extraction.
  *
  * Re-expresses the reference's regex chains as column expressions
  * (codegen'd, no UDF) and its anchor mapper as a flatMap:
  *  - HTML cleanup: `edu/gslis/hadoop/trec/TrecUtils.java:18-26` and
  *    `nl/utwente/mirex/util/WarcTextConverterInputFormat.java:25-32,
  *    100-103` (strip pre-HTML header, script blocks, all tags,
  *    collapse whitespace, lowercase).
  *  - Anchor extraction + URL normalization:
  *    `nl/utwente/mirex/AnchorExtract.java:79-135`.
  */
object Html {

  /** Strip leading non-HTML (e.g. the HTTP response header) up to the
    * first tag, drop script blocks and all tags, collapse whitespace.
    *
    * Review r14, two fixes on a previously untested path: (1) the
    * header strip anchors on the first '<' via a kept capture — the
    * old bare `^[^<]*` matched the WHOLE string of a tag-free payload
    * (plain text, JSON) and silently deleted the document; now a
    * tag-free doc passes through intact (header stripping only makes
    * sense when markup exists). (2) whitespace collapse is its own
    * final pass — the old combined `<tag>|\s+` alternation replaced
    * each ADJACENT match with its own space ('a <b> c' → 'a   c'),
    * never actually collapsing as the scaladoc and the reference
    * chain (tag-strip THEN \s+ collapse) specify.
    */
  def htmlToText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, "(?s)^[^<]*(<)", "$1"),
          "(?is)<script.*?</script>", " "),
        "(?s)<[^>]*>", " "),
      "\\s+", " "))

  def htmlToTextLower(c: Column): Column = lower(htmlToText(c))

  // ---- anchor extraction (driver-side Scala, used from flatMap) ----

  private val scriptPat = "(?is)<script(.*?)</script>".r
  private val anchorPat = "(?is)<a ([^>]*)href=[\"']?([^> '\"]+)([^>]*)>(.*?)</a>".r
  private val nofollowPat = "(?i)rel=[\"']?nofollow".r
  private val absUrlPat = "^[a-z]+://".r
  /** Suffixes treated as the directory default page (dropped). */
  private val noIndexHtml = "/$|/index\\.[a-z][a-z][a-z][a-z]?$"

  /** Normalize a page URL: drop `/index.html`-style default pages. */
  def normalizePageUrl(url: String): String =
    url.replaceFirst(noIndexHtml, "")

  /** Resolve an href against the page URL and normalize — same
    * semantics as `AnchorExtract.makeAbsoluteUrl` (strip protocol,
    * root-relative onto the host, path-relative onto the directory,
    * collapse `..`/`//`, drop default-page suffix, re-prefix http://).
    */
  def makeAbsoluteUrl(pageUrl: String, href0: String): String = {
    val page = absUrlPat.replaceAllIn(pageUrl, "")
    val href = href0.replaceAll("[ \n\r\t]", "")
    val joined =
      if (href.startsWith("/")) page.replaceAll("/.*$", "") + href
      else if (absUrlPat.findFirstIn(href).isDefined)
        absUrlPat.replaceAllIn(href, "")
      else page.replaceAll("/[^/]+$", "") + "/" + href
    // regex kept BYTE-IDENTICAL to the reference's
    // (AnchorExtract.java:101), quirk included: the stray `.` makes a
    // single-char path segment uncollapsible ("/a/../c" stays, only
    // "/ab/../c" collapses). Anchor URLs are AGGREGATION KEYS that
    // must equal what the reference would produce — normalizing
    // better would file the same anchors under different keys.
    "http://" + joined.replaceAll("/.[^/]+/\\.\\./|//", "/")
      .replaceFirst(noIndexHtml, "")
  }

  /** All (absolute URL, anchor text) pairs of one page; skips
    * rel=nofollow links; strips tags/newlines inside the anchor text;
    * truncates the page at `maxHtml` UTF-16 CODE UNITS — chars, not
    * bytes (the reference caps raw bytes, AnchorExtract.java:71-72;
    * chars is the JVM-string equivalent, as AnchorExtractJob's
    * sibling cap documents), backing off one unit when the cut would
    * split a surrogate pair (review r18: a dangling high surrogate
    * flowed into the emitted anchor text and mojibaked on write).
    */
  def extractAnchors(pageUrl: String, html0: String,
                     maxHtml: Int = 50000): Seq[(String, String)] = {
    val cut =
      if (html0.length > maxHtml)
        html0.substring(0,
          if (Character.isHighSurrogate(html0.charAt(maxHtml - 1)))
            maxHtml - 1
          else maxHtml)
      else html0
    val html = scriptPat.replaceAllIn(cut, " ")
    anchorPat.findAllMatchIn(html).flatMap { m =>
      val attrs = m.group(1) + m.group(3)
      if (nofollowPat.findFirstIn(attrs).isDefined) None
      else Some((
        makeAbsoluteUrl(pageUrl, m.group(2)),
        m.group(4).replaceAll("<[^>]+>|[ \n\t\r]+", " ")))
    }.toSeq
  }
}
