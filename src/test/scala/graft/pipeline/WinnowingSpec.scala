package graft.pipeline

import graft.SparkSpec

/** The winnowing guarantee (Schleimer et al. 2003 §2): any run of
  * ≥ w+k−1 shared tokens yields at least one SHARED fingerprint, and
  * the selected set is position-robust (a sketch property, not a
  * hash-set-of-everything property).
  */
class WinnowingSpec extends SparkSpec {

  import org.apache.spark.sql.functions.col

  private def fpSets(rows: Seq[(Long, String)], k: Int = 4, w: Int = 5) = {
    import spark.implicits._
    val docs = rows.toDF("doc_id", "text")
    // recompute the per-window minima the summary aggregates over, so
    // the test can compare the actual fingerprint SETS
    val sh = docs
      .select(col("doc_id"), org.apache.spark.sql.functions.posexplode(
        graft.text.TextOps.shinglesFromToks(
          org.apache.spark.sql.functions.expr(
            "filter(split(lower(text), '[^0-9a-z]+'), x -> x <> '')"), k))
        .as(Seq("pos", "s")))
      .select(col("doc_id"),
        graft.functions.DetHash.h60(col("s")).as("h"), col("pos"))
    val win = s"PARTITION BY doc_id ORDER BY pos" +
      s" ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING"
    sh.selectExpr("doc_id", s"count(*) OVER ($win) AS wn",
        s"min(h) OVER ($win) AS wmin")
      .filter(col("wn") === w)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
  }

  test("docs sharing a >= w+k-1 token run share a fingerprint; disjoint docs don't") {
    // shared run of 8 tokens = exactly w+k-1 with k=4, w=5 — the
    // guarantee's boundary case
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    val sets = fpSets(Seq(
      (1L, s"$shared oneend twoend threeend fourend fiveend"),
      (2L, s"prefixa prefixb prefixc prefixd prefixe $shared"),
      (3L, "totally different words that never overlap with anything here")))
    assert((sets(1L) & sets(2L)).nonEmpty,
      s"w+k-1 shared tokens must produce a shared fingerprint")
    assert((sets(1L) & sets(3L)).isEmpty && (sets(2L) & sets(3L)).isEmpty,
      "no shared 4-grams, no shared fingerprints")
  }

  test("docs shorter than one full window emit no row, not an error") {
    import spark.implicits._
    // 7 tokens → 4 4-grams → no window of 5 → absent; 2 tokens → no
    // 4-gram at all → absent; empty text → absent
    val out = TextMetrics.winnowingFingerprints(Seq(
      (1L, "one two three four five six seven"),
      (2L, "just two"),
      (3L, ""),
      (4L, "a b c d e f g h i j k l")).toDF("doc_id", "text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(4L), s"only the 12-token doc fingerprints: $out")
  }

  test("winnowingSelection join surfaces overlapping docs as a pair") {
    import spark.implicits._
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    val sel = TextMetrics.winnowingSelection(Seq(
      (1L, s"$shared a1 a2 a3 a4 a5 a6"),
      (2L, s"b1 b2 b3 b4 b5 b6 $shared"),
      (3L, "nothing in common with either of the other two documents at all"))
      .toDF("doc_id", "text"))
    val pairs = sel.as("a").join(sel.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .count().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"only the overlapping pair may share fingerprints: $pairs")
  }

  test("summary row matches the recomputed selection, density in (0, 1]") {
    import spark.implicits._
    val rows = Seq((7L,
      "one two three four five six seven eight nine ten eleven twelve"))
    val out = TextMetrics.winnowingFingerprints(rows.toDF("doc_id", "text"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    // 12 tokens → 9 4-grams → 5 full windows of 5
    assert(r.getLong(1) == 5L, s"n_windows: ${r.getLong(1)}")
    assert(r.getLong(2) == fpSets(rows)(7L).size.toLong, "n_fp matches set")
    assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0)
  }
}
