package graft.functions

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions.col

/** The Bloom prefilter's contract: zero false negatives (members
  * always pass), a bounded false-positive rate (the prune that makes
  * it worth broadcasting at 100 TB), and — end to end — the
  * prefiltered contamination query returns EXACTLY the plain join's
  * rows.
  */
class BloomMcSpec extends SparkSpec {

  test("no false negatives: every inserted key passes the probe") {
    import spark.implicits._
    val members = (1L to 5000L).map(_ * 2654435761L).toDF("k")
    val bytes = BloomMc.buildLongBloom(members, "k", 10000, 0.01)
    val passed =
      members.filter(BloomMc.mightContain(bytes, col("k"))).count()
    assert(passed == 5000L)
  }

  test("false positives bounded: non-members are pruned ~99%") {
    import spark.implicits._
    val members = (1L to 5000L).map(_ * 2654435761L).toDF("k")
    val bytes = BloomMc.buildLongBloom(members, "k", 10000, 0.01)
    val probes = (1L to 20000L).map(_ * 2654435761L + 1L).toDF("k")
    val fp = probes.filter(BloomMc.mightContain(bytes, col("k"))).count()
    // nominal fpp 1%; assert a generous 5% so the test is not flaky
    // against the sketch's probabilistic bound
    assert(fp < 1000L, s"$fp of 20000 non-members passed")
  }

  test("bloom-prefiltered contamination ≡ plain-join contamination") {
    val plain = SparkEntry.queries("px24_contamination")(spark, sfTiny)
      .orderBy("doc_id").collect()
    val bloomed =
      SparkEntry.queries("px56_bloom_contamination")(spark, sfTiny)
        .orderBy("doc_id").collect()
    assert(plain.nonEmpty, "fixture must exercise the join")
    assert(plain.sameElements(bloomed))
  }
}
