package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** Plan-time input checks must reject wrong TYPES, not legal NULLs or
  * collation variants (ADVICE r16): a NULL literal argument flows
  * through every null-intolerant graft expression as SQL NULL (the
  * optimizer's NullPropagation folds it before codegen), and a
  * collated string column is still a string to expressions that read
  * raw UTF8String bytes.
  */
class GraftTypeChecksSpec extends SparkSpec {

  test("NULL literal arguments evaluate to NULL, not an analysis error") {
    val r = spark.sql(
      """SELECT h60(NULL) a, md5_h1h2(NULL) b, char_trigrams(NULL) c,
        |       krovetz_ex(NULL) d, deflate_len(NULL) e,
        |       token_shingles(NULL, 3) f, hamming64(NULL, 5L) g,
        |       hamming64(NULL, NULL) h, dot_f64(NULL, NULL) i,
        |       norm2_f64(NULL) j, token_shingles(array('a','b'), NULL) k
        |""".stripMargin).collect()(0)
    assert((0 until r.length).forall(r.isNullAt), r.toString)
  }

  test("collated string input is accepted and hashes its bytes") {
    val plain = spark.sql("SELECT h60('abc')").collect()(0).getLong(0)
    val collated = spark.sql(
      "SELECT h60('abc' COLLATE UNICODE_CI)").collect()(0).getLong(0)
    assert(collated == plain)
    // the exception-dictionary probe too: 'news' is a protected
    // headword — the lookup must hit on the collated column's bytes
    assert(spark.sql("SELECT krovetz_ex('news' COLLATE UNICODE_CI)")
      .collect()(0).getString(0) == "news")
  }

  test("wrong-typed arguments still fail at analysis, by name") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT h60(42L)").collect()
    }
    assert(e.getMessage.contains("h60"), e.getMessage)
    val e2 = intercept[AnalysisException] {
      spark.sql("SELECT hamming64('a', 'b')").collect()
    }
    assert(e2.getMessage.contains("hamming64"), e2.getMessage)
  }

  test("NULL-typed column (not literal) also passes analysis") {
    // a NullType COLUMN survives NullPropagation differently from a
    // literal — exercise the projection path too
    val df = spark.range(3).selectExpr("CAST(NULL AS void) v")
      .selectExpr("h60(v) h")
    assert(df.collect().forall(_.isNullAt(0)))
  }
}
