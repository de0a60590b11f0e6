package graft.queries

import graft.{SparkSpec, SparkEntry}
import graft.functions.DetHash
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Invariants over the declared query surface + cross-engine hash and
  * normalization properties.
  */
class QuerySuiteSpec extends SparkSpec {

  test("every decl has a unique name; oracle column aliasing sane") {
    val names = SparkEntry.decls.map(_.name)
    assert(names.distinct.length == names.length)
    assert(SparkEntry.queries.size == names.length)
  }

  test("smoke: entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("px85 oracle pairing is mechanical (r15): token substituted " +
    "per-SF, prepare hook registered, path canonicalized") {
    // the RAW map carries the token (px85 needs per-SF substitution);
    // every other entry is token-free
    val raw = SparkEntry.oracleSql
    assert(raw("px85_compression_funnel")
      .contains(PipelineQueries.px85ArtifactToken))
    assert(raw.count(_._2.contains("__PX85_ARTIFACT_DIR__")) == 1)
    // oracleSqlFor: token gone, the SF-keyed path in its place, and
    // NOTHING else in the map changed
    val sub = SparkEntry.oracleSqlFor(sfTiny)
    assert(!sub.values.exists(_.contains(PipelineQueries.px85ArtifactToken)))
    assert(sub("px85_compression_funnel")
      .contains(PipelineQueries.px85ArtifactPath(sfTiny)))
    assert((raw - "px85_compression_funnel") ==
      (sub - "px85_compression_funnel"))
    // exactly px85 carries a prepare hook today
    assert(SparkEntry.prepares.keySet == Set("px85_compression_funnel"))
    // SF-keying: different dirs → different artifact paths; different
    // SPELLINGS of one dir → ONE path (canonicalization, review r15)
    val p1 = PipelineQueries.px85ArtifactPath("/root/testdata/sf0.001")
    val p2 = PipelineQueries.px85ArtifactPath("/root/testdata/sf0.01")
    val p3 = PipelineQueries.px85ArtifactPath(
      "/root/testdata/../testdata/sf0.001/")
    assert(p1 != p2)
    assert(p1 == p3, s"$p1 vs $p3")
    // r16 (r15 advice): the disambiguating suffix is 64 bits of
    // SHA-256 (16 hex chars), not a 32-bit hash — basename collisions
    // across dirs cannot silently share an artifact in practice
    assert(p1.matches(""".*_[0-9a-f]{16}$"""), p1)
  }

  test("h60 matches the DuckDB-verified constant") {
    import spark.implicits._
    val got = Seq("abc").toDF("s").select(DetHash.h60(col("s")))
      .as[Long].head()
    // DuckDB: SELECT ('0x' || substr(md5('abc'),1,15))::BIGINT
    assert(got == 648541476951500027L)
  }

  test("rm3 weights sum to 1 per query (normalization property)") {
    import spark.implicits._
    val rm3 = SparkEntry.queries("ir19_rm3")(spark, sfTiny)
    val sums = rm3.groupBy("qid").agg(sum("w3").as("s"))
      .select("s").as[Double].collect()
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-4, s"sum=$s"))
  }

  test("tokenizer: only [0-9a-z]+ tokens, no empties") {
    import spark.implicits._
    val toks = TextOps.tokens(
      Seq((1L, "Hello, World! 42 foo_bar")).toDF("doc_id", "text"))
      .select("term").as[String].collect().toSeq
    assert(toks == Seq("hello", "world", "42", "foo", "bar"))
    assert(toks.forall(_.matches("[0-9a-z]+")))
  }

  test("shingles: short docs yield empty array, not a descending range") {
    import spark.implicits._
    val got = Seq((1L, "a b"), (2L, "x y z w"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.shinglesCol(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L).isEmpty)
    assert(got(2L) == Seq("x y z", "y z w"))
  }

  test("eval metrics stay in [0, 1]") {
    import spark.implicits._
    val m = SparkEntry.queries("ir17_eval")(spark, sfTiny)
      .select("p5", "ap").as[(Double, Double)].collect()
    m.foreach { case (p5, ap) =>
      assert(p5 >= 0 && p5 <= 1); assert(ap >= 0 && ap <= 1)
    }
  }

  test("emim is symmetric in its two marginals (property on formula)") {
    // EMIM(df1, df2, n11) == EMIM(df2, df1, n11): swap-symmetry of the
    // contingency table. Evaluate the shared expression both ways.
    val df = spark.sql(
      """SELECT * FROM VALUES (30L, 40L, 10L, 100L), (5L, 80L, 3L, 100L)
        | AS t(df1, df2, n11, n_docs)""".stripMargin)
    val fwd = df.selectExpr(emimExprForTest).collect().map(_.getDouble(0))
    val bwd = df.selectExpr("df2 AS df1x", "df1 AS df2x", "n11", "n_docs")
      .withColumnRenamed("df1x", "df1").withColumnRenamed("df2x", "df2")
      .selectExpr(emimExprForTest).collect().map(_.getDouble(0))
    fwd.zip(bwd).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  private val emimExprForTest: String = {
    val p11 = "((n11 + 2.5e-1) / (n_docs + 1e0))"
    val px = "((df1 + 5e-1) / (n_docs + 1e0))"
    val py = "((df2 + 5e-1) / (n_docs + 1e0))"
    val p10 = "((df1 - n11 + 2.5e-1) / (n_docs + 1e0))"
    val p01 = "((df2 - n11 + 2.5e-1) / (n_docs + 1e0))"
    val p00 = "((n_docs - df1 - df2 + n11 + 2.5e-1) / (n_docs + 1e0))"
    s"$p11 * log2($p11 / ($px * $py)) + $p10 * log2($p10 / ($px * (1 - $py))) " +
      s"+ $p01 * log2($p01 / ((1 - $px) * $py)) " +
      s"+ $p00 * log2($p00 / ((1 - $px) * (1 - $py)))"
  }
}
