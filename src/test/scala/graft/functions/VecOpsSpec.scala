package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The native vector kernels must be BIT-IDENTICAL to the higher-order
  * lambda folds they replace (same IEEE op sequence), on real testdata
  * embeddings — otherwise oracle hash-matches would silently drift.
  */
class VecOpsSpec extends SparkSpec {

  private val lambdaDot =
    "aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
  private val lambdaNorm =
    "aggregate(transform(emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  test("dot_f64 == lambda fold, bit for bit, on testdata embeddings") {
    val e = Tables(spark, sfTiny, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val pairs = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("b"), col("embedding").as("eb")))
      .filter(col("a") < col("b") && col("b") < 40)
    val diff = pairs
      .select(expr("dot_f64(ea, eb)").as("fast"), expr(lambdaDot).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
    assert(pairs.count() > 100)
  }

  test("norm2_f64 == lambda fold, bit for bit; nonneg") {
    val e = Tables(spark, sfTiny, "embeddings")
      .select(col("embedding").as("emb"))
    val rows = e.select(expr("norm2_f64(emb)").as("fast"),
      expr(lambdaNorm).as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(r.getDouble(0) >= 0.0)
    }
  }

  test("null vector yields null (nullIntolerant)") {
    val r = spark.sql(
      "SELECT dot_f64(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))," +
        " norm2_f64(CAST(NULL AS ARRAY<FLOAT>))").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("char_trigrams survives malformed UTF-8 (truncated lead byte)") {
    // 0xC2 'A' 'B' 'C': numChars() disagrees with the byte-walk count
    // here — the starts buffer must be byte-sized, not numChars-sized
    val n = spark.sql(
      "SELECT size(char_trigrams(CAST(unbase64('wkFCQw==') AS STRING)))")
      .head().getInt(0)
    assert(n >= 0)
  }

  test("dot_f64 on unequal-length vectors is NULL, not a prefix product") {
    val r = spark.sql(
      "SELECT dot_f64(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT)))").head()
    assert(r.isNullAt(0))
  }

  test("native h60 == conv(substring(md5)) formula, bit for bit") {
    // the native digest-byte path must be indistinguishable from the
    // hex-string formula (which is what the DuckDB oracle replays)
    val diff = Tables(spark, sfTiny, "documents")
      .selectExpr("text",
        "h60(text) AS fast",
        "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT) AS ref")
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
    // known constant (DuckDB-verified in QuerySuiteSpec) + edge cases
    val edge = spark.sql(
      "SELECT h60('abc'), h60(''), h60('ü ☃ 漢字')," +
        " CAST(conv(substring(md5(''), 1, 15), 16, 10) AS BIGINT)," +
        " CAST(conv(substring(md5('ü ☃ 漢字'), 1, 15), 16, 10) AS BIGINT)").head()
    assert(edge.getLong(0) == 648541476951500027L)
    assert(edge.getLong(1) == edge.getLong(3))
    assert(edge.getLong(2) == edge.getLong(4))
  }

  test("driver-side h60Local == the native column, bit for bit") {
    // DetHash.h60Local bakes deterministic literal material (the
    // randomProject ±1 matrix) into plans — it must be the SAME hash
    import spark.implicits._
    val inputs = Seq("abc", "", "5|0|0", "5|63|15", "ü ☃ 漢字", "a|b|c")
    val native = inputs.toDF("s").selectExpr("h60(s)")
      .collect().map(_.getLong(0))
    val local = inputs.map(graft.functions.DetHash.h60Local)
    assert(native.toSeq == local)
  }

  test("char_trigrams == transform(sequence, substring) formula") {
    val diff = Tables(spark, sfTiny, "documents")
      .selectExpr("lower(text) AS t")
      .selectExpr("char_trigrams(t) AS fast",
        "CASE WHEN length(t) >= 3 THEN transform(sequence(1, length(t) - 2)," +
          " i -> substring(t, i, 3)) ELSE array() END AS ref")
      .filter(expr("fast != ref"))
    assert(diff.count() == 0)
    val edge = spark.sql(
      "SELECT char_trigrams(''), char_trigrams('ab'), char_trigrams('abc')," +
        " char_trigrams('héllo')").head()
    assert(edge.getSeq[String](0).isEmpty)
    assert(edge.getSeq[String](1).isEmpty)
    assert(edge.getSeq[String](2) == Seq("abc"))
    assert(edge.getSeq[String](3) == Seq("hél", "éll", "llo"))
  }

  test("token_shingles == transform(sequence, concat_ws(element_at))") {
    def ref(k: Int) =
      s"CASE WHEN size(toks) >= $k THEN transform(sequence(0, size(toks) - $k)," +
        s" i -> concat_ws(' ', ${(0 until k).map(j => s"element_at(toks, i + $j + 1)").mkString(", ")}))" +
        " ELSE CAST(array() AS ARRAY<STRING>) END"
    val base = Tables(spark, sfTiny, "documents")
      .selectExpr("filter(split(lower(text), '[^0-9a-z]+'), t -> t != '') AS toks")
    Seq(3, 5).foreach { k =>
      val diff = base
        .selectExpr(s"token_shingles(toks, $k) AS fast", s"${ref(k)} AS refv")
        .filter(expr("fast != refv"))
      assert(diff.count() == 0, s"k=$k")
    }
    val edge = spark.sql(
      "SELECT token_shingles(array('a','b'), 3)," +
        " token_shingles(array('a','b','c','d'), 3)," +
        " token_shingles(CAST(array() AS ARRAY<STRING>), 3)").head()
    assert(edge.getSeq[String](0).isEmpty)
    assert(edge.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(edge.getSeq[String](2).isEmpty)
  }

  test("md5_h1h2 == the two conv(substring(md5)) slices, bit for bit") {
    val diff = Tables(spark, sfTiny, "documents")
      .selectExpr("text", "md5_h1h2(text) AS hh", "md5(text) AS m")
      .selectExpr("hh.h1 AS f1", "hh.h2 AS f2",
        "CAST(conv(substring(m, 1, 15), 16, 10) AS BIGINT) AS r1",
        "CAST(conv(substring(m, 17, 14), 16, 10) AS BIGINT) AS r2")
      .filter(col("f1") =!= col("r1") || col("f2") =!= col("r2"))
    assert(diff.count() == 0)
  }

  test("typed inputs + arity: wrong types and arities fail at PLAN time, " +
    "never as silent garbage or raw index errors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // review r14: dot_f64/norm2_f64 hardcode getFloat — an
    // array<double> argument used to reinterpret 4 of every 8 bytes
    // into silently-wrong numbers; now an analysis-time type error
    val d = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
    val e1 = intercept[Exception] {
      d.select(expr("norm2_f64(v)")).collect()
    }
    assert(e1.getMessage.contains("array<float>"), e1.getMessage)
    val e2 = intercept[Exception] {
      d.select(expr("dot_f64(v, v)")).collect()
    }
    assert(e2.getMessage.contains("array<float>"), e2.getMessage)
    // token_shingles with a BIGINT k used to fail janino + throw a
    // raw ClassCastException mid-query
    val t = Seq((1L, Seq("a", "b", "c"))).toDF("id", "toks")
    val e3 = intercept[Exception] {
      t.select(expr("token_shingles(toks, CAST(2 AS BIGINT))")).collect()
    }
    assert(e3.getMessage.contains("(array<string>, int)"), e3.getMessage)
    assert(t.select(expr("token_shingles(toks, 2)")).head()
      .getSeq[String](0) == Seq("a b", "b c"))
    // wrong arity used to surface as IndexOutOfBoundsException from
    // the registry builder
    val e4 = intercept[Exception] {
      t.select(expr("hamming64(id)")).collect()
    }
    assert(e4.getMessage.contains("exactly 2 argument"), e4.getMessage)
  }
}
