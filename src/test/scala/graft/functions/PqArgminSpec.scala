package graft.functions

import graft.SparkSpec
import graft.pipeline.Ann
import org.apache.spark.sql.functions._

/** The native PQ argmin kernel must be bit-equivalent to the
  * historical crossJoin + round-then-rank window shape it replaced —
  * including tie resolution (lowest code) and the NULL/dim-mismatch
  * raise.
  */
class PqArgminSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfTiny/embeddings.parquet")

  test("pqEncode == the historical window shape, row for row") {
    val cb = Ann.pqTrain(emb.filter(col("vec_id") % 3 === 0),
      blocks = 8, kCodes = 8, iters = 2)
    val fast = Ann.pqEncode(emb, cb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the pre-r17 reference shape, inlined: kCodes x row blowup +
    // round-then-rank window
    val slow = emb.select(col("vec_id").as("vid"), col("embedding").as("ve"))
      .crossJoin(broadcast(cb))
      .withColumn("d2", expr(
        "aggregate(zip_with(slice(ve, CAST(blk * size(centroid) + 1 AS INT)," +
          " size(centroid)), centroid, (a, b) ->" +
          " (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b))," +
          " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
      .withColumn("r", expr(
        "row_number() OVER (PARTITION BY vid, blk ORDER BY round(d2, 6), code)"))
      .filter(col("r") === 1).select("vid", "blk", "code").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast.nonEmpty && fast == slow)
  }

  test("tie resolution: exact duplicate centroids pick the LOWEST code") {
    import spark.implicits._
    // a codebook whose codes 3 and 7 are identical centroids: every
    // vector's distances tie exactly, and round-then-rank semantics
    // demand code 3 wins over 7 whenever they share the minimum
    val base = Seq.tabulate(8)(c =>
      (0L, c.toLong, Seq.fill(2)(c.toDouble)))
      .map { case (b, c, ct) => (b, c, if (c == 7) Seq(3.0, 3.0) else ct) }
      .toDF("blk", "code", "centroid")
    val vecs = Seq((1L, Seq(3.1f, 2.9f)), (2L, Seq(0.1f, 0.2f)))
      .toDF("vec_id", "embedding")
    val out = Ann.pqEncode(vecs, base).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out(1L) == 3L, s"tie must go to the lowest code: $out")
    assert(out(2L) == 0L)
  }

  test("mat_vec == the HOF transform/aggregate form; NULL vec → NULL; " +
    "dim mismatch raises") {
    import spark.implicits._
    val rot = Seq(Seq(0.0, 1.0), Seq(-1.0, 0.5))
    val vecs = Seq((1L, Some(Seq(2.0f, 3.0f))), (2L, None))
      .toDF("vec_id", "embedding")
    val fast = Ann.rotateVec(vecs, rot, "embedding", "r").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) null else r.getSeq[Double](2))).toMap
    assert(fast(1L) == Seq(3.0, -0.5) && fast(2L) == null)
    // HOF reference on the non-null row
    val hof = vecs.filter(col("vec_id") === 1L)
      .withColumn("r", transform(typedLit(rot), row => aggregate(
        zip_with(row, col("embedding"), (a, b) => a * b.cast("double")),
        lit(0.0), (acc, v) => acc + v)))
      .head().getSeq[Double](2)
    assert(hof == fast(1L))
    val short = Seq((3L, Seq(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Ann.rotateVec(short, rot, "embedding", "r").collect()
    }
    assert(e.getMessage.contains("dim mismatch"), e.getMessage)
    // a NON-FOLDABLE NullType column (NullPropagation only folds
    // literals) must flow NULL through codegen, not CCE on the
    // ArrayType cast (review r17)
    import org.apache.spark.sql.types._
    val nullSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", NullType)))
    val nullDf = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(5L, null)), nullSchema)
    val nr = Ann.rotateVec(nullDf, rot, "embedding", "r").collect()
    assert(nr.length == 1 && nr(0).isNullAt(2))
  }

  test("int vec_id and int code columns still encode (review r17: the " +
    "kernel must not narrow the old window shape's accepted inputs)") {
    import spark.implicits._
    val cb = Seq((0L, 0, Seq(0.0, 0.0)), (0L, 1, Seq(5.0, 5.0)))
      .toDF("blk", "code", "centroid") // int code
    val vecs = Seq((7, Seq(4.9f, 5.1f)), (8, Seq(0.1f, -0.1f)))
      .toDF("vec_id", "embedding") // int id
    val out = Ann.pqEncode(vecs, cb).collect()
      .map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(out == Map(7 -> 1L, 8 -> 0L))
  }

  test("non-numeric STRING vec_id encodes (r18 advice fix: the " +
    "long-typed error-tag slot cast it to NULL and failed every row)") {
    import spark.implicits._
    val cb = Seq((0L, 0L, Seq(0.0, 0.0)), (0L, 1L, Seq(5.0, 5.0)))
      .toDF("blk", "code", "centroid")
    val vecs = Seq(("doc-a", Seq(4.9f, 5.1f)), ("doc-b", Seq(0.1f, -0.1f)))
      .toDF("vec_id", "embedding")
    val out = Ann.pqEncode(vecs, cb).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(out == Map("doc-a" -> 1L, "doc-b" -> 0L))
    // and the loud per-row raise still names the (string) id — a
    // valid row rides along so the constant-width requireDimMatches
    // fast-fail doesn't trip first
    val mixed = Seq(("doc-ok", Seq(1.0f, 1.0f)), ("doc-short", Seq(1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] { Ann.pqEncode(mixed, cb).collect() }
    assert(e.getMessage.contains("doc-short"), e.getMessage)
  }

  test("a foldable typed-NULL argument raises loudly (r18 advice fix: " +
    "nullIntolerant=true let NullPropagation fold it to silent NULL " +
    "codes, contradicting nullable=false)") {
    import spark.implicits._
    val df = Seq(1L).toDF("x")
    val c = PqArgmin.argmin(
      lit(null).cast("array<double>"), lit(0),
      typedLit(Seq(Seq(0.0, 0.0))), typedLit(Seq(0L)),
      lit("v1"), "spec")
    val e = intercept[Exception] { df.select(c.as("code")).collect() }
    assert(e.getMessage.contains("pq_argmin"), e.getMessage)
  }

  test("all-NaN distances raise loudly with the vector id (review r17: " +
    "round6(Infinity) threw an untagged NumberFormatException)") {
    import spark.implicits._
    val cb = Seq((0L, 0L, Seq(0.0, 0.0))).toDF("blk", "code", "centroid")
    val bad = Seq((42L, Seq(Float.NaN, 1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] { Ann.pqEncode(bad, cb).collect() }
    assert(e.getMessage.contains("pqEncode") &&
      e.getMessage.contains("42") &&
      e.getMessage.contains("finite"), e.getMessage)
  }

  test("NULL element / dim mismatch raises with the vector id") {
    import spark.implicits._
    val cb = Ann.pqTrain(emb.filter(col("vec_id") % 3 === 0),
      blocks = 8, kCodes = 4, iters = 1)
    val short = Seq((999L, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Ann.pqEncode(emb.select("vec_id", "embedding").unionByName(short), cb)
        .collect()
    }
    assert(e.getMessage.contains("pqEncode") &&
      e.getMessage.contains("999"), e.getMessage)
  }
}
