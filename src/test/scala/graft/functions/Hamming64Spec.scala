package graft.functions

import graft.SparkSpec
import graft.functions.Hamming64.hamming64
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class Hamming64Spec extends SparkSpec {

  test("hamming64: column API, SQL registration, and codegen agree") {
    import spark.implicits._
    val df = Seq((0L, 0L), (7L, 1L), (-1L, 0L), (Long.MaxValue, 0L))
      .toDF("a", "b")
    val viaCol = df.select(hamming64(col("a"), col("b"))).as[Int].collect().toSeq
    val viaSql = df.selectExpr("hamming64(a, b)").as[Int].collect().toSeq
    assert(viaCol == Seq(0, 2, 64, 63))
    assert(viaSql == viaCol)
  }

  test("hamming64 properties: identity, symmetry, triangle") {
    import spark.implicits._
    val gen = Gen.listOfN(200, Gen.zip(Gen.long, Gen.long, Gen.long))
    val triples = gen(Gen.Parameters.default, Seed(42L)).get
    val rows = triples.toDF("a", "b", "c")
      .selectExpr("hamming64(a, a) AS aa", "hamming64(a, b) AS ab",
        "hamming64(b, a) AS ba", "hamming64(b, c) AS bc",
        "hamming64(a, c) AS ac")
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == 0)
      assert(r.getInt(1) == r.getInt(2))
      assert(r.getInt(4) <= r.getInt(1) + r.getInt(3))
    }
  }
}
