package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OPQ rotation (Ann.opqTrainRotation / rotateVec / the rotated
  * IVFADC query path): orthogonality, distance preservation,
  * determinism, MSE improvement on a cross-block-correlated sample
  * (the case OPQ exists for), and the identity-rotation path being
  * value-identical to plain IVFADC.
  */
class OpqSpec extends SparkSpec {
  import Ann._

  // cross-block correlated sample: second half mirrors the first (plus
  // a small deterministic wobble), so independent per-block PQ wastes
  // half its code budget re-describing the same variance — the
  // textbook anisotropy a learned rotation recovers
  private lazy val correlated = {
    import spark.implicits._
    // x = (h, h): the second block duplicates the first exactly, so a
    // rotation onto ((h+h)/√2, (h−h)/√2) = (h√2, 0) leaves block 2
    // with ZERO variance — the ideal R roughly halves the PQ MSE,
    // well past the asserted 10% bar
    (0L until 256L).map { i =>
      val half = Array.tabulate(4)(j =>
        (math.sin(i * 0.37 + j * 1.13) +
          0.6 * math.cos(i * 0.093 * (j + 1))).toFloat)
      (i, (half ++ half).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("learned rotation is orthogonal and deterministic") {
    val m1 = opqTrainRotation(correlated, blocks = 2, kCodes = 8,
      lloydIters = 2, opqIters = 4)
    val m2 = opqTrainRotation(correlated, blocks = 2, kCodes = 8,
      lloydIters = 2, opqIters = 4)
    assert(m1.rotation == m2.rotation, "same sample must give same R")
    val r = m1.rotation
    val d = r.length
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => r(i)(k) * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"R·Rᵀ[$i][$j] = $dot")
    }
  }

  test("rotation reduces PQ reconstruction MSE on correlated blocks") {
    val plain = opqTrainRotation(correlated, blocks = 2, kCodes = 8,
      lloydIters = 2, opqIters = 0) // identity baseline
    val opq = opqTrainRotation(correlated, blocks = 2, kCodes = 8,
      lloydIters = 2, opqIters = 8)
    assert(plain.rotation.zipWithIndex.forall { case (row, i) =>
      row.zipWithIndex.forall { case (v, j) =>
        v == (if (i == j) 1.0 else 0.0) } }, "opqIters=0 must be identity")
    assert(opq.mse < plain.mse * 0.9,
      s"OPQ must beat plain PQ on cross-block-correlated data: " +
        s"opq ${opq.mse} vs plain ${plain.mse}")
  }

  test("eigenvalue allocation is scale-invariant (review r17: the " +
    "unconstrained min-logSum pick chunked instead of balancing " +
    "whenever every eigenvalue < 1)") {
    // scaling by 2 is exact in binary floating point: every distance
    // comparison, assignment, and Procrustes input scales uniformly,
    // so the learned ROTATION must be bit-identical
    val m1 = opqTrainRotation(correlated, blocks = 2, kCodes = 8,
      lloydIters = 2, opqIters = 4)
    val scaled = correlated.selectExpr("vec_id",
      "transform(embedding, x -> x * CAST(2.0 AS FLOAT)) AS embedding")
    val m2 = opqTrainRotation(scaled, blocks = 2, kCodes = 8,
      lloydIters = 2, opqIters = 4)
    assert(m1.rotation == m2.rotation,
      "rotation must not depend on the corpus scale")
  }

  test("rotateVec preserves pairwise squared distances") {
    val m = opqTrainRotation(correlated, blocks = 2, kCodes = 8,
      lloydIters = 2, opqIters = 4)
    val rot = rotateVec(correlated, m.rotation, "embedding", "rot")
    val pairs = rot.alias("a").crossJoin(rot.alias("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .limit(200)
      .select(
        expr("aggregate(zip_with(a.embedding, b.embedding, (x, y) -> " +
          "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
          "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0d, " +
          "(acc, v) -> acc + v)").as("d0"),
        expr("aggregate(zip_with(a.rot, b.rot, (x, y) -> " +
          "(x - y) * (x - y)), 0d, (acc, v) -> acc + v)").as("d1"))
      .collect()
    assert(pairs.nonEmpty && pairs.forall(r =>
      math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9 *
        (1.0 + r.getDouble(0))), "rotation must be an isometry")
  }

  test("identity rotation: rotated IVFADC path == plain IVFADC, " +
    "exactly") {
    val emb = spark.read.parquet(s"$sfTiny/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val cent = kmeansCentroids(emb, kClusters = 4, iters = 1)
    val resid = ivfResiduals(emb, cent)
    val cb = pqTrain(resid.filter(col("vid") % 3 === 0),
      blocks = 4, kCodes = 8, iters = 2, idCol = "vid", embCol = "res")
    val codes = ivfPqEncode(resid, cb)
    val d = emb.select(size(col("embedding"))).head().getInt(0)
    val ident = Seq.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
      .map(_.toSeq)
    val plain = ivfAdcTopK(codes, cent, cb, queries, nprobe = 2, k = 5)
      .collect().map(_.toSeq).toSet
    val rotated = ivfAdcTopK(codes, cent, cb, queries, nprobe = 2, k = 5,
      rotation = ident).collect().map(_.toSeq).toSet
    assert(plain.nonEmpty && rotated == plain)
  }

  test("learned-rotation IVFADC end-to-end: valid top-k over " +
    "OPQ-rotated residual codes") {
    val emb = spark.read.parquet(s"$sfTiny/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val cent = kmeansCentroids(emb, kClusters = 4, iters = 1)
    val resid = ivfResiduals(emb, cent)
    val m = opqTrainRotation(resid, blocks = 4, kCodes = 8,
      lloydIters = 2, opqIters = 4, idCol = "vid", embCol = "res")
    val residRot = rotateVec(resid, m.rotation, "res", "res")
    val cb = pqTrain(residRot.filter(col("vid") % 3 === 0),
      blocks = 4, kCodes = 8, iters = 2, idCol = "vid", embCol = "res")
    val codes = ivfPqEncode(residRot, cb)
    val out = ivfAdcTopK(codes, cent, cb, queries, nprobe = 2, k = 5,
      rotation = m.rotation)
      .collect()
    assert(out.nonEmpty)
    val perQ = out.groupBy(_.getLong(0))
    assert(perQ.values.forall(rows =>
      rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length)),
      "ranks must be dense 1..k per query")
  }
}
