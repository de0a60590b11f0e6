package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding kernels (dot product
  * and squared norm over `array<float>`, accumulated in DOUBLE).
  *
  * Spark's higher-order functions (`aggregate(zip_with(...))`) evaluate
  * a lambda interpreter per element and fall out of whole-stage
  * codegen; on an ANN scoring path the kernel runs once per candidate
  * pair, so these are Expression-tier (build-brief preference: compose
  * built-ins > native Expression > UDF) with a tight codegen'd loop.
  *
  * Float semantics are IDENTICAL to the lambda formulation they
  * replace: each float is widened to double, products accumulate left
  * to right — the same IEEE operation sequence, so oracle-matched
  * results are unchanged bit for bit. Unequal-length inputs yield NULL
  * (zip_with's null padding would poison the lambda fold) — never a
  * silently-truncated prefix product. Null ELEMENTS inside a vector are
  * not supported (testdata embeddings are dense); a null vector yields
  * null via nullIntolerant.
  */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression {

  // typed inputs (review r14): the kernels hardcode getFloat, so an
  // array<double> argument through the SQL registration would
  // reinterpret 4 bytes of every 8-byte slot — silently-wrong cosines
  // with no exception. The check turns that into a plan-time error.
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(c => c.dataType match {
      case ArrayType(FloatType, _) => true
      case org.apache.spark.sql.types.NullType => true // NULL in → NULL out
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // result can be null even on non-null inputs (length mismatch)
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // unequal lengths → NULL, matching aggregate(zip_with(...)): the
    // lambda form pads with nulls and null*x poisons the whole fold —
    // a truncated prefix dot product would be a silently-wrong cosine
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 norm of an `array<float>`, double accumulation — the
  * unary sibling of [[DotF64]] (same ordering semantics as
  * `aggregate(transform(v, x -> x*x), 0d, +)`).
  */
case class Norm2F64(child: Expression) extends UnaryExpression {

  // see DotF64: getFloat over array<double> would silently corrupt
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case org.apache.spark.sql.types.NullType => // NULL in → NULL out
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "norm2_f64"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Norm2F64 =
    copy(child = newChild)
}
