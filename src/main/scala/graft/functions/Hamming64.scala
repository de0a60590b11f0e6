package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: Hamming distance between two 64-bit
  * signatures (`Long.bitCount(a ^ b)`).
  *
  * This is the hot comparator of SimHash near-dup detection — at
  * 100 TB it runs once per candidate pair, so it is implemented as a
  * codegen'd `Expression` (stays inside whole-stage codegen, two JVM
  * intrinsics per row) rather than a Scala UDF (which would box both
  * longs and break the codegen stage). Preference order per the build
  * brief: compose built-ins > native Expression > UDF; Spark has no
  * built-in popcount-of-xor, so this is the Expression tier.
  */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming64 =
    copy(left = newLeft, right = newRight)
}

object Hamming64 {
  /** Column-API form — built directly (not via the registered SQL
    * name), so it works on sessions without GraftExtensions too.
    */
  def hamming64(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(Hamming64(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}

/** Session extensions: registers graft's native functions so they are
  * usable from SQL text (`expr("hamming64(a, b)")`) in any session
  * built by GraftSession.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("hamming64"),
      new ExpressionInfo(classOf[Hamming64].getName, "hamming64"),
      (exprs: Seq[Expression]) => Hamming64(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotF64].getName, "dot_f64"),
      (exprs: Seq[Expression]) => DotF64(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("norm2_f64"),
      new ExpressionInfo(classOf[Norm2F64].getName, "norm2_f64"),
      (exprs: Seq[Expression]) => Norm2F64(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("h60"),
      new ExpressionInfo(classOf[H60].getName, "h60"),
      (exprs: Seq[Expression]) => H60(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("md5_h1h2"),
      new ExpressionInfo(classOf[Md5H1H2].getName, "md5_h1h2"),
      (exprs: Seq[Expression]) => Md5H1H2(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("char_trigrams"),
      new ExpressionInfo(classOf[CharTrigrams].getName, "char_trigrams"),
      (exprs: Seq[Expression]) => CharTrigrams(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("token_shingles"),
      new ExpressionInfo(classOf[TokenShingles].getName, "token_shingles"),
      (exprs: Seq[Expression]) => TokenShingles(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("krovetz_ex"),
      new ExpressionInfo(classOf[KrovetzEx].getName, "krovetz_ex"),
      (exprs: Seq[Expression]) => KrovetzEx(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (exprs: Seq[Expression]) => DeflateLen(exprs(0))))
  }
}
