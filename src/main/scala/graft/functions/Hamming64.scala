package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
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
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeChecks.expect(Seq(left.dataType, right.dataType),
      Seq(LongType, LongType), prettyName)

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
    // arity-checked builders (review r14): a wrong-arity SQL call used
    // to surface as a raw IndexOutOfBoundsException from exprs(1)
    // during function building — now a clear invalid-arguments error
    def fn(name: String, arity: Int, clazz: Class[_])(
        build: Seq[Expression] => Expression): Unit =
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (exprs: Seq[Expression]) => {
          if (exprs.length != arity)
            throw new IllegalArgumentException(
              s"$name takes exactly $arity argument(s), got ${exprs.length}")
          build(exprs)
        }))
    fn("hamming64", 2, classOf[Hamming64])(x => Hamming64(x(0), x(1)))
    fn("dot_f64", 2, classOf[DotF64])(x => DotF64(x(0), x(1)))
    fn("norm2_f64", 1, classOf[Norm2F64])(x => Norm2F64(x(0)))
    fn("h60", 1, classOf[H60])(x => H60(x(0)))
    fn("md5_h1h2", 1, classOf[Md5H1H2])(x => Md5H1H2(x(0)))
    fn("char_trigrams", 1, classOf[CharTrigrams])(x => CharTrigrams(x(0)))
    fn("token_shingles", 2, classOf[TokenShingles])(
      x => TokenShingles(x(0), x(1)))
    fn("krovetz_ex", 1, classOf[KrovetzEx])(x => KrovetzEx(x(0)))
    fn("deflate_len", 1, classOf[DeflateLen])(x => DeflateLen(x(0)))
  }
}
