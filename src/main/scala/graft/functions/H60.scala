package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit MD5 hash: the first 15 hex chars of md5(x) as a
  * BIGINT — bit-identical to the SQL formula
  * `conv(substring(md5(x), 1, 15), 16, 10)` (and to DuckDB's
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`), but computed straight
  * from the digest bytes: no 32-char hex string materialization, no
  * base-16 reparse per row. This hash sits under every dedup /
  * minhash / fingerprint operator, so it runs once per shingle —
  * Expression tier per the build-brief preference ladder.
  *
  * First 15 hex chars == first 60 bits of the digest: big-endian
  * first 8 bytes shifted right 4 (unsigned), always non-negative.
  */
case class H60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "h60"

  override protected def nullSafeEval(a: Any): Any =
    H60.hash(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): H60 =
    copy(child = newChild)
}

object H60 {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5 over the string's UTF-8 bytes. */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    val top =
      (b(0) & 0xffL) << 56 | (b(1) & 0xffL) << 48 | (b(2) & 0xffL) << 40 |
        (b(3) & 0xffL) << 32 | (b(4) & 0xffL) << 24 | (b(5) & 0xffL) << 16 |
        (b(6) & 0xffL) << 8 | (b(7) & 0xffL)
    top >>> 4
  }
}
