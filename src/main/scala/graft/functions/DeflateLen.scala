package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string — the corpus-quality
  * compressibility signal (CCNet / RedPajama-v2 style: highly
  * compressible text is boilerplate/repetition, incompressible text
  * is noise; the useful band sits in between). A native Expression so
  * the per-row Deflater call stays inside whole-stage codegen; the
  * Deflater instance is reused per-thread (construction dominates the
  * cost for short docs).
  *
  * Determinism note: the byte LENGTH for a fixed (input, level,
  * strategy) is stable for a given zlib build, and the repo pins no
  * cross-engine oracle on it — DuckDB SQL cannot express DEFLATE, so
  * this signal is spec-verified by ORDERING properties (repetitive <
  * natural < random compressed size), which are zlib-invariant. Use
  * the RATIO (deflate_len / octet_length) for filtering, not absolute
  * bytes.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_len"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeChecks.expectString(child, prettyName)

  override protected def nullSafeEval(a: Any): Any =
    DeflateLen.compressedLen(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateLen.compressedLen($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  // one Deflater per thread, reset between rows — constructing a
  // Deflater allocates native zlib state, far costlier than a reset.
  // The native state is deliberately never end()'d: it lives for the
  // thread's lifetime, which is bounded on Spark's POOLED executor
  // task threads (a fixed-size pool holds ~64 KB of zlib state per
  // thread). A host embedding this expression on short-lived
  // per-task threads would leak one Deflater per dead thread and
  // should call .remove()/end() in a task-completion hook instead.
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  /** DEFLATE length of the UTF-8 bytes of `s`. Empty input → 8 (the
    * fixed empty-stream frame), consistent everywhere. */
  def compressedLen(s: UTF8String): Long = {
    val d = deflater.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val b = buf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(b)
    total
  }
}
