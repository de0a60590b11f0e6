package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Krovetz exception-dictionary lookup: the mapped stem for a term in
  * [[graft.text.KrovetzStem.exceptions]], or NULL when the term is
  * regular (callers `coalesce` with the rule pipeline, exactly as the
  * generated exception CASE did).
  *
  * Why an Expression and not the generated `CASE WHEN term = '…'`
  * chain the DuckDB oracle still runs: the ~230-branch CASE codegens
  * to a linear string-compare ladder evaluated once per token of the
  * corpus — the round-9 bench measured px15 at 5–6.6× DuckDB purely
  * from that ladder. A static HashMap is one O(1) probe per token and
  * stays inside whole-stage codegen. Semantics are identical (exact
  * string equality against the same table, single source of truth);
  * KrovetzStemSpec pins Spark-vs-oracle agreement.
  */
case class KrovetzEx(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  // NULL for every non-exception term, whatever the child's nullability
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "krovetz_ex"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeChecks.expectString(child, prettyName)

  override protected def nullSafeEval(a: Any): Any =
    KrovetzEx.lookup(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.KrovetzEx.lookup($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): KrovetzEx =
    copy(child = newChild)
}

object KrovetzEx {
  // UTF8String keys: the probe runs on the column's native
  // representation — no per-row String decode
  private val table: java.util.HashMap[UTF8String, UTF8String] = {
    val m = new java.util.HashMap[UTF8String, UTF8String](
      graft.text.KrovetzStem.exceptions.size * 2)
    graft.text.KrovetzStem.exceptions.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), UTF8String.fromString(v))
    }
    m
  }

  /** The exception stem, or null when `s` is regular. */
  def lookup(s: UTF8String): UTF8String = table.get(s)
}
