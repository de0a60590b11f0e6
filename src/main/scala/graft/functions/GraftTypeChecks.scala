package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, LongType, NullType, StringType}

/** Shared plan-time input checks for the registered native
  * expressions (review r16, the TokenShingles r14 rule applied
  * across the board): a wrong-typed SQL argument must fail at
  * ANALYSIS with a readable message — otherwise janino rejects the
  * generated call, execution silently falls back to interpreted
  * eval, and the `asInstanceOf` throws a raw ClassCastException
  * mid-query.
  */
private[functions] object GraftTypeChecks {

  // Per-slot acceptance, not strict Seq equality (review r17):
  //  - NullType always passes — every graft expression is
  //    null-intolerant, so a NULL literal argument (h60(NULL)) yields
  //    NULL at eval exactly as it did before the plan-time checks
  //    landed; rejecting it at analysis regressed legal queries.
  //  - a StringType slot accepts ANY collation: on Spark 4.x a
  //    collated column is a distinct StringType instance, but every
  //    graft string expression reads the raw UTF8String bytes and is
  //    collation-agnostic.
  private def slotOk(got: DataType, want: DataType): Boolean =
    got == want ||
      got == NullType ||
      (want.isInstanceOf[StringType] && got.isInstanceOf[StringType])

  def expect(got: Seq[DataType], want: Seq[DataType],
             pretty: String): TypeCheckResult =
    if (got.length == want.length && got.lazyZip(want).forall(slotOk))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$pretty expects (${want.map(_.simpleString).mkString(", ")}), " +
        s"got (${got.map(_.simpleString).mkString(", ")})")

  def expectString(child: Expression, pretty: String): TypeCheckResult =
    expect(Seq(child.dataType), Seq(StringType), pretty)

  def expectLong(child: Expression, pretty: String): TypeCheckResult =
    expect(Seq(child.dataType), Seq(LongType), pretty)
}
