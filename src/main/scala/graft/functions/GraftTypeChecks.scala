package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Shared plan-time input checks for the registered native
  * expressions (review r16, the TokenShingles r14 rule applied
  * across the board): a wrong-typed SQL argument must fail at
  * ANALYSIS with a readable message — otherwise janino rejects the
  * generated call, execution silently falls back to interpreted
  * eval, and the `asInstanceOf` throws a raw ClassCastException
  * mid-query.
  */
private[functions] object GraftTypeChecks {

  def expect(got: Seq[DataType], want: Seq[DataType],
             pretty: String): TypeCheckResult =
    if (got == want) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$pretty expects (${want.map(_.simpleString).mkString(", ")}), " +
        s"got (${got.map(_.simpleString).mkString(", ")})")

  def expectString(child: Expression, pretty: String): TypeCheckResult =
    expect(Seq(child.dataType), Seq(StringType), pretty)

  def expectLong(child: Expression, pretty: String): TypeCheckResult =
    expect(Seq(child.dataType), Seq(LongType), pretty)
}
