package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared, correctness-gated operator query.
  *
  * @param name   stable key (shows up in CORRECTNESS_r{N}.json)
  * @param run    Spark implementation over the sfDir parquet tables
  * @param oracle equivalent DuckDB SQL over the same tables; None for
  *               ops whose semantics DuckDB cannot express (driver then
  *               records a weaker rows-only check)
  * @param survey SURVEY.md §2 operator ids this query covers
  */
final case class Decl(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    survey: Seq[String] = Nil)

object Decl {
  /** Cross-engine exact money math: sum as decimal (exact), surface as
    * double (same decimal → same IEEE double in both engines). Raw
    * double sums would be order-dependent and could never hash-match.
    */
  def decSumSql(col: String, scale: Int = 2): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE)"
}
