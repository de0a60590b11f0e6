package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared, correctness-gated operator query.
  *
  * @param name    stable key (shows up in CORRECTNESS_r{N}.json)
  * @param run     Spark implementation over the sfDir parquet tables;
  *                MUST be side-effect free (build = plan only) — any
  *                oracle-side materialization belongs in `prepare`
  * @param oracle  equivalent DuckDB SQL over the same tables; None for
  *                ops whose semantics DuckDB cannot express (driver then
  *                records a weaker rows-only check). May contain the
  *                `__PX85_ARTIFACT_DIR__`-style tokens SparkEntry
  *                .oracleSqlFor substitutes per-sfDir at dump time.
  * @param survey  SURVEY.md §2 operator ids this query covers
  * @param prepare oracle-input materialization hook (r15): side effect
  *                that writes any artifact the ORACLE SQL reads (e.g.
  *                px85's deflate-kernel parquet — SQL cannot DEFLATE,
  *                so the oracle replays the funnel from Spark's kernel
  *                outputs). Run by Verify before dumping the query —
  *                the dump's substituted oracle SQL and the artifact
  *                are then produced by the same run at the same sfDir.
  *                NOT run by Bench (it is oracle scaffolding, not
  *                query work — every DuckDB read of the artifact flows
  *                through a Verify dump) nor by plan-only consumers,
  *                which keeps `run` action-free.
  */
final case class Decl(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    survey: Seq[String] = Nil,
    prepare: Option[(SparkSession, String) => Unit] = None)

object Decl {
  /** Cross-engine exact money math: sum as decimal (exact), surface as
    * double (same decimal → same IEEE double in both engines). Raw
    * double sums would be order-dependent and could never hash-match.
    */
  def decSumSql(col: String, scale: Int = 2): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE)"
}
