package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing.
  *
  * Spark's `hash`/`xxhash64` have no DuckDB twin, so every hash that
  * feeds a correctness-checked operator (dedup, minhash, simhash,
  * fingerprints) is derived from MD5, which both engines implement
  * bit-identically: take the first 15 hex chars (60 bits — always
  * non-negative in an i64) and parse as an integer.
  *
  * DuckDB equivalent: `('0x' || substr(md5(x), 1, 15))::BIGINT`.
  *
  * Scale note: md5 is ~2× slower than xxhash64 but still >100 MB/s/core
  * and fully parallel — it is never the bottleneck next to a shuffle.
  * The library-internal (non-oracle) paths may use xxhash64 freely.
  */
object DetHash {

  /** 60-bit non-negative hash of a string column — the NATIVE
    * [[H60]] expression (digest bytes straight to long; bit-identical
    * to the conv/substring formula, asserted in VecOpsSpec). Built
    * directly (not via the registered SQL name) so the Column API
    * works on sessions without GraftExtensions.
    */
  def h60(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(H60(GraftColumnBridge.expression(c)))
  }

  /** Seeded variant: independent hash family member i (for minhash). */
  def h60(c: Column, seed: Int): Column =
    h60(concat(lit(seed.toString), lit("|"), c))

  /** Spark SQL string form of [[h60]], for use inside expr() strings. */
  def sparkH60Sql(e: String): String = s"h60($e)"

  /** Driver-side twin of the [[H60]] expression, for deterministic
    * literal material baked into plans (e.g. `Ann.randomProject`'s
    * ±1 matrix) — DELEGATES to the same byte-level implementation
    * (review r14: this used to reimplement the formula via hex
    * formatting + base-16 reparse, a second copy of a
    * bit-identity-critical formula). Bit-equality with the native
    * column expression is asserted in VecOpsSpec.
    */
  def h60Local(s: String): Long =
    H60.hash(org.apache.spark.unsafe.types.UTF8String.fromString(s))

  /** DuckDB SQL fragment for the same hash, for oracle authoring. */
  def duckH60(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  def duckH60(expr: String, seed: Int): String =
    duckH60(s"'$seed' || '|' || $expr")
}
