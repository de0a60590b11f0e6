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
  // typed input (review r16, the TokenShingles r14 rule applied to
  // every registered expression): the SQL registration would
  // otherwise accept h60(doc_id) — janino rejects the generated
  // hash(long), execution falls back to interpreted, and the
  // asInstanceOf throws a raw ClassCastException MID-QUERY instead of
  // a plan-time error
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeChecks.expectString(child, prettyName)

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

  private[functions] def digest(s: UTF8String): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(s.getBytes)
  }

  /** First 60 bits of md5 over the string's UTF-8 bytes. */
  def hash(s: UTF8String): Long = {
    val b = digest(s)
    val top =
      (b(0) & 0xffL) << 56 | (b(1) & 0xffL) << 48 | (b(2) & 0xffL) << 40 |
        (b(3) & 0xffL) << 32 | (b(4) & 0xffL) << 24 | (b(5) & 0xffL) << 16 |
        (b(6) & 0xffL) << 8 | (b(7) & 0xffL)
    top >>> 4
  }
}

/** Both minhash base hashes from ONE digest: h1 = hex chars 1..15
  * (60 bits, digest bytes 0..7 >>> 4), h2 = hex chars 17..30 (56 bits,
  * digest bytes 8..14) — bit-identical to the two conv(substring(...))
  * parses of the same md5 hex string, without materializing it. This
  * runs once per shingle in every minhash/LSH operator, the hottest
  * expression in the dedup family.
  */
case class Md5H1H2(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_h1h2"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeChecks.expectString(child, prettyName)

  override protected def nullSafeEval(a: Any): Any =
    Md5H1H2.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5H1H2.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5H1H2 =
    copy(child = newChild)
}

/** All overlapping character trigrams of a string as one array —
  * equivalent to `transform(sequence(1, length(s)-2), i ->
  * substring(s, i, 3))` (empty below 3 chars) but built in a single
  * pass over the char positions instead of re-evaluating a substring
  * expression per index. Used by the language-ID profile/vote path,
  * which explodes ~|corpus chars| of these.
  */
case class CharTrigrams(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, StringType}

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_trigrams"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeChecks.expectString(child, prettyName)

  override protected def nullSafeEval(a: Any): Any =
    CharTrigrams.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharTrigrams.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharTrigrams =
    copy(child = newChild)
}

object CharTrigrams {
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    // True O(n): one byte walk collects code-point start offsets
    // (UTF-8 continuation bytes are 10xxxxxx), then each trigram is a
    // 3-code-point byte slice. substringSQL-per-position would re-scan
    // from the string head for every index — O(n²) on long documents.
    val bytes = s.getBytes
    val nb = bytes.length
    // sized by BYTE count, not numChars(): on malformed UTF-8 the two
    // disagree (numChars() skips past truncated lead bytes) and a
    // numChars()-sized array would overflow during the walk
    val starts = new Array[Int](nb + 1)
    var n = 0
    var b = 0
    while (b < nb) {
      if ((bytes(b) & 0xc0) != 0x80) { starts(n) = b; n += 1 }
      b += 1
    }
    starts(n) = nb
    if (n < 3)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    val out = new Array[Any](n - 2)
    var i = 0
    while (i < n - 2) {
      out(i) = UTF8String.fromBytes(bytes, starts(i), starts(i + 3) - starts(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** All overlapping k-token shingles of a string array, space-joined —
  * equivalent to `transform(sequence(0, n-k), i -> concat_ws(' ',
  * element_at(a, i+1), …, element_at(a, i+k)))` (empty below k tokens)
  * but built in one pass: k array reads + one concat per shingle,
  * instead of k interpreted element_at lambda evaluations. The
  * entry-point expression of every MinHash/Jaccard/fingerprint
  * operator — it touches every token of the corpus.
  */
case class TokenShingles(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

  // typed inputs (review r14): the SQL registration would otherwise
  // accept token_shingles(toks, CAST(3 AS BIGINT)) — the generated
  // compute(..., long) fails janino (no long->int narrowing), falls
  // back to interpreted eval, and k.asInstanceOf[Int] throws a raw
  // ClassCastException mid-query instead of a plan-time error
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      // NullType slots pass (NULL in → NULL out via NullPropagation);
      // the array's element may carry any collation — compute() reads
      // raw UTF8String bytes (ADVICE r16)
      case (ArrayType(_: StringType, _) | org.apache.spark.sql.types.NullType,
            IntegerType | org.apache.spark.sql.types.NullType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<string>, int), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_shingles"

  override protected def nullSafeEval(a: Any, k: Any): Any =
    TokenShingles.compute(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, k) => s"graft.functions.TokenShingles.compute($a, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenShingles =
    copy(left = newLeft, right = newRight)
}

object TokenShingles {
  private val SP = UTF8String.fromString(" ")

  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData, k: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = a.numElements()
    if (k <= 0 || n < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    val out = new Array[Any](n - k + 1)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = a.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(SP, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object Md5H1H2 {
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = H60.digest(s)
    val h1 =
      ((b(0) & 0xffL) << 56 | (b(1) & 0xffL) << 48 | (b(2) & 0xffL) << 40 |
        (b(3) & 0xffL) << 32 | (b(4) & 0xffL) << 24 | (b(5) & 0xffL) << 16 |
        (b(6) & 0xffL) << 8 | (b(7) & 0xffL)) >>> 4
    val h2 =
      (b(8) & 0xffL) << 48 | (b(9) & 0xffL) << 40 | (b(10) & 0xffL) << 32 |
        (b(11) & 0xffL) << 24 | (b(12) & 0xffL) << 16 | (b(13) & 0xffL) << 8 |
        (b(14) & 0xffL)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](h1, h2))
  }
}
