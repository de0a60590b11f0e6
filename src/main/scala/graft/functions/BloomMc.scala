package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership probe: true iff the 64-bit key
  * MIGHT be in the filter (no false negatives; false positives at the
  * built `fpp`).
  *
  * This is the broadcast-prefilter primitive for contamination /
  * overlap checks at 100 TB: a benchmark n-gram set of ~10⁹ entries is
  * too big to broadcast as a hash-join side (~16 GB of rows) but its
  * 1%-fpp Bloom filter is ~1.2 GB — executors drop ~99% of corpus
  * shingles map-side, and only the survivors pay the exact shuffle
  * join that removes the false positives. The filter itself is built
  * with a mergeable per-partition `treeAggregate` (same pattern as the
  * KMV sketch in px28): no row ever reaches the driver, only sketches.
  *
  * Expression tier per the build-brief ladder: the probe runs once per
  * corpus shingle, so it must stay inside whole-stage codegen — one
  * virtual call per row against a reference-object filter, no boxing.
  * The serialized filter rides as a constructor field, NOT a Binary
  * literal child: a literal's plan rendering is proportional to the
  * filter size (megabytes of hex in every explain/log of the plan),
  * while a non-child field prints truncated. It ships to executors
  * once per stage inside the task binary, like any literal would.
  */
case class BloomMc(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_mc"
  override def toString: String =
    s"bloom_mc($child, <${bytes.length}B sketch>)"

  // Content-based equality (review r14): the case-class default over
  // Array[Byte] is REFERENCE equality, so two BloomMc nodes built
  // from equal sketch bytes never compare semanticEquals — Catalyst
  // could not deduplicate them (no ReusedExchange across plan
  // branches, no common-subexpression elimination), duplicating the
  // probe stage per branch at the sketch's 1.2 GB design point.
  override def equals(other: Any): Boolean = other match {
    case BloomMc(c, b) =>
      c == child && java.util.Arrays.equals(b, bytes)
    case _ => false
  }
  // cached (review r16): Catalyst calls hashCode repeatedly during
  // planning (ExpressionSet, semanticHash, EquivalentExpressions —
  // the very dedup this override enables), and an uncached
  // Arrays.hashCode re-scans the whole sketch per call — seconds per
  // probe at the 1.2 GB design point, turning plan optimization into
  // a driver stall
  @transient private lazy val bytesHash = java.util.Arrays.hashCode(bytes)
  override def hashCode(): Int = 31 * child.hashCode() + bytesHash
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeChecks.expectLong(child, prettyName)

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override protected def nullSafeEval(v: Any): Any =
    bf.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, v => s"$ref.mightContainLong($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMc =
    copy(child = newChild)
}

object BloomMc {

  /** Build a Bloom filter over a LongType column with a mergeable
    * per-partition aggregate. `putLong`/`mightContainLong` are the
    * matched pair — the build and the probe hash identically by
    * construction (not an assumption about `df.stat`'s internals).
    */
  def buildLongBloom(df: DataFrame, colName: String,
                     expectedItems: Long, fpp: Double): Array[Byte] = {
    val keys: RDD[Long] =
      df.select(col(colName).cast("long")).na.drop()
        .rdd.map(_.getLong(0))
    val bf = keys.treeAggregate(BloomFilter.create(expectedItems, fpp))(
      (b, v) => { b.putLong(v); b },
      (a, b) => a.mergeInPlace(b))
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Column-API probe over a LongType column. */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    GraftColumnBridge.column(
      BloomMc(GraftColumnBridge.expression(c), bloomBytes))
}
