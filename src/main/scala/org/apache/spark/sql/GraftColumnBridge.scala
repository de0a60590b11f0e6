package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-placed bridge to Spark's `private[sql]` Column↔Expression
  * converters (`classic.ExpressionUtils`). Needed for expressions that
  * cannot come through the function registry because they carry
  * non-Expression state — e.g. [[graft.functions.BloomMc]]'s sketch
  * bytes, which must NOT be a Binary literal child (a literal renders
  * proportional to its size in every plan string). The standard
  * pattern for Spark-native libraries; nothing here touches internals
  * beyond the two public-shaped converters.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
