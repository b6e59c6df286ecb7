package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-query probe of a serialized count-min sketch ("An improved data
  * stream summary: the count-min sketch", Cormode & Muthukrishnan '05).
  *
  * The sketch itself is built by Spark's built-in `count_min_sketch(col,
  * eps, confidence, seed)` aggregate — mergeable, partial+final, fixed
  * `depth×width` state per group — so corpus-scale frequency estimation
  * never shuffles the full token cardinality; only this probe is ours. At
  * 100 TB the sketch column is a few hundred KB per group no matter how many
  * billions of rows fed it, and probing happens on the handful of
  * already-aggregated group rows, never in the scan — which is why this is a
  * `CodegenFallback` (deserialization cost is per *group row*, not per input
  * row, and a one-entry cache below collapses the explode(probes) pattern to
  * one deserialization per sketch).
  *
  * (North-star frequency op; no reference counterpart — complements the
  * Misra-Gries heavy-hitter aggregate in [[ApproxTopK]]: that one answers
  * "which items are frequent", this one answers "how frequent is item X".)
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  // One-entry sketch cache: consecutive rows probing the same group's sketch
  // (the explode-probes shape) deserialize once. Arrays.equals is cheaper
  // than readFrom (no allocation, early exit on first differing byte), and
  // expressions are task-local so plain mutable fields are safe.
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    if (cachedSketch == null || !Arrays.equals(bytes, cachedBytes)) {
      cachedBytes = bytes.clone()
      cachedSketch = CountMinSketch.readFrom(bytes)
    }
    cachedSketch.estimateCount(item.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsFunctions {
  /** Estimated count of string `item` in the serialized sketch `cms`. */
  def cms_estimate(cms: Column, item: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(cms), ColumnBridge.expression(item)))
}
