package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types._

/** Morton / Z-order interleave of two 32-bit keys into one 64-bit sort key
  * (Morton '66; the bit-spreading masks are the standard public "Bit
  * Twiddling Hacks" parallel-prefix form). Sorting by `z` places rows that
  * are close in BOTH dimensions into the same parquet files/row groups, so
  * a conjunctive 2-D range filter (bbox, the reference's F3 hyperslab
  * semantics on tabular data) hits a handful of files whose column min/max
  * stats are tight, instead of matching a sliver of every file — the
  * standard clustered-layout lever for multi-dimensional pruning at 100 TB
  * (same idea as Delta/Iceberg Z-ORDER clustering).
  *
  * Codegen'd: layout writes evaluate this once per row over the whole
  * table; the interleave is ~12 shift/mask ops, no branches.
  */
case class ZOrder64(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = ZOrder64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.interleave($x, $y);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

object ZOrder64 {
  /** Spread the low 32 bits of `v` into the even bit positions of a long. */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** z = x bits in even positions, y bits in odd positions. */
  def interleave(x: Int, y: Int): Long = spread(x) | (spread(y) << 1)
}

object ZOrderFunctions {
  /** 64-bit Z-order key of two int columns (quantize doubles first). */
  def zorder64(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrder64(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
