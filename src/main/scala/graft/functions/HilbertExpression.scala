package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types._

/** Hilbert-curve index of two 32-bit keys into one 63-bit sort key — the
  * OTHER clustering curve (Iceberg's `hilbert` transform next to Z-order).
  * The Hilbert curve's defining property is unit-step locality: consecutive
  * indices are Manhattan-adjacent cells, so it has no Z-order "seams" (the
  * long diagonal jumps where Morton adjacency breaks) and per-file [min,
  * max] envelopes come out tighter on average for box queries. Standard
  * quadrant-recursion xy2d (Hilbert 1891; the public iterative
  * formulation): per level, the quadrant bits pick one of 4 sub-squares
  * (Gray-coded into the index) and the lower bits rotate/reflect into that
  * sub-square's frame.
  *
  * Inputs map through a sign flip (so the signed int order becomes the
  * unsigned grid order) and drop one low bit, giving a 31-bit grid whose
  * 62-bit index stays positive in a signed long. Codegen'd: layout writes
  * evaluate this once per row; 31 iterations of shift/mask, no allocation.
  */
case class Hilbert64(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert64"

  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert64.index(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = Hilbert64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.index($x, $y);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hilbert64 =
    copy(left = newLeft, right = newRight)
}

object Hilbert64 {
  /** Grid order: 31 bits per axis (62-bit index, positive in a long). */
  val Order = 31

  /** Column value → grid coordinate: sign-flip maps the signed int order
    * onto [0, 2^32), then one low bit drops to fit the 31-bit grid.
    */
  @inline private def toGrid(v: Int): Long =
    ((v ^ Int.MinValue) >>> 1).toLong & 0x7FFFFFFFL

  /** xy2d on the 2^31 grid. Invariant at each level: (x, y) are coordinates
    * WITHIN the current sub-square of size 2s — the rotation re-expresses
    * the low bits in the chosen quadrant's frame, so values never leave
    * [0, s) going in.
    */
  def index(x0: Int, y0: Int): Long =
    indexOrder(toGrid(x0), toGrid(y0), Order)

  /** xy2d core on a 2^order grid — exposed for the property tests. */
  def indexOrder(gx: Long, gy: Long, order: Int): Long = {
    var x = gx
    var y = gy
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      val xl = x & (s - 1); val yl = y & (s - 1)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - yl; y = s - 1 - xl } // reflect + swap
        else { x = yl; y = xl } // swap
      } else { x = xl; y = yl }
      s >>= 1
    }
    d
  }

  /** The inverse (d2xy) on an order-`k` grid — test-surface for the curve
    * properties (bijectivity, unit-step adjacency); not used by layouts.
    */
  def inverse(d: Long, order: Int): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = d
    var s = 1L
    while (s < (1L << order)) {
      val rx = (t / 2) & 1
      val ry = (t ^ rx) & 1
      // un-rotate the coordinates accumulated so far
      if (ry == 0) {
        if (rx == 1) { val tx = x; x = s - 1 - y; y = s - 1 - tx }
        else { val tx = x; x = y; y = tx }
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

object HilbertFunctions {
  /** 63-bit Hilbert key of two int columns (quantize doubles first). */
  def hilbert64(x: Column, y: Column): Column =
    ColumnBridge.column(Hilbert64(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))
}

/** N-DIMENSIONAL Hilbert index — the d-dim generalization of [[Hilbert64]]
  * via the public Skilling transform (J. Skilling, "Programming the Hilbert
  * curve", AIP Conf. Proc. 707, 2004): coordinates → transposed Hilbert
  * form in place (Gray code + per-level bit exchanges), then the index is
  * the bit-interleave of the transposed words. Iterative, allocation-light
  * (one n-long scratch array per row), and exact for any `n·bits ≤ 63`.
  * The 2-D [[Hilbert64]] stays the codegen'd fast path for int pairs; this
  * covers the (time, x, y)-style 3-D+ layouts a raster archive clusters by.
  */
object HilbertN {
  /** Skilling AxestoTranspose, in place over `x` (n words of `bits` bits). */
  private def axesToTranspose(x: Array[Long], bits: Int): Unit = {
    val n = x.length
    val m = 1L << (bits - 1)
    // inverse undo
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
  }

  /** Skilling TransposetoAxes — the inverse, for the property tests. */
  private def transposeToAxes(x: Array[Long], bits: Int): Unit = {
    val n = x.length
    val m = 1L << bits
    // Gray decode by H ^ (H/2)
    val t0 = x(n - 1) >> 1
    var i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t0
    // undo excess work
    var q = 2L
    while (q != m) {
      val p = q - 1
      var j = n - 1
      while (j >= 0) {
        if ((x(j) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(j)) & p; x(0) ^= t; x(j) ^= t }
        j -= 1
      }
      q <<= 1
    }
  }

  /** Hilbert index of `coords` on the 2^bits grid (requires every
    * coordinate in [0, 2^bits) and `coords.length * bits <= 63`). */
  def index(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val x = new Array[Long](n)
    System.arraycopy(coords, 0, x, 0, n)
    axesToTranspose(x, bits)
    var d = 0L
    var b = bits - 1
    while (b >= 0) {
      var i = 0
      while (i < n) { d = (d << 1) | ((x(i) >> b) & 1L); i += 1 }
      b -= 1
    }
    d
  }

  /** d2axes — test-surface for bijectivity/adjacency locks. */
  def inverse(d: Long, bits: Int, n: Int): Array[Long] = {
    val x = new Array[Long](n)
    var pos = n * bits - 1
    var b = bits - 1
    while (b >= 0) {
      var i = 0
      while (i < n) { x(i) |= ((d >> pos) & 1L) << b; pos -= 1; i += 1 }
      b -= 1
    }
    transposeToAxes(x, bits)
    x
  }
}

/** `hilbertN(bits, rank1, …, rankN)` as a Catalyst expression: evaluates
  * [[HilbertN.index]] once per row over long rank children (already
  * canonicalized to [0, 2^bits) by the caller — see
  * `Snapshots.clusterHilbertCols`). Codegen'd: one stack array + one
  * static call, no boxing on the hot path.
  */
case class HilbertNKey(children: Seq[Expression], bits: Int)
  extends Expression with ImplicitCastInputTypes {
  require(children.nonEmpty && children.size * bits <= 63,
    s"hilbertN: ${children.size} dims x $bits bits exceeds a signed long")

  override def inputTypes: Seq[TypeBridge.AbstractType] =
    Seq.fill(children.size)(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "hilbert_n"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val coords = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      coords(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertN.index(coords, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val cls = HilbertN.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("coords")
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    val fill = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.value};"
    }.mkString("\n")
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          long[] $arr = new long[${children.size}];
          $fill
          ${ev.value} = $cls.index($arr, $bits);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertNKey =
    copy(children = newChildren)
}

object HilbertNFunctions {
  /** Hilbert key of N long rank columns on a 2^bits grid. */
  def hilbertN(bits: Int, ranks: Column*): Column =
    ColumnBridge.column(HilbertNKey(
      ranks.map(ColumnBridge.expression), bits))
}
