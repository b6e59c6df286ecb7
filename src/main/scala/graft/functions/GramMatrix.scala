package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.TypeBridge
import org.apache.spark.sql.types._

/** Mutable moment buffer for a population covariance (Gram) matrix over a
  * vector column: count, per-dimension sums, and the upper triangle of the
  * raw cross-product matrix Σ xᵢxⱼ. Dimension is fixed by the FIRST vector
  * seen (lazily — the aggregate doesn't need the width at plan time) and a
  * later mismatch fails loudly: a corpus mixing embedding widths is corrupt,
  * not averageable.
  *
  * This is the single-pass distributed shape for d×d covariance: each
  * partition folds its rows into one O(d²) buffer, partials merge by
  * elementwise add, and nothing row-sized ever crosses the shuffle — versus
  * the explode-and-self-join formulation, whose shuffle carries d²/2 rows
  * PER INPUT ROW (the DuckDB oracle does exactly that, which is fine at
  * oracle scale and a scale-killer at 100 TB).
  */
final class GramBuffer extends Serializable {
  var d: Int = -1
  var n: Long = 0L
  var sum: Array[Double] = null
  var prod: Array[Double] = null // upper triangle row-major: (i,j) i<=j

  private def init(dim: Int): Unit = {
    require(dim > 0, s"gram_matrix: empty vector")
    d = dim
    sum = new Array[Double](dim)
    prod = new Array[Double](dim * (dim + 1) / 2)
  }

  def add(a: ArrayData, getD: (ArrayData, Int) => Double): Unit = {
    val dim = a.numElements()
    if (d < 0) init(dim)
    require(dim == d, s"gram_matrix: vector width $dim != first-seen width $d")
    var i = 0; var k = 0
    while (i < d) {
      val xi = getD(a, i)
      sum(i) += xi
      var j = i
      while (j < d) { prod(k) += xi * getD(a, j); j += 1; k += 1 }
      i += 1
    }
    n += 1
  }

  def merge(o: GramBuffer): Unit = {
    if (o.d < 0) return
    if (d < 0) init(o.d)
    require(o.d == d, s"gram_matrix: merging width ${o.d} into width $d")
    n += o.n
    var i = 0
    while (i < d) { sum(i) += o.sum(i); i += 1 }
    i = 0
    while (i < prod.length) { prod(i) += o.prod(i); i += 1 }
  }

  /** cov(i,j) = Σxᵢxⱼ/n − (Σxᵢ/n)(Σxⱼ/n) — population covariance, the
    * textbook moment form both engines share.
    */
  def covariance(i: Int, j: Int): Double = {
    val (lo, hi) = if (i <= j) (i, j) else (j, i)
    val k = lo * d - lo * (lo - 1) / 2 + (hi - lo)
    prod(k) / n - (sum(lo) / n) * (sum(hi) / n)
  }
}

object GramBuffer {
  def toBytes(b: GramBuffer): Array[Byte] = {
    val d = math.max(b.d, 0)
    val bb = ByteBuffer.allocate(4 + 8 + d * 8 + d * (d + 1) / 2 * 8)
    bb.putInt(b.d); bb.putLong(b.n)
    var i = 0
    while (i < d) { bb.putDouble(b.sum(i)); i += 1 }
    i = 0
    while (i < d * (d + 1) / 2) { bb.putDouble(b.prod(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): GramBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new GramBuffer
    val d = bb.getInt; val n = bb.getLong
    if (d >= 0) {
      b.d = d; b.n = n
      b.sum = Array.fill(d)(bb.getDouble)
      b.prod = Array.fill(d * (d + 1) / 2)(bb.getDouble)
    }
    b
  }
}

/** `gram_matrix(vec)` → `array<struct<i:long, j:long, cov:double>>`: the
  * upper triangle of the population covariance matrix of a vector column,
  * as one mergeable aggregate (partial + final like any built-in). The
  * result is d²-sized — metadata, never data — so exploding it to rows
  * downstream is free. Feeds `q_embed_gram` (oracle-checked cell by cell)
  * and the driver-side eigensolve behind `q_embed_pca`.
  */
case class GramMatrixAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("cov", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def inputTypes: Seq[TypeBridge.AbstractType] =
    Seq(ArrayType(DoubleType))

  override def createAggregationBuffer(): GramBuffer = new GramBuffer

  override def update(buffer: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null)
      buffer.add(v.asInstanceOf[ArrayData], (a, i) => a.getDouble(i))
    buffer
  }

  override def merge(buffer: GramBuffer, other: GramBuffer): GramBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: GramBuffer): Any = {
    if (buffer.d < 0 || buffer.n == 0) return new GenericArrayData(Array.empty[Any])
    val d = buffer.d
    val out = new Array[Any](d * (d + 1) / 2)
    var i = 0; var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(k) = new GenericInternalRow(
          Array[Any](i.toLong, j.toLong, buffer.covariance(i, j)))
        j += 1; k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: GramBuffer): Array[Byte] = GramBuffer.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): GramBuffer = GramBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramMatrixAgg =
    copy(child = newChild)
  override def prettyName: String = "gram_matrix"
}

/** Stage 1 of the covariance rollup: per-shard moment buffer as BYTES —
  * compute once per shard at ingest, persist alongside the shard (the
  * `histogram_sketch` / HLL-sketch posture), and answer any
  * shard-combination's covariance later without rescanning rows. At 100 TB
  * the spectrum diagnostic then reads |shards| × O(d²) bytes, not the
  * corpus.
  */
case class GramSketch(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def inputTypes: Seq[TypeBridge.AbstractType] =
    Seq(ArrayType(DoubleType))

  override def createAggregationBuffer(): GramBuffer = new GramBuffer
  override def update(buffer: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null)
      buffer.add(v.asInstanceOf[ArrayData], (a, i) => a.getDouble(i))
    buffer
  }
  override def merge(buffer: GramBuffer, other: GramBuffer): GramBuffer = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: GramBuffer): Any = GramBuffer.toBytes(buffer)
  override def serialize(buffer: GramBuffer): Array[Byte] = GramBuffer.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): GramBuffer = GramBuffer.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): GramSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramSketch =
    copy(child = newChild)
  override def prettyName: String = "gram_sketch"
}

/** Stage 2: merge stage-1 sketch bytes and emit the covariance triangle —
  * [[GramMatrixAgg]]'s output shape. The moments are plain sums, so a
  * rolled-up result equals the single-pass one up to float-addition
  * reordering (ulp-scale); the declared queries round at 6 dp on both
  * engines, which absorbs it.
  */
case class GramMergeCov(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("cov", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(BinaryType)

  override def createAggregationBuffer(): GramBuffer = new GramBuffer
  override def update(buffer: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(GramBuffer.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }
  override def merge(buffer: GramBuffer, other: GramBuffer): GramBuffer = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: GramBuffer): Any = {
    if (buffer.d < 0 || buffer.n == 0) return new GenericArrayData(Array.empty[Any])
    val d = buffer.d
    val out = new Array[Any](d * (d + 1) / 2)
    var i = 0; var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(k) = new GenericInternalRow(
          Array[Any](i.toLong, j.toLong, buffer.covariance(i, j)))
        j += 1; k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override def serialize(buffer: GramBuffer): Array[Byte] = GramBuffer.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): GramBuffer = GramBuffer.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): GramMergeCov =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMergeCov =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramMergeCov =
    copy(child = newChild)
  override def prettyName: String = "gram_merge_cov"
}

object GramFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column form of [[GramMatrixAgg]], usable in `agg(...)` / `groupBy`. */
  def gram_matrix(c: Column): Column =
    ColumnBridge.column(
      GramMatrixAgg(ColumnBridge.expression(c)).toAggregateExpression())

  /** Per-shard moment sketch bytes ([[GramSketch]]). */
  def gram_sketch(c: Column): Column =
    ColumnBridge.column(
      GramSketch(ColumnBridge.expression(c)).toAggregateExpression())

  /** Merge sketch bytes → covariance triangle ([[GramMergeCov]]). */
  def gram_merge_cov(c: Column): Column =
    ColumnBridge.column(
      GramMergeCov(ColumnBridge.expression(c)).toAggregateExpression())
}
