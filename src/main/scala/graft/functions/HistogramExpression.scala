package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.TypeBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Mutable Ben-Haim/Tom-Yossef histogram buffer: sorted parallel arrays of
  * (centroid, count), at most `cap` bins after each insert. Same algorithm as
  * the immutable [[StreamingHistogram.Hist]] (insert, then merge the two
  * closest adjacent centroids while over cap) but with in-place arraycopy
  * updates — no per-row allocation.
  */
final class MutableHist(val cap: Int) extends Serializable {
  require(cap >= 1, s"histogram needs at least one bin (got $cap)")
  var size: Int = 0
  // one slot of headroom: insert may briefly hold cap+1 bins before compress
  val centroid = new Array[Double](cap + 1)
  val count = new Array[Long](cap + 1)

  def add(v: Double, n: Long): Unit = {
    var lo = 0; var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (centroid(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < size && centroid(lo) == v) { count(lo) += n; return }
    System.arraycopy(centroid, lo, centroid, lo + 1, size - lo)
    System.arraycopy(count, lo, count, lo + 1, size - lo)
    centroid(lo) = v; count(lo) = n; size += 1
    if (size > cap) compressOnce()
  }

  /** Merge the two closest adjacent centroids (the paper's update step). */
  private def compressOnce(): Unit = {
    var bestI = 0; var bestGap = Double.MaxValue
    var i = 0
    while (i < size - 1) {
      val gap = centroid(i + 1) - centroid(i)
      if (gap < bestGap) { bestGap = gap; bestI = i }
      i += 1
    }
    val n1 = count(bestI); val n2 = count(bestI + 1)
    centroid(bestI) = (centroid(bestI) * n1 + centroid(bestI + 1) * n2) / (n1 + n2)
    count(bestI) = n1 + n2
    System.arraycopy(centroid, bestI + 2, centroid, bestI + 1, size - bestI - 2)
    System.arraycopy(count, bestI + 2, count, bestI + 1, size - bestI - 2)
    size -= 1
  }

  def merge(o: MutableHist): Unit = {
    var i = 0
    while (i < o.size) { add(o.centroid(i), o.count(i)); i += 1 }
  }

  /** View as the immutable Hist for the (once-per-group) quantile math. */
  def toHist: StreamingHistogram.Hist =
    StreamingHistogram.Hist(
      Vector.tabulate(size)(i => (centroid(i), count(i))), cap)

  /** Type-7 (linear-interpolation) quantile over the bins treated as exact
    * (value, count) pairs — identical to Spark `percentile` / DuckDB
    * `quantile_cont` WHILE the histogram has never compressed (distinct
    * values ≤ cap: `add` dedups equal values, so bins stay exact and merges
    * of exact histograms stay exact). Past that the centroids are
    * approximations and so is this.
    */
  def quantileCont(p: Double): Double = {
    if (size == 0) return Double.NaN // same empty-input posture as Hist.quantile
    var total = 0L
    var i = 0
    while (i < size) { total += count(i); i += 1 }
    val h = (total - 1) * p
    val lo = math.floor(h).toLong
    val frac = h - lo
    def at(k: Long): Double = { // value at sorted 0-based position k
      var c = 0L; var j = 0
      while (j < size) { c += count(j); if (k < c) return centroid(j); j += 1 }
      centroid(size - 1)
    }
    val vlo = at(lo)
    if (frac == 0) vlo else vlo + frac * (at(lo + 1) - vlo)
  }
}

object MutableHist {
  /** Wire form shared by every histogram aggregate: size, centroids, counts. */
  def toBytes(h: MutableHist): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + h.size * 16)
    bb.putInt(h.size)
    var i = 0
    while (i < h.size) { bb.putDouble(h.centroid(i)); i += 1 }
    i = 0
    while (i < h.size) { bb.putLong(h.count(i)); i += 1 }
    bb.array()
  }

  /** Sized to hold the stored bins even when they exceed `cap` (a sketch
    * built with a larger cap merges fine — the TARGET buffer's cap governs).
    */
  def fromBytes(bytes: Array[Byte], cap: Int): MutableHist = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new MutableHist(math.max(cap, n))
    h.size = n
    var i = 0
    while (i < n) { h.centroid(i) = bb.getDouble; i += 1 }
    i = 0
    while (i < n) { h.count(i) = bb.getLong; i += 1 }
    h
  }
}

/** Shared TypedImperativeAggregate plumbing for the histogram family. */
sealed trait HistAggBase extends TypedImperativeAggregate[MutableHist] {
  def maxBins: Int
  override def createAggregationBuffer(): MutableHist = new MutableHist(maxBins)
  override def merge(buffer: MutableHist, other: MutableHist): MutableHist = {
    buffer.merge(other); buffer
  }
  override def serialize(buffer: MutableHist): Array[Byte] =
    MutableHist.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): MutableHist =
    MutableHist.fromBytes(bytes, maxBins)
}

/** The reference's break computation (`Gddp.scala:230-232`) as a
  * `TypedImperativeAggregate`: the buffer is a live [[MutableHist]] object,
  * serialized ONLY at partial-output/shuffle boundaries — unlike the typed
  * `Aggregator` surface, which round-trips the buffer through its encoder on
  * every update/merge (the round-2 q_hist_sketch cost). Partial+final
  * mergeable like any built-in aggregate.
  */
case class HistogramBreaks(
    child: Expression,
    numBreaks: Int,
    maxBins: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HistAggBase with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  require(numBreaks >= 1 && maxBins >= 1,
    s"need numBreaks ($numBreaks) >= 1 and maxBins ($maxBins) >= 1")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(DoubleType)

  override def update(buffer: MutableHist, input: InternalRow): MutableHist = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double], 1L)
    buffer
  }

  override def eval(buffer: MutableHist): Any =
    new GenericArrayData(buffer.toHist.quantileBreaks(numBreaks).toArray)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramBreaks =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramBreaks =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistogramBreaks =
    copy(child = newChild)
  override def prettyName: String = "histogram_breaks"
}

/** Stage 1 of the quantile-sketch rollup: per-shard histogram state as
  * BYTES, persistable like the HLL sketches of `q_hll_union` — compute once
  * per shard at ingest, answer any shard-combination's quantiles later
  * without rescanning (the 100 TB posture for A1,
  * `/root/reference/gddp/src/main/scala/Gddp.scala:230-232`).
  */
case class HistogramSketch(
    child: Expression,
    maxBins: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HistAggBase with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(maxBins >= 1, s"need maxBins ($maxBins) >= 1")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(DoubleType)

  override def update(buffer: MutableHist, input: InternalRow): MutableHist = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double], 1L)
    buffer
  }

  override def eval(buffer: MutableHist): Any = MutableHist.toBytes(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistogramSketch =
    copy(child = newChild)
  override def prettyName: String = "histogram_sketch"
}

/** Stage 2: merge stage-1 sketch bytes and evaluate type-7 quantiles — the
  * quantile twin of `hll_union_agg` + `hll_sketch_estimate`. Exact (equals
  * `percentile` / DuckDB `quantile_cont`) while total distinct values stay
  * within the bin budget; Ben-Haim/Tom-Yossef-approximate beyond it.
  */
case class HistogramMergeQuantiles(
    child: Expression,
    probs: Seq[Double],
    maxBins: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HistAggBase with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
    s"probabilities must be in [0, 1] (got $probs)")
  require(maxBins >= 1, s"need maxBins ($maxBins) >= 1")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(BinaryType)

  override def update(buffer: MutableHist, input: InternalRow): MutableHist = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(MutableHist.fromBytes(v.asInstanceOf[Array[Byte]], maxBins))
    buffer
  }

  override def eval(buffer: MutableHist): Any =
    new GenericArrayData(probs.map(buffer.quantileCont).toArray)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramMergeQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramMergeQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistogramMergeQuantiles =
    copy(child = newChild)
  override def prettyName: String = "histogram_merge_quantiles"
}

object HistogramFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column form of [[HistogramBreaks]], usable in `groupBy().agg(...)`. */
  def histogram_breaks(c: Column, numBreaks: Int, maxBins: Int = 64): Column =
    ColumnBridge.column(
      HistogramBreaks(ColumnBridge.expression(c), numBreaks, maxBins)
        .toAggregateExpression())

  /** Per-shard sketch bytes ([[HistogramSketch]]). */
  def histogram_sketch(c: Column, maxBins: Int = 64): Column =
    ColumnBridge.column(
      HistogramSketch(ColumnBridge.expression(c), maxBins)
        .toAggregateExpression())

  /** Merge sketch bytes → quantiles ([[HistogramMergeQuantiles]]). */
  def histogram_merge_quantiles(c: Column, probs: Seq[Double],
      maxBins: Int = 64): Column =
    ColumnBridge.column(
      HistogramMergeQuantiles(ColumnBridge.expression(c), probs, maxBins)
        .toAggregateExpression())
}
