package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.TypeBridge
import org.apache.spark.sql.types._

/** One kept candidate: compared so the priority-queue HEAD is the WORST
  * (lowest sim; among ties, the largest id — so a tied smaller id wins).
  */
private[graft] final case class ScoredId(sim: Double, id: Long)
  extends Comparable[ScoredId] {
  override def compareTo(o: ScoredId): Int = {
    val bySim = java.lang.Double.compare(sim, o.sim)
    if (bySim != 0) bySim else java.lang.Long.compare(o.id, id)
  }
}

/** Bounded top-k-by-score aggregate: keeps the k highest-`sim` (id, sim)
  * pairs in a size-k heap, mergeable partial+final. This is what makes a kNN
  * JOIN scale: per (group × partition) only k candidates survive the map
  * side, so the shuffle carries k rows per group instead of the whole scored
  * corpus — the difference between a top-k and a global sort at 100 TB.
  * Ties break toward the smaller id (= `ORDER BY sim DESC, id` semantics),
  * so results are deterministic and oracle-checkable.
  *
  * Input: struct<sim: double, id: bigint>. Output: array<struct<id, sim>>
  * best-first.
  */
case class TopKByScore(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[ScoredId]]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StructType(Seq(
    StructField("sim", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): java.util.PriorityQueue[ScoredId] =
    new java.util.PriorityQueue[ScoredId](k + 1)

  private def offer(q: java.util.PriorityQueue[ScoredId], e: ScoredId): Unit =
    if (q.size < k) q.add(e)
    else if (e.compareTo(q.peek()) > 0) { q.poll(); q.add(e) }

  override def update(q: java.util.PriorityQueue[ScoredId],
      input: InternalRow): java.util.PriorityQueue[ScoredId] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        offer(q, ScoredId(row.getDouble(0), row.getLong(1)))
    }
    q
  }

  override def merge(a: java.util.PriorityQueue[ScoredId],
      b: java.util.PriorityQueue[ScoredId]): java.util.PriorityQueue[ScoredId] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(q: java.util.PriorityQueue[ScoredId]): Any = {
    val arr = q.toArray(new Array[ScoredId](q.size))
    java.util.Arrays.sort(arr, java.util.Comparator.reverseOrder[ScoredId]()) // best first
    new GenericArrayData(arr.map(e => InternalRow(e.id, e.sim)): Array[Any])
  }

  override def serialize(q: java.util.PriorityQueue[ScoredId]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + q.size * 16)
    bb.putInt(q.size)
    val it = q.iterator()
    while (it.hasNext) { val e = it.next(); bb.putDouble(e.sim); bb.putLong(e.id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[ScoredId] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    (0 until n).foreach(_ => q.add(ScoredId(bb.getDouble, bb.getLong)))
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKByScore =
    copy(child = newChild)
  override def prettyName: String = "top_k_by_score"
}

object TopKFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Top-k of a `struct(sim, id)` column, best-first `array<struct<id, sim>>`. */
  def top_k_by_score(c: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(c), k).toAggregateExpression())
}
