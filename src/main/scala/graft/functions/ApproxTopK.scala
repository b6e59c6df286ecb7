package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.TypeBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries / space-saving heavy hitters ("Finding repeated elements",
  * Misra & Gries '82; SpaceSaving, Metwally et al. '05) as a mergeable
  * `TypedImperativeAggregate`: at most `capacity` counters per buffer,
  * partial+final like any built-in aggregate, so the frequent-items question
  * needs NO full-cardinality shuffle — the 100 TB path for "top tokens /
  * domains / n-grams" where exact groupBy-count would shuffle billions of
  * distinct keys. Guarantees: any item with true count > n/capacity survives;
  * estimates undercount by at most (true n-th largest deficit) ≤ n/capacity.
  * When `capacity` exceeds the true distinct count the counts are EXACT.
  *
  * (North-star op; no reference counterpart — the reference has no text or
  * frequency analytics.)
  */
case class ApproxTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(k > 0 && capacity >= k, s"need capacity ($capacity) >= k ($k) > 0")

  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est_n", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](capacity * 2)

  private def decrementAll(m: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  override def update(m: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val cur = m.get(s)
      if (cur != 0L || m.containsKey(s)) m.put(s, cur + 1)
      else if (m.size < capacity) m.put(s, 1L)
      else decrementAll(m, 1L) // Misra-Gries step: no counter free, all decay
    }
    m
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b.forEach { (s, n) => a.put(s, a.get(s) + n) } // unboxed null get = 0
    // re-trim: subtract the (size-capacity)-th smallest count so at most
    // `capacity` positive counters remain (standard mergeable-MG reduction)
    if (a.size > capacity) {
      val counts = new Array[Long](a.size)
      var i = 0
      a.forEach { (_, n) => counts(i) = n; i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(a, counts(a.size - capacity - 1))
    }
    a
  }

  override def eval(m: java.util.HashMap[String, Long]): Any = {
    val top = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    m.forEach { (s, n) => top += ((s, n)) }
    val rows = top.sortBy { case (s, n) => (-n, s) }.take(k).map { case (s, n) =>
      InternalRow(UTF8String.fromString(s), n)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(m: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(m.size)
    m.forEach { (s, n) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(n)
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      m.put(new String(b, StandardCharsets.UTF_8), in.readLong())
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ApproxTopK =
    copy(child = newChild)
  override def prettyName: String = "approx_top_k"
}

object ApproxTopKFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Top-k frequent values of a string column, `capacity`-bounded sketch. */
  def approx_top_k(c: Column, k: Int, capacity: Int): Column =
    ColumnBridge.column(
      ApproxTopK(ColumnBridge.expression(c), k, capacity).toAggregateExpression())
}
