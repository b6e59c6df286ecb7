package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math (similarity search / ANN,
  * north-star ops — no reference implementation; the reference's only vector
  * math is the squared-distance argmin `Gddp.scala:25-38`).
  *
  * Implemented as codegen'd `Expression`s rather than Scala UDFs so the hot
  * loop (64-float dot product per row pair) stays inside WholeStageCodegen
  * with no boxing: at 100 TB a brute-force scan evaluates this billions of
  * times. Float elements are widened to double per element, summed
  * sequentially — bit-identical to the DuckDB oracle's
  * `list_dot_product(list_transform(e, x -> CAST(x AS DOUBLE)), …)`.
  *
  * Array elements must be non-null (embedding vectors); both FloatType and
  * DoubleType element types are supported.
  */
abstract class ArrayPairFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def getD(a: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType   => a.getLong(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  /** Java source for `arr.get<T>(i)` widened to double. */
  protected def getterSrc(arr: String, idx: String, et: DataType): String = et match {
    case FloatType   => s"(double) $arr.getFloat($idx)"
    case DoubleType  => s"$arr.getDouble($idx)"
    case IntegerType => s"(double) $arr.getInt($idx)"
    case LongType    => s"(double) $arr.getLong($idx)"
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }
}

/** dot(a, b) = Σ aᵢ·bᵢ in double. */
case class DotProduct(left: Expression, right: Expression) extends ArrayPairFoldExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val (et1, et2) = (elementType(left), elementType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += getD(x, i, et1) * getD(y, i, et2); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (${getterSrc(a, i, elementType(left))}) * (${getterSrc(b, i, elementType(right))});
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** cosine(a, b) = dot(a,b) / (‖a‖·‖b‖), one fused pass over both arrays.
  * A zero-norm operand (all-zero vector) has no defined angle → NULL, not NaN
  * (NaN would poison downstream top-k ordering; NULLs sort out cleanly).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends ArrayPairFoldExpression {
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val (et1, et2) = (elementType(left), elementType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = getD(x, i, et1); val yi = getD(y, i, et2)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = ${getterSrc(a, i, elementType(left))};
         |  double $yi = ${getterSrc(b, i, elementType(right))};
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_similarity"
}

object VectorFunctions {
  /** Array-of-doubles literal — the one shared helper behind every vector
    * constant (IVF centroids, LSH planes, PQ codebooks/LUTs). */
  def array_lit(c: Array[Double]): Column =
    org.apache.spark.sql.functions.array(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(
        c.map(org.apache.spark.sql.functions.lit)): _*)

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
