package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash (Charikar '02) of a token-hash array, as one codegen'd
  * expression: a single pass over the array maintains all 64 bit-counters in a
  * local `int[64]`, then bit k of the fingerprint is set iff a majority of
  * token hashes set bit k.
  *
  * Why an expression and not an aggregate: the fingerprint is per-document, so
  * computing it as `groupBy(doc_id).agg(64 × sum(bit_k))` (round 1) pays an
  * explode + a 65-column hash-aggregate shuffle for what is really a scalar
  * map over each row's own token list. As a scalar expression there is NO
  * shuffle at all — at 100 TB the fingerprint stage is a pure scan.
  * (North-star dedup op; no reference counterpart — SURVEY.md §2B.)
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  // analysis-time type check (+ widening cast for narrower integral arrays):
  // without it a mistyped child fails at runtime inside getLong
  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(ArrayType(LongType))

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var k = 0
      while (k < 64) { cnt(k) += ((h >>> k) & 1L).toInt; k += 1 }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) { if (2L * cnt(k) > n) fp |= 1L << k; k += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val h = ctx.freshName("h"); val fp = ctx.freshName("fp")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $k = 0; $k < 64; $k++) { $cnt[$k] += (int) (($h >>> $k) & 1L); }
         |}
         |long $fp = 0L;
         |for (int $k = 0; $k < 64; $k++) { if (2L * $cnt[$k] > $n) $fp |= 1L << $k; }
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHashFunctions {
  /** Fingerprint of an `array<bigint>` token-hash column. */
  def simhash64(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokenHashes)))
}
