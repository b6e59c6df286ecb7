package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numPerms` MinHash signature components in ONE pass over the shingle
  * array (Broder '97). Bit-identical to the compositional form
  * `array_min(transform(shingles, sh => xxhash64(lit(i), sh)))`: Spark's
  * `xxhash64(a, b)` folds XXH64 over its children starting from seed 42, so
  * component i is `min over sh of XXH64.hashLong(sh, XXH64.hashInt(i, 42))`
  * — the per-perm seeds are precomputed once.
  *
  * Why an expression: the compositional form re-traverses the array once per
  * permutation (32×), and the round-1 explode + 32-min hash-aggregate paid a
  * one-row-per-shingle explode plus a 33-column aggregation. As a scalar
  * expression the signature stage is a shuffle-free scan — at 100 TB the
  * dedup pipeline's only shuffles are the LSH band join and the
  * candidate verification. (North-star op; no reference counterpart.)
  */
case class MinHashSignature(child: Expression, numPerms: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // analysis-time type check (+ widening cast for narrower integral arrays):
  // without it a mistyped child fails at runtime inside getLong
  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(ArrayType(LongType))

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numPerms)(i => XXH64.hashInt(i, 42L))

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val e = a.getLong(j)
      var i = 0
      while (i < numPerms) {
        val h = XXH64.hashLong(e, seeds(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val e = ctx.freshName("e"); val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$numPerms];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $e = $a.getLong($j);
         |  for (int $i = 0; $i < $numPerms; $i++) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($e, $seedsRef[$i]);
         |    if ($h < $sig[$i]) $sig[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object MinHashFunctions {
  /** Signature of an `array<bigint>` shingle-hash column. */
  def minhash_signature(shingleHashes: Column, numPerms: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingleHashes), numPerms))
}
