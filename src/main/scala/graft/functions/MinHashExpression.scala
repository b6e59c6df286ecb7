package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

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

/** All LSH band hashes of a minhash signature in ONE loop. Bit-identical to
  * the compositional form
  * `array((0 until n/rows).map(b => struct(b, xxhash64(sig[b*rows+1] ..
  * sig[b*rows+rows]))))` — Spark's n-ary `xxhash64` folds
  * `h = XXH64.hashLong(child, h)` left-to-right from seed 42, reproduced
  * here (DedupSpec asserts parity).
  *
  * Why an expression: the compositional fan is `bands` structs × (`rows`
  * `element_at` + an `xxhash64`) of generated code, and inside the dedup
  * pipeline's wider projections it pushed the codegen unit past the JVM's
  * 64 KB method limit — Janino's `InternalCompilerException: Code grows
  * beyond 64 KB` dropped the whole signature stage to interpreted mode (a
  * constant-factor regression on the 100-TB hot path). One loop keeps the
  * generated method tiny no matter how many bands.
  */
case class BandHashes(child: Expression, bandRows: Int, numPerms: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  private val bands = numPerms / bandRows
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band", IntegerType, nullable = false),
      StructField("bh", LongType, nullable = false))),
    containsNull = false)
  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(ArrayType(LongType))

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var r = 0
      while (r < bandRows) { h = XXH64.hashLong(a.getLong(b * bandRows + r), h); r += 1 }
      out(b) = org.apache.spark.sql.catalyst.InternalRow(b, h)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out"); val b = ctx.freshName("b")
      val r = ctx.freshName("r"); val h = ctx.freshName("h")
      s"""
         |Object[] $out = new Object[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = 42L;
         |  for (int $r = 0; $r < $bandRows; $r++) {
         |    $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
         |      $a.getLong($b * $bandRows + $r), $h);
         |  }
         |  $out[$b] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { $b, $h });
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "band_hashes"
}

object MinHashFunctions {
  /** Signature of an `array<bigint>` shingle-hash column. */
  def minhash_signature(shingleHashes: Column, numPerms: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingleHashes), numPerms))

  /** LSH band keys `array<struct<band:int, bh:bigint>>` of a signature. */
  def band_hashes(sig: Column, bandRows: Int, numPerms: Int): Column =
    ColumnBridge.column(BandHashes(ColumnBridge.expression(sig), bandRows, numPerms))
}
