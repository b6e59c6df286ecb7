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

/** All pigeonhole block-combination keys of a 64-bit SimHash fingerprint in
  * ONE loop: the Manku/Jain/Das Sarma (WWW'07 §3) construction splits the
  * fingerprint into `maxDist + 3` blocks and emits one key per 3-block
  * combination (`C(b,3)` of them), so two fingerprints within hamming
  * distance ≤ maxDist share at least one key exactly. Bit-identical to the
  * compositional form in `Dedup.simhashBlockKeysCompositional` (parity test
  * in DedupSpec): combination order is Scala's lexicographic
  * `combinations(3)`, and each key folds its blocks as
  * `k = (k << width) | ((fp >> offset) & mask)`.
  *
  * Why an expression: at the production maxDist=3 the compositional form is
  * an `array` of 20 structs × 3 shift/mask/or chains — inside the candidate
  * join's projection it pushed whole-stage codegen past the JVM's 64 KB
  * method limit (generated.java ~16k lines), silently dropping the stage to
  * interpreted eval. One data-driven loop over precomputed (offset, width)
  * triples keeps the generated method a few lines at any maxDist.
  */
case class SimHashBlockKeys(child: Expression, maxDist: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  require(maxDist >= 1 && maxDist <= 12, s"maxDist $maxDist out of range")
  private val b = maxDist + 3
  private val widths = (0 until b).map(i => 64 / b + (if (i < 64 % b) 1 else 0))
  private val offsets = widths.scanLeft(0)(_ + _)
  // flattened (offset, width) per combo slot: combo g uses slots 3g..3g+2
  @transient private lazy val combos: Array[Int] =
    (0 until b).combinations(3).toArray.flatten
  @transient private lazy val slotOff: Array[Int] = combos.map(offsets(_))
  @transient private lazy val slotW: Array[Int] = combos.map(widths(_))
  private def nGroups = combos.length / 3

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("k", LongType, nullable = false))),
    containsNull = false)
  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(LongType)

  override protected def nullSafeEval(input: Any): Any = {
    val fp = input.asInstanceOf[Long]
    val out = new Array[Any](nGroups)
    var g = 0
    while (g < nGroups) {
      var k = 0L
      var s = 3 * g
      while (s < 3 * g + 3) {
        k = (k << slotW(s)) | ((fp >> slotOff(s)) & ((1L << slotW(s)) - 1))
        s += 1
      }
      out(g) = org.apache.spark.sql.catalyst.InternalRow(g, k)
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, fp => {
      val offRef = ctx.addReferenceObj("slotOff", slotOff, "int[]")
      val wRef = ctx.addReferenceObj("slotW", slotW, "int[]")
      val out = ctx.freshName("out"); val g = ctx.freshName("g")
      val k = ctx.freshName("k"); val s = ctx.freshName("s")
      s"""
         |Object[] $out = new Object[$nGroups];
         |for (int $g = 0; $g < $nGroups; $g++) {
         |  long $k = 0L;
         |  for (int $s = 3 * $g; $s < 3 * $g + 3; $s++) {
         |    $k = ($k << $wRef[$s]) | (($fp >> $offRef[$s]) & ((1L << $wRef[$s]) - 1L));
         |  }
         |  $out[$g] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { $g, $k });
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash_block_keys"
}

object SimHashFunctions {
  /** Fingerprint of an `array<bigint>` token-hash column. */
  def simhash64(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokenHashes)))

  /** Pigeonhole combination keys `array<struct<g:int, k:bigint>>` of a
    * fingerprint for hamming-distance ≤ maxDist candidate generation. */
  def simhash_block_keys(fp: Column, maxDist: Int): Column =
    ColumnBridge.column(SimHashBlockKeys(ColumnBridge.expression(fp), maxDist))
}
