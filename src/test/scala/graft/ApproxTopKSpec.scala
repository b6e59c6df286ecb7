package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{ApproxTopK, ApproxTopKFunctions}

/** Misra-Gries heavy hitters: exact when capacity covers the vocabulary,
  * guaranteed-recovery + bounded undercount when it doesn't, and a correct
  * mergeable/serializable buffer (the partial+final contract).
  */
class ApproxTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def agg = ApproxTopK(
    org.apache.spark.sql.catalyst.expressions.Literal("x"), k = 5, capacity = 8)

  private def update(m: java.util.HashMap[String, Long], s: String): Unit = {
    val a = ApproxTopK(org.apache.spark.sql.catalyst.expressions.Literal(s), 5, 8)
    a.update(m, null)
  }

  test("exact counts when distinct values fit the capacity") {
    val df = spark.createDataFrame(
      Seq.tabulate(300)(i => Tuple1(s"tok${i % 6}"))).toDF("t")
    val rows = df.agg(ApproxTopKFunctions.approx_top_k(col("t"), 6, 64).as("top"))
      .select(posexplode(col("top"))).select("col.item", "col.est_n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq.tabulate(6)(i => (s"tok$i", 50L)))
  }

  test("heavy hitter survives capacity pressure with bounded undercount") {
    // 10k heavy + 5000 distinct singletons, capacity 100:
    // MG guarantees count(heavy) >= true - n/capacity = 10000 - 150
    val data = Seq.fill(10000)("HEAVY") ++ Seq.tabulate(5000)(i => s"rare$i")
    val shuffled = new scala.util.Random(42).shuffle(data)
    val rows = spark.createDataFrame(shuffled.map(Tuple1(_))).toDF("t")
      .repartition(8)
      .agg(ApproxTopKFunctions.approx_top_k(col("t"), 1, 100).as("top"))
      .select(posexplode(col("top"))).select("col.item", "col.est_n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 1 && rows(0)._1 == "HEAVY", rows.toSeq)
    assert(rows(0)._2 >= 10000 - 150 && rows(0)._2 <= 10000, rows.toSeq)
  }

  test("buffer serde round-trips and merge sums counts") {
    val a = agg
    val m1 = a.createAggregationBuffer()
    Seq("a", "a", "b").foreach(update(m1, _))
    val m2 = a.deserialize(a.serialize(m1))
    assert(m2 == m1)
    val m3 = a.createAggregationBuffer()
    Seq("a", "c").foreach(update(m3, _))
    val merged = a.merge(m2, m3)
    assert(merged.get("a") == 3L && merged.get("b") == 1L && merged.get("c") == 1L)
  }

  test("merge re-trims to capacity keeping the heavy entries") {
    val a = agg // capacity 8
    val m1 = a.createAggregationBuffer()
    val m2 = a.createAggregationBuffer()
    (0 until 8).foreach(i => m1.put(s"l$i", if (i == 0) 100L else 1L))
    (0 until 8).foreach(i => m2.put(s"r$i", if (i == 0) 100L else 1L))
    val merged = a.merge(m1, m2)
    assert(merged.size <= 8, s"size=${merged.size}")
    assert(merged.get("l0") >= 99L && merged.get("r0") >= 99L)
  }
}
