package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{ScoredId, TopKByScore, TopKFunctions}

/** Bounded top-k aggregate: heap semantics, deterministic tie-break, and the
  * partial+final (merge/serde) contract that keeps kNN-join shuffles k-row.
  */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def agg = TopKByScore(
    org.apache.spark.sql.catalyst.expressions.Literal(null,
      org.apache.spark.sql.types.NullType), k = 3)

  test("keeps the k best with smaller-id winning ties") {
    val rows = spark.createDataFrame(Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.7), (6L, 0.9)))
      .toDF("id", "sim")
      .agg(TopKFunctions.top_k_by_score(struct(col("sim"), col("id")), 3).as("top"))
      .select(posexplode(col("top"))).select("col.id", "col.sim")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // ORDER BY sim DESC, id ASC LIMIT 3: the three 0.9s, id-ascending
    assert(rows.toSeq == Seq((2L, 0.9), (3L, 0.9), (6L, 0.9)))
  }

  test("merge + serde preserve the global top-k across partial buffers") {
    val a = agg
    val b1 = a.createAggregationBuffer()
    val b2 = a.createAggregationBuffer()
    Seq(ScoredId(0.1, 10), ScoredId(0.8, 11), ScoredId(0.3, 12)).foreach(e =>
      { b1.add(e); if (b1.size > 3) b1.poll() })
    Seq(ScoredId(0.9, 20), ScoredId(0.2, 21), ScoredId(0.8, 5)).foreach(e =>
      { b2.add(e); if (b2.size > 3) b2.poll() })
    val merged = a.merge(a.deserialize(a.serialize(b1)), b2)
    val out = a.eval(merged).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val got = (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 2); (r.getLong(0), r.getDouble(1))
    }
    // global best three: (20, 0.9), then the 0.8 tie broken toward id 5
    assert(got == Seq((20L, 0.9), (5L, 0.8), (11L, 0.8)))
  }

  test("knnJoin plans the bounded aggregate partial+final, query side broadcast") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val df = graft.similarity.Similarity.knnJoin(
      emb, emb.filter(col("vec_id") % 100 === 0), k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_by_score"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    // every query got exactly k neighbors, ranked
    val got = df.collect()
    assert(got.length == 5 * 5)
    assert(got.map(_.getInt(1)).toSeq.sorted.distinct == Seq(0, 1, 2, 3, 4))
  }
}
