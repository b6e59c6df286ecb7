package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Scale
import graft.similarity.{Ivf, Similarity}
import graft.domain.GridData

class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    val direct = li.groupBy(col("l_returnflag").as("k"))
      .agg(sum("l_quantity").as("total"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Scale.saltedSumCount(li, col("l_returnflag"), col("l_quantity"), 8)
      .as[(String, Double, Long)].collect().toSet
    assert(salted == direct)
  }

  test("bucketed co-located join plans with no shuffle exchange") {
    val o = Tables.orders(spark, TestSpark.sf)
    val c = Tables.customer(spark, TestSpark.sf)
    Scale.writeBucketed(o.select("o_custkey", "o_totalprice"), "b_orders", "o_custkey", 4)
    Scale.writeBucketed(c.select("c_custkey", "c_acctbal"), "b_cust", "c_custkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_orders").join(spark.table("b_cust"),
        col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(j.count() == o.join(c, o("o_custkey") === c("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IVF top-k has decent overlap with brute force") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val cents = Ivf.train(emb, k = 8, iters = 2)
    assert(cents.length == 8 && cents.forall(_.length == 64))
    val exact = Similarity.cosineTopK(emb, 1L, 50).select("vec_id").as[Long].collect().toSet
    val ivf = Ivf.topK(emb, cents, 1L, 10, nprobe = 2).select("vec_id").as[Long].collect()
    assert(ivf.nonEmpty)
    val overlap = ivf.count(exact.contains).toDouble / ivf.length
    assert(overlap >= 0.2, s"IVF overlap with exact top-50 too low: $overlap")
  }

  test("NODATA nulls never leak into aggregates (grid)") {
    val cells = GridData.cells(spark)
    val (nAll, nVal) = cells.agg(count(lit(1)), count(col("value")))
      .as[(Long, Long)].head()
    assert(nVal < nAll, "fixture should contain NODATA cells")
    // avg over non-null only: recompute manually
    val manual = cells.filter(col("value").isNotNull)
      .agg(sum("value") / count(lit(1))).as[Double].head()
    val auto = cells.agg(avg("value")).as[Double].head()
    assert(math.abs(manual - auto) < 1e-9)
    // percentile ignores nulls too
    val p = cells.agg(expr("percentile(value, 0.5)")).as[Double].head()
    assert(!p.isNaN)
  }
}
