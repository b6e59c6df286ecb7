package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CmsFunctions.cms_estimate

/** Count-min sketch probe (CmsEstimate over Spark's built-in
  * `count_min_sketch` aggregate): exact when the width dwarfs the
  * vocabulary, never-undercounting when it doesn't (the CMS guarantee),
  * mergeable across groups/partitions, and SQL-registered.
  */
class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tokensDf(n: Int, vocab: Int) = {
    import spark.implicits._
    Seq.tabulate(n)(i => s"tok${i % vocab}").toDF("t")
  }

  test("estimates are exact when width >> vocabulary") {
    val sk = tokensDf(600, 6)
      .agg(count_min_sketch(col("t"), lit(0.001d), lit(0.99d), lit(42)).as("cms"))
    val est = sk
      .select(explode(array((0 until 6).map(i => lit(s"tok$i")): _*)).as("t"), col("cms"))
      .select(cms_estimate(col("cms"), col("t")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(est == Seq.fill(6)(100L))
  }

  test("CMS never undercounts, even under width pressure") {
    // eps=0.5 → width 4 buckets for 64 distinct tokens: heavy collisions.
    val sk = tokensDf(6400, 64)
      .agg(count_min_sketch(col("t"), lit(0.5d), lit(0.9d), lit(7)).as("cms"))
    val est = sk
      .select(explode(array((0 until 64).map(i => lit(s"tok$i")): _*)).as("t"), col("cms"))
      .select(cms_estimate(col("cms"), col("t")).as("n"))
      .collect().map(_.getLong(0))
    assert(est.forall(_ >= 100L), s"undercount: ${est.min}")
    assert(est.exists(_ > 100L), "4 buckets / 64 tokens must collide somewhere")
  }

  test("partial+final merge equals a single-partition build") {
    val one = tokensDf(1200, 12).coalesce(1)
      .agg(count_min_sketch(col("t"), lit(0.001d), lit(0.99d), lit(42)).as("cms"))
      .select(cms_estimate(col("cms"), lit("tok3")).as("n"))
      .collect().head.getLong(0)
    val many = tokensDf(1200, 12).repartition(8)
      .agg(count_min_sketch(col("t"), lit(0.001d), lit(0.99d), lit(42)).as("cms"))
      .select(cms_estimate(col("cms"), lit("tok3")).as("n"))
      .collect().head.getLong(0)
    assert(one == 100L && many == 100L)
  }

  test("absent items estimate 0 at ample width") {
    val sk = tokensDf(300, 3)
      .agg(count_min_sketch(col("t"), lit(0.001d), lit(0.99d), lit(42)).as("cms"))
    val n = sk.select(cms_estimate(col("cms"), lit("never-seen")).as("n"))
      .collect().head.getLong(0)
    assert(n == 0L)
  }
}
