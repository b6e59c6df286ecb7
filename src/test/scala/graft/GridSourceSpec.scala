package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.domain.GridData
import graft.sources.SourceQueries

class GridSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DSv2 grid equals the DataFrame generator cell-for-cell") {
    val fromSource = SourceQueries.gridTable(spark)
      .select("variable", "ts", "y", "x", "lat", "lon", "value")
    val fromRange = GridData.cells(spark)
      .select("variable", "ts", "y", "x", "lat", "lon", "value")
    assert(fromSource.count() == GridData.N)
    assert(fromSource.except(fromRange).count() == 0)
    assert(fromRange.except(fromSource).count() == 0)
  }

  test("variable + time predicates prune partitions at planning time") {
    val full = SourceQueries.gridTable(spark)
    assert(full.rdd.getNumPartitions == 2 * GridData.T)
    val sliced = full.filter(col("variable") === "tasmax" &&
      col("ts").between(lit("1990-01-03 00:00:00").cast("timestamp"),
        lit("1990-01-06 23:59:59").cast("timestamp")))
    // 1 variable × 4 days -> 4 planned partitions (12 pruned before read)
    assert(sliced.rdd.getNumPartitions == 4)
  }

  test("index-range pushdown generates only the hyperslab") {
    val sliced = SourceQueries.gridTable(spark)
      .filter(col("y").between(5, 8) && col("x") < 3)
    // generated rows = vars × days × 4 y × 3 x; count proves the loops shrank
    assert(sliced.count() == 2 * GridData.T * 4 * 3)
    val plan = sliced.queryExecution.executedPlan.toString
    assert(plan.contains("GridScan"), plan)
  }

  test("unsupported predicates still evaluate correctly above the scan") {
    val odd = SourceQueries.gridTable(spark).filter(col("value") > 10.0)
    assert(odd.select(min("value")).as[Double].head() > 10.0)
  }

  test("column pruning reaches the reader") {
    val two = SourceQueries.gridTable(spark).select("y", "x")
    assert(two.schema.fieldNames.toSeq == Seq("y", "x"))
    assert(two.distinct().count() == GridData.Y * GridData.X)
  }
}
