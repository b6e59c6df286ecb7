package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the parts of the driver-generated fixture schemas this library's
  * loaders depend on, so a testdata regeneration that changes a physical type
  * fails HERE with a named assertion instead of silently breaking every
  * transitive consumer (round-12/13 postmortem: `events.ts` flipped from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ) and took out 18 declared
  * queries, 10 tests, and the bench with an analyzer error three hops away).
  *
  * Two layers:
  *   1. the RAW parquet type of volatile columns must be one of the variants
  *      `Tables` knows how to normalize;
  *   2. the NORMALIZED loader output must present the contract type and
  *      plausible values, whatever the file shipped as.
  */
class FixtureContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("raw events.ts parquet type is a variant Tables.events handles") {
    val raw = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    assert(
      Set[DataType](LongType, TimestampNTZType, TimestampType).contains(raw),
      s"events.parquet ts regenerated as unhandled type $raw — " +
        "extend Tables.events before anything downstream runs")
  }

  test("Tables.events normalizes ts to TimestampType with sane epoch range") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType)
    import org.apache.spark.sql.functions._
    val Array(row) = ev.agg(
      min(unix_timestamp(col("ts"))).as("lo"),
      max(unix_timestamp(col("ts"))).as("hi"),
      count(lit(1)).as("n")).collect()
    assert(row.getAs[Long]("n") > 0, "events fixture is empty")
    val (lo, hi) = (row.getAs[Long]("lo"), row.getAs[Long]("hi"))
    // 2000-01-01 .. 2100-01-01: catches unit mistakes (a ns value read as µs
    // lands in year ~51138; a µs value divided as if ns lands in 1970).
    assert(lo >= 946684800L && hi <= 4102444800L,
      s"events.ts epoch range [$lo, $hi] implausible — unit conversion bug?")
  }

  test("core tables load with the column names the query registry uses") {
    val contracts: Seq[(String, org.apache.spark.sql.DataFrame, Seq[String])] = Seq(
      ("events", Tables.events(spark, sf), Seq("ts", "user_id", "event_type")),
      ("documents", Tables.documents(spark, sf), Seq("doc_id", "text")),
      ("embeddings", Tables.embeddings(spark, sf), Seq("vec_id", "embedding")),
      ("lineitem", Tables.lineitem(spark, sf), Seq("l_orderkey", "l_quantity")))
    for ((name, df, cols) <- contracts; c <- cols)
      assert(df.columns.contains(c), s"$name lost contract column $c")
  }
}
