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

  test("Tables.events yields the same instants under a non-UTC session timezone") {
    // the NTZ branch must interpret the naive wall clock AS UTC explicitly —
    // a bare cast reinterprets the micros in the session tz and silently
    // shifts every epoch-aligned window for a non-UTC library user
    import org.apache.spark.sql.functions._
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    val utc = Tables.events(spark, sf)
      .agg(min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts"))),
        sum(unix_timestamp(col("ts")))).collect()(0)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val ny = Tables.events(spark, sf)
        .agg(min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts"))),
          sum(unix_timestamp(col("ts")))).collect()(0)
      assert(ny == utc,
        s"events instants shift with session tz: UTC=$utc America/New_York=$ny")
    } finally spark.conf.set(tzKey, prev)
  }

  test("all 10 harness tables load with the column sets the query registry uses") {
    val contracts: Seq[(String, org.apache.spark.sql.DataFrame, Seq[String])] = Seq(
      ("region", Tables.region(spark, sf), Seq("r_regionkey", "r_name")),
      ("nation", Tables.nation(spark, sf), Seq("n_nationkey", "n_name", "n_regionkey")),
      ("customer", Tables.customer(spark, sf),
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")),
      ("supplier", Tables.supplier(spark, sf),
        Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal")),
      ("part", Tables.part(spark, sf),
        Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")),
      ("orders", Tables.orders(spark, sf),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")),
      ("lineitem", Tables.lineitem(spark, sf),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
          "l_shipdate")),
      ("events", Tables.events(spark, sf),
        Seq("event_id", "ts", "user_id", "event_type", "value", "props")),
      ("documents", Tables.documents(spark, sf),
        Seq("doc_id", "text", "lang", "source", "n_chars")),
      ("embeddings", Tables.embeddings(spark, sf),
        Seq("vec_id", "embedding", "label")))
    for ((name, df, cols) <- contracts; c <- cols)
      assert(df.columns.contains(c), s"$name lost contract column $c")
  }

  test("date-like columns stay timestamp-family (orders, lineitem)") {
    // o_orderdate / l_shipdate have shipped as timestamp[us]; queries compare
    // them against timestamp literals, so a regeneration to DATE or string
    // must fail here first
    def tsFamily(dt: DataType) = dt == TimestampType || dt == TimestampNTZType
    assert(tsFamily(Tables.orders(spark, sf).schema("o_orderdate").dataType))
    assert(tsFamily(Tables.lineitem(spark, sf).schema("l_shipdate").dataType))
  }

  test("embeddings.embedding is array<float> with a consistent dimension") {
    val emb = Tables.embeddings(spark, sf)
    assert(emb.schema("embedding").dataType === ArrayType(FloatType, containsNull = true) ||
      emb.schema("embedding").dataType === ArrayType(FloatType, containsNull = false),
      s"embedding regenerated as ${emb.schema("embedding").dataType}")
    import org.apache.spark.sql.functions._
    val dims = emb.select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.length == 1 && dims.head > 0, s"ragged embedding dims: ${dims.mkString(",")}")
  }
}
