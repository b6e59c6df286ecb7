package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (TESTDATA.md / FIXTURES.md §A).
  *
  * Mirrors the reference's directory-scan source (`gddp/src/main/scala/Gddp.scala:61-68`):
  * one named table per file, schema-on-read. On a real cluster these would be
  * catalog tables backed by partitioned parquet; `spark.read.parquet` keeps the
  * same declarative scan so Catalyst column pruning + predicate pushdown apply.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  /** `events.ts` is nanosecond-precision parquet, which Spark's TimestampType
    * (µs) cannot read natively. Read ns as long and floor-divide to µs — the
    * same truncation DuckDB applies when casting TIMESTAMP_NS → TIMESTAMP, so
    * oracle comparisons on derived timestamps agree. Integer `DIV` keeps the
    * conversion exact (ns epochs exceed double's 2^53 integer range).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** A bundle of declared queries plus their DuckDB oracle SQL twins.
  * Every oracle query ends in a total ORDER BY (SURVEY.md §2A preamble) and
  * aliases every computed column identically on both sides.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
