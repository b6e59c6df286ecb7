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
  /** `events.ts` has shipped as three physical parquet types across fixture
    * regenerations: TIMESTAMP(NANOS) (read as long under
    * `nanosAsLong`), TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
    * TIMESTAMP_NTZ), and plain TIMESTAMP(MICROS). Branch on the column's
    * actual dataType so a fixture regeneration can't silently break every
    * downstream consumer again (round-12/13 postmortem): every branch
    * normalizes to TimestampType holding the instant DuckDB's naive read of
    * the same file yields — INDEPENDENT of the session timezone, so a
    * library user's non-UTC session gets the same epoch-aligned windows and
    * unix_timestamp math as the UTC harness entrypoints.
    *   - long (ns): floor-divide to µs — the truncation DuckDB applies for
    *     TIMESTAMP_NS → TIMESTAMP; integer `DIV` stays exact (ns epochs
    *     exceed double's 2^53 integer range). Epoch micros are already an
    *     instant, no tz involved.
    *   - TIMESTAMP_NTZ (µs): interpret the naive wall clock AS UTC. A bare
    *     cast would reinterpret the micros in whatever tz the session runs,
    *     and a convert-to-session-wall-then-cast round-trip is ambiguous in
    *     a DST fall-back overlap (the cast picks one offset, shifting those
    *     instants an hour). NTZ physically stores µs since the 1970-01-01
    *     wall epoch, so `timestampdiff(MICROSECOND, epoch, ts)` IS the
    *     as-UTC instant — one codegen'd subtraction, no calendar fields, no
    *     tz rules anywhere (verified equal to field-wise
    *     make_timestamp(…, 'UTC') construction on the full fixture under a
    *     non-UTC session).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", expr(
          "timestamp_micros(timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts))"))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts: unhandled parquet type $other — update Tables.events")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** Memoized PERSISTED DataFrames for ingest-time indexes/fixtures (PQ code
  * tables, multimodal asset payloads). Keyed by the owning SparkContext's
  * applicationId in addition to the caller's key, so a new session in the
  * same JVM rebuilds instead of returning plans bound to a stopped context.
  * Eviction is by LIVENESS, not by "differs from the caller": only entries
  * whose owning context has stopped are dropped (their cached blocks died
  * with the context), so two concurrently active sessions in one JVM keep
  * their entries side by side instead of thrashing each other. The plain
  * driver-value caches (IVF centroids, PQ codebooks) don't need this — they
  * hold session-independent data.
  */
/** Tail-sort a SMALL (label/aggregate-sized) query result in one
  * partition. A plain global `orderBy` at the end of a declared query
  * plans a range-partitioned sort whose sampling pass executes the whole
  * child subtree a second time — for queries whose child is an expensive
  * multi-stage pipeline that silently doubles the cost. The harness's
  * oracle compare is order-insensitive (it re-sorts), so the sort is
  * purely presentational; keep `orderBy(...).limit(k)` tails as-is
  * (Catalyst turns those into TakeOrdered — no sampling pass).
  */
object Sorted1 {
  def apply(df: DataFrame, cols: String*): DataFrame =
    df.coalesce(1).sortWithinPartitions(cols.head, cols.tail: _*)
  def desc(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    df.coalesce(1).sortWithinPartitions(cols: _*)
}

/** Tail-sort a DATA-SIZED (corpus-row-scale) query result. A naive tail
  * sort has two scale pathologies and this helper dodges both: a plain
  * trailing `orderBy` range-samples by executing the whole child subtree a
  * SECOND time (doubling a multi-stage pipeline's cost), while the
  * [[Sorted1]] cure — right for label/aggregate-sized results — collapses
  * everything after the last exchange into ONE task, which for a
  * corpus-row-sized result is the stage that doesn't finish at 100 TB.
  * Here the child is eagerly `localCheckpoint`ed (ONE execution, blocks
  * cached MEMORY_AND_DISK on the executors, lineage cut) and then sorted
  * with a plain distributed `orderBy`: the range sampler reads the cached
  * blocks instead of re-executing the child, and the sort itself stays
  * range-partitioned and parallel at any scale. Checkpoint blocks are
  * reclaimed by the ContextCleaner once the plan is unreachable.
  */
object SortedDist {
  def apply(df: DataFrame, cols: String*): DataFrame =
    df.localCheckpoint(eager = true).orderBy(cols.head, cols.tail: _*)
  def desc(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    df.localCheckpoint(eager = true).orderBy(cols: _*)
}

object PersistedCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Any), (org.apache.spark.SparkContext, DataFrame)]()
  def apply(s: SparkSession, key: Any)(build: => DataFrame): DataFrame = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) if (it.next().getValue._1.isStopped) it.remove()
    val k = (s.sparkContext.applicationId, key)
    val hit = cache.get(k)
    if (hit != null) hit._2
    else {
      // build OUTSIDE the map lock: a cached build may itself resolve
      // another cached table (computeIfAbsent would throw Recursive
      // update). Racing builders may duplicate work once; first put wins
      // and the loser's persist is dropped.
      val df = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      val prev = cache.putIfAbsent(k, (s.sparkContext, df))
      if (prev != null) { df.unpersist(); prev._2 } else df
    }
  }
}

/** A bundle of declared queries plus their DuckDB oracle SQL twins.
  * Every oracle query ends in a total ORDER BY (SURVEY.md §2A preamble) and
  * aliases every computed column identically on both sides.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
