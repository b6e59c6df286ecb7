package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale techniques that exist purely for 100 TB posture — each is the
  * standard mitigation for a failure mode that small-scale tests never hit,
  * with an equivalence test proving it does not change semantics.
  */
object Scale {

  /** Two-stage salted aggregation for skewed group keys: stage 1 aggregates
    * (key, salt) so one hot key spreads over `buckets` reducers; stage 2
    * combines the partials. Works for any algebraic aggregate — here sum and
    * count (avg derives). AQE handles moderate skew; salting is for the
    * pathological single-key case AQE cannot split further.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column, buckets: Int): DataFrame = {
    df.select(key.as("k"), value.as("v"),
        (abs(xxhash64(monotonically_increasing_id())) % buckets).as("salt"))
      .groupBy(col("k"), col("salt"))
      .agg(sum("v").as("ps"), count(lit(1)).as("pc"))
      .groupBy(col("k"))
      .agg(sum("ps").as("total"), sum("pc").as("n"))
  }

  /** Bucketed-table setup for co-located joins: writing both sides bucketed
    * and sorted by the join key lets SortMergeJoin run with NO exchange —
    * the shuffle is paid once at layout time, not per query. (At 100 TB this
    * is the difference between a join that moves terabytes and one that
    * moves nothing.)
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a dropped in-memory-catalog table can leave its managed location behind
    // from a previous session; clear it or CTAS refuses the path
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    df.write.bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  /** Z-order-clustered parquet layout: range-partition and sort by the
    * Morton key of two quantized dimensions, so rows near in BOTH dims land
    * in the same files and a conjunctive 2-D range filter prunes by column
    * min/max stats instead of matching a sliver of every file. Like
    * [[writeBucketed]], this is the ingest-time layout cost a deployment
    * pays once; the z column itself is dropped (derivable, and the filter
    * columns' own stats do the pruning).
    */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, path: String, files: Int): Unit =
    df.withColumn("__z", graft.functions.ZOrderFunctions.zorder64(x, y))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
