package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.domain.GridData

/** Declared queries over the DSv2 grid connector. The oracle regenerates the
  * same closed-form grid, so these verify that pushdown/pruning do not change
  * results — the section read must be invisible to semantics.
  */
object SourceQueries extends QueryModule {

  def gridTable(s: SparkSession): DataFrame =
    s.read.format(classOf[GridSource].getName).load()

  /** Hyperslab via pushdown: variable + time + index-range predicates all land
    * in the source's Section; Spark plans only the 4 surviving partitions.
    */
  private def qDsv2Select(s: SparkSession, d: String): DataFrame =
    gridTable(s)
      .filter(col("variable") === "tasmax" &&
        col("ts").between(lit("1990-01-03 00:00:00").cast("timestamp"),
          lit("1990-01-06 23:59:59").cast("timestamp")) &&
        col("y").between(5, 15) && col("x").between(10, 25))
      .select("ts", "y", "x", "lat", "lon", "value")
      .orderBy("ts", "y", "x")

  /** Completely-pushed metadata aggregate: COUNT/MIN/MAX over index and
    * coordinate columns are answered from the section bounds — the scan emits
    * ONE row and generates zero cells (`GridAggScan`). The reference answers
    * the same questions from file attributes/coord arrays (`Gddp.scala:121-130`).
    */
  private def qDsv2Count(s: SparkSession, d: String): DataFrame =
    gridTable(s)
      .filter(col("variable") === "tasmax" && col("y").between(3, 12) && col("x") < 20)
      .agg(count(lit(1)).as("n_cells"), min("ts").as("ts_min"),
        max("x").as("x_max"), min("lat").as("lat_min"))

  /** Aggregate over the pushed-down slice (only the slice is generated). */
  private def qDsv2Agg(s: SparkSession, d: String): DataFrame =
    gridTable(s)
      .filter(col("variable") === "tasmin" && col("y") < 10)
      .groupBy("ts")
      .agg(count(col("value")).as("n_obs"), round(avg("value"), 4).as("mean_v"))
      .orderBy("ts")

  /** S2: location-agnostic scan — the same parquet read through an explicit
    * Hadoop-FS URI scheme. The reference's headline is reading NetCDF straight
    * from S3 (`README.md:8-20`); in Spark the scan path is scheme-agnostic
    * (`file://`, `hdfs://`, `s3a://` differ only in the FileSystem
    * implementation resolved from the URI), so demonstrating a non-bare-path
    * URI proves the plumbing end to end. SourceSpec additionally drives the
    * Hadoop FileSystem API against the same URI.
    */
  private def qScanUri(s: SparkSession, d: String): DataFrame = {
    val uri = "file://" + new java.io.File(d).getAbsolutePath + "/nation.parquet"
    s.read.parquet(uri)
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
  }

  /** Writes the two variables' cubes to `.grf` files once per JVM — the same
    * closed form as the generator, so the file-backed scan stays fully
    * oracle-checkable.
    */
  lazy val grfDir: String = {
    import GridData.{T => TD, X => XD, Y => YD}
    val dir = java.nio.file.Files.createTempDirectory("graft-grf").toFile.getAbsolutePath
    for ((v, vid) <- Seq("tasmax" -> 0, "tasmin" -> 1))
      GridFile.write(s"$dir/$v.grf", v, TD, YD, XD,
        GridSource.epochMicros, 24L * 3600 * 1000000L,
        lat0 = 44.0, dlat = 0.05, lon0 = -80.0, dlon = 0.05) { (t, y, x) =>
        if ((t + y + x) % 17 == 0) None
        else Some(((t * 31 + y * 7 + x * 13 + vid * 5) % 100).toDouble / 2.0 - 10.0)
      }
    dir
  }

  /** The hyperslab read against REAL file bytes: variable pruning drops one
    * file entirely; the ts/y/x section bounds become seek offsets in the
    * survivor (`GridFile.SectionReader.readRow`).
    */
  private def qGridFile(s: SparkSession, d: String): DataFrame =
    s.read.format(classOf[GridSource].getName).option("path", grfDir).load()
      .filter(col("variable") === "tasmin" &&
        col("ts").between(lit("1990-01-02 00:00:00").cast("timestamp"),
          lit("1990-01-05 23:59:59").cast("timestamp")) &&
        col("y") >= 2 && col("x").between(3, 27))
      .select("ts", "y", "x", "lat", "lon", "value")
      .orderBy("ts", "y", "x")

  /** Date-partitioned parquet layout of `events`, written once per JVM — the
    * physical form of F1 file pruning: the day predicate is satisfied by
    * DIRECTORY pruning (`PartitionFilters` in the scan), so files outside the
    * day are never opened. At 100 TB this layout choice, not any operator, is
    * what bounds a time-ranged query's I/O.
    */
  private val partitionedFor = scala.collection.mutable.Map[String, String]()
  def partitionedEventsDir(s: SparkSession, d: String): String =
    partitionedFor.synchronized {
      partitionedFor.getOrElseUpdate(d, {
        val dir = java.nio.file.Files.createTempDirectory("graft-part").toFile.getAbsolutePath
        graft.Tables.events(s, d)
          .withColumn("day", to_date(col("ts")))
          .write.mode("overwrite").partitionBy("day").parquet(dir)
        dir
      })
    }

  private def qScanPartitioned(s: SparkSession, d: String): DataFrame =
    s.read.parquet(partitionedEventsDir(s, d))
      .filter(col("day") === lit("2024-01-15").cast("date"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dsv2_select" -> qDsv2Select,
    "q_dsv2_agg" -> qDsv2Agg,
    "q_dsv2_count" -> qDsv2Count,
    "q_scan_uri" -> qScanUri,
    "q_scan_partitioned" -> qScanPartitioned,
    "q_grid_file" -> qGridFile
  )

  val oracleSql: Map[String, String] = Map(
    "q_dsv2_select" -> (GridData.oracleCells +
      """SELECT ts, y, x, lat, lon, value FROM cells
        |WHERE variable = 'tasmax'
        |  AND ts BETWEEN TIMESTAMP '1990-01-03 00:00:00' AND TIMESTAMP '1990-01-06 23:59:59'
        |  AND y BETWEEN 5 AND 15 AND x BETWEEN 10 AND 25
        |ORDER BY ts, y, x""".stripMargin),
    "q_dsv2_agg" -> (GridData.oracleCells +
      """SELECT ts, count(value) AS n_obs, round(avg(value), 4) AS mean_v
        |FROM cells WHERE variable = 'tasmin' AND y < 10
        |GROUP BY ts ORDER BY ts""".stripMargin),
    "q_dsv2_count" -> (GridData.oracleCells +
      """SELECT count(*) AS n_cells, min(ts) AS ts_min,
        |  CAST(max(x) AS INT) AS x_max, min(lat) AS lat_min
        |FROM cells
        |WHERE variable = 'tasmax' AND y BETWEEN 3 AND 12 AND x < 20""".stripMargin),
    "q_scan_uri" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q_scan_partitioned" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events WHERE date_trunc('day', ts) = DATE '2024-01-15'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_grid_file" -> (GridData.oracleCells +
      """SELECT ts, y, x, lat, lon, value FROM cells
        |WHERE variable = 'tasmin'
        |  AND ts BETWEEN TIMESTAMP '1990-01-02 00:00:00' AND TIMESTAMP '1990-01-05 23:59:59'
        |  AND y >= 2 AND x BETWEEN 3 AND 27
        |ORDER BY ts, y, x""".stripMargin)
  )
}
