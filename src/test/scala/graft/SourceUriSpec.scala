package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.{FileSystem, Path}

/** S2 — location-agnostic scans: the parquet read works through an explicit
  * Hadoop-FS URI, and the FileSystem is resolved from the URI scheme (the
  * same mechanism that makes `s3a://`/`hdfs://` work on a cluster with the
  * corresponding FS jars on the classpath; the reference's headline feature
  * is reading NetCDF from S3, README.md:8-20).
  */
class SourceUriSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val uriStr =
    "file://" + new java.io.File(TestSpark.sf).getAbsolutePath + "/nation.parquet"

  test("FileSystem resolves from the URI scheme") {
    val uri = new java.net.URI(uriStr)
    val fs = FileSystem.get(uri, spark.sparkContext.hadoopConfiguration)
    assert(fs.getScheme == "file")
    assert(fs.exists(new Path(uri)))
  }

  test("scan through an explicit file:// URI equals the bare-path scan") {
    val viaUri = spark.read.parquet(uriStr)
    val barePath = spark.read.parquet(TestSpark.sf + "/nation.parquet")
    assert(viaUri.schema == barePath.schema)
    assert(viaUri.count() == barePath.count())
    assert(viaUri.exceptAll(barePath).isEmpty && barePath.exceptAll(viaUri).isEmpty)
  }

  test("custom mock:// FileSystem serves the scan via the FS API with range reads") {
    sources.MockFs.register(spark)
    val mockUri = "mock://" + new java.io.File(TestSpark.sf).getAbsolutePath + "/nation.parquet"
    // scheme resolution instantiates OUR class — the same mechanism that
    // resolves s3a:// to the S3AFileSystem on a credentialed cluster
    val fs = FileSystem.get(new java.net.URI(mockUri),
      spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[sources.MockFs])
    assert(fs.exists(new Path(mockUri)))
    val opens0 = sources.MockFs.opens.get(); val seeks0 = sources.MockFs.seeks.get()
    val viaMock = spark.read.parquet(mockUri)
    val barePath = spark.read.parquet(TestSpark.sf + "/nation.parquet")
    assert(viaMock.schema == barePath.schema)
    assert(viaMock.exceptAll(barePath).isEmpty && barePath.exceptAll(viaMock).isEmpty)
    // the parquet reader must have gone THROUGH the FS: opened files and
    // performed ranged (seek) reads — footer then row groups
    assert(sources.MockFs.opens.get() > opens0, "scan bypassed the mock FileSystem")
    assert(sources.MockFs.seeks.get() > seeks0, "no range reads reached the FileSystem")
  }

  test("declared q_scan_uri_mock equals the file:// twin") {
    val viaMock = sources.SourceQueries.queries("q_scan_uri_mock")(spark, TestSpark.sf)
    val viaFile = sources.SourceQueries.queries("q_scan_uri")(spark, TestSpark.sf)
    assert(viaMock.collect().toSeq == viaFile.collect().toSeq)
  }

  test("date-partitioned layout prunes at the directory level") {
    val df = sources.SourceQueries.queries("q_scan_partitioned")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-15"), plan)
    val total = df.select(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    val expect = Tables.events(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")) === "2024-01-15")
      .count()
    assert(total == expect && total > 0)
  }

  test("declared q_scan_uri returns the nation table in key order") {
    val rows = sources.SourceQueries
      .queries("q_scan_uri")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(_.getAs[Number](0).longValue)
    assert(keys.sameElements(keys.sorted))
  }
}
