package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (guide: one per suite).
  * Built WITH [[GraftExtensions]], matching every production entrypoint
  * (Verify/Bench/ApiServer/tools all set `spark.sql.extensions`) — declared
  * queries may use the SQL-registered functions and table functions.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
