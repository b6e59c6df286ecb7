package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev smoke for the driver's entry contract. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + e.count())
    println("ENTRY_COLS=" + e.columns.mkString(","))
    println("ORPHAN_ORACLES=" + graft.SparkEntry.oracleSql.keySet.diff(graft.SparkEntry.queries.keySet))
    spark.stop()
  }
}
