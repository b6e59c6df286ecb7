package graft.tools

import org.apache.spark.sql.SparkSession
import graft.domain.{GridData, GridQuery, QueryRequest}
import graft.render.RenderSink

/** CLI twin of the reference's spark-submit entry
  * (`README.md:44-52`: `<ncDir> <geojson> <start,end> <vars>`): runs the
  * composed domain query over the grid, writes the selection as parquet and
  * one PNG per (variable, day).
  *
  * Usage: runMain graft.tools.GridCli <outDir> [<start,end>] [<vars,csv>]
  */
object GridCli {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/tmp/graft_grid_out"
    val dates = (if (args.length > 1) args(1) else "1990-01-03,1990-01-06").split(",")
    val vars = (if (args.length > 2) args(2) else "tasmax,tasmin").split(",").toSeq

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val req = QueryRequest(vars, dates(0), dates(1), GridData.kawarthaRing)
    val sel = GridQuery.select(GridData.cells(spark), req)
    sel.write.mode("overwrite").parquet(s"$outDir/cells")
    RenderSink.writePngs(sel, outDir, lo = -10.0, step = 5.0, nbins = 10)
    val pngs = new java.io.File(outDir).listFiles().count(_.getName.endsWith(".png"))
    println(s"[grid-cli] wrote ${sel.count()} cells and $pngs PNGs to $outDir")
    spark.stop()
  }
}
