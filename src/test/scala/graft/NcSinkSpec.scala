package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.domain.GridData
import graft.sources.{GridSource, NcSink, SourceQueries}

/** Round-trip tests for the NetCDF export sink: what the engine writes, the
  * engine (and the format spec) must read back identically.
  */
class NcSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def readNc(dir: String) =
    spark.read.format(classOf[GridSource].getName).option("path", dir).load()

  test("export → re-read round-trips the generator grid (values, coords, NULLs)") {
    val out = java.nio.file.Files.createTempDirectory("graft-nc-out").toFile.getAbsolutePath
    NcSink.export(GridData.cells(spark), out)
    assert(new java.io.File(out).listFiles().map(_.getName).sorted.toSeq ==
      Seq("tasmax.nc", "tasmin.nc"))
    val back = readNc(out)
      .select("variable", "ts", "y", "x", "lat", "lon", "value")
      .orderBy("variable", "ts", "y", "x").collect()
    val orig = GridData.cells(spark)
      .select("variable", "ts", "y", "x", "lat", "lon", "value")
      .orderBy("variable", "ts", "y", "x").collect()
    assert(back.length == orig.length && back.sameElements(orig))
  }

  test("a bbox slice exports as a self-contained re-based grid") {
    val out = java.nio.file.Files.createTempDirectory("graft-nc-slice").toFile.getAbsolutePath
    NcSink.export(GridData.cells(spark)
      .filter(col("variable") === "tasmax" && col("y").between(5, 8) && col("x") < 3), out)
    val back = readNc(out)
    assert(back.agg(max("y"), max("x")).collect()(0).toSeq == Seq(3, 2)) // re-based
    // lat of re-based y=0 is the original y=5 latitude
    val lat0 = back.filter(col("y") === 0).select("lat").distinct().collect()
    assert(lat0.map(_.getDouble(0)).toSeq == Seq(44.0 + 5 * 0.05))
  }

  test("format interop: a .grf grid converts to .nc and reads back identically") {
    val out = java.nio.file.Files.createTempDirectory("graft-grf2nc").toFile.getAbsolutePath
    val grf = readNc(SourceQueries.grfDir) // GridSource dispatches on extension
      .select("variable", "ts", "y", "x", "lat", "lon", "value")
    NcSink.export(grf, out)
    val back = readNc(out)
      .select("variable", "ts", "y", "x", "lat", "lon", "value")
      .orderBy("variable", "ts", "y", "x").collect()
    assert(back.sameElements(grf.orderBy("variable", "ts", "y", "x").collect()))
  }

  test("curvilinear grids export 2-D coord matrices and round-trip") {
    val out = java.nio.file.Files.createTempDirectory("graft-nc-curv-out").toFile.getAbsolutePath
    val orig = readNc(SourceQueries.ncCurvDir)
      .select("variable", "ts", "y", "x", "lat", "lon", "value")
    NcSink.export(orig, out)
    // the written file must carry 2-D lat/lon (no per-axis factoring exists)
    val h = graft.sources.NetCdf3.open(s"$out/temp.nc")
    assert(h.variable("lat").get.dimIds.length == 2, h.vars.map(_.name))
    val back = readNc(out)
      .select("variable", "ts", "y", "x", "lat", "lon", "value")
      .orderBy("ts", "y", "x").collect()
    assert(back.sameElements(orig.orderBy("ts", "y", "x").collect()))
  }
}
