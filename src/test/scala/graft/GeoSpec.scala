package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.functions.{GeoFunctions, GeoUtil}
import graft.domain.{GridData, GridQuery, QueryRequest}

class GeoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // L-shaped (non-convex) polygon: unit square minus its upper-right quadrant
  private val lShape = Seq((0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0), (1.0, 2.0), (0.0, 2.0), (0.0, 0.0))

  test("ray casting handles a non-convex polygon") {
    assert(GeoUtil.rayCast(0.5, 0.5, lShape.flatMap { case (x, y) => Seq(x, y) }.toArray))
    assert(GeoUtil.rayCast(0.5, 1.5, lShape.flatMap { case (x, y) => Seq(x, y) }.toArray))
    // the cut-out quadrant
    assert(!GeoUtil.rayCast(1.5, 1.5, lShape.flatMap { case (x, y) => Seq(x, y) }.toArray))
    assert(!GeoUtil.rayCast(0.5, 2.5, lShape.flatMap { case (x, y) => Seq(x, y) }.toArray))
  }

  test("expression agrees with the Scala implementation on random points") {
    val pts = for {
      x <- Gen.choose(-0.5, 2.5); y <- Gen.choose(-0.5, 2.5)
    } yield (x, y)
    val sample = Gen.listOfN(200, pts).sample.get
    val ring = lShape.flatMap { case (x, y) => Seq(x, y) }.toArray
    val df = sample.toDF("lon", "lat")
      .select(col("lon"), col("lat"),
        GeoFunctions.point_in_polygon(col("lat"), col("lon"), lShape).as("in"))
      .as[(Double, Double, Boolean)].collect()
    df.foreach { case (lon, lat, in) =>
      assert(in == GeoUtil.rayCast(lat, lon, ring), s"($lon, $lat)")
    }
  }

  test("rectangle mask equals bbox filter on the synthetic grid") {
    val cells = GridData.cells(spark)
    val ring = GridData.kawarthaRing
    val masked = cells.filter(
      GeoFunctions.point_in_polygon(col("lat"), col("lon"), ring)).count()
    val lons = ring.map(_._1); val lats = ring.map(_._2)
    val bbox = cells.filter(
      col("lat") > lats.min && col("lat") < lats.max &&
        col("lon") > lons.min && col("lon") < lons.max).count()
    assert(masked == bbox && masked > 0)
  }

  test("composed grid select honors all filters") {
    val req = QueryRequest(Seq("tasmax"), "1990-01-03", "1990-01-06", GridData.kawarthaRing)
    val sel = GridQuery.select(GridData.cells(spark), req)
      .select("ts", "lat", "lon").as[(java.sql.Timestamp, Double, Double)].collect()
    assert(sel.nonEmpty)
    sel.foreach { case (ts, lat, lon) =>
      assert(ts.getTime >= java.sql.Timestamp.valueOf("1990-01-03 00:00:00").getTime)
      assert(ts.getTime <= java.sql.Timestamp.valueOf("1990-01-06 23:59:59").getTime)
      assert(lat > 44.292647 && lat < 44.489801)
      assert(lon > -79.317877 && lon < -78.987601)
    }
  }

  test("nearest matches brute force with first-index tie-break") {
    val cells = GridData.cells(spark)
    val coords = cells.select("y", "x", "lat", "lon").distinct()
      .as[(Int, Int, Double, Double)].collect()
    val gen = for { a <- Gen.choose(43.9, 45.1); o <- Gen.choose(-80.1, -78.4) } yield (a, o)
    Gen.listOfN(10, gen).sample.get.foreach { case (qlat, qlon) =>
      val best = coords.minBy { case (y, x, la, lo) =>
        (math.pow(la - qlat, 2) + math.pow(lo - qlon, 2), y, x)
      }
      val got = GridQuery.nearest(cells, qlat, qlon)
        .select("y", "x").as[(Int, Int)].head()
      assert(got == ((best._1, best._2)), s"point ($qlat, $qlon)")
    }
  }

  test("quantile breaks are monotonically non-decreasing") {
    val breaks = GridQuery.quantileBreaks(GridData.cells(spark), Seq(0.1, 0.25, 0.5, 0.75, 0.9))
      .select("b0", "b1", "b2", "b3", "b4")
      .as[(Double, Double, Double, Double, Double)].collect()
    breaks.foreach { case (a, b, c, d, e) =>
      assert(a <= b && b <= c && c <= d && d <= e)
    }
  }

  test("color bins stay within [0, nbins)") {
    val vals = Gen.listOfN(50, Gen.choose(-1000.0, 1000.0)).sample.get
    val bins = vals.toDF("value")
      .select(GridQuery.colorBin(col("value"), -10.0, 5.0, 10).as("bin"))
      .as[Int].collect()
    bins.foreach(b => assert(b >= 0 && b <= 9))
  }

  test("spatialJoin: hash-bucketed plan (no cartesian), overlap multiplicity, brute-force parity") {
    import graft.domain.GridQueries
    // two OVERLAPPING triangles; points scattered to hit in/out/overlap/none
    val zones = Seq(
      (1L, Array(0.0, 0.0, 4.0, 0.0, 2.0, 4.0, 0.0, 0.0)),
      (2L, Array(1.0, 0.5, 5.0, 0.5, 3.0, 4.5, 1.0, 0.5))
    ).toDF("zone_id", "ring")
    val rng = new scala.util.Random(5)
    val pts = Seq.tabulate(300)(i =>
      (i.toLong, rng.nextDouble() * 6 - 0.5, rng.nextDouble() * 7 - 1.0))
      .toDF("pid", "lat", "lon") // lat in [-0.5, 5.5], lon in [-1, 6]
    val joined = GridQueries.spatialJoin(pts, zones, cellDeg = 1.0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "spatial join must bucket, never cross-join")
    // brute-force oracle with the same ray-cast
    val expect = (for {
      (id, ring) <- Seq((1L, zones.collect()(0).getSeq[Double](1).toArray),
        (2L, zones.collect()(1).getSeq[Double](1).toArray))
      r <- pts.collect()
      if GeoUtil.rayCast(r.getDouble(1), r.getDouble(2), ring)
    } yield (r.getLong(0), id)).toSet
    val got = joined.select("pid", "zone_id").as[(Long, Long)].collect().toSet
    assert(got == expect, "bucketed join diverged from brute force")
    // overlap region points really do land in BOTH zones
    assert(expect.groupBy(_._1).exists(_._2.size == 2),
      "fixture should exercise overlapping zones")
  }
}
