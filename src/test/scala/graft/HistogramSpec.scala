package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.functions.StreamingHistogram
import graft.functions.StreamingHistogram.Hist

class HistogramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("histogram with enough bins reproduces exact quantiles on small data") {
    val h = (1 to 50).map(_.toDouble)
      .foldLeft(Hist(Vector.empty, 64))(_.add(_))
    assert(h.bins.length == 50) // no compression below cap
    assert(math.abs(h.quantile(0.5) - 25.5) <= 1.0)
  }

  test("compression keeps bin cap and total count") {
    val vals = Gen.listOfN(500, Gen.choose(0.0, 100.0)).sample.get
    val h = vals.foldLeft(Hist(Vector.empty, 32))(_.add(_))
    assert(h.bins.length <= 32)
    assert(h.totalCount == 500)
  }

  test("merge is count-preserving and order-insensitive in total") {
    val (a, b) = (1 to 200).map(_.toDouble).splitAt(120)
    val ha = a.foldLeft(Hist(Vector.empty, 32))(_.add(_))
    val hb = b.foldLeft(Hist(Vector.empty, 32))(_.add(_))
    val m1 = ha.merge(hb); val m2 = hb.merge(ha)
    assert(m1.totalCount == 200 && m2.totalCount == 200)
    assert(math.abs(m1.quantile(0.5) - m2.quantile(0.5)) < 5.0)
  }

  test("MutableHist matches the immutable Hist bin-for-bin on sequential adds") {
    val vals = Gen.listOfN(400, Gen.choose(0.0, 100.0)).sample.get
    val immutable = vals.foldLeft(Hist(Vector.empty, 32))(_.add(_))
    val mutable = new graft.functions.MutableHist(32)
    vals.foreach(mutable.add(_, 1L))
    assert(mutable.toHist.bins == immutable.bins)
  }

  test("HistogramBreaks serialize/deserialize roundtrips the buffer") {
    val agg = graft.functions.HistogramBreaks(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0), 4, 32)
    val h = agg.createAggregationBuffer()
    (1 to 100).foreach(i => h.add(i.toDouble, 1L))
    val back = agg.deserialize(agg.serialize(h))
    assert(back.toHist.bins == h.toHist.bins)
    // merge with a disjoint histogram is count-preserving
    val h2 = agg.createAggregationBuffer()
    (101 to 150).foreach(i => h2.add(i.toDouble, 1L))
    val m = agg.merge(h, h2)
    assert(m.toHist.totalCount == 150)
  }

  test("quantile rollup equals the exact global percentile (exact regime)") {
    // stage-1 sketches per shard, stage-2 merge — vs one flat percentile()
    val got = graft.operators.Aggregates.queries("q_quantile_rollup")(spark, TestSpark.sf)
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    val exact = Tables.lineitem(spark, TestSpark.sf)
      .agg(expr("percentile(l_quantity, 0.25)"),
        expr("percentile(l_quantity, 0.5)"),
        expr("percentile(l_quantity, 0.75)"))
      .as[(Double, Double, Double)].collect()(0)
    assert(got.toSeq == Seq(exact._1, exact._2, exact._3)
      .map(v => math.rint(v * 1e4) / 1e4))
  }

  test("quantile rollup over empty input yields NaN, not a crash") {
    import graft.functions.HistogramFunctions._
    val empty = Seq.empty[(Double, Int)].toDF("v", "i")
    val qs = empty.groupBy(col("i"))
      .agg(histogram_sketch(col("v")).as("sk"))
      .agg(histogram_merge_quantiles(col("sk"), Seq(0.5)).as("qs"))
      .select(explode(col("qs"))).as[Double].collect()
    assert(qs.length == 1 && qs.head.isNaN)
    // all-NULL input sketches merge to an empty histogram the same way
    val nulls = Seq((null.asInstanceOf[java.lang.Double], 1),
        (null.asInstanceOf[java.lang.Double], 2)).toDF("v", "i")
    val qs2 = nulls.groupBy(col("i"))
      .agg(histogram_sketch(col("v").cast("double")).as("sk"))
      .agg(histogram_merge_quantiles(col("sk"), Seq(0.5)).as("qs"))
      .select(explode(col("qs"))).as[Double].collect()
    assert(qs2.length == 1 && qs2.head.isNaN)
  }

  test("quantile rollup degrades within sketch error past the bin budget") {
    // 5000 distinct values >> 16 bins: compression engages; the merged
    // estimate must stay within a few percent of the exact quantile
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(5000)(rnd.nextDouble() * 1000.0)
    val df = vals.zipWithIndex.toDF("v", "i")
    import graft.functions.HistogramFunctions._
    val approx = df.groupBy(pmod(col("i"), lit(8)).as("shard"))
      .agg(histogram_sketch(col("v"), maxBins = 16).as("sk"))
      .agg(histogram_merge_quantiles(col("sk"), Seq(0.25, 0.5, 0.75), 16).as("qs"))
      .select(explode(col("qs")).as("q")).as[Double].collect()
    val exact = df.agg(expr("percentile(v, array(0.25, 0.5, 0.75))"))
      .as[Seq[Double]].collect()(0)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= 50.0, s"sketch $a vs exact $e") // 5% of range
    }
  }

  test("sketch breaks track exact percentiles on lineitem quantity") {
    // query output is exploded to (group, break_idx, break_value) rows;
    // reassemble per-group break arrays
    val rows = graft.operators.Aggregates.queries("q_hist_sketch")(spark, TestSpark.sf)
      .select("l_returnflag", "break_idx", "break_value")
      .as[(String, Int, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toSeq
    val exact = Tables.lineitem(spark, TestSpark.sf)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (flag, breaks) =>
      assert(breaks.length == 3)
      val (p25, p50, p75) = exact(flag)
      // quantities span 1..50; sketch with 64 bins should land within ~2 units
      assert(math.abs(breaks(0) - p25) <= 2.5, s"$flag p25 ${breaks(0)} vs $p25")
      assert(math.abs(breaks(1) - p50) <= 2.5, s"$flag p50 ${breaks(1)} vs $p50")
      assert(math.abs(breaks(2) - p75) <= 2.5, s"$flag p75 ${breaks(2)} vs $p75")
    }
  }
}
