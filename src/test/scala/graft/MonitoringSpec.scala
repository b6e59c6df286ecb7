package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Monitoring

class MonitoringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, TestSpark.sf)
  private def ref = docs.filter($"doc_id" % 2 === 0)
  private def cur = docs.filter($"doc_id" % 2 === 1 && $"n_chars" >= 150)

  test("planted length drift: len_band PSI dominates lang PSI, short band depleted") {
    val rows = Monitoring.driftPsi(ref, cur)
      .select($"feature", $"bucket", $"ref_frac", $"cur_frac", $"psi")
      .as[(String, String, Double, Double, Double)].collect()
    val byFeat = rows.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    assert(byFeat("len_band") > byFeat("lang"),
      s"length drift ${byFeat("len_band")} should exceed language drift ${byFeat("lang")}")
    assert(byFeat("len_band") > 0.05, s"planted drift too weak: ${byFeat("len_band")}")
    val band0 = rows.find(r => r._1 == "len_band" && r._2 == "0").get
    assert(band0._4 < band0._3, "cur slice must be depleted in the short band")
    rows.foreach(r => assert(r._5 >= -1e-9, s"PSI term negative: $r"))
  }

  test("PSI terms are symmetric in direction: swapping slices preserves each bucket's PSI") {
    val fwd = Monitoring.driftPsi(ref, cur)
      .select($"feature", $"bucket", $"psi").as[(String, String, Double)]
      .collect().map { case (f, b, p) => (f, b) -> p }.toMap
    val bwd = Monitoring.driftPsi(cur, ref)
      .select($"feature", $"bucket", $"psi").as[(String, String, Double)]
      .collect().map { case (f, b, p) => (f, b) -> p }.toMap
    fwd.foreach { case (k, p) =>
      assert(math.abs(bwd(k) - p) <= 1e-3, s"PSI not direction-symmetric at $k: $p vs ${bwd(k)}")
    }
  }

  test("token movers are ranked by |delta| and internally consistent") {
    val rows = Monitoring.driftTokens(ref, cur)
      .select($"token", $"ref_frac", $"cur_frac", $"delta")
      .as[(String, Double, Double, Double)].collect()
    assert(rows.length == 20)
    val mags = rows.map(r => math.abs(r._4))
    assert(mags.zip(mags.tail).forall { case (a, b) => a >= b }, "not sorted by |delta|")
    rows.foreach { case (t, rf, cf, d) =>
      assert(math.abs(cf - rf - d) <= 2e-6, s"$t: delta $d != $cf - $rf") }
  }

  test("A/B z-test: planted arm effect is significant with the right sign; parity split is not") {
    // arm 0 (even ids) converts 9/10, arm 1 converts 2/10
    def burst(uid: Long, purchases: Int) =
      (0 until purchases).map(i => (uid, "purchase", i)) :+ ((uid, "view", 99))
    val planted = (0L until 20L).flatMap { uid =>
      val p = if (uid % 2 == 0) { if (uid == 18) 0 else 14 } // 9 of 10 convert
              else { if (uid < 4) 14 else 0 }                // 2 of 10 convert
      burst(uid, p)
    }.toDF("user_id", "event_type", "i")
    val r = Monitoring.abTest(planted)
      .select($"c_a", $"c_b", $"z", $"significant")
      .as[(Long, Long, Double, Boolean)].head()
    assert(r._1 == 9 && r._2 == 2, s"arm conversions ${r._1}/${r._2}")
    assert(r._3 > 1.96 && r._4, s"planted uplift not significant: $r")
    val parity = Monitoring.abTest(Tables.events(spark, TestSpark.sf))
      .select($"significant").as[Boolean].head()
    assert(!parity, "a user_id-parity split of unbiased traffic must not be significant")
  }

  test("A/B z-test: degenerate all-convert experiment yields null z, no division error") {
    val allConvert = (0L until 10L).flatMap(uid =>
      (0 until 14).map(i => (uid, "purchase", i))).toDF("user_id", "event_type", "i")
    val row = Monitoring.abTest(allConvert).select($"z", $"rate_a", $"rate_b").collect().head
    assert(row.isNullAt(0), "z must be null when pooled variance is zero")
    assert(row.getDouble(1) == 1.0 && row.getDouble(2) == 1.0)
  }

  test("CUPED: balanced covariate gives theta ~ 1, large variance reduction, sharper z") {
    // 40 users: pre-period purchases x = u%5 + 1 (covariate), post-period
    // y = x + arm effect (+3 even arm, +1 odd) + a u%3 noise bump. x and
    // arm are exactly balanced (u%5 x u%2 over 40 users), so theta ~ 1 and
    // CUPED removes nearly all the x-driven spread; the noise term keeps
    // the adjusted variance nonzero so z stays finite.
    val rows = (0L until 40L).flatMap { u =>
      val x = (u % 5).toInt + 1
      val y = x + (if (u % 2 == 0) 3 else 1) + (if (u % 3 == 0) 1 else 0)
      Seq.fill(x)((u, "purchase", "2024-01-10 00:00:00")) ++
        Seq.fill(y)((u, "purchase", "2024-01-20 00:00:00"))
    }.toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val r = Monitoring.abCuped(rows)
      .select($"theta", $"z_raw", $"z_cuped", $"var_reduction", $"adj_a", $"adj_b")
      .as[(Double, Double, Double, Double, Double, Double)].head()
    assert(r._1 > 0.8 && r._1 < 1.2, s"theta ${r._1} not ~1 on y = x + eff")
    assert(r._4 > 0.7, s"var_reduction ${r._4}: covariate explains most variance")
    assert(math.abs(r._3) > math.abs(r._2),
      s"CUPED must sharpen the test here: z ${r._2} -> ${r._3}")
    // the arm-mean gap survives adjustment (effect is orthogonal to x)
    assert(r._5 - r._6 > 1.5 && r._5 - r._6 < 2.5, s"adjusted gap ${r._5 - r._6}")
  }

  test("CUPED on the fixture: moments fold to one row, adjusted z at least as sharp") {
    val r = Monitoring.abCuped(Tables.events(spark, TestSpark.sf))
      .select($"n_a", $"n_b", $"z_raw", $"z_cuped", $"var_reduction")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(r.length == 1)
    val (na, nb, _, _, vr) = r.head
    assert(na > 0 && nb > 0)
    assert(vr >= 0.0 && vr <= 1.0, s"var_reduction $vr out of [0,1]")
  }

  test("CUPED: zero-variance covariate falls back to the raw test (theta = 0)") {
    // all users share x = 2 pre-period purchases -> var(x) = 0
    val rows = (0L until 20L).flatMap { u =>
      Seq.fill(2)((u, "purchase", "2024-01-10 00:00:00")) ++
        Seq.fill((u % 4).toInt + 1)((u, "purchase", "2024-01-20 00:00:00"))
    }.toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val r = Monitoring.abCuped(rows)
      .select($"theta", $"z_raw", $"z_cuped").as[(Double, Double, Double)].head()
    assert(r._1 == 0.0, s"theta must be 0 when var(x) = 0, got ${r._1}")
    assert(r._2 == r._3, s"with theta 0 the adjusted z equals the raw z: $r")
  }

  test("changepoint: planted level shift found at the exact boundary") {
    val series = (1 to 20).map { i =>
      (f"2024-01-$i%02d", if (i <= 12) 100L else 200L)
    }.toDF("day_s", "n").withColumn("day", $"day_s".cast("date")).drop("day_s")
    val r = Monitoring.changepoint(series)
      .select($"split_day".cast("string"), $"days_before", $"days_after",
        $"mean_before", $"mean_after")
      .as[(String, Long, Long, Double, Double)].head()
    assert(r == (("2024-01-12", 12L, 8L, 100.0, 200.0)), r.toString)
  }

  test("changepoint: minseglen excludes sub-3-day segments; edge outlier tolerated") {
    // day 1 alone would be the unconstrained argmax (gain 675000 vs 135000
    // for the n1=3 split); minseglen forces the earliest admissible cut
    val spike = ((1 to 1).map(i => (f"2024-01-$i%02d", 1000L)) ++
      (2 to 6).map(i => (f"2024-01-$i%02d", 100L)))
      .toDF("day_s", "n").withColumn("day", $"day_s".cast("date")).drop("day_s")
    val s1 = Monitoring.changepoint(spike)
      .select($"days_before", $"days_after").as[(Long, Long)].head()
    assert(s1._1 >= 3 && s1._2 >= 3, s"minseglen violated: $s1")
    // a moderate day-1 outlier does not move a genuine level shift
    val series = ((1 to 1).map(i => (f"2024-01-$i%02d", 400L)) ++
      (2 to 10).map(i => (f"2024-01-$i%02d", 100L)) ++
      (11 to 20).map(i => (f"2024-01-$i%02d", 300L)))
      .toDF("day_s", "n").withColumn("day", $"day_s".cast("date")).drop("day_s")
    val r = Monitoring.changepoint(series)
      .select($"split_day".cast("string")).as[String].head()
    assert(r == "2024-01-10", s"outlier moved the detected boundary: $r")
    // a series shorter than 2*minSeg has no admissible split at all
    val tiny = (1 to 5).map(i => (f"2024-01-$i%02d", 100L))
      .toDF("day_s", "n").withColumn("day", $"day_s".cast("date")).drop("day_s")
    assert(Monitoring.changepoint(tiny).count() == 0)
  }

  test("drift plans: totals broadcast, no corpus-sized window on the Spark side") {
    val plan = Monitoring.driftPsi(ref, cur).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(1500))
    assert(!plan.contains("Window"), "per-slice totals must not window the corpus")
  }

  test("driftKs guards the grid: a continuous feature refuses with the fix named") {
    // a high-cardinality double feature (every row distinct) must NOT
    // silently serialize the cumulative window — the bound refuses loudly
    val contRef = spark.range(5000)
      .select(($"id" * 1.000001 + 0.1).as("f"))
    val contCur = spark.range(5000)
      .select(($"id" * 1.000002 + 7.3).as("f"))
    val e = intercept[IllegalArgumentException](
      Monitoring.driftKs(contRef, contCur, "f", maxGrid = 1000))
    assert(e.getMessage.contains("distinct values") &&
      e.getMessage.contains("quantize"), e.getMessage)
    // quantizing the same feature passes and detects the planted shift
    val q = Monitoring.driftKs(
      contRef.select(round($"f", -1).as("f")),
      contCur.select(round($"f", -1).as("f")), "f", maxGrid = 1000)
      .select("ks", "breach").as[(Double, Int)].head()
    assert(q._1 > 0.0 && q._2 == 0 || q._2 == 1) // statistic computed
    // the declared query's bounded integer grid is untouched by the guard
    assert(Monitoring.driftKs(ref, cur, "n_chars").count() == 1)
  }
}
