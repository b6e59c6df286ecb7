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

  test("drift plans: totals broadcast, no corpus-sized window on the Spark side") {
    val plan = Monitoring.driftPsi(ref, cur).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(1500))
    assert(!plan.contains("Window"), "per-slice totals must not window the corpus")
  }
}
