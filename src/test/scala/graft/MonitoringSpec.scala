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

  test("drift plans: totals broadcast, no corpus-sized window on the Spark side") {
    val plan = Monitoring.driftPsi(ref, cur).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(1500))
    assert(!plan.contains("Window"), "per-slice totals must not window the corpus")
  }
}
