package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.Behavioral

class BehavioralSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kmCurve on a hand-computed planted case") {
    // intervals: two events at t=1, one censored at t=2, one event at t=3
    // t=1: n=4, d=2 -> S=0.5 ; t=3: n=1, d=1 -> S=0 (exact-zero tail)
    val iv = Seq((1L, 1L), (1L, 1L), (2L, 0L), (3L, 1L)).toDF("t", "ev")
    val got = Behavioral.kmCurve(iv)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 4L, 0.5), (3L, 1L, 1L, 0.0)), got.toString)
  }

  test("kmCurve without censoring equals 1 - ECDF") {
    val iv = Seq(1L, 1L, 2L, 5L, 5L, 5L, 9L).map((_, 1L)).toDF("t", "ev")
    val got = Behavioral.kmCurve(iv)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (t, _, _, s) => t -> s }.toMap
    assert(got == Map(1L -> 0.7143, 2L -> 0.5714, 5L -> 0.1429, 9L -> 0.0), got.toString)
  }

  test("q_survival: monotone nonincreasing, risk sets consistent, censoring present") {
    val rows = SparkEntry.queries("q_survival")(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val survs = rows.map(_._4)
    survs.zip(survs.tail).foreach { case (a, b) => assert(b <= a + 1e-12) }
    rows.foreach { case (t, d, n, s) =>
      assert(d >= 1 && d <= n && s >= 0 && s <= 1, s"bad row ($t,$d,$n,$s)") }
    // censoring means observed events < total intervals entering the table
    val totalEvents = rows.map(_._2).sum
    assert(totalEvents < rows.head._3,
      s"no censored intervals: $totalEvents events of ${rows.head._3} at risk")
  }

  test("q_survival_logrank: O/E/V fold is internally consistent") {
    val Array((obs, exp, chi2, nHigh, nLow)) =
      SparkEntry.queries("q_survival_logrank")(spark, TestSpark.sf)
        .as[(Long, Double, Option[Double], Long, Long)].collect()
    val totalIntervals = Tables.events(spark, TestSpark.sf)
      .filter($"event_type" === "purchase").count()
    assert(nHigh + nLow == totalIntervals,
      s"cohorts $nHigh+$nLow != $totalIntervals purchase intervals")
    assert(nHigh > 0 && nLow > 0, "cohort split degenerate at this sf")
    assert(obs >= 0 && obs <= totalIntervals)
    assert(exp > 0, s"expected events $exp")
    chi2.foreach(c => assert(c >= 0, s"chi2 $c"))
  }

  test("q_recs_itemcf: never recommends an owned part, ranks are dense 1..k") {
    val recs = SparkEntry.queries("q_recs_itemcf")(spark, TestSpark.sf).cache()
    val owned = Tables.orders(spark, TestSpark.sf)
      .select($"o_orderkey".as("ok"), $"o_custkey".as("custkey"))
      .join(Tables.lineitem(spark, TestSpark.sf)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("partkey")), "ok")
      .select("custkey", "partkey").distinct()
    assert(recs.join(owned, Seq("custkey", "partkey")).count() == 0,
      "recommended an already-owned part")
    val byCust = recs.groupBy("custkey")
      .agg(collect_list("rank").as("ranks"), count(lit(1)).as("n"))
      .as[(Long, Seq[Long], Long)].collect()
    byCust.foreach { case (c, ranks, n) =>
      assert(n <= 3 && ranks.sorted == (1L to n).toSeq, s"cust $c ranks $ranks") }
    recs.unpersist()
  }

  test("q_recs_itemcf plan: no cartesian product, neighbor join broadcasts") {
    // lock the serving computation's plan, not the SortedDist tail (the
    // tail's eager localCheckpoint truncates the visible plan to a cached
    // scan + distributed sort — itself asserted below)
    val body = graft.analytics.Behavioral.recsItemcfBody(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!body.contains("CartesianProduct"), body)
    assert(body.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$body")
    val tail = SparkEntry.queries("q_recs_itemcf")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(tail.contains("rangepartitioning") && !tail.contains("Coalesce"),
      s"tail must be a distributed range sort:\n$tail")
  }

  test("item-CF ingest state: shard-folded counts equal the full rebuild exactly") {
    import graft.analytics.Behavioral
    val bk = Tables.lineitem(spark, TestSpark.sf)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct().cache()
    // three ok-disjoint ingest shards (whole baskets per shard)
    val shards = (0 to 2).map(i => bk.filter($"ok" % 3 === i))
    val (cooc0, cnt0) = (Behavioral.itemcfCounts(shards(0)),
      Behavioral.itemcfPartCounts(shards(0)))
    val (cooc, cnt) = shards.drop(1).foldLeft((cooc0, cnt0)) {
      case ((co, cn), sh) => Behavioral.appendItemcfShard(co, cn, sh)
    }
    def canon(df: org.apache.spark.sql.DataFrame, cols: String*) =
      df.select(cols.map(col): _*).as[(Long, Long, Long)].collect().sorted.toSeq
    assert(canon(cooc, "a", "b", "nab") ==
      canon(Behavioral.itemcfCounts(bk), "a", "b", "nab"),
      "incremental co-occurrence counts diverged from the full rebuild")
    assert(cnt.as[(Long, Long)].collect().sorted.toSeq ==
      Behavioral.itemcfPartCounts(bk).as[(Long, Long)].collect().sorted.toSeq,
      "incremental part counts diverged")
    // and the MODEL from maintained counts equals the one-shot build
    val fromState = Behavioral.neighborsFromCounts(cooc, cnt)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val oneShot = Behavioral.neighborsFromCounts(
      Behavioral.itemcfCounts(bk), Behavioral.itemcfPartCounts(bk))
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(fromState == oneShot, "model from maintained state diverged")
    bk.unpersist()
  }

  test("q_recs_eval: metrics bounded and ordered, every held-out user counted once") {
    val rows = SparkEntry.queries("q_recs_eval")(spark, TestSpark.sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (seg, n, hr3, hr10, mrr) =>
      assert(n > 0, seg)
      assert(hr3 >= 0 && hr3 <= hr10 + 1e-9 && hr10 <= 1, s"$seg: hr3 $hr3 hr10 $hr10")
      assert(mrr >= 0 && mrr <= hr10 + 1e-9, s"$seg: mrr $mrr > hr10 $hr10")
    }
    // one eval row per customer with >= 2 owned parts
    val eligible = Tables.orders(spark, TestSpark.sf)
      .select($"o_orderkey".as("ok"), $"o_custkey".as("ck"))
      .join(Tables.lineitem(spark, TestSpark.sf)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")), "ok")
      .select("ck", "pk").distinct()
      .groupBy("ck").count().filter($"count" >= 2).count()
    assert(rows.map(_._2).sum == eligible,
      s"${rows.map(_._2).sum} evaluated != $eligible eligible customers")
  }

  test("q_next_event: model trained pre-split only, accuracy consistent") {
    val rows = SparkEntry.queries("q_next_event")(spark, TestSpark.sf)
      .as[(String, String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, pred, n, hits, acc) =>
      assert(hits >= 0 && hits <= n, s"$src: hits $hits of $n")
      val want = BigDecimal(hits.toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(acc - want) < 1e-9, s"$src: accuracy $acc != $hits/$n")
      assert(pred.nonEmpty)
    }
    assert(rows.map(_._1).distinct.length == rows.length, "one row per src")
  }

  test("q_next_event is leak-free: post-split transitions never change the model") {
    // the model argmax must be reproducible from pre-split transitions alone
    val ev = Tables.events(spark, TestSpark.sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val seq = ev.select($"user_id", $"ts", $"event_id", $"event_type".as("src"))
      .withColumn("dst", lead("src", 1).over(w))
      .withColumn("dst_ts", lead("ts", 1).over(w))
      .filter($"dst".isNotNull && $"dst_ts" < lit("2024-01-25 00:00:00").cast("timestamp"))
    val wantModel = seq.groupBy("src", "dst").agg(count(lit(1)).as("w0"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy($"w0".desc, $"dst")))
      .filter($"rn" === 1).select($"src", $"dst".as("want"))
      .as[(String, String)].collect().toMap
    val got = SparkEntry.queries("q_next_event")(spark, TestSpark.sf)
      .select("src", "predicted").as[(String, String)].collect().toMap
    got.foreach { case (src, pred) =>
      assert(wantModel(src) == pred, s"$src predicted $pred != pre-split argmax ${wantModel(src)}") }
  }

  test("q_next_event plan: model join is broadcast") {
    val plan = SparkEntry.queries("q_next_event")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"model must broadcast:\n$plan")
  }
}
