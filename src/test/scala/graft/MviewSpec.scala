package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Mview, Snapshots}

class MviewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toFile.getAbsolutePath

  private def viewMap(viewDir: String): Map[String, (Long, Long, Long, Long)] =
    Snapshots.read(spark, viewDir).select("g", "cnt", "sum_x", "min_x", "max_x")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  private def fullMap(srcDir: String): Map[String, (Long, Long, Long, Long)] =
    Snapshots.read(spark, srcDir).groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"),
        min("x").as("min_x"), max("x").as("max_x"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("property: refresh at random cadence always equals the full aggregate") {
    val src = tmp("mv-src"); val view = tmp("mv-view")
    val rng = new scala.util.Random(7)
    for (round <- 1 to 8) {
      val rows = Seq.fill(1 + rng.nextInt(40))(
        (s"g${rng.nextInt(5)}", rng.nextInt(100).toLong))
      Snapshots.commit(spark, src, rows.toDF("g", "x"))
      if (rng.nextBoolean() || round == 8) {
        Mview.refresh(spark, src, view, Seq("g"), Seq("x"), Seq("x"))
        assert(viewMap(view) == fullMap(src), s"diverged at round $round")
        assert(Mview.appliedSrcVersion(spark, view)
          .contains(Snapshots.currentVersion(spark, src).get))
      }
    }
  }

  test("property: feed refresh with EXTREMA equals the full aggregate under random op mixes") {
    val src = tmp("graft-mvmm-src"); val view = tmp("graft-mvmm-v")
    def full: Map[Long, (Long, Long, Long, Long)] =
      Snapshots.read(spark, src).groupBy("g")
        .agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"),
          min("x").as("min_x"), max("x").as("max_x"))
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    def mv: Map[Long, (Long, Long, Long, Long)] =
      Snapshots.read(spark, view).select("g", "cnt", "sum_x", "min_x", "max_x")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val rng = new scala.util.Random(11)
    var nextK = 0L
    Snapshots.commit(spark, src, (0 until 30).map { _ =>
      nextK += 1; (rng.nextInt(4).toLong, nextK, rng.nextInt(1000).toLong)
    }.toDF("g", "k", "x"))
    Mview.refreshViaFeed(spark, src, view, Seq("g"), Seq("x"), Seq("x"))
    assert(mv == full, "initial extrema build diverged")
    for (round <- 1 to 10) {
      rng.nextInt(3) match {
        case 0 => // append: pure-insert fold tier
          Snapshots.commit(spark, src, (0 until 1 + rng.nextInt(8)).map { _ =>
            nextK += 1; (rng.nextInt(4).toLong, nextK, rng.nextInt(1000).toLong)
          }.toDF("g", "k", "x"))
        case 1 => // upsert merge: update_pre rows trigger the recompute tier
          val live = Snapshots.read(spark, src).select("g", "k")
            .as[(Long, Long)].collect()
          val ups = rng.shuffle(live.toSeq).take(1 + rng.nextInt(5))
            .map { case (g, k) => (g, k, rng.nextInt(1000).toLong) }
          Snapshots.mergeInto(spark, src, ups.toDF("g", "k", "x"), "k")
        case 2 => // range delete: may remove a group's minimum or maximum
          val lo = 1L + rng.nextInt(nextK.toInt).toLong
          Snapshots.deleteRange(spark, src, "k", Some(lo),
            Some(lo + rng.nextInt(6)))
      }
      if (rng.nextBoolean() || round == 10) {
        Mview.refreshViaFeed(spark, src, view, Seq("g"), Seq("x"), Seq("x"))
        assert(mv == full, s"extrema view diverged at round $round")
      }
    }
  }

  test("feed refresh without minMaxCols ADOPTS a view's existing extrema instead of dropping them") {
    val src = tmp("graft-mvadopt-src"); val view = tmp("graft-mvadopt-v")
    Snapshots.commit(spark, src,
      Seq((1L, 1L, 10L), (1L, 2L, 30L), (2L, 3L, 5L)).toDF("g", "k", "x"))
    Mview.refreshViaFeed(spark, src, view, Seq("g"), Seq("x"), Seq("x"))
    assert(Snapshots.read(spark, view).columns.contains("min_x"))
    // a config-drifted caller (serveViaFeed's default) refreshes WITHOUT
    // minMaxCols: the extrema columns must survive AND stay correct
    Snapshots.deleteRange(spark, src, "k", Some(2L), Some(2L)) // g=1 max goes
    Mview.refreshViaFeed(spark, src, view, Seq("g"), Seq("x"))
    assert(Snapshots.read(spark, view).columns.toSet
      .intersect(Set("min_x", "max_x")).size == 2,
      "extrema columns silently dropped by a minMaxCols-less refresh")
    val rows = Snapshots.read(spark, view)
      .select("g", "min_x", "max_x").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(1L) == ((10L, 10L)), s"g=1 extrema stale after delete: $rows")
    assert(rows(2L) == ((5L, 5L)), rows)
  }

  test("refresh requesting extrema the view was not built with refuses actionably") {
    val src = tmp("graft-mvnoex-src"); val view = tmp("graft-mvnoex-v")
    Snapshots.commit(spark, src,
      Seq((1L, 1L, 10L), (2L, 2L, 5L)).toDF("g", "k", "x"))
    // built WITHOUT extrema — then a config-drifted caller asks for them:
    // both refresh paths must refuse with the rebuild hint, not die in the
    // merged select with an unresolved l_min_x
    Mview.refresh(spark, src, view, Seq("g"), Seq("x"))
    Snapshots.commit(spark, src, Seq((1L, 3L, 7L)).toDF("g", "k", "x"))
    val e1 = intercept[IllegalArgumentException](
      Mview.refresh(spark, src, view, Seq("g"), Seq("x"), Seq("x")))
    assert(e1.getMessage.contains("rebuild"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Mview.refreshViaFeed(spark, src, view, Seq("g"), Seq("x"), Seq("x")))
    assert(e2.getMessage.contains("rebuild"), e2.getMessage)
    // the refusal left the view intact and refreshable
    Mview.refresh(spark, src, view, Seq("g"), Seq("x"))
    val rows = Snapshots.read(spark, view)
      .select("g", "sum_x").as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 17L, 2L -> 5L), rows)
  }

  test("feed-based refresh survives merge and delete, equals the full aggregate") {
    val src = tmp("graft-mvf-src"); val view = tmp("graft-mvf-v")
    def full: Map[Long, (Long, Long, Long)] =
      Snapshots.read(spark, src).groupBy("g")
        .agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"),
          count(col("x")).as("cntv_x"))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def mv: Map[Long, (Long, Long, Long)] =
      Snapshots.read(spark, view).select("g", "cnt", "sum_x", "cntv_x")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    Snapshots.commit(spark, src, Seq((1L, 1L, 10L), (1L, 2L, 20L),
      (2L, 3L, 30L), (3L, 4L, 40L)).toDF("g", "k", "x"))
    Mview.refreshViaFeed(spark, src, view, Seq("g"), Seq("x"))
    assert(mv == full, "initial build diverged")
    // append, then an upsert-merge that updates and inserts
    Snapshots.commit(spark, src, Seq((2L, 5L, 50L)).toDF("g", "k", "x"))
    Snapshots.mergeInto(spark, src,
      Seq((1L, 2L, 99L), (2L, 6L, 60L)).toDF("g", "k", "x"), "k")
    Mview.refreshViaFeed(spark, src, view, Seq("g"), Seq("x"))
    assert(mv == full, "merge fold diverged")
    // delete an ENTIRE group (g=3 has only k=4): the group must leave
    Snapshots.deleteRange(spark, src, "k", Some(4L), Some(4L))
    Mview.refreshViaFeed(spark, src, view, Seq("g"), Seq("x"))
    assert(mv == full, "delete fold diverged")
    assert(!mv.contains(3L), "fully-deleted group still in the view")
    // the PLAIN refresh would have refused across these rewrites
    val src2 = tmp("graft-mvf-src2"); val view2 = tmp("graft-mvf-v2")
    Snapshots.commit(spark, src2, Seq((1L, 1L, 10L)).toDF("g", "k", "x"))
    Mview.refresh(spark, src2, view2, Seq("g"), Seq("x"))
    Snapshots.deleteRange(spark, src2, "k", Some(1L), Some(1L))
    intercept[IllegalArgumentException](
      Mview.refresh(spark, src2, view2, Seq("g"), Seq("x")))
  }

  test("refresh with an unmoved source is a no-op version") {
    val src = tmp("mv-src2"); val view = tmp("mv-view2")
    Snapshots.commit(spark, src, Seq(("a", 1L)).toDF("g", "x"))
    val v1 = Mview.refresh(spark, src, view, Seq("g"), Seq("x"))
    val v2 = Mview.refresh(spark, src, view, Seq("g"), Seq("x"))
    assert(v1 == v2, "no-op refresh must not publish a version")
  }

  test("source replace breaks the delta: refresh refuses, rebuild resyncs") {
    val src = tmp("mv-src3"); val view = tmp("mv-view3")
    Snapshots.commit(spark, src, Seq(("a", 1L), ("b", 2L)).toDF("g", "x"))
    Mview.refresh(spark, src, view, Seq("g"), Seq("x"), Seq("x"))
    Snapshots.commit(spark, src, Seq(("a", 100L)).toDF("g", "x"), replace = true)
    intercept[IllegalArgumentException](
      Mview.refresh(spark, src, view, Seq("g"), Seq("x"), Seq("x")))
    Mview.rebuild(spark, src, view, Seq("g"), Seq("x"), Seq("x"))
    assert(viewMap(view) == Map("a" -> ((1L, 100L, 100L, 100L))))
    // incremental maintenance resumes cleanly after the resync
    Snapshots.commit(spark, src, Seq(("b", 7L)).toDF("g", "x"))
    Mview.refresh(spark, src, view, Seq("g"), Seq("x"), Seq("x"))
    assert(viewMap(view) == fullMap(src))
  }

  test("NULL group keys stay ONE group across refreshes (null-safe merge)") {
    val src = tmp("mv-null"); val view = tmp("mv-null-v")
    Snapshots.commit(spark, src,
      Seq((Option("a"), 1L), (Option.empty[String], 2L)).toDF("g", "x"))
    Mview.refresh(spark, src, view, Seq("g"), Seq("x"), Seq("x"))
    Snapshots.commit(spark, src,
      Seq((Option.empty[String], 3L), (Option.empty[String], 5L)).toDF("g", "x"))
    Mview.refresh(spark, src, view, Seq("g"), Seq("x"), Seq("x"))
    val rows = Snapshots.read(spark, view).collect()
    assert(rows.length == 2, s"NULL key split into ${rows.length - 1} rows")
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) == 3 && nullRow.getLong(2) == 10,
      "NULL-group totals must accumulate in one row")
  }

  test("a non-Mview snapshot table is rejected as a view target") {
    val d = tmp("mv-plain")
    Snapshots.commit(spark, d, Seq(("a", 1L)).toDF("g", "x"))
    intercept[IllegalStateException](Mview.appliedSrcVersion(spark, d))
  }

  test("commit meta rides the version atomically and round-trips any chars") {
    val d = tmp("mv-meta")
    val meta = Map("src_version" -> "3", "note" -> "tabs\tand\nnewlines % ü")
    Snapshots.commit(spark, d, Seq(1L).toDF("k"), meta = meta)
    assert(Snapshots.commitMeta(spark, d, 1) == meta)
    Snapshots.commit(spark, d, Seq(2L).toDF("k"))
    assert(Snapshots.commitMeta(spark, d, 2).isEmpty, "meta must not leak across versions")
  }

  // ---- automatic query rewrite (MviewRewrite + the injected rule)

  import graft.operators.MviewRewrite

  private def rewriteFixture(): (String, String) = {
    val src = tmp("mvr-src"); val view = tmp("mvr-view")
    Snapshots.commit(spark, src,
      Seq(("a", 1L), ("a", 5L), ("b", 2L), ("b", 8L), ("c", 4L)).toDF("g", "x"))
    Mview.refresh(spark, src, view, Seq("g"), Seq("x"), Seq("x"))
    (src, view)
  }

  private def baseAgg(src: String) =
    Snapshots.read(spark, src).groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum("x").as("sx"),
        min("x").as("lo"), max("x").as("hi"))
      .orderBy("g")

  private def scannedDirs(df: org.apache.spark.sql.DataFrame): Set[String] =
    TestSpark.scannedDirs(df)

  private def scansUnder(df: org.apache.spark.sql.DataFrame, dir: String): Boolean =
    scannedDirs(df).exists(_.startsWith(dir + "/"))

  test("query rewrite: a fresh registered view answers the base-table aggregate") {
    val (src, view) = rewriteFixture()
    val truth = baseAgg(src).as[(String, Long, Long, Long, Long)].collect().toSeq
    MviewRewrite.register(src, view, Seq("g"), Seq("x"), Seq("x"))
    try {
      val df = baseAgg(src)
      assert(scansUnder(df, view), s"aggregate not rewritten to the view: ${scannedDirs(df)}")
      assert(!scansUnder(df, src), s"rewritten plan still scans the source: ${scannedDirs(df)}")
      assert(df.as[(String, Long, Long, Long, Long)].collect().toSeq == truth)
      // subset grouping (global aggregate) re-aggregates the view correctly
      val g = Snapshots.read(spark, src)
        .agg(count(lit(1)).as("cnt"), sum("x").as("sx"), max("x").as("hi"))
      assert(scansUnder(g, view))
      assert(g.as[(Long, Long, Long)].collect().head == ((5L, 20L, 8L)))
    } finally MviewRewrite.deregister(src)
  }

  test("query rewrite: a STALE view never answers; refresh re-enables it") {
    val (src, view) = rewriteFixture()
    MviewRewrite.register(src, view, Seq("g"), Seq("x"), Seq("x"))
    try {
      Snapshots.commit(spark, src, Seq(("c", 9L)).toDF("g", "x"))
      val df = baseAgg(src)
      assert(!scansUnder(df, view), "stale view must not answer")
      assert(df.as[(String, Long, Long, Long, Long)].collect()
        .exists(r => r._1 == "c" && r._5 == 9L), "fresh data missing")
      Mview.refresh(spark, src, view, Seq("g"), Seq("x"), Seq("x"))
      val df2 = baseAgg(src)
      assert(scansUnder(df2, view))
      assert(df2.as[(String, Long, Long, Long, Long)].collect()
        .exists(r => r._1 == "c" && r._5 == 9L))
    } finally MviewRewrite.deregister(src)
  }

  test("query rewrite: time travel and non-derivable aggregates keep the base scan") {
    val (src, view) = rewriteFixture()
    Snapshots.commit(spark, src, Seq(("d", 3L)).toDF("g", "x"))
    Mview.refresh(spark, src, view, Seq("g"), Seq("x"), Seq("x"))
    MviewRewrite.register(src, view, Seq("g"), Seq("x"), Seq("x"))
    try {
      // a pinned v1 read aggregates HISTORY — rewriting to the head view
      // would be wrong, so it must not fire
      val v1 = Snapshots.read(spark, src, Some(1)).groupBy("g")
        .agg(count(lit(1)).as("cnt")).orderBy("g")
      assert(!scansUnder(v1, view))
      assert(v1.as[(String, Long)].collect().toSeq ==
        Seq(("a", 2L), ("b", 2L), ("c", 1L)))
      // an aggregate over an EXPRESSION is not derivable → base scan
      val ex = Snapshots.read(spark, src).groupBy("g")
        .agg(sum(col("x") * 2).as("s2"))
      assert(!scansUnder(ex, view))
      // count(DISTINCT x) must also refuse
      val cd = Snapshots.read(spark, src).groupBy("g")
        .agg(countDistinct(col("x")).as("n"))
      assert(!scansUnder(cd, view))
    } finally MviewRewrite.deregister(src)
  }

  test("query rewrite: avg and count(col) derive via non-null counts, exact under NULLs") {
    val src = tmp("mvr-null-src"); val view = tmp("mvr-null-view")
    Snapshots.commit(spark, src,
      Seq(("a", Option(4L)), ("a", Option.empty[Long]), ("a", Option(8L)),
        ("b", Option.empty[Long]), ("b", Option.empty[Long]))
        .toDF("g", "x"))
    Mview.refresh(spark, src, view, Seq("g"), Seq("x"))
    def q() = Snapshots.read(spark, src).groupBy("g")
      .agg(avg("x").as("a"), count(col("x")).as("nn"), count(lit(1)).as("n"))
      .orderBy("g")
    val truth = q().collect().map(_.toSeq).toSeq
    assert(truth == Seq(Seq("a", 6.0, 2L, 3L), Seq("b", null, 0L, 2L)), truth)
    MviewRewrite.register(src, view, Seq("g"), Seq("x"))
    try {
      val df = q()
      assert(scansUnder(df, view), s"avg/count(col) did not rewrite: ${scannedDirs(df)}")
      assert(df.collect().map(_.toSeq).toSeq == truth)
    } finally MviewRewrite.deregister(src)
  }

  test("query rewrite: counts stay 0 (not NULL) when the rewritten input is empty") {
    val (src, view) = rewriteFixture()
    MviewRewrite.register(src, view, Seq("g"), Seq("x"), Seq("x"))
    try {
      // global aggregate + a key filter matching nothing: the rewrite fires
      // (key-only filter) and sum-over-empty must not turn count's 0 into NULL
      val df = Snapshots.read(spark, src).filter(col("g") === "zzz")
        .agg(count(lit(1)).as("n"), count(col("x")).as("nn"), sum("x").as("sx"))
      assert(scansUnder(df, view), s"expected rewrite: ${scannedDirs(df)}")
      val row = df.collect().head
      assert(row.getLong(0) == 0L && row.getLong(1) == 0L && row.isNullAt(2), row.toString)
    } finally MviewRewrite.deregister(src)
  }

  test("query rewrite: nondeterministic filters and mismatched registrations refuse safely") {
    val (src, view) = rewriteFixture()
    // a rand() predicate filters base ROWS; over the view it would filter
    // whole GROUPS — must refuse even though its reference set is empty
    MviewRewrite.register(src, view, Seq("g"), Seq("x"), Seq("x"))
    try {
      // (rand < 2.0 would be provably true and Spark removes the filter
      // before this rule runs — the predicate must stay unfoldable)
      val nd = Snapshots.read(spark, src).filter(rand(7) < 0.5).groupBy("g")
        .agg(count(lit(1)).as("n"))
      assert(!scansUnder(nd, view), "nondeterministic filter must refuse")
    } finally MviewRewrite.deregister(src)
    // a registration claiming a key the VIEW does not carry must refuse
    // the rewrite (base scan, correct result) — never throw from the
    // optimizer: here "x" is registered as a key but the view was built
    // keyed on "g" only, so grouping by x attempts and safely abandons
    MviewRewrite.register(src, view, Seq("g", "x"), Seq.empty)
    try {
      val df = Snapshots.read(spark, src).groupBy("x").agg(count(lit(1)).as("n"))
      assert(!scansUnder(df, view))
      assert(df.count() == 5)
    } finally MviewRewrite.deregister(src)
  }

  test("query rewrite: fires for SQL users too — snapshot_scan TVF and mounted USING snapshots") {
    val (src, view) = rewriteFixture()
    MviewRewrite.register(src, view, Seq("g"), Seq("x"), Seq("x"))
    try {
      // the TVF plans the same parquet relation Snapshots.read builds
      val tvf = spark.sql(
        s"SELECT g, count(*) AS n, sum(x) AS sx FROM snapshot_scan('$src') GROUP BY g ORDER BY g")
      assert(scansUnder(tvf, view), s"TVF aggregate not rewritten: ${scannedDirs(tvf)}")
      assert(tvf.as[(String, Long, Long)].collect().toSeq ==
        Seq(("a", 2L, 6L), ("b", 2L, 10L), ("c", 1L, 4L)))
      // the DSv1 mounted relation matches by its own dir + pin
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW mvr_mounted " +
        s"USING snapshots OPTIONS (path '$src')")
      val mounted = spark.sql(
        "SELECT g, count(*) AS n FROM mvr_mounted GROUP BY g ORDER BY g")
      assert(scansUnder(mounted, view), s"mounted aggregate not rewritten: ${scannedDirs(mounted)}")
      assert(mounted.as[(String, Long)].collect().toSeq ==
        Seq(("a", 2L), ("b", 2L), ("c", 1L)))
      // a version-pinned mount below head keeps its scan
      Snapshots.commit(spark, src, Seq(("c", 9L)).toDF("g", "x"))
      Mview.refresh(spark, src, view, Seq("g"), Seq("x"), Seq("x"))
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW mvr_pinned " +
        s"USING snapshots OPTIONS (path '$src', versionAsOf '1')")
      val pinned = spark.sql("SELECT g, count(*) AS n FROM mvr_pinned GROUP BY g")
      assert(!scansUnder(pinned, view), "pinned mount must keep its scan")
      assert(pinned.count() == 3)
    } finally MviewRewrite.deregister(src)
  }

  test("query rewrite: a key-only WHERE rides the rewrite; other filters refuse") {
    val (src, view) = rewriteFixture()
    MviewRewrite.register(src, view, Seq("g"), Seq("x"), Seq("x"))
    try {
      val f = Snapshots.read(spark, src).filter(col("g") =!= "b").groupBy("g")
        .agg(sum("x").as("sx")).orderBy("g")
      assert(scansUnder(f, view), s"key filter blocked the rewrite: ${scannedDirs(f)}")
      assert(f.as[(String, Long)].collect().toSeq == Seq(("a", 6L), ("c", 4L)))
      // a filter on a NON-key column does not commute with the aggregate
      val nf = Snapshots.read(spark, src).filter(col("x") > 1).groupBy("g")
        .agg(sum("x").as("sx"))
      assert(!scansUnder(nf, view), "non-key filter must refuse")
    } finally MviewRewrite.deregister(src)
  }
}
