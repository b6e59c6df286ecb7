package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** GraftExtensions: SQL-registered native functions + the polygon-envelope
  * optimizer rule (bbox conjunct derived from the ring becomes a pushable
  * range predicate).
  */
class ExtensionsSpec extends AnyFunSuite {

  /** A second session on the shared SparkContext, built WITH the extension
    * via `builder.withExtensions` — the programmatic path (the
    * `spark.sql.extensions` STATIC conf is ignored once the context
    * exists); Bench/Verify/ApiServer create their own contexts and use the
    * config form. TestSpark.spark ALSO carries the extensions now (declared
    * queries use the SQL table functions), so this session exists to pin
    * the programmatic registration path specifically, not an
    * extensions-vs-none contrast. It is restored as non-default so the
    * other specs keep running against the shared session.
    */
  private lazy val ext: SparkSession = {
    TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(TestSpark.spark)
    SparkSession.setActiveSession(TestSpark.spark)
    s
  }

  test("SQL cosine_sim / dot_product / simhash64 resolve and compute") {
    val row = ext.sql(
      """SELECT round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS c,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       simhash64(array(0L)) AS s""".stripMargin).collect()(0)
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) == 11.0)
    assert(row.getLong(2) == 0L)
  }

  test("SQL numeric-literal arrays (decimal/int) are cast, not crashed on") {
    val row = ext.sql(
      """SELECT dot_product(array(1.0, 2.0), array(3.0, 4.0)) AS d,
        |       round(cosine_sim(array(1.0, 0.0), array(1.0, 0.0)), 6) AS c,
        |       simhash64(array(1, 2, 3)) AS s1,
        |       simhash64(array(1L, 2L, 3L)) AS s2""".stripMargin).collect()(0)
    assert(row.getDouble(0) == 11.0)
    assert(row.getDouble(1) == 1.0)
    assert(row.getLong(2) == row.getLong(3)) // int array widens to the long-array result
  }

  test("SQL gram_matrix and the gram_sketch rollup compute population covariance") {
    // x = id in 0..4, y = id²: var_pop(x)=2, covar_pop(x,y)=8, var_pop(y)=34.8
    def cells(rows: Seq[org.apache.spark.sql.Row]): Map[(Long, Long), Double] =
      rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val one = cells(ext.sql(
      """SELECT inline(g) FROM (
        |  SELECT gram_matrix(array(CAST(id AS DOUBLE), CAST(id*id AS DOUBLE))) AS g
        |  FROM range(5))""".stripMargin).collect().toSeq)
    assert(math.abs(one((0L, 0L)) - 2.0) < 1e-12, one.toString)
    assert(math.abs(one((0L, 1L)) - 8.0) < 1e-12, one.toString)
    assert(math.abs(one((1L, 1L)) - 34.8) < 1e-12, one.toString)
    val rolled = cells(ext.sql(
      """SELECT inline(g) FROM (
        |  SELECT gram_merge_cov(sk) AS g FROM (
        |    SELECT id % 2 AS shard,
        |      gram_sketch(array(CAST(id AS DOUBLE), CAST(id*id AS DOUBLE))) AS sk
        |    FROM range(5) GROUP BY id % 2))""".stripMargin).collect().toSeq)
    one.foreach { case (k, v) =>
      assert(math.abs(rolled(k) - v) < 1e-12, s"$k: rollup ${rolled(k)} vs $v") }
  }

  test("SQL point_in_polygon matches the Scala ray-cast") {
    val ring = Seq((-79.5, 44.1), (-79.0, 44.1), (-79.0, 44.4), (-79.5, 44.4), (-79.5, 44.1))
    val sqlHits = ext.sql(
      """SELECT y, x FROM (SELECT id DIV 10 AS y, id % 10 AS x,
        |  44.0 + (id DIV 10) * 0.05 AS lat, -79.6 + (id % 10) * 0.1 AS lon
        |  FROM range(100))
        |WHERE point_in_polygon(lat, lon,
        |  array(-79.5D, 44.1D, -79.0D, 44.1D, -79.0D, 44.4D, -79.5D, 44.4D, -79.5D, 44.1D))
        |ORDER BY y, x""".stripMargin).collect().map(r => (r.getLong(0), r.getLong(1)))
    val scalaHits = (0 until 100).map(id => (id / 10, id % 10)).filter { case (y, x) =>
      functions.GeoUtil.rayCast(44.0 + y * 0.05, -79.6 + x * 0.1,
        ring.flatMap { case (lo, la) => Seq(lo, la) }.toArray)
    }.map { case (y, x) => (y.toLong, x.toLong) }
    assert(sqlHits.nonEmpty && sqlHits.toSeq == scalaHits)
  }

  test("envelope rule turns the polygon mask into pushed parquet range filters") {
    import ext.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-env").toFile.getAbsolutePath
    (0 until 400).map(i => (44.0 + (i / 20) * 0.05, -80.0 + (i % 20) * 0.05, i))
      .toDF("lat", "lon", "v").write.mode("overwrite").parquet(s"$dir/pts")
    val ring = Seq((-79.5, 44.1), (-79.0, 44.1), (-79.0, 44.4), (-79.5, 44.4), (-79.5, 44.1))
    val df = ext.read.parquet(s"$dir/pts")
      .filter(functions.GeoFunctions.point_in_polygon(col("lat"), col("lon"), ring))
    val plan = df.queryExecution.executedPlan.toString
    // the derived bbox reached the scan as pushable range predicates
    // (FileScan's toString truncates the filter list, so assert on the lat
    // bound and the conjuncts in the residual Filter)
    assert(plan.contains("GreaterThanOrEqual(lat,44.1)"), plan)
    assert(plan.contains(">= -79.5)") && plan.contains("<= -79.0)"), plan)
    // and semantics are unchanged vs the extension-less session
    val plain = TestSpark.spark.read.parquet(s"$dir/pts")
      .filter(functions.GeoFunctions.point_in_polygon(col("lat"), col("lon"), ring))
    assert(df.collect().map(_.getInt(2)).sorted
      .sameElements(plain.collect().map(_.getInt(2)).sorted))
  }

  test("rule leaves projections untouched: NULL coordinate stays NULL") {
    // lon=5.0 is OUTSIDE the envelope: a filter-style rewrite (bbox AND pip)
    // would evaluate to FALSE here, but the projected value must stay NULL
    val row = ext.sql(
      """SELECT point_in_polygon(CAST(NULL AS DOUBLE), 5.0D,
        |  array(-1.0D, -1.0D, 1.0D, -1.0D, 1.0D, 1.0D, -1.0D, 1.0D, -1.0D, -1.0D)) AS p
        |""".stripMargin).collect()(0)
    assert(row.isNullAt(0), "projected point_in_polygon must stay NULL for NULL input")
  }

  test("minhash/simhash reject non-integral-array children at analysis time") {
    import org.apache.spark.sql.AnalysisException
    val df = TestSpark.spark.range(1).selectExpr("CAST(id AS STRING) AS s")
    intercept[AnalysisException] {
      df.select(functions.SimHashFunctions.simhash64(col("s"))).collect()
    }
    intercept[AnalysisException] {
      df.select(functions.MinHashFunctions.minhash_signature(col("s"), 4)).collect()
    }
    // narrower integral arrays widen instead of failing
    val ok = TestSpark.spark.sql("SELECT array(1, 2, 3) AS a")
    assert(ok.select(functions.SimHashFunctions.simhash64(col("a"))).collect().length == 1)
  }

  test("SQL aggregate sketches resolve and run partial+final") {
    val top = ext.sql(
      """SELECT approx_top_k(t, 2, 16) AS top FROM (
        |  SELECT CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END AS t FROM range(90))
        |""".stripMargin).collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(r => (r.getString(0), r.getLong(1))) == Seq(("b", 60L), ("a", 30L)))
    val breaks = ext.sql(
      """SELECT histogram_breaks(CAST(id AS DOUBLE), 4, 64) AS b FROM range(101)
        |""".stripMargin).collect()(0).getSeq[Double](0)
    assert(breaks.length == 3 && math.abs(breaks(1) - 50.0) <= 1.0, breaks)
    // two-stage quantile rollup from SQL alone: per-shard sketch bytes
    // merged to global type-7 quantiles — exact below the bin budget
    val rollup = ext.sql(
      """SELECT histogram_merge_quantiles(sk, 64, 0.25, 0.5, 0.75) AS qs FROM (
        |  SELECT id % 4 AS shard, histogram_sketch(CAST(id % 50 AS DOUBLE), 64) AS sk
        |  FROM range(1000) GROUP BY id % 4)
        |""".stripMargin).collect()(0).getSeq[Double](0)
    val exactRollup = ext.sql(
      """SELECT percentile(CAST(id % 50 AS DOUBLE), array(0.25, 0.5, 0.75))
        |FROM range(1000)""".stripMargin).collect()(0).getSeq[Double](0)
    assert(rollup == exactRollup, s"$rollup vs $exactRollup")
    val knn = ext.sql(
      """SELECT top_k_by_score(struct(CAST(id % 7 AS DOUBLE), id), 3) AS t
        |FROM range(100)""".stripMargin).collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(knn.map(_.getLong(0)) == Seq(6L, 13L, 20L)) // sim 6.0 ties, id asc
    val mh = ext.sql("SELECT minhash_signature(array(1L, 2L, 3L), 8) AS s")
      .collect()(0).getSeq[Long](0)
    assert(mh.length == 8)
    val z = ext.sql("SELECT zorder64(3, 3) AS z").collect()(0).getLong(0)
    assert(z == 15L)
    val cms = ext.sql(
      """SELECT cms_estimate(
        |  count_min_sketch(t, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42),
        |  'a') AS n
        |FROM (SELECT CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END AS t
        |      FROM range(90))""".stripMargin).collect()(0).getLong(0)
    assert(cms == 30L)
  }

  test("polygon mask → envelope → grid section: the full pipeline composes") {
    // the reference's whole query path (polygon → bbox → hyperslab,
    // Gddp.scala:73-94,206-226), fully automatic: PolygonEnvelopeRule
    // derives the bbox conjuncts, V2 pushdown hands them to the grid scan,
    // and the builder narrows the section conservatively from the affine
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val ring = Seq((-79.3, 44.3), (-79.0, 44.3), (-79.0, 44.5), (-79.3, 44.5), (-79.3, 44.3))
    val df = sources.SourceQueries.gridTable(ext)
      .filter(functions.GeoFunctions.point_in_polygon(col("lat"), col("lon"), ring))
    val rel = df.queryExecution.optimizedPlan
      .collectFirst { case r: DataSourceV2ScanRelation => r }.get
    val full = BigInt(domain.GridData.N) * 64
    assert(rel.stats.sizeInBytes < full / 4,
      s"section did not shrink: ${rel.stats.sizeInBytes} vs $full")
    // and the mask semantics are exactly the extension-less evaluation
    val plain = domain.GridData.cells(TestSpark.spark)
      .filter(functions.GeoFunctions.point_in_polygon(col("lat"), col("lon"), ring))
    assert(df.count() == plain.count() && plain.count() > 0)
  }

  test("rule is idempotent: one envelope per mask, no repeated conjuncts") {
    val ring = Seq((-79.5, 44.1), (-79.0, 44.1), (-79.0, 44.4), (-79.5, 44.4), (-79.5, 44.1))
    val df = ext.range(10)
      .selectExpr("44.0 + id * 0.05 AS lat", "-79.4 AS lon")
      .filter(functions.GeoFunctions.point_in_polygon(col("lat"), col("lon"), ring))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("point_in_polygon".r.findAllIn(optimized).size == 1, optimized)
  }

  test("SQL grid_scan TVF serves the DSv2 grid source with pushdown intact") {
    val dir = sources.SourceQueries.ncDir
    val viaSql = ext.sql(
      s"SELECT variable, ts, y, x, value FROM grid_scan('$dir') " +
        "WHERE y < 5 AND x < 7 ORDER BY variable, ts, y, x")
    val viaApi = ext.read.format(classOf[sources.GridSource].getName)
      .option("path", dir).load()
      .filter(col("y") < 5 && col("x") < 7)
      .select("variable", "ts", "y", "x", "value")
      .orderBy("variable", "ts", "y", "x")
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
    assert(viaSql.count() > 0)
    // the bbox predicate must reach the source as a pushed Section, exactly
    // as in the DataFrame form — the TVF returns the same relation
    val phys = viaSql.queryExecution.executedPlan.toString
    assert(phys.contains("GridScan") || phys.contains("Section"), phys)
  }

  test("SQL snapshot_scan TVF reads latest and pinned versions (time travel)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf-snap").toString
    import TestSpark.spark.implicits._
    operators.Snapshots.commit(ext,
      dir, Seq((1, "a"), (2, "b")).toDF("id", "s"))
    operators.Snapshots.commit(ext,
      dir, Seq((3, "c")).toDF("id", "s"))
    val latest = ext.sql(s"SELECT sum(id) AS t FROM snapshot_scan('$dir')")
      .collect()(0).getLong(0)
    val pinned = ext.sql(s"SELECT sum(id) AS t FROM snapshot_scan('$dir', 1)")
      .collect()(0).getLong(0)
    assert(latest == 6 && pinned == 3)
  }

  test("SQL snapshot_changes TVF serves the row-level change feed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf-cdf").toString
    import TestSpark.spark.implicits._
    operators.Snapshots.commit(ext, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    operators.Snapshots.commit(ext, dir, Seq((3L, "c")).toDF("k", "v"))
    operators.Snapshots.mergeInto(ext, dir, Seq((1L, "A")).toDF("k", "v"), "k")
    val got = ext.sql(
      s"""SELECT _commit_version, _change_type, k, v
         |FROM snapshot_changes('$dir', 1, 3)
         |ORDER BY _commit_version, _change_type, k""".stripMargin)
      .as[(Int, String, Long, String)].collect().toSeq
    assert(got == Seq(
      (2, "insert", 3L, "c"),
      (3, "update_post", 1L, "A"),
      (3, "update_pre", 1L, "a")), s"TVF feed diverged: $got")
  }

  test("SQL bm25_search / phrase_search TVFs serve the text index") {
    val dir = graft.text.TextIndex.prepareIndex(ext, TestSpark.sf)
    assert(ext.sql(s"SELECT * FROM bm25_search('$dir')").collect().toSeq ==
      graft.text.TextIndex.bm25Indexed(ext, dir).collect().toSeq)
    // the k argument narrows the cut, SQL-side composition still works
    val top5 = ext.sql(
      s"SELECT doc_id FROM bm25_search('$dir', 5) WHERE bm25 > 0")
    assert(top5.count() <= 5 && top5.count() > 0)
    assert(ext.sql(s"SELECT * FROM phrase_search('$dir')").collect().toSeq ==
      graft.text.TextIndex.phraseSearch(ext, dir).collect().toSeq)
    // the TVF plan is the same pruned index scan: no Generate, no documents
    val phys = ext.sql(s"SELECT * FROM bm25_search('$dir')")
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Generate"), phys)
    assert(phys.contains("PushedFilters: [In(token"), phys)
  }

  test("SQL face of the semantic diff: snapshot_diff TVF") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf-diff").toString
    import TestSpark.spark.implicits._
    operators.Snapshots.commit(ext, dir, Seq((1, "a"), (2, "b")).toDF("id", "s"))
    operators.Snapshots.commit(ext, dir, Seq((3, "c")).toDF("id", "s"))
    operators.Snapshots.deleteRange(ext, dir, "id", Some(1), Some(1))
    val d = ext.sql(
      s"SELECT id, s, _change_type FROM snapshot_diff('$dir', 1, 3) ORDER BY id")
      .as[(Int, String, String)].collect().toSeq
    assert(d == Seq((1, "a", "delete"), (3, "c", "insert")))
    intercept[Exception](
      ext.sql(s"SELECT * FROM snapshot_diff('$dir', 1)").collect())
  }

  test("SQL face of named tags: snapshot_tags TVF + tagAsOf relation option") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf-tag").toString
    import TestSpark.spark.implicits._
    operators.Snapshots.commit(ext, dir, Seq((1, "a"), (2, "b")).toDF("id", "s"))
    operators.Snapshots.commit(ext, dir, Seq((3, "c")).toDF("id", "s"))
    operators.Snapshots.setTag(ext, dir, "golden", 1)
    val tags = ext.sql(s"SELECT tag, version FROM snapshot_tags('$dir')")
      .as[(String, Int)].collect().toSeq
    assert(tags == Seq(("golden", 1)))
    ext.sql(s"CREATE OR REPLACE TEMP VIEW snap_tagged USING snapshots " +
      s"OPTIONS (path '$dir', tagAsOf 'golden')")
    assert(ext.sql("SELECT sum(id) FROM snap_tagged").collect()(0).getLong(0) == 3)
    // unknown tag and conflicting pins both refuse
    intercept[Exception](ext.sql(s"CREATE OR REPLACE TEMP VIEW bad_tag USING " +
      s"snapshots OPTIONS (path '$dir', tagAsOf 'nope')").collect())
    intercept[Exception](ext.sql(s"CREATE OR REPLACE TEMP VIEW bad_two USING " +
      s"snapshots OPTIONS (path '$dir', tagAsOf 'golden', versionAsOf '2')")
      .collect())
  }

  test("SQL face of branches: snapshot_branches TVF tracks fork and commits") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf-br").toString
    import TestSpark.spark.implicits._
    operators.Snapshots.commit(ext, dir, Seq((1, "a")).toDF("id", "s"))
    operators.Snapshots.createBranch(ext, dir, "wip")
    operators.Snapshots.commitToBranch(ext, dir, "wip", Seq((2, "b")).toDF("id", "s"))
    val rows = ext.sql(
      s"SELECT branch, base_version, n_commits FROM snapshot_branches('$dir')")
      .as[(String, Int, Int)].collect().toSeq
    assert(rows == Seq(("wip", 1, 1)))
    operators.Snapshots.fastForward(ext, dir, "wip")
    assert(ext.sql(s"SELECT count(*) FROM snapshot_branches('$dir')")
      .collect()(0).getLong(0) == 0)
  }

  test("SQL admin relations: snapshot_constraints and snapshot_staged TVFs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf-admin").toString
    import TestSpark.spark.implicits._
    operators.Snapshots.commit(ext, dir, Seq((1, 5.0), (2, 7.0)).toDF("id", "p"))
    operators.Snapshots.addCheckConstraint(ext, dir, "p_pos", "p > 0")
    assert(ext.sql(s"SELECT * FROM snapshot_constraints('$dir')")
      .as[(String, String)].collect().toSeq == Seq(("p_pos", "p > 0")))
    val tok = operators.Snapshots.stageCommit(ext, dir,
      Seq((3, 9.0)).toDF("id", "p"), meta = Map("wap" -> "x"))
    val staged = ext.sql(s"SELECT token, n_files, meta FROM snapshot_staged('$dir')")
      .as[(String, Int, String)].collect().toSeq
    assert(staged.map(_._1) == Seq(tok) && staged.head._3 == "wap=x", staged)
    operators.Snapshots.publishStaged(ext, dir, tok)
    assert(ext.sql(s"SELECT * FROM snapshot_staged('$dir')").count() == 0)
  }

  test("table functions reject non-constant arguments loudly") {
    val e = intercept[Exception](
      ext.sql("SELECT * FROM grid_scan(concat('a', rand()))").collect())
    assert(e.getMessage.toLowerCase.contains("constant") ||
      e.getMessage.toLowerCase.contains("foldable"), e.getMessage)
  }
}
