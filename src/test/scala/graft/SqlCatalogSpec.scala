package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Snapshots
import graft.streaming.SnapshotRelation

/** The DSv2 catalog face ([[graft.sources.SnapshotCatalog]]): DDL, reads
  * with filter/column/aggregate pushdown, SQL time travel, and the DML
  * rewrite (DELETE/UPDATE/MERGE → copy-on-write commands). Every lock here
  * is a SQL-user-visible contract: plans answer count(*) from metadata,
  * pushdown skips files, DML keeps untouched files carried by reference,
  * CHECK constraints gate the post-image, the change feed records exactly
  * the DML's row effects, and the ANSI multi-match rule fails loudly.
  */
class SqlCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlcatspec")
      .toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.gtest",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtest.warehouse", dir)
    dir
  }

  private var n = 0
  private def fresh(): (String, String) = synchronized {
    n += 1
    val name = s"t$n"
    (s"gtest.db.$name", s"$wh/db/$name")
  }

  test("DDL: create (schema pinned, empty), insert, overwrite, rename, drop") {
    val (t, dir) = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").as[Long].head() == 0L)
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("k", "v"))
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")
    assert(spark.table(t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // each INSERT is one atomic commit
    assert(Snapshots.currentVersion(spark, dir).contains(3))
    spark.sql(s"INSERT OVERWRITE $t VALUES (9, 'z')")
    assert(spark.table(t).as[(Long, String)].collect().toSet == Set((9L, "z")))
    // CREATE over an existing table refuses; unknown/multi/mistyped
    // transforms refuse (identity/days/hours/months/years/bucket/truncate
    // are accepted — see the partitioning tests)
    intercept[Exception](spark.sql(s"CREATE TABLE $t (k BIGINT)"))
    intercept[Exception](spark.sql(
      s"CREATE TABLE ${t}_p (k BIGINT, ts TIMESTAMP) PARTITIONED BY (zoom(ts))"))
    intercept[Exception](spark.sql(
      s"CREATE TABLE ${t}_p (a INT, b INT, c INT, d INT, e INT) " +
        "PARTITIONED BY (a, b, c, d, e)")) // > 4 transforms
    intercept[Exception](spark.sql(
      s"CREATE TABLE ${t}_p (k BIGINT, d STRING) PARTITIONED BY (days(d))"))
    intercept[Exception](spark.sql(
      s"CREATE TABLE ${t}_p (k BIGINT, p DOUBLE) PARTITIONED BY (truncate(4, p))"))
    // CTAS: create + first commit through the same write path
    spark.sql(s"CREATE TABLE ${t}_ctas AS SELECT k, v FROM $t WHERE k >= 9")
    assert(spark.table(s"${t}_ctas").as[(Long, String)].collect().toSet ==
      Set((9L, "z")))
    spark.sql(s"DROP TABLE ${t}_ctas")
    spark.sql(s"ALTER TABLE $t RENAME TO db.renamed$n")
    assert(spark.table(s"gtest.db.renamed$n").count() == 1)
    assert(!spark.catalog.tableExists(t))
    spark.sql(s"DROP TABLE gtest.db.renamed$n")
    intercept[Exception](spark.table(s"gtest.db.renamed$n").count())
  }

  test("SHOW TABLES lists snapshot tables; table properties round-trip through ALTER") {
    val (t, dir) = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    val listed = spark.sql("SHOW TABLES IN gtest.db").select("tableName")
      .as[String].collect().toSet
    assert(listed.contains(t.split('.').last))
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('owner.team' = 'data')")
    assert(Snapshots.properties(spark, dir).get("owner.team").contains("data"))
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('owner.team')")
    assert(!Snapshots.properties(spark, dir).contains("owner.team"))
  }

  test("DDL column evolution: ADD COLUMN (evolve commit), RENAME COLUMN, DROP COLUMN") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    spark.sql(s"ALTER TABLE $t ADD COLUMN score DOUBLE")
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("k", "v", "score"))
    assert(spark.table(t).select("score").as[Option[Double]].head().isEmpty,
      "pre-evolution rows must surface NULL for the added column")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b', 7.5)")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO label")
    assert(spark.table(t).select("k", "label", "score")
      .as[(Long, String, Option[Double])].collect().toSet ==
      Set((1L, "a", None), (2L, "b", Some(7.5))))
    spark.sql(s"ALTER TABLE $t DROP COLUMN score")
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("k", "label"))
    // FIRST/AFTER positions refuse (physical layout appends)
    intercept[Exception](
      spark.sql(s"ALTER TABLE $t ADD COLUMN early INT FIRST"))
  }

  test("count(*) answers from metadata: no data-file scan survives clobbered files") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir,
      spark.range(1000).toDF("k").withColumn("p", col("k") * 1.0)
        .repartitionByRange(4, col("k")))
    Snapshots.deleteRangeMor(spark, dir, "k", Some(100L), Some(199L))
    val q = spark.sql(s"SELECT count(*) AS n FROM $t")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [COUNT(*)]"), plan)
    assert(q.as[Long].head() == 900L, "DV mask not subtracted")
    // the decisive proof: clobber every data file; metadata still answers
    Snapshots.files(spark, dir, Snapshots.currentVersion(spark, dir).get)
      .foreach { f =>
        java.nio.file.Files.write(java.nio.file.Paths.get(dir, f), Array[Byte](1))
      }
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").as[Long].head() == 900L,
      "count(*) planned a data-file scan")
  }

  test("min/max/count(col) push down completely; a deletion vector declines extrema") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir,
      Seq((1L, 10.0, Some("a")), (2L, 20.0, None), (3L, 30.0, Some("c")))
        .toDF("k", "p", "s"))
    val q = spark.sql(
      s"SELECT min(k) AS mn, max(p) AS mx, count(s) AS ns FROM $t")
    assert(q.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      q.queryExecution.executedPlan.toString)
    assert(q.collect().head.toSeq == Seq(1L, 30.0, 2L))
    // a DV makes per-column stats inexact → extrema must NOT push down,
    // and the real scan must still answer correctly
    Snapshots.deleteRangeMor(spark, dir, "k", Some(3L), Some(3L))
    val q2 = spark.sql(s"SELECT min(k) AS mn, max(p) AS mx, count(s) AS ns FROM $t")
    assert(!q2.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "extrema pushed down over a deletion vector")
    assert(q2.collect().head.toSeq == Seq(1L, 20.0, 1L))
    // count(*) still answers from metadata (exact under the mask)
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").as[Long].head() == 2L)
  }

  test("WHERE pushdown drives manifest file skipping; grouped aggregates stay exact") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir,
      spark.range(1000).toDF("k").withColumn("g", col("k") % 7)
        .withColumn("p", col("k") * 2.0).repartitionByRange(8, col("k")))
    val got = spark.sql(
      s"""SELECT g, count(*) AS n, sum(p) AS total FROM $t
         |WHERE k BETWEEN 100 AND 199 GROUP BY g ORDER BY g""".stripMargin)
      .collect()
    val (kept, total) = SnapshotRelation.lastScan.get()
    assert(total == 8 && kept < total,
      s"range filter pruned nothing ($kept/$total)")
    val want = spark.range(1000).toDF("k").withColumn("g", col("k") % 7)
      .withColumn("p", col("k") * 2.0)
      .filter(col("k").between(100, 199)).groupBy("g")
      .agg(count(lit(1)).as("n"), sum("p").as("total")).orderBy("g").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("PARTITIONED BY days(ts): inserts route per day, a day filter plans only that day") {
    val (t, dir) = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    assert(Snapshots.partitionSpec(spark, dir).contains(Snapshots.DaysPart("ts")))
    // DESCRIBE surfaces the transform
    assert(spark.table(t).queryExecution.analyzed.toString.nonEmpty)
    spark.sql(s"INSERT INTO $t SELECT id AS k, " +
      "timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,CAST(id % 4 AS INT),0,0,id) AS ts, " +
      "id * 1.5 AS v FROM range(400)")
    // the commit routed rows into one file per day, value recorded in the entry
    val files = Snapshots.files(spark, dir, Snapshots.currentVersion(spark, dir).get)
    val parts = files.flatMap(Snapshots.partValueOf)
    assert(parts.toSet == Set("2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04"),
      s"per-file day values: $parts")
    // the CREATE's schema-pinning 0-row commit predates the spec: its one
    // flat file carries no value (and its rows=0 stats always prune it)
    assert(parts.length == files.length - 1, "a routed file lost its partition value")
    // a day-range filter plans ONLY that day's files
    SnapshotRelation.lastScan.set((-1, -1))
    val got = spark.sql(s"SELECT count(*) AS n, sum(v) AS sv FROM $t " +
      "WHERE ts >= timestamp'2024-03-02 00:00:00' AND ts < timestamp'2024-03-03 00:00:00'")
      .collect().head
    val (kept, total) = SnapshotRelation.lastScan.get()
    assert(total == 5 && kept == 1, s"day filter planned $kept/$total files")
    assert(got.getLong(0) == 100L)
    assert(math.abs(got.getDouble(1) - (1 to 397 by 4).map(_ * 1.5).sum) < 1e-6)
  }

  test("PARTITIONED BY bucket(n, k): equality probes prune to one bucket's files") {
    val (t, dir) = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) PARTITIONED BY (bucket(8, k))")
    assert(Snapshots.partitionSpec(spark, dir).contains(Snapshots.BucketPart(8, "k")))
    spark.sql(s"INSERT INTO $t SELECT id AS k, concat('v', id) AS v FROM range(1000)")
    val files = Snapshots.files(spark, dir, Snapshots.currentVersion(spark, dir).get)
    val parts = files.flatMap(Snapshots.partValueOf)
    assert(parts.length == files.length - 1 && parts.toSet.subsetOf(
      (0 until 8).map(_.toString).toSet), s"bucket values: $parts")
    // an equality probe keeps exactly the probed key's bucket file(s) —
    // min/max stats CANNOT do this (every bucket spans ~the full k range)
    SnapshotRelation.lastScan.set((-1, -1))
    val got = spark.sql(s"SELECT v FROM $t WHERE k = 123").as[String].collect()
    val (kept, total) = SnapshotRelation.lastScan.get()
    assert(got.toSeq == Seq("v123"))
    assert(total == files.length && kept == 1,
      s"bucket equality planned $kept/$total files")
    // a range filter can't use buckets: everything is (correctly) kept
    SnapshotRelation.lastScan.set((-1, -1))
    assert(spark.sql(s"SELECT count(*) AS n FROM $t WHERE k >= 990 AND k < 1000")
      .as[Long].head() == 10L)
  }

  test("PARTITIONED BY months/truncate: time-granule and prefix routing both prune") {
    // months(ts): one file per month, a month-range filter plans one file
    val (t, dir) = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT, ts TIMESTAMP) PARTITIONED BY (months(ts))")
    spark.sql(s"INSERT INTO $t SELECT id AS k, " +
      "timestamp'2024-01-15 12:00:00' + make_interval(0, CAST(id % 6 AS INT), 0,0,0,0, id) " +
      "AS ts FROM range(600)")
    val files = Snapshots.files(spark, dir, Snapshots.currentVersion(spark, dir).get)
    assert(files.flatMap(Snapshots.partValueOf).toSet ==
      (1 to 6).map(m => f"2024-$m%02d").toSet)
    SnapshotRelation.lastScan.set((-1, -1))
    assert(spark.sql(s"SELECT count(*) AS n FROM $t " +
      "WHERE ts >= timestamp'2024-03-01 00:00:00' AND ts < timestamp'2024-04-01 00:00:00'")
      .as[Long].head() == 100L)
    val (kept, total) = SnapshotRelation.lastScan.get()
    assert(total == 7 && kept == 1, s"month filter planned $kept/$total files")
    // truncate(2, code): string-prefix routing; a prefix filter prunes
    val (t2, dir2) = fresh()
    spark.sql(s"CREATE TABLE $t2 (k BIGINT, code STRING) PARTITIONED BY (truncate(2, code))")
    spark.sql(s"INSERT INTO $t2 SELECT id AS k, " +
      "concat(CASE WHEN id % 3 = 0 THEN 'DE' WHEN id % 3 = 1 THEN 'FR' ELSE 'US' END, " +
      "'-', id) AS code FROM range(300)")
    val f2 = Snapshots.files(spark, dir2, Snapshots.currentVersion(spark, dir2).get)
    assert(f2.flatMap(Snapshots.partValueOf).toSet == Set("DE", "FR", "US"))
    SnapshotRelation.lastScan.set((-1, -1))
    assert(spark.sql(s"SELECT count(*) AS n FROM $t2 WHERE code LIKE 'FR%'")
      .as[Long].head() == 100L)
    val (k2, n2) = SnapshotRelation.lastScan.get()
    assert(n2 == 4 && k2 == 1, s"prefix filter planned $k2/$n2 files")
    // truncate(100, k) on a BIGINT: arithmetic binning, range filter prunes
    val (t3, dir3) = fresh()
    spark.sql(s"CREATE TABLE $t3 (k BIGINT, v DOUBLE) PARTITIONED BY (truncate(100, k))")
    spark.sql(s"INSERT INTO $t3 SELECT id AS k, id * 0.5 AS v FROM range(1000)")
    val f3 = Snapshots.files(spark, dir3, Snapshots.currentVersion(spark, dir3).get)
    assert(f3.flatMap(Snapshots.partValueOf).toSet ==
      (0 until 10).map(b => (b * 100).toString).toSet)
    SnapshotRelation.lastScan.set((-1, -1))
    assert(spark.sql(s"SELECT count(*) AS n FROM $t3 WHERE k BETWEEN 250 AND 349")
      .as[Long].head() == 100L)
    val (k3, n3) = SnapshotRelation.lastScan.get()
    assert(n3 == 11 && k3 == 2, s"range filter planned $k3/$n3 files")
  }

  test("dynamic INSERT OVERWRITE replaces only the touched partitions") {
    val (t, dir) = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT, day STRING, v DOUBLE) PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $t SELECT id AS k, " +
      "concat('d', id % 4) AS day, id * 1.0 AS v FROM range(400)")
    val v1 = Snapshots.currentVersion(spark, dir).get
    val before = Snapshots.files(spark, dir, v1)
      .filter(f => Snapshots.partValueOf(f).exists(p => p != "d1")).toSet
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // replace ONLY day d1 with 5 fresh rows
      spark.sql(s"INSERT OVERWRITE $t SELECT id + 9000 AS k, 'd1' AS day, " +
        "-1.0 AS v FROM range(5)")
      val v2 = Snapshots.currentVersion(spark, dir).get
      val after = Snapshots.files(spark, dir, v2)
      // untouched partitions carry BYTE-IDENTICAL (same manifest entries)
      assert(before.subsetOf(after.toSet),
        s"untouched partitions rewritten: ${before.diff(after.toSet)}")
      val got = spark.table(t).groupBy("day").count().as[(String, Long)]
        .collect().toMap
      assert(got == Map("d0" -> 100L, "d1" -> 5L, "d2" -> 100L, "d3" -> 100L), got)
      // feed: the replaced partition's old rows as deletes, new as inserts
      val feed = Snapshots.readChangeFeed(spark, dir, v1, v2)
        .groupBy("_change_type").count().as[(String, Long)].collect().toMap
      assert(feed == Map("delete" -> 100L, "insert" -> 5L), feed)
      // static mode still replaces the WHOLE table
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      spark.sql(s"INSERT OVERWRITE $t SELECT 1L AS k, 'd9' AS day, 0.0 AS v")
      assert(spark.table(t).count() == 1L)
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", p)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // a populated PRE-SPEC file refuses dynamic overwrite loudly
    val (t2, dir2) = fresh()
    spark.sql(s"CREATE TABLE $t2 (k BIGINT, day STRING)")
    spark.sql(s"INSERT INTO $t2 SELECT id AS k, concat('d', id % 2) AS day FROM range(10)")
    spark.sql(s"ALTER TABLE $t2 SET TBLPROPERTIES ('graft.partition' = 'identity(day)')")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val e = intercept[Exception](
        spark.sql(s"INSERT OVERWRITE $t2 SELECT 1L AS k, 'd0' AS day"))
      assert(e.getMessage.contains("predates the partition spec"), e.getMessage)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    // malformed spec strings refuse at ALTER time, not at the next write
    intercept[Exception](spark.sql(
      s"ALTER TABLE $t2 SET TBLPROPERTIES ('graft.partition' = 'zoom(day)')"))
    // CALL system.repartition rewrites the pre-spec files under the spec —
    // after it, every entry carries a value and dynamic overwrite works
    val v = spark.sql(s"CALL gtest.system.repartition(tbl => 'db.t${n}')")
      .as[Int].head()
    val fs2 = Snapshots.files(spark, dir2, v)
    assert(fs2.flatMap(Snapshots.partValueOf).length == fs2.length,
      s"repartition left valueless entries: $fs2")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql(s"INSERT OVERWRITE $t2 SELECT 100L AS k, 'd0' AS day")
      assert(spark.table(t2).groupBy("day").count().as[(String, Long)]
        .collect().toMap == Map("d0" -> 1L, "d1" -> 5L))
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("static INSERT OVERWRITE PARTITION (col=v) swaps exactly that region") {
    val (t, dir) = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT, day STRING, v DOUBLE) PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $t SELECT id AS k, concat('d', id % 3) AS day, " +
      "id * 1.0 AS v FROM range(300)")
    val v1 = Snapshots.currentVersion(spark, dir).get
    val others = Snapshots.files(spark, dir, v1)
      .filter(f => Snapshots.partValueOf(f).exists(_ != "d2")).toSet
    spark.sql(s"INSERT OVERWRITE $t PARTITION (day = 'd2') " +
      "SELECT id + 7000 AS k, -2.0 AS v FROM range(7)")
    val v2 = Snapshots.currentVersion(spark, dir).get
    assert(others.subsetOf(Snapshots.files(spark, dir, v2).toSet),
      "untouched partitions must carry by reference")
    val got = spark.table(t).groupBy("day").count().as[(String, Long)]
      .collect().toMap
    assert(got == Map("d0" -> 100L, "d1" -> 100L, "d2" -> 7L), got)
    assert(spark.table(t).filter(col("day") === "d2").select(min("k"))
      .as[Long].head() == 7000L)
  }

  test("PARTITIONED BY (days(ts), region): two-level routing, tuple-scoped dynamic overwrite") {
    val (t, dir) = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT, ts TIMESTAMP, region STRING) " +
      "PARTITIONED BY (days(ts), region)")
    spark.sql(s"INSERT INTO $t SELECT id AS k, " +
      "timestamp'2024-05-01 06:00:00' + make_interval(0,0,0, CAST(id % 2 AS INT), 0,0,0) AS ts, " +
      "CASE WHEN id % 3 = 0 THEN 'eu' ELSE 'us' END AS region FROM range(600)")
    val v1 = Snapshots.currentVersion(spark, dir).get
    val files = Snapshots.files(spark, dir, v1)
    // 2 days x 2 regions = 4 routed leaves, each entry carrying BOTH values
    val tuples = files.flatMap { f =>
      for (a <- Snapshots.partValueRawAt(f, 0); b <- Snapshots.partValueRawAt(f, 1))
        yield (a, b)
    }
    assert(tuples.toSet == Set(("2024-05-01", "eu"), ("2024-05-01", "us"),
      ("2024-05-02", "eu"), ("2024-05-02", "us")), tuples)
    // both dimensions prune: a (day, region) conjunction plans ONE file
    SnapshotRelation.lastScan.set((-1, -1))
    assert(spark.sql(s"SELECT count(*) AS n FROM $t WHERE region = 'eu' AND " +
      "ts >= timestamp'2024-05-02 00:00:00'").as[Long].head() == 100L)
    val (kept, total) = SnapshotRelation.lastScan.get()
    assert(total == 5 && kept == 1, s"2-D filter planned $kept/$total files")
    // dynamic overwrite scopes by the TUPLE: only (2024-05-01, eu) swaps
    // routed files of every OTHER (day, region) cell — the valueless 0-row
    // schema-pin file legitimately drops with the replaced set
    val others = files.filter { f =>
      Snapshots.partValueRawAt(f, 0).nonEmpty &&
        !(Snapshots.partValueRawAt(f, 0).contains("2024-05-01") &&
          Snapshots.partValueRawAt(f, 1).contains("eu"))
    }.toSet
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql(s"INSERT OVERWRITE $t SELECT id + 9000 AS k, " +
        "timestamp'2024-05-01 12:00:00' AS ts, 'eu' AS region FROM range(3)")
      val v2 = Snapshots.currentVersion(spark, dir).get
      assert(others.subsetOf(Snapshots.files(spark, dir, v2).toSet),
        "untouched (day, region) cells rewritten")
      val got = spark.table(t).groupBy("region").count()
        .as[(String, Long)].collect().toMap
      assert(got == Map("eu" -> (100L + 3L), "us" -> 400L), got)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test(".partitions metadata table: per-tuple file and row counts from the manifest") {
    val (t, dir) = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT, ts TIMESTAMP, region STRING) " +
      "PARTITIONED BY (days(ts), region)")
    spark.sql(s"INSERT INTO $t SELECT id AS k, " +
      "timestamp'2024-07-01 08:00:00' + make_interval(0,0,0, CAST(id % 2 AS INT), 0,0,0) AS ts, " +
      "CASE WHEN id % 4 = 0 THEN 'eu' ELSE 'us' END AS region FROM range(200)")
    val rows = spark.sql(s"SELECT * FROM $t.partitions ORDER BY ts_day, region")
      .as[(String, String, Long, Long)].collect().toSeq
    // the schema-pin 0-row file groups under the NULL tuple with 0 rows;
    // id%4==0 implies id even, so 'eu' exists only on day 1
    assert(rows.map(r => (r._1, r._2, r._4)).toSet == Set(
      (null, null, 0L), ("2024-07-01", "eu", 50L),
      ("2024-07-01", "us", 50L), ("2024-07-02", "us", 100L)), rows)
    assert(rows.filter(_._1 != null).forall(_._3 == 1L),
      "one routed file per (day, region) cell on one commit")
    // an unpartitioned table's .partitions refuses with a clear message
    val (t2, _) = fresh()
    spark.sql(s"CREATE TABLE $t2 (k BIGINT)")
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $t2.partitions").collect())
    assert(e.getMessage.contains("no partition spec") ||
      e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"), e.getMessage)
  }

  test("PARTITIONED BY identity: routing makes stats envelopes value-tight; DML re-routes") {
    val (t, dir) = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t SELECT id AS k, " +
      "CASE WHEN id % 3 = 0 THEN 'emea' WHEN id % 3 = 1 THEN 'apac' ELSE 'amer' END " +
      "AS region FROM range(300)")
    // identity pruning flows through the (now value-tight) string stats
    SnapshotRelation.lastScan.set((-1, -1))
    assert(spark.sql(s"SELECT count(*) AS n FROM $t WHERE region = 'apac'")
      .as[Long].head() == 100L)
    val (kept, total) = SnapshotRelation.lastScan.get()
    assert(total == 4 && kept == 1, s"identity filter planned $kept/$total files")
    // a rewriting DML keeps the spec: rewritten files carry values again
    spark.sql(s"UPDATE $t SET k = k + 1000 WHERE region = 'emea'")
    val files = Snapshots.files(spark, dir, Snapshots.currentVersion(spark, dir).get)
    // every file except the schema-pin one carries a value post-rewrite
    assert(files.flatMap(Snapshots.partValueOf).length >= files.length - 1,
      "a DML-rewritten file lost its partition value")
    assert(spark.sql(s"SELECT min(k) AS mn FROM $t WHERE region = 'emea'")
      .as[Long].head() == 1000L)
  }

  test("SQL time travel: VERSION AS OF number and tag, TIMESTAMP AS OF") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    Thread.sleep(20)
    val cut = System.currentTimeMillis()
    Thread.sleep(20)
    Snapshots.commit(spark, dir, Seq((2L, "b")).toDF("k", "v"))
    Snapshots.setTag(spark, dir, "audited", 1)
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").as[Long].head() == 2)
    assert(spark.sql(s"SELECT count(*) AS n FROM $t VERSION AS OF 1")
      .as[Long].head() == 1)
    assert(spark.sql(s"SELECT count(*) AS n FROM $t VERSION AS OF 'audited'")
      .as[Long].head() == 1)
    val utc = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(cut))
    assert(spark.sql(s"SELECT count(*) AS n FROM $t TIMESTAMP AS OF '$utc'")
      .as[Long].head() == 1)
    intercept[Exception](
      spark.sql(s"SELECT * FROM $t VERSION AS OF 99").collect())
  }

  test("SQL DELETE: arbitrary predicate, three-valued NULL logic, carried files, feed") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir,
      Seq((1L, Some(10.0), "aa"), (2L, None, "b"), (3L, Some(30.0), "cc"),
        (4L, Some(40.0), "d")).toDF("k", "p", "s")
        .repartitionByRange(4, col("k")))
    val before = Snapshots.files(spark, dir, 1)
    // p > 15 is NULL for k=2 → NOT deleted (SQL three-valued logic);
    // length(s) > 1 is beyond any V1 filter — the rule path must take it
    spark.sql(s"DELETE FROM $t WHERE p > 15 AND length(s) > 1")
    assert(spark.table(t).select("k").as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
    val v = Snapshots.currentVersion(spark, dir).get
    assert(Snapshots.files(spark, dir, v).toSet.intersect(before.toSet).nonEmpty,
      "DELETE rewrote files it never touched")
    val feed = Snapshots.readChangeFeed(spark, dir, v - 1, v)
    assert(feed.select("_change_type", "k").as[(String, Long)].collect().toSet ==
      Set(("delete", 3L)))
    // no-match delete: version unchanged (no empty commit)
    spark.sql(s"DELETE FROM $t WHERE k = 999")
    assert(Snapshots.currentVersion(spark, dir).contains(v))
    // unconditional delete empties the table
    spark.sql(s"DELETE FROM $t")
    assert(spark.table(t).count() == 0)
  }

  test("SQL UPDATE: assignments cast, NULL condition keeps rows, constraints gate, feed") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir,
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "p")
        .repartitionByRange(3, col("k")))
    Snapshots.addCheckConstraint(spark, dir, "p_pos", "p > 0")
    // the assignment is an INT expression cast to the column's DOUBLE
    spark.sql(s"UPDATE $t SET p = 7 WHERE k >= 3")
    assert(spark.table(t).as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 20.0), (3L, 7.0)))
    val v = Snapshots.currentVersion(spark, dir).get
    val feed = Snapshots.readChangeFeed(spark, dir, v - 1, v)
    assert(feed.select("_change_type", "k", "p").as[(String, Long, Double)]
      .collect().toSet ==
      Set(("update_pre", 3L, 30.0), ("update_post", 3L, 7.0)))
    // a violating update refuses BEFORE publishing; table intact
    val e = intercept[Exception](spark.sql(s"UPDATE $t SET p = -1 WHERE k = 1"))
    assert(e.getMessage.contains("p_pos"), e.getMessage)
    assert(Snapshots.currentVersion(spark, dir).contains(v))
    assert(spark.table(t).filter(col("k") === 1).select("p").as[Double].head() == 10.0)
    // unknown SET column refuses actionably
    intercept[Exception](spark.sql(s"UPDATE $t SET nope = 1"))
  }

  test("SQL MERGE: ordered clauses, BY SOURCE, star actions, carry, feed") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir,
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)).toDF("k", "p")
        .repartitionByRange(4, col("k")))
    Seq((2L, 200.0), (3L, 5.0), (9L, 90.0), (10L, -1.0)).toDF("k", "p")
      .createOrReplaceTempView("mrg_src")
    // k=2 matched & p>100 → update; k=3 matched & p<=100 → delete;
    // k=9 insert (p > 0); k=10 insert clause condition false → dropped;
    // k=1 not matched by source & p < 15 → delete; k=4 NMBS → update p+1
    spark.sql(s"""MERGE INTO $t t USING mrg_src s ON t.k = s.k
      |WHEN MATCHED AND s.p > 100 THEN UPDATE SET p = s.p + 0.5
      |WHEN MATCHED THEN DELETE
      |WHEN NOT MATCHED AND s.p > 0 THEN INSERT *
      |WHEN NOT MATCHED BY SOURCE AND t.p < 15 THEN DELETE
      |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET p = t.p + 1
      |""".stripMargin)
    assert(spark.table(t).as[(Long, Double)].collect().toSet ==
      Set((2L, 200.5), (4L, 41.0), (9L, 90.0)))
    val v = Snapshots.currentVersion(spark, dir).get
    val feed = Snapshots.readChangeFeed(spark, dir, v - 1, v)
      .select("_change_type", "k").as[(String, Long)].collect().toSet
    assert(feed == Set(("update_pre", 2L), ("update_post", 2L),
      ("update_pre", 4L), ("update_post", 4L),
      ("delete", 3L), ("delete", 1L), ("insert", 9L)), feed)
  }

  test("SQL MERGE: unmatched target files carry by reference; insert-only merge appends") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir,
      spark.range(1000).toDF("k").withColumn("p", col("k") * 1.0)
        .repartitionByRange(8, col("k")))
    val before = Snapshots.files(spark, dir, 1)
    spark.range(100, 110).toDF("k").withColumn("p", col("k") * 10.0)
      .createOrReplaceTempView("mrg_src2")
    spark.sql(s"""MERGE INTO $t t USING mrg_src2 s ON t.k = s.k
      |WHEN MATCHED THEN UPDATE SET p = s.p""".stripMargin)
    val v2 = Snapshots.currentVersion(spark, dir).get
    assert(Snapshots.files(spark, dir, v2).toSet.intersect(before.toSet).nonEmpty,
      "merge rewrote files outside the matched envelope")
    assert(spark.table(t).filter(col("k") === 105).select("p").as[Double].head() == 1050.0)
    assert(spark.table(t).count() == 1000)
    // source matching nothing + INSERT clause = pure append commit
    spark.range(5000, 5003).toDF("k").withColumn("p", lit(0.0))
      .createOrReplaceTempView("mrg_src3")
    spark.sql(s"""MERGE INTO $t t USING mrg_src3 s ON t.k = s.k
      |WHEN MATCHED THEN DELETE
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val v3 = Snapshots.currentVersion(spark, dir).get
    assert(Snapshots.files(spark, dir, v3).toSet.intersect(
      Snapshots.files(spark, dir, v2).toSet).size ==
      Snapshots.files(spark, dir, v2).length,
      "insert-only merge rewrote data files")
    assert(spark.table(t).count() == 1003)
  }

  test("SQL MERGE: a target row matched twice fails loudly, nothing publishes") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir, Seq((1L, 10.0)).toDF("k", "p"))
    Seq((1L, 1.0), (1L, 2.0)).toDF("k", "p").createOrReplaceTempView("mrg_dup")
    val e = intercept[Exception](
      spark.sql(s"""MERGE INTO $t t USING mrg_dup s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET p = s.p""".stripMargin))
    assert(e.getMessage.contains("more than one source row"), e.getMessage)
    assert(Snapshots.currentVersion(spark, dir).contains(1))
    assert(spark.table(t).as[(Long, Double)].head() == ((1L, 10.0)))
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION: source column lands, old rows NULL-backfill") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    Seq((2L, "b2", 7.5), (3L, "c", 9.0)).toDF("k", "v", "score")
      .createOrReplaceTempView(s"mrg_evo_$n")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $t t
      |USING mrg_evo_$n s ON t.k = s.k
      |WHEN MATCHED THEN UPDATE SET *
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("k", "v", "score"))
    assert(spark.table(t).as[(Long, String, Option[Double])].collect().toSet ==
      Set((1L, "a", None), (2L, "b2", Some(7.5)), (3L, "c", Some(9.0))),
      "evolved merge rows")
    // without the clause, the same merge refuses on the unknown column —
    // evolution stays opt-in (Delta's posture)
    val (t2, _) = fresh()
    spark.sql(s"CREATE TABLE $t2 (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t2 VALUES (1, 'a')")
    intercept[Exception](
      spark.sql(s"""MERGE INTO $t2 t USING mrg_evo_$n s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
  }

  test("nested-field assignments: UPDATE SET s.f rebuilds the struct in place") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir, Seq(
      (1L, ("alice", 10.0, "x")), (2L, ("bob", 20.0, "y")),
      (3L, ("carol", 30.0, "z")))
      .toDF("k", "s").selectExpr("k",
        "named_struct('name', s._1, 'score', s._2, 'tag', s._3) AS s"))
    // one nested field updates; SIBLING fields and other rows are untouched
    spark.sql(s"UPDATE $t SET s.score = s.score * 2 WHERE k >= 2")
    val got = spark.table(t).selectExpr("k", "s.name", "s.score", "s.tag")
      .as[(Long, String, Double, String)].collect().toSet
    assert(got == Set((1L, "alice", 10.0, "x"), (2L, "bob", 40.0, "y"),
      (3L, "carol", 60.0, "z")), got)
    // two nested fields in one statement; the value may read the old struct
    spark.sql(s"UPDATE $t SET s.tag = concat(s.name, '!'), s.score = 0 WHERE k = 1")
    assert(spark.table(t).filter(col("k") === 1)
      .selectExpr("s.name", "s.score", "s.tag")
      .as[(String, Double, String)].head() == (("alice", 0.0, "alice!")))
    // unknown nested field refuses loudly, nothing publishes
    val v = Snapshots.currentVersion(spark, dir)
    val e = intercept[Exception](spark.sql(s"UPDATE $t SET s.nope = 1"))
    assert(e.getMessage.contains("nope"), e.getMessage)
    assert(Snapshots.currentVersion(spark, dir) == v)
    // MERGE: WHEN MATCHED THEN UPDATE SET s.f = source expr
    Seq((2L, 99.0)).toDF("k", "newscore").createOrReplaceTempView(s"nst_src_$n")
    spark.sql(s"""MERGE INTO $t t USING nst_src_$n s ON t.k = s.k
      |WHEN MATCHED THEN UPDATE SET t.s.score = s.newscore""".stripMargin)
    assert(spark.table(t).filter(col("k") === 2)
      .selectExpr("s.name", "s.score", "s.tag")
      .as[(String, Double, String)].head() == (("bob", 99.0, "y")))
  }

  test("library DML twins: deleteWhere respects DV masks, updateWhere prunes files") {
    val (_, dir) = fresh()
    Snapshots.commit(spark, dir,
      spark.range(100).toDF("k").withColumn("p", col("k") * 1.0)
        .repartitionByRange(4, col("k")))
    // mask k=10 via DV, then deleteWhere k<20: the masked row must not
    // resurrect in the rewrite or double-count in the feed
    Snapshots.deleteRangeMor(spark, dir, "k", Some(10L), Some(10L))
    val v = Snapshots.deleteWhere(spark, dir, col("k") < 20,
      prune = Seq(("k", None, Some(20L))))
    assert(Snapshots.read(spark, dir).count() == 80)
    val feed = Snapshots.readChangeFeed(spark, dir, v - 1, v)
    assert(feed.count() == 19, "DV-masked row leaked into the delete feed")
    // updateWhere with a prune hint rewrites only envelope files
    val before = Snapshots.files(spark, dir, v)
    val v2 = Snapshots.updateWhere(spark, dir, col("k") === 50,
      Seq("p" -> (col("p") + 1000)), prune = Seq(("k", Some(50L), Some(50L))))
    assert(Snapshots.files(spark, dir, v2).toSet.intersect(before.toSet).nonEmpty,
      "updateWhere rewrote unpruned files")
    assert(Snapshots.read(spark, dir).filter(col("k") === 50)
      .select("p").as[Double].head() == 1050.0)
  }

  test("chaos: SQL MERGE and UPDATE race retrying appenders — all statements land") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir,
      spark.range(100).toDF("k").withColumn("p", lit(0.0))
        .repartitionByRange(4, col("k")))
    spark.range(10, 20).toDF("k").withColumn("p", lit(5.0))
      .createOrReplaceTempView("mrg_race_src")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val barrier = new java.util.concurrent.CyclicBarrier(3)
    val merger = Future {
      barrier.await()
      spark.sql(s"""MERGE INTO $t t USING mrg_race_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET p = s.p""".stripMargin)
    }
    val updater = Future {
      barrier.await()
      spark.sql(s"UPDATE $t SET p = -1 WHERE k BETWEEN 90 AND 99")
    }
    val appender = Future {
      barrier.await()
      (1 to 3).map(i => Snapshots.commitRetry(spark, dir,
        Seq((1000L + i, 9.0)).toDF("k", "p")))
    }
    Await.result(Future.sequence(Seq(merger, updater)), 300.seconds)
    Await.result(appender, 300.seconds)
    pool.shutdown()
    val got = spark.table(t).as[(Long, Double)].collect().toMap
    assert(got.size == 103, s"lost or duplicated rows (${got.size})")
    assert((10L to 19L).forall(k => got(k) == 5.0), "SQL MERGE lost to the race")
    assert((90L to 99L).forall(k => got(k) == -1.0), "SQL UPDATE lost to the race")
    assert((1 to 3).forall(i => got(1000L + i) == 9.0), "append lost to the race")
    assert(Snapshots.currentVersion(spark, dir).contains(6),
      "a statement retried into a duplicate version")
  }

  test("CALL procedures: the SQL face of the maintenance ops") {
    val (t, dir) = fresh()
    val tblArg = t.stripPrefix("gtest.")
    Snapshots.commit(spark, dir,
      spark.range(500).toDF("k").withColumn("p", col("k") * 1.0)
        .repartition(8))
    spark.sql(s"INSERT INTO $t VALUES (9999, 0.0)")
    // compact folds the small files; row count and content preserved
    val cv = spark.sql(
      s"CALL gtest.system.compact(tbl => '$tblArg', target_mb => 512)")
      .as[Int].head()
    assert(cv == 3)
    assert(spark.table(t).count() == 501)
    assert(Snapshots.files(spark, dir, cv).length <
      Snapshots.files(spark, dir, cv - 1).length, "compact did not fold files")
    // tag + restore through CALL
    spark.sql(s"CALL gtest.system.set_tag(tbl => '$tblArg', name => 'good', version => 2)")
    assert(Snapshots.tags(spark, dir) == Map("good" -> 2))
    spark.sql(s"DELETE FROM $t WHERE k < 400")
    val rv = spark.sql(
      s"CALL gtest.system.restore(tbl => '$tblArg', version => $cv)")
      .as[Int].head()
    assert(rv == cv + 2 && spark.table(t).count() == 501)
    // branch lifecycle through CALL
    spark.sql(s"CALL gtest.system.create_branch(tbl => '$tblArg', name => 'wip')")
    Snapshots.commitToBranch(spark, dir, "wip", Seq((7777L, 1.0)).toDF("k", "p"))
    val ffv = spark.sql(
      s"CALL gtest.system.fast_forward(tbl => '$tblArg', name => 'wip')")
      .as[Int].head()
    assert(ffv == rv + 1 && spark.table(t).count() == 502)
    // zorder through CALL: content preserved, layout re-clustered
    val zv = spark.sql(
      s"CALL gtest.system.zorder(tbl => '$tblArg', cols => 'k,p', target_files => 4)")
      .as[Int].head()
    assert(spark.table(t).count() == 502 && zv == ffv + 1)
    // hilbert through CALL: the other curve, same contract
    val hv = spark.sql(s"CALL gtest.system.hilbert(tbl => '$tblArg', " +
      s"x_col => 'k', y_col => 'p', target_files => 4)").as[Int].head()
    assert(spark.table(t).count() == 502 && hv == zv + 1)
    // shallow clone through CALL: a new catalog table, zero bytes copied
    val cloneV = spark.sql(s"CALL gtest.system.clone(tbl => '${tblArg}_clone', " +
      s"src => '$tblArg')").as[Int].head()
    assert(cloneV == 1 && spark.table(s"${t}_clone").count() == 502)
    spark.sql(s"INSERT INTO ${t}_clone VALUES (999999, 1.0)")
    assert(spark.table(s"${t}_clone").count() == 503)
    assert(spark.table(t).count() == 502, "clone insert leaked into the source")
    // vacuum + expire + expire_staged return counts; unknown proc refuses
    assert(spark.sql(s"CALL gtest.system.vacuum(tbl => '$tblArg', grace_hours => 0)")
      .collect().nonEmpty)
    assert(spark.sql(s"CALL gtest.system.expire_staged(tbl => '$tblArg', " +
      s"older_than_millis => 0)").as[Int].head() == 0)
    intercept[Exception](
      spark.sql(s"CALL gtest.system.nope(tbl => '$tblArg')").collect())
    // the tag clamp holds through the CALL face
    spark.sql(s"CALL gtest.system.expire_older_than(tbl => '$tblArg', " +
      s"ts_millis => ${System.currentTimeMillis() + 100000})")
    assert(Snapshots.versions(spark, dir).contains(2),
      "expire through CALL dropped a tagged version")
  }

  test("metadata tables: db.t.history / .tags / .branches / .constraints / .staged") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    Snapshots.commit(spark, dir, Seq((2L, "b")).toDF("k", "v"))
    Snapshots.setTag(spark, dir, "golden", 1)
    Snapshots.createBranch(spark, dir, "wip")
    Snapshots.addCheckConstraint(spark, dir, "k_pos", "k > 0")
    val tok = Snapshots.stageCommit(spark, dir, Seq((3L, "c")).toDF("k", "v"))
    assert(spark.sql(s"SELECT version FROM $t.history ORDER BY version")
      .as[Int].collect().toSeq == Seq(1, 2))
    assert(spark.sql(s"SELECT tag, version FROM $t.tags")
      .as[(String, Int)].head() == (("golden", 1)))
    assert(spark.sql(s"SELECT branch, base_version FROM $t.branches")
      .as[(String, Int)].head() == (("wip", 2)))
    assert(spark.sql(s"SELECT constraint, check_expr FROM $t.constraints")
      .as[(String, String)].head() == (("k_pos", "k > 0")))
    assert(spark.sql(s"SELECT token FROM $t.staged").as[String].head() == tok)
    // metadata tables track LIVE state (no caching across commits)
    Snapshots.publishStaged(spark, dir, tok)
    assert(spark.sql(s"SELECT count(*) FROM $t.staged").as[Long].head() == 0)
    assert(spark.sql(s"SELECT max(version) FROM $t.history").as[Int].head() == 3)
    intercept[Exception](spark.table(s"$t.nope").collect())
  }

  test("catalog API: pinned references refuse writes; listTables/namespaces") {
    val (t, dir) = fresh()
    Snapshots.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    Snapshots.commit(spark, dir, Seq((2L, "b")).toDF("k", "v"))
    val cat = spark.sessionState.catalogManager.catalog("gtest")
      .asInstanceOf[graft.sources.SnapshotCatalog]
    import org.apache.spark.sql.connector.catalog.Identifier
    val ident = Identifier.of(Array("db"), t.split('.').last)
    val pinned = cat.loadTable(ident, "1")
      .asInstanceOf[graft.sources.SnapshotV2Table]
    assert(pinned.pinned.contains(1))
    intercept[IllegalArgumentException](pinned.newWriteBuilder(null))
    assert(cat.listTables(Array("db")).map(_.name).contains(ident.name))
    assert(cat.namespaceExists(Array("db")))
    intercept[Exception](cat.loadTable(Identifier.of(Array("db"), "nope")))
  }
}
