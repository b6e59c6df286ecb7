package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §5.3 property-based checks. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("window-frame moving sums equal a naive recompute") {
    val rows = Tables.orders(spark, TestSpark.sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .as[(Long, Long, Double)].collect()
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderkey")).rowsBetween(-2, Window.currentRow)
    val got = Tables.orders(spark, TestSpark.sf)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice")).over(w).as("mov3"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    rows.groupBy(_._1).foreach { case (_, orders) =>
      val sorted = orders.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((ck, ok, _), i) =>
        val naive = sorted.slice(math.max(0, i - 2), i + 1).map(_._3).sum
        assert(math.abs(got((ck, ok)) - naive) < 1e-6, s"cust $ck order $ok")
      }
    }
  }

  test("filtered scans are contained in the unfiltered scan") {
    val bounds = Gen.listOfN(8, for {
      lo <- Gen.choose(1.0, 40.0); w <- Gen.choose(1.0, 15.0)
    } yield (lo, lo + w)).sample.get
    val all = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .as[(Long, Int, Double)].collect().toSet
    bounds.foreach { case (lo, hi) =>
      val sub = Tables.lineitem(spark, TestSpark.sf)
        .filter(col("l_quantity").between(lo, hi))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .as[(Long, Int, Double)].collect().toSet
      assert(sub.subsetOf(all))
      assert(sub.forall { case (_, _, q) => q >= lo && q <= hi })
      // complement check: nothing in range was dropped
      assert(all.count { case (_, _, q) => q >= lo && q <= hi } == sub.size)
    }
  }

  test("property: containment posting merge equals full rebuild for random corpora and splits") {
    import graft.dedup.Dedup
    // random small-vocabulary docs (repeats force df-gate crossings) split
    // into 2..3 shards folded in sequentially (the single-shard append case
    // is DedupSpec's parity test) — the maintained state must
    // equal the one-shot rebuild regardless of how ingestion was sliced
    val words = Vector("red", "blue", "ox", "fig", "elm", "sky", "fox", "sun")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("g"), col("df"), array_sort(col("ds")).as("ds"))
      .as[(Long, Long, Seq[Long])].collect().toSet
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 40L).map { id =>
        val len = 3 + rnd.nextInt(8)
        (id, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val maxDf = 6 // low gate so random repeats actually cross it
      val full = canon(Dedup.containmentPostings(docs.toDF("doc_id", "text"), maxDf))
      val cuts = (1 to 2).map(_ => 1 + rnd.nextInt(39)).distinct.sorted
      val shards = (Seq(0L) ++ cuts.map(_.toLong) ++ Seq(40L))
        .sliding(2).map { case Seq(lo, hi) =>
          docs.filter(d => d._1 > lo && d._1 <= hi).toDF("doc_id", "text")
        }.toSeq
      val merged = shards.foldLeft(
        Dedup.containmentPostings(Seq.empty[(Long, String)].toDF("doc_id", "text"), maxDf)) {
        (st, shard) => Dedup.appendContainmentShard(st, shard, maxDf).localCheckpoint(true)
      }
      assert(canon(merged) == full, s"seed $seed: merge order changed the state")
    }
  }

  test("property: segment-df merge equals full rebuild for random corpora and splits") {
    import graft.text.TextAnalysis
    // same slicing-invariance contract as the posting state: the maintained
    // (seg, df) table must equal the one-shot rebuild however ingestion was
    // cut. Repeated segments WITHIN one doc must count once (distinct-doc
    // semantics), which the small vocabulary forces often.
    val words = Vector("red", "blue", "ox", "fig")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long)].collect().toSet
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 30L).map { id =>
        val len = 2 + rnd.nextInt(10)
        (id, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val full = canon(TextAnalysis.segmentDf(docs.toDF("doc_id", "text"), k = 2))
      val cuts = (1 to 2).map(_ => 1 + rnd.nextInt(29)).distinct.sorted
      val shards = (Seq(0L) ++ cuts.map(_.toLong) ++ Seq(30L))
        .sliding(2).map { case Seq(lo, hi) =>
          docs.filter(d => d._1 > lo && d._1 <= hi).toDF("doc_id", "text")
        }.toSeq
      val merged = shards.foldLeft(
        TextAnalysis.segmentDf(Seq.empty[(Long, String)].toDF("doc_id", "text"), k = 2)) {
        (st, shard) => TextAnalysis.appendSegmentShard(st, shard, k = 2).localCheckpoint(true)
      }
      assert(canon(merged) == full, s"seed $seed: merge order changed the df state")
    }
  }

  test("property: grid stream offsets round-trip JSON for random path sets") {
    import graft.sources.GridFilesOffset
    val nameGen = Gen.listOf(Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('/', '.', '-', '_', ' ')))
      .map(cs => "/" + cs.mkString))
    (1 to 200).foreach { i =>
      val names = nameGen(Gen.Parameters.default.withSize(i % 23 + 1),
        org.scalacheck.rng.Seed(i)).getOrElse(Nil).distinct
      val off = GridFilesOffset(names)
      val back = GridFilesOffset.fromJson(off.json())
      // serialization sorts (offset equality is set equality over files)
      assert(back.names.toSet == names.toSet,
        s"offset round-trip lost files for $names")
    }
  }

  test("property: dense-group HDF5 round-trips for random link counts and names") {
    import graft.sources.Hdf5
    import graft.sources.Hdf5._
    val gen = for {
      n <- Gen.choose(1, 40)
      names <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 24)
        cs <- Gen.listOfN(len, Gen.alphaNumChar)
      } yield cs.mkString)
      // random v2-b-tree node sizes drive random index depths (0..2) for
      // the SAME link counts — tiny nodes force internal-over-internal
      nodeSize <- Gen.oneOf(64, 96, 128, 512, 4096)
    } yield (names.distinct, nodeSize)
    (1 to 5).foreach { trial =>
      val (names, nodeSize) = gen.sample.get
      val dir = java.nio.file.Files.createTempDirectory("graft-h5p")
      val p = dir.resolve(s"dense$trial.h5").toString
      val dsets = names.zipWithIndex.map { case (nm, i) =>
        WDataset(nm, F64, Seq(3), Array(i * 1.0, i * 2.0, i * 3.0))
      }
      Hdf5.write(p, dsets, latest = true, denseRoot = true, denseAttrs = false,
        groupInternalK = 16, denseNodeSize = nodeSize)
      val h = Hdf5.open(p)
      assert(h.datasets.map(_.name) == names.sorted, s"trial $trial")
      names.zipWithIndex.foreach { case (nm, i) =>
        assert(Hdf5.readAll(p, h.dataset(nm).get).toSeq ==
          Seq(i * 1.0, i * 2.0, i * 3.0), s"trial $trial dataset $nm")
      }
    }
  }

  test("truncated EWMA window fan equals the direct sequential formula") {
    val got = SparkEntry.queries("q_ewma")(spark, TestSpark.sf)
      .as[(Long, Double)].collect().toMap
    val events = Tables.events(spark, TestSpark.sf)
      .select("user_id", "ts", "event_id", "event_type", "value")
      .as[(Long, java.sql.Timestamp, Long, String, Double)].collect()
    val w = Array.tabulate(8)(k => math.pow(0.75, k)) // exact dyadic powers
    events.groupBy(_._1).foreach { case (_, rows) =>
      // sort at full sub-ms precision (getTime alone is ms and would
      // misorder µs-distinct neighbors)
      val sorted = rows.sortBy(r => (r._2.getTime / 1000, r._2.getNanos, r._3))
      sorted.zipWithIndex.foreach { case ((_, _, id, tpe, _), i) =>
        if (tpe == "purchase") {
          val terms = (0 until math.min(8, i + 1)).map(k => sorted(i - k)._5 * w(k))
          val expect = terms.sum / w.take(math.min(8, i + 1)).sum
          assert(math.abs(got(id) - expect) < 1e-4, s"event $id")
        }
      }
    }
  }

  test("skyline: members undominated, every non-member dominated by a member") {
    val all = Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_totalprice", "o_orderdate")
      .as[(Long, Double, java.sql.Timestamp)].collect()
    val sky = SparkEntry.queries("q_skyline")(spark, TestSpark.sf)
      .select("o_orderkey").as[Long].collect().toSet
    def dom(a: (Long, Double, java.sql.Timestamp), b: (Long, Double, java.sql.Timestamp)) =
      a._2 >= b._2 && !a._3.after(b._3) && (a._2 > b._2 || a._3.before(b._3))
    val members = all.filter(r => sky.contains(r._1))
    assert(members.nonEmpty)
    members.foreach(m => assert(!all.exists(o => dom(o, m)), s"member ${m._1} dominated"))
    all.filterNot(r => sky.contains(r._1)).take(2000).foreach { r =>
      assert(members.exists(m => dom(m, r)), s"non-member ${r._1} undominated")
    }
  }

  test("skyline sweep fallback: exact parity with the broadcast path, incl. anti-correlated data") {
    import graft.operators.Relational
    def dom(a: (Long, Double, java.sql.Timestamp), b: (Long, Double, java.sql.Timestamp)) =
      a._2 >= b._2 && !a._3.after(b._3) && (a._2 > b._2 || a._3.before(b._3))
    def check(rows: Seq[(Long, Double, java.sql.Timestamp)]): Unit = {
      val df = rows.toDF("o_orderkey", "o_totalprice", "o_orderdate")
      // broadcastLimit=0 forces the range-partitioned sweep; default takes broadcast
      val swept = Relational.skyline(df, broadcastLimit = 0)
        .select("o_orderkey").as[Long].collect().toSet
      val bcast = Relational.skyline(df)
        .select("o_orderkey").as[Long].collect().toSet
      val exact = rows.filterNot(r => rows.exists(o => dom(o, r))).map(_._1).toSet
      assert(swept == exact, s"sweep ${swept.size} vs exact ${exact.size}")
      assert(bcast == exact, s"broadcast ${bcast.size} vs exact ${exact.size}")
    }
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${1 + day % 28}%02d 00:00:00")
    // ANTI-correlated: price rises while date worsens → skyline ≈ n (the case
    // that would melt an unguarded broadcast), with ties + planted dominated rows
    val anti = (0 until 600).map { i =>
      (i.toLong, 100.0 + (i / 2) * 10, ts(28 - (i / 2) % 28))
    } ++ Seq((9001L, 50.0, ts(27)), (9002L, 105.0, ts(27)))
    check(anti)
    // correlated: tiny skyline, exercises cross-partition dominance carry
    val corr = (0 until 600).map { i => (i.toLong, 100.0 + i * 10, ts(i % 28)) }
    check(corr)
    // the real table through both paths
    val orders = Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_totalprice", "o_orderdate")
    val defaultSky = Relational.skyline(orders).select("o_orderkey").as[Long].collect().toSet
    val sweptSky = Relational.skyline(orders, broadcastLimit = 0)
      .select("o_orderkey").as[Long].collect().toSet
    assert(sweptSky == defaultSky, s"orders: sweep ${sweptSky.size} vs bcast ${defaultSky.size}")
  }

  test("simhash candidates equal brute-force all-pairs for maxDist 1/3/8") {
    val rnd = new scala.util.Random(42)
    val base = Seq.fill(40)(rnd.nextLong())
    // near-duplicates at controlled distances 0..10 so every maxDist tier
    // has true pairs to find (and misses to reject)
    val mutated = base.zipWithIndex.map { case (fp, i) =>
      (0 until (i % 11)).foldLeft(fp)((acc, _) => acc ^ (1L << rnd.nextInt(64)))
    }
    val fps = (base ++ mutated).zipWithIndex.map { case (fp, i) => (i.toLong, fp) }
    val fpTable = fps.toDF("doc_id", "fp")
    for (maxDist <- Seq(1, 3, 8)) {
      val got = graft.dedup.Dedup.simhashCandidates(fpTable, maxDist)
        .filter(col("hamming") <= maxDist)
        .select("doc1", "doc2").as[(Long, Long)].collect().toSet
      val want = (for {
        (id1, f1) <- fps; (id2, f2) <- fps
        if id1 < id2 && java.lang.Long.bitCount(f1 ^ f2) <= maxDist
      } yield (id1, id2)).toSet
      assert(want.nonEmpty, s"maxDist=$maxDist: degenerate fixture, no true pairs")
      assert(got == want, s"maxDist=$maxDist: got ${got.size} pairs, want ${want.size}")
    }
  }

  test("histogram sketch merge is associative and grouping-invariant (exact regime)") {
    // any shard partitioning and any merge ORDER must produce the same
    // quantiles while values stay within the bin budget — the property that
    // makes per-shard sketch blobs reusable across arbitrary rollups
    import graft.functions.MutableHist
    val rnd = new scala.util.Random(11)
    (1 to 10).foreach { trial =>
      val distinct = rnd.nextInt(40) + 5 // ≤ 45 values < 64 bins: exact
      val vals = Seq.fill(500)((rnd.nextInt(distinct) + 1).toDouble)
      def sketch(vs: Seq[Double]): MutableHist = {
        val h = new MutableHist(64); vs.foreach(h.add(_, 1L)); h
      }
      def mergeAll(parts: Seq[Seq[Double]]): Seq[Double] = {
        val acc = new MutableHist(64)
        parts.foreach { p =>
          // round-trip through bytes like the shuffle boundary does
          acc.merge(MutableHist.fromBytes(MutableHist.toBytes(sketch(p)), 64))
        }
        Seq(0.25, 0.5, 0.75).map(acc.quantileCont)
      }
      val flat = mergeAll(Seq(vals))
      val bySplits = mergeAll(vals.grouped(7).toSeq)
      val byShards = mergeAll(vals.zipWithIndex.groupBy(_._2 % 5).toSeq
        .sortBy(-_._1).map(_._2.map(_._1))) // reversed shard order
      assert(flat == bySplits, s"trial $trial: split grouping diverged")
      assert(flat == byShards, s"trial $trial: shard order diverged")
      // and the exact-regime result equals the sorted-order type-7 quantile
      val sorted = vals.sorted
      def q7(p: Double): Double = {
        val h = (sorted.length - 1) * p
        val lo = h.toInt
        if (lo + 1 >= sorted.length) sorted(lo)
        else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
      }
      Seq(0.25, 0.5, 0.75).zip(flat).foreach { case (p, got) =>
        assert(math.abs(got - q7(p)) < 1e-9, s"trial $trial p=$p")
      }
    }
  }

  test("set-op algebra: (A intersect B) + (A except B) partitions distinct A") {
    val a = Tables.orders(spark, TestSpark.sf).select(col("o_orderkey"))
    val b = Tables.lineitem(spark, TestSpark.sf).filter(col("l_quantity") > 25)
      .select(col("l_orderkey").as("o_orderkey"))
    val inter = a.intersect(b).count()
    val exc = a.except(b).count()
    assert(inter + exc == a.distinct().count())
  }

  test("pivot cells partition the group totals (pivot vs plain groupBy)") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    val pivoted = li.groupBy("l_linestatus").pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum("l_quantity"))
      .as[(String, Option[Double], Option[Double], Option[Double])].collect()
    val grouped = li.groupBy("l_linestatus").agg(sum("l_quantity"))
      .as[(String, Double)].collect().toMap
    assert(pivoted.nonEmpty)
    pivoted.foreach { case (ls, a, n, r) =>
      val rowSum = Seq(a, n, r).flatten.sum
      assert(math.abs(rowSum - grouped(ls)) < 1e-6, s"linestatus $ls")
    }
  }

  test("full outer join algebra: |full| = |left-only| + |right-only| + |inner|") {
    val c = Tables.customer(spark, TestSpark.sf)
      .filter(col("c_acctbal") > 5000).select(col("c_custkey").as("k"))
    val o = Tables.orders(spark, TestSpark.sf)
      .filter(col("o_totalprice") > 100000).select(col("o_custkey").as("k")).distinct()
    val full = c.join(o, c("k") === o("k"), "full").count()
    val inner = c.join(o, c("k") === o("k")).count()
    val leftOnly = c.join(o, c("k") === o("k"), "left_anti").count()
    val rightOnly = o.join(c, o("k") === c("k"), "left_anti").count()
    assert(full == leftOnly + rightOnly + inner)
    assert(inner > 0 && leftOnly + rightOnly > 0, "degenerate fixture")
  }

  test("window distribution invariants: cume_dist bounds, ntile partition sizes") {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
    val rows = Tables.orders(spark, TestSpark.sf)
      .select(col("o_custkey"),
        ntile(4).over(w).as("q"), cume_dist().over(w).as("cd"))
      .as[(Long, Int, Double)].collect()
    assert(rows.forall(r => r._2 >= 1 && r._2 <= 4))
    assert(rows.forall(r => r._3 > 0.0 && r._3 <= 1.0))
    // ntile bucket sizes within a partition differ by at most 1
    rows.groupBy(_._1).foreach { case (ck, part) =>
      val sizes = part.groupBy(_._2).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"cust $ck ntile sizes $sizes")
    }
  }

  test("correlated subquery equals the window-function formulation") {
    val viaSubquery = operators.Relational.queries("q_subquery_corr")(spark, TestSpark.sf)
      .as[(Long, Double)].collect().toSet
    val w = Window.partitionBy(col("o_custkey"))
    val viaWindow = Tables.orders(spark, TestSpark.sf)
      .withColumn("cavg", avg(col("o_totalprice")).over(w))
      .filter(col("o_totalprice") > col("cavg"))
      .select("o_orderkey", "o_totalprice")
      .as[(Long, Double)].collect().toSet
    assert(viaSubquery == viaWindow && viaSubquery.nonEmpty)
  }

  test("attribution interval join equals a naive per-pair recompute") {
    val got = streaming.Streaming.queries("q_attribution")(spark, TestSpark.sf)
      .select("p_id", "c_id").as[(Long, Long)].collect().toSet
    val events = Tables.events(spark, TestSpark.sf)
      .select("event_id", "user_id", "ts", "event_type")
      .as[(Long, Long, java.sql.Timestamp, String)].collect()
    val purchases = events.filter(_._4 == "purchase")
    val clicks = events.filter(_._4 == "click")
    val naive = (for {
      p <- purchases; c <- clicks
      if c._2 == p._2 && c._3.getTime >= p._3.getTime - 30 * 60 * 1000 && c._3.getTime < p._3.getTime
    } yield (p._1, c._1)).toSet
    assert(got == naive && got.nonEmpty)
  }

  test("rollup counts are consistent: grand total equals sum of leaves") {
    val rows = SparkEntry.queries("q_rollup")(spark, TestSpark.sf)
      .as[(String, String, Double, Long)].collect()
    val leaves = rows.filter(r => r._1 != "ALL" && r._2 != "ALL").map(_._4).sum
    val grand = rows.find(r => r._1 == "ALL" && r._2 == "ALL").get._4
    assert(leaves == grand)
  }

  test("property: replaceWhere equals set-subtract-plus-insert for random regions") {
    import graft.operators.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("graft-prop-rw").toFile.getAbsolutePath
    val n = 500L
    Snapshots.commit(spark, dir,
      spark.range(n).toDF("k").withColumn("p", col("k") * 1.0).repartition(4))
    var expected: Map[Long, Double] =
      (0L until n).map(k => k -> k.toDouble).toMap
    val regions = Gen.listOfN(6, for {
      lo <- Gen.choose(0L, n - 1); w <- Gen.choose(0L, 120L)
      dens <- Gen.choose(1, 3); bump <- Gen.choose(1.0, 99.0)
    } yield (lo, math.min(n - 1, lo + w), dens, bump)).sample.get
    regions.foreach { case (lo, hi, dens, bump) =>
      val incoming = (lo to hi).filter(_ % dens == 0).map(k => (k, k + bump))
      Snapshots.replaceWhere(spark, dir,
        incoming.toDF("k", "p"), "k", Some(lo), Some(hi))
      expected = expected.filterNot { case (k, _) => k >= lo && k <= hi } ++
        incoming.toMap
      val got = Snapshots.read(spark, dir).as[(Long, Double)].collect().toMap
      assert(got == expected, s"region [$lo, $hi] dens=$dens diverged")
    }
  }

  test("property: a violating batch never publishes — versions and rows are unchanged") {
    import graft.operators.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("graft-prop-cons").toFile.getAbsolutePath
    Snapshots.commit(spark, dir,
      spark.range(1, 200).toDF("k").withColumn("p", col("k") * 2.0))
    Snapshots.addCheckConstraint(spark, dir, "p_pos", "p > 0")
    Snapshots.addCheckConstraint(spark, dir, "k_pos", "k > 0")
    val batches = Gen.listOfN(8, for {
      base <- Gen.choose(1000L, 9000L); sz <- Gen.choose(1, 20)
      badAt <- Gen.choose(-1, 19) // -1 = clean batch
    } yield (base, sz, badAt)).sample.get
    batches.foreach { case (base, sz, badAt) =>
      val rows = (0 until sz).map(i =>
        (base + i, if (i == badAt) -1.0 else (base + i) * 2.0))
      val before = Snapshots.currentVersion(spark, dir).get
      val beforeRows = Snapshots.countRows(spark, dir)
      val violates = rows.exists(_._2 <= 0)
      try {
        Snapshots.commit(spark, dir, rows.toDF("k", "p"))
        assert(!violates, s"violating batch ($base, $sz, $badAt) was accepted")
      } catch {
        case _: IllegalArgumentException =>
          assert(violates, s"clean batch ($base, $sz, $badAt) was refused")
          assert(Snapshots.currentVersion(spark, dir).contains(before),
            "refused batch advanced the version")
          assert(Snapshots.countRows(spark, dir) == beforeRows,
            "refused batch changed the row count")
      }
    }
  }
}
