package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.EntityResolution

/** Entity-resolution locks: ground truth is `rec_id / 10` (the customer key
  * the dirty-record generator perturbed away), which the resolver itself
  * never sees — so precision/recall here measure real linkage quality, not
  * rule parity (the DuckDB oracle covers that).
  */
class EntityResolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val records = EntityResolution.dirtyRecords(spark, TestSpark.sf).cache()

  test("dirty fixture: every 3rd customer gets a b-record, every 5th a c-record") {
    val bySys = records.groupBy("sys").count().as[(String, Long)].collect().toMap
    val n = bySys("a")
    assert(bySys("b") == (0L until n).count(_ % 3 == 0), "b-record population")
    assert(bySys("c") == (0L until n).count(_ % 5 == 0), "c-record population")
  }

  test("pair matching: perfect recall on a/b and a/c legs, precision >= 0.95") {
    val pairs = EntityResolution.matchPairs(records)
      .select($"rec1", $"rec2").as[(Long, Long)].collect()
    val truePos = pairs.count { case (r1, r2) => r1 / 10 == r2 / 10 }
    // every perturbed record must link back to its system-a twin
    val wantAB = records.filter($"sys" === "b").count()
    val wantAC = records.filter($"sys" === "c").count()
    val abFound = pairs.count { case (r1, r2) => r1 / 10 == r2 / 10 && r1 % 10 == 0 && r2 % 10 == 1 }
    val acFound = pairs.count { case (r1, r2) => r1 / 10 == r2 / 10 && r1 % 10 == 0 && r2 % 10 == 2 }
    assert(abFound == wantAB, s"a-b recall: $abFound of $wantAB")
    assert(acFound == wantAC, s"a-c recall: $acFound of $wantAC")
    assert(truePos.toDouble / pairs.length >= 0.95,
      s"precision ${truePos.toDouble / pairs.length} below 0.95 (${pairs.length} pairs)")
  }

  test("clustering is transitive: b and c legs land in one entity even when b-c scores below threshold") {
    // custkey % 15 == 0 entities hold all three records; the b-c name
    // distance (5) exceeds MaxNameLev, so only CC transitivity unites them
    val golden = EntityResolution.goldenRecords(records)
    val sizes = golden.select($"entity_id", $"n_recs").as[(Long, Long)].collect().toMap
    val n = records.filter($"sys" === "a").count()
    (0L until n).foreach { k =>
      val want = 1 + (if (k % 3 == 0) 1 else 0) + (if (k % 5 == 0) 1 else 0)
      assert(sizes(k * 10) == want, s"entity $k: size ${sizes(k * 10)} != $want")
    }
    assert(sizes.size == n, "every entity resolves to its system-a key")
  }

  test("golden record survivorship: authoritative name/bal, spread only where b rounded") {
    val rows = EntityResolution.goldenRecords(records)
      .select($"entity_id", $"name", $"bal", $"bal_spread")
      .as[(Long, String, Double, Double)].collect()
    val src = Tables.customer(spark, TestSpark.sf)
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .as[(Long, String, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (eid, name, bal, spread) =>
      val (wantName, wantBal) = src(eid / 10)
      assert(name == wantName, s"entity $eid name")
      assert(bal == wantBal, s"entity $eid bal")
      if (eid / 10 % 3 != 0) assert(spread == 0.0, s"entity $eid spread without a b-record")
      else assert(spread <= 0.5 + 1e-9, s"entity $eid spread $spread exceeds rounding delta")
    }
  }

  test("incremental admit: d-records rejoin their store entity, x-records found new ones") {
    val store = EntityResolution.linkageStore(records)
    val batch = EntityResolution.batchRecords(spark, TestSpark.sf)
    val out = EntityResolution.admitRecords(batch, store)
      .select($"rec_id", $"entity_id", $"is_new").as[(Long, Long, Boolean)].collect()
    assert(out.length == batch.count(), "every batch record gets a verdict exactly once")
    out.foreach { case (rec, ent, isNew) =>
      if (rec % 10 == 3) { // d-system: linkable rename of an existing entity
        assert(!isNew && ent == rec / 10 * 10, s"d-record $rec resolved to $ent (is_new=$isNew)")
      } else { // x-system: unlinkable rename -> a new entity
        assert(isNew, s"x-record $rec should be a new entity, landed in $ent")
      }
    }
  }

  test("blocked pair generation: the plan joins on the block key, never cross-product") {
    val plan = EntityResolution.matchPairs(records).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("hot-gated admit: a collided hot block splits by suffix, same verdicts") {
    // two DIFFERENT entities colliding in one block (same nation, same
    // last-4 digits "1234") — the cross-entity hot block the gate exists
    // for; TPC-H custkeys at test SF never collide on last-4, so this is
    // the scenario built explicitly
    val rows = Seq(
      (10L, "a", "Customer#000011234", 1L, 100.0),
      (11L, "b", "CUSTOMR NO 000011234", 1L, 100.0),
      (12L, "c", "cust. #000011234", 1L, 100.0),
      (20L, "a", "Customer#000021234", 1L, 500.0),
      (21L, "b", "CUSTOMR NO 000021234", 1L, 500.0),
      (22L, "c", "cust. #000021234", 1L, 500.0)
    ).toDF("rec_id", "sys", "name", "nation", "bal")
    val store = EntityResolution.linkageStore(rows)
    val stats = EntityResolution.blockStats(rows)
    assert(stats.filter($"pop" > EntityResolution.HotBlockPop).count() == 1,
      "the collided block must register hot")
    val batch = Seq((1003L, "d", "CUST-000011234", 1L, 100.0))
      .toDF("rec_id", "sys", "name", "nation", "bal")
    // candidate volume BEFORE scoring: plain block join fans to all 6
    // collided records; the sub-key keeps only entity A's 3
    val nb = EntityResolution.withBlocks(batch)
    val plainCand = nb.join(
      EntityResolution.withBlocks(rows).select($"block"), "block").count()
    assert(plainCand == 6, s"collided block should fan to 6, got $plainCand")
    val gatedCand = nb.withColumn("sub", expr("right(canon, 8)"))
      .join(EntityResolution.withBlocks(rows)
        .select($"block", expr("right(canon, 8)").as("sub")), Seq("block", "sub"))
      .count()
    assert(gatedCand == 3, s"sub-key should keep entity A's 3, got $gatedCand")
    // verdicts match the ungated admit: the suffix-preserving conventions
    // keep recall intact while the hot block's fan-out halves
    val plain = EntityResolution.admitRecords(batch, store)
      .select($"rec_id", $"entity_id", $"is_new")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val gated = EntityResolution.admitRecordsHotGated(batch,
      EntityResolution.hotStore(store, stats), stats)
      .select($"rec_id", $"entity_id", $"is_new")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(gated == plain && gated == Seq((1003L, 10L, false)),
      s"hot gating changed verdicts: plain=$plain gated=$gated")
  }

  test("hot-gated admit on the fixture: parity with the plain admit (suffixes preserved)") {
    val store = EntityResolution.linkageStore(records)
    val stats = EntityResolution.blockStats(records)
    val batch = EntityResolution.batchRecords(spark, TestSpark.sf)
    assert(stats.filter($"pop" > EntityResolution.HotBlockPop).count() > 0,
      "fixture has no hot blocks; the declared query never exercises the gate")
    val plain = EntityResolution.admitRecords(batch, store)
      .select($"rec_id", $"entity_id", $"is_new")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val gated = EntityResolution.admitRecordsHotGated(batch,
      EntityResolution.hotStore(store, stats), stats)
      .select($"rec_id", $"entity_id", $"is_new")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(gated == plain, "gating changed verdicts on suffix-preserving data")
  }
}
