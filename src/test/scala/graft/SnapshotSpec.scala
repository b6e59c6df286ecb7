package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Snapshots

class SnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-snapspec").toFile.getAbsolutePath

  test("append commits never change a pinned version's rows") {
    val dir = tmp()
    val v1 = Snapshots.commit(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val before = Snapshots.read(spark, dir, Some(v1))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val v2 = Snapshots.commit(spark, dir, Seq((3L, "c")).toDF("k", "v"))
    assert(v1 == 1 && v2 == 2)
    val after = Snapshots.read(spark, dir, Some(v1))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(after == before, "v1 drifted after the v2 append")
    assert(Snapshots.read(spark, dir, Some(v2)).count() == 3)
    assert(Snapshots.read(spark, dir).count() == 3, "default read = latest")
  }

  test("replace commit rewrites layout, keeps content, preserves history") {
    val dir = tmp()
    Snapshots.commit(spark, dir, spark.range(100).toDF("k").repartition(8))
    val v2 = Snapshots.commit(spark, dir,
      Snapshots.read(spark, dir).coalesce(1), replace = true)
    assert(Snapshots.files(spark, dir, v2).length == 1, "replace should compact to 1 file")
    assert(Snapshots.files(spark, dir, 1).length == 8, "v1 manifest untouched")
    assert(Snapshots.read(spark, dir, Some(v2)).as[Long].collect().sorted.toSeq ==
      (0L until 100L).toSeq)
    assert(Snapshots.read(spark, dir, Some(1)).count() == 100, "v1 still readable")
  }

  test("unpublished (hidden tmp) manifests are invisible to version listing") {
    val dir = tmp()
    Snapshots.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    // simulate a torn publish: a writer crashed before the atomic rename
    val torn = java.nio.file.Paths.get(dir, "_manifests", ".v2.list.tmp")
    java.nio.file.Files.write(torn, "data/c2/part-bogus.parquet\n".getBytes("UTF-8"))
    assert(Snapshots.versions(spark, dir) == Seq(1), "tmp manifest leaked into versions")
    assert(Snapshots.currentVersion(spark, dir).contains(1))
    assert(Snapshots.read(spark, dir).count() == 1)
  }

  test("reading a missing version or an empty table fails loudly") {
    val dir = tmp()
    intercept[IllegalArgumentException](Snapshots.read(spark, dir))
    Snapshots.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException](Snapshots.files(spark, dir, 9))
  }

  test("readChanges tails appended rows only, refuses ranges crossing a replace") {
    val dir = tmp()
    Snapshots.commit(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    Snapshots.commit(spark, dir, Seq((3L, "c")).toDF("k", "v"))
    Snapshots.commit(spark, dir, Seq((4L, "d"), (5L, "e")).toDF("k", "v"))
    assert(Snapshots.readChanges(spark, dir, 1, 2)
      .as[(Long, String)].collect().toSet == Set((3L, "c")))
    assert(Snapshots.readChanges(spark, dir, 1, 3)
      .as[(Long, String)].collect().toSet == Set((3L, "c"), (4L, "d"), (5L, "e")))
    Snapshots.commit(spark, dir,
      Snapshots.read(spark, dir).coalesce(1), replace = true)
    val e = intercept[IllegalArgumentException](
      Snapshots.readChanges(spark, dir, 3, 4))
    assert(e.getMessage.contains("replace"), e.getMessage)
  }

  test("expire vacuums unreferenced files and kills expired reads loudly") {
    val dir = tmp()
    Snapshots.commit(spark, dir, spark.range(10).toDF("k").repartition(4))
    Snapshots.commit(spark, dir,
      Snapshots.read(spark, dir).coalesce(1), replace = true) // v2 rewrites
    Snapshots.commit(spark, dir, spark.range(10, 12).toDF("k")) // v3 appends
    val deleted = Snapshots.expire(spark, dir, keepFrom = 2)
    assert(deleted == 4, s"v1's 4 now-orphaned files should go, got $deleted")
    assert(Snapshots.versions(spark, dir) == Seq(2, 3))
    intercept[IllegalArgumentException](Snapshots.files(spark, dir, 1))
    assert(Snapshots.read(spark, dir, Some(2)).count() == 10, "kept version intact")
    assert(Snapshots.read(spark, dir).count() == 12)
  }

  test("property: random append/replace sequences match an in-memory model at every version") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val dir = tmp()
      // model(v) = expected key multiset of snapshot v
      val model = scala.collection.mutable.ArrayBuffer[Vector[Long]]()
      var next = 1000L * trial
      for (step <- 0 until 6) {
        val fresh = Vector.fill(1 + rnd.nextInt(4)) { next += 1; next }
        val replace = step > 0 && rnd.nextBoolean()
        val v = Snapshots.commit(spark, dir, fresh.toDF("k"), replace = replace)
        assert(v == step + 1)
        model += (if (replace || model.isEmpty) fresh
                  else (model.last ++ fresh))
      }
      model.zipWithIndex.foreach { case (want, i) =>
        val got = Snapshots.read(spark, dir, Some(i + 1)).as[Long].collect().sorted
        assert(got.toVector == want.sorted, s"trial $trial v${i + 1}")
      }
      // readChanges across every append-only span equals the model delta
      for (a <- 1 until model.length; b <- (a + 1) to model.length
           if model(b - 1).startsWith(model(a - 1))) {
        val delta = model(b - 1).drop(model(a - 1).length)
        if (delta.nonEmpty) {
          val got = Snapshots.readChanges(spark, dir, a, b).as[Long].collect().sorted
          assert(got.toVector == delta.sorted, s"trial $trial changes ($a,$b]")
        }
      }
    }
  }

  test("q_time_travel: v3 (replace) equals v2 (its source) row-for-row") {
    val rows = SparkEntry.queries("q_time_travel")(spark, TestSpark.sf)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == 3)
    assert(rows(0)._2 < rows(1)._2, "append must grow the table")
    assert(rows(1)._2 == rows(2)._2 && rows(1)._3 == rows(2)._3,
      "replace changed content")
  }
}
