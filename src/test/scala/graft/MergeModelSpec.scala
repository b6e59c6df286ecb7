package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Snapshots

/** Model-based fuzz of the general multi-clause MERGE ([[Snapshots.mergeApply]],
  * the SQL face's engine): random target/source tables and random clause
  * stacks run both through the real operator and through a tiny in-memory
  * interpreter of ANSI MERGE semantics (first applicable clause wins, NULL
  * conditions are false, unmatched rows carry, multi-match is an error).
  * Any divergence — a row lost, duplicated, mis-updated, wrongly deleted,
  * wrongly inserted — fails with the offending seed.
  */
class MergeModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-mrgmodel").toFile.getAbsolutePath

  // clause model: cond is a (threshold, onSource) pair meaning
  // "side.p > threshold"; None = unconditional
  private case class MClause(cond: Option[Double], update: Option[Double])
  private case class NmClause(cond: Option[Double])
  private case class BsClause(cond: Option[Double], update: Option[Double])

  test("property: mergeApply equals the ANSI-merge interpreter across random clause stacks") {
    val rng = new scala.util.Random(20260815)
    for (round <- 1 to 12) {
      val dir = tmp()
      // target: unique keys, random payloads
      val tKeys = (0 until 40).filter(_ => rng.nextBoolean()).map(_.toLong)
      val target = tKeys.map(k => (k, math.rint(rng.nextDouble() * 100) / 10))
      // source: unique keys (the ANSI requirement on the matched side),
      // overlapping the target about half the time
      val sKeys = (0 until 40).filter(_ => rng.nextBoolean()).map(_.toLong)
      val source = sKeys.map(k => (k, math.rint(rng.nextDouble() * 100) / 10))
      Snapshots.commit(spark, dir,
        target.toDF("k", "p").repartition(3))

      def conds(n: Int): Seq[Option[Double]] =
        Seq.fill(n)(if (rng.nextBoolean()) Some(rng.nextInt(10).toDouble) else None)
      val matched = conds(rng.nextInt(3)).map(c =>
        MClause(c, if (rng.nextBoolean()) Some(rng.nextInt(5) + 100.0) else None))
      val notMatched = conds(rng.nextInt(2)).map(NmClause)
      val bySource = conds(rng.nextInt(2)).map(c =>
        BsClause(c, if (rng.nextBoolean()) Some(999.0) else None))

      // ---- the real operator
      val got = try {
        Snapshots.mergeApply(spark, dir, source.toDF("k", "p"),
          onCond = col("__t.k") === col("__s.k"),
          matched = matched.map(m => Snapshots.WhenMatched(
            m.cond.map(t => col("__s.p") > lit(t)),
            m.update.map(u => Seq("p" -> (col("__s.p") + lit(u)))))),
          notMatched = notMatched.map(n => Snapshots.WhenNotMatched(
            n.cond.map(t => col("__s.p") > lit(t)),
            Seq("k" -> col("__s.k"), "p" -> col("__s.p")))),
          notMatchedBySource = bySource.map(b => Snapshots.WhenNotMatchedBySource(
            b.cond.map(t => col("__t.p") > lit(t)),
            b.update.map(u => Seq("p" -> lit(u))))),
          pruneKey = if (rng.nextBoolean()) Some(("k", col("__s.k"))) else None)
        Snapshots.read(spark, dir).as[(Long, Double)].collect().toSeq.sorted
      } catch {
        case e: Exception => fail(s"round $round: mergeApply failed: $e")
      }

      // ---- the interpreter
      val srcByKey = source.toMap
      val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      for ((k, p) <- target) {
        srcByKey.get(k) match {
          case Some(sp) => // matched: first applicable clause wins
            matched.find(m => m.cond.forall(t => sp > t)) match {
              case Some(MClause(_, Some(u))) => expected += ((k, sp + u))
              case Some(MClause(_, None)) => () // DELETE
              case None => expected += ((k, p)) // no clause claims it: carry
            }
          case None => // not matched by source
            bySource.find(b => b.cond.forall(t => p > t)) match {
              case Some(BsClause(_, Some(u))) => expected += ((k, u))
              case Some(BsClause(_, None)) => ()
              case None => expected += ((k, p))
            }
        }
      }
      val tKeySet = tKeys.toSet
      for ((k, sp) <- source if !tKeySet.contains(k))
        if (notMatched.exists(n => n.cond.forall(t => sp > t)))
          expected += ((k, sp))

      assert(got == expected.sorted.toSeq,
        s"round $round diverged (matched=$matched notMatched=$notMatched " +
          s"bySource=$bySource)\n got=$got\n want=${expected.sorted}")

      // the change feed balances: survivors = old - deletes - update_pre
      // + update_post + inserts (only when a data commit happened)
      if (Snapshots.currentVersion(spark, dir).contains(2)) {
        val feed = Snapshots.readChangeFeed(spark, dir, 1, 2)
          .groupBy("_change_type").agg(count(lit(1)).as("n"))
          .as[(String, Long)].collect().toMap
        val delta = feed.getOrElse("insert", 0L) +
          feed.getOrElse("update_post", 0L) -
          feed.getOrElse("update_pre", 0L) - feed.getOrElse("delete", 0L)
        assert(target.size + delta == expected.size,
          s"round $round: feed does not balance: $feed")
      }
    }
  }

  test("ANSI multi-match refuses even when only a DELETE clause applies") {
    val dir = tmp()
    Snapshots.commit(spark, dir, Seq((1L, 1.0)).toDF("k", "p"))
    val dup = Seq((1L, 2.0), (1L, 3.0)).toDF("k", "p")
    val e = intercept[IllegalArgumentException](
      Snapshots.mergeApply(spark, dir, dup,
        col("__t.k") === col("__s.k"),
        matched = Seq(Snapshots.WhenMatched(None, None)),
        notMatched = Seq.empty))
    assert(e.getMessage.contains("more than one source row"))
  }
}
