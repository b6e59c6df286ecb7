package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GramBuffer
import graft.similarity.Pca

/** Locks for the embedding-spectrum family (`similarity/Pca.scala`): the
  * no-oracle `q_embed_pca` is pinned here by its mathematical invariants
  * (trace identity, eigen residuals, orthonormality, projection parity)
  * instead of a DuckDB twin — DuckDB has no eigensolver.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val X: Array[Array[Double]] =
    Tables.embeddings(spark, TestSpark.sf).orderBy("vec_id")
      .select("embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble))

  private lazy val cov = Pca.covMatrix(spark, TestSpark.sf)
  private lazy val eigen = Pca.jacobiEigen(cov)

  /** Population covariance computed naively on the driver. */
  private def covDriver(i: Int, j: Int): Double = {
    val n = X.length
    val mi = X.map(_(i)).sum / n
    val mj = X.map(_(j)).sum / n
    X.map(r => (r(i) - mi) * (r(j) - mj)).sum / n
  }

  test("gram_matrix aggregate matches the driver-computed covariance") {
    val d = cov.length
    assert(d == X.head.length)
    for ((i, j) <- Seq((0, 0), (0, 1), (5, 9), (d - 1, d - 1), (3, d - 2))) {
      assert(math.abs(cov(i)(j) - covDriver(i, j)) < 1e-9,
        s"cov($i,$j): ${cov(i)(j)} vs driver ${covDriver(i, j)}")
      assert(cov(i)(j) == cov(j)(i), s"cov not symmetric at ($i,$j)")
    }
  }

  test("GramBuffer merge equals single-buffer accumulation (partial+final safety)") {
    val rows = X.take(40)
    def toAD(a: Array[Double]) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(a)
    val whole = new GramBuffer
    rows.foreach(r => whole.add(toAD(r), (ad, i) => ad.getDouble(i)))
    val p1 = new GramBuffer; val p2 = new GramBuffer
    rows.take(17).foreach(r => p1.add(toAD(r), (ad, i) => ad.getDouble(i)))
    rows.drop(17).foreach(r => p2.add(toAD(r), (ad, i) => ad.getDouble(i)))
    val merged = GramBuffer.fromBytes(GramBuffer.toBytes(p1))
    merged.merge(GramBuffer.fromBytes(GramBuffer.toBytes(p2)))
    assert(merged.n == whole.n)
    for ((i, j) <- Seq((0, 0), (2, 7), (63, 63)))
      assert(math.abs(merged.covariance(i, j) - whole.covariance(i, j)) < 1e-12)
  }

  test("jacobi eigen: trace identity, descending spectrum, residuals, orthonormality") {
    val (evals, evecs) = eigen
    val d = cov.length
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(evals.sum - trace) < 1e-9,
      s"Σλ ${evals.sum} != trace $trace")
    evals.zip(evals.tail).foreach { case (a, b) => assert(a >= b - 1e-12) }
    evals.foreach(l => assert(l >= -1e-10, s"negative eigenvalue $l"))
    // ‖Cv − λv‖∞ per top component
    for (k <- 0 until 8) {
      val v = evecs(k)
      val res = (0 until d).map { i =>
        math.abs((0 until d).map(j => cov(i)(j) * v(j)).sum - evals(k) * v(i))
      }.max
      assert(res < 1e-8, s"component $k residual $res")
    }
    for (a <- 0 until 4; b <- 0 until 4) {
      val dot = evecs(a).zip(evecs(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9,
        s"evec($a)·evec($b) = $dot")
    }
  }

  test("distributed projection matches the driver matmul") {
    val k = 8
    val (_, evecs) = eigen
    val got = Pca.projected(spark, TestSpark.sf, k)
      .orderBy("vec_id").select("proj").as[Array[Double]].collect()
    assert(got.length == X.length)
    X.indices.take(25).foreach { r =>
      (0 until k).foreach { c =>
        val want = X(r).zip(evecs(c)).map { case (x, v) => x * v }.sum
        assert(math.abs(got(r)(c) - want) < 1e-9, s"row $r comp $c")
      }
    }
  }

  test("32-dim projection preserves cosine top-10 neighbors at recall >= 0.4") {
    // the fixture spectrum is near-isotropic (flat eigenvalues), so PCA is a
    // diagnostic here, not a compressor — the floor documents that honestly
    val k = 32
    val (_, evecs) = eigen
    val P = X.map(r => evecs.take(k).map(v => r.zip(v).map { case (a, b) => a * b }.sum))
    def top10(m: Array[Array[Double]]): Array[Set[Int]] = {
      val norms = m.map(r => math.sqrt(r.map(x => x * x).sum))
      m.indices.map { i =>
        m.indices.filter(_ != i)
          .sortBy(j => -m(i).zip(m(j)).map { case (a, b) => a * b }.sum / (norms(i) * norms(j)))
          .take(10).toSet
      }.toArray
    }
    val (full, red) = (top10(X), top10(P))
    val recall = X.indices.map(i => (full(i) & red(i)).size / 10.0).sum / X.length
    assert(recall >= 0.4, s"recall@10 in $k-dim PCA space = $recall")
  }

  test("sharded sketch rollup equals the single-pass covariance (mergeable-state parity)") {
    val one = SparkEntry.queries("q_embed_gram")(spark, TestSpark.sf)
      .as[(Long, Long, Double)].collect()
    val rolled = SparkEntry.queries("q_embed_gram_shard")(spark, TestSpark.sf)
      .as[(Long, Long, Double)].collect()
    assert(one.length == rolled.length)
    one.zip(rolled).foreach { case ((i1, j1, c1), (i2, j2, c2)) =>
      assert(i1 == i2 && j1 == j2)
      assert(math.abs(c1 - c2) <= 1e-6 + 1e-12, s"($i1,$j1): $c1 vs $c2")
    }
  }

  test("q_embed_pca output: ratios sum consistently and cum_ratio is monotone") {
    val rows = SparkEntry.queries("q_embed_pca")(spark, TestSpark.sf)
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.length == 16)
    rows.foreach { case (_, ev, vr, _) => assert(ev >= 0 && vr >= 0 && vr <= 1) }
    val cums = rows.map(_._4)
    cums.zip(cums.tail).foreach { case (a, b) => assert(b >= a - 1e-9) }
    val vrSum = rows.map(_._3).sum
    assert(math.abs(cums.last - vrSum) < 1e-3, s"cum ${cums.last} vs Σvr $vrSum")
  }

  test("q_embed_gram plan: one aggregate, no join, no per-row explode before the agg") {
    val df = SparkEntry.queries("q_embed_gram")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"gram must be join-free:\n$plan")
    val explodeBeforeAgg = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate
        if g.child.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.isEmpty => g
    }
    assert(explodeBeforeAgg.isEmpty, "explode must run on the d²-sized result, not the corpus")
  }
}
