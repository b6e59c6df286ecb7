package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GramFunctions, VectorFunctions}
import graft.{QueryModule, Tables => T}

/** Embedding-spectrum analysis: the distributed covariance (Gram) matrix of
  * the embedding column and the PCA decomposition on top of it — the
  * embedding-health diagnostic a training-data pipeline runs per corpus
  * snapshot (collapsed or dominated dimensions show up as a skewed
  * eigenvalue spectrum; anisotropy is the standard embedding-quality
  * signal) and the whitening/dimension-reduction primitive for downstream
  * ANN. No reference twin (the reference has no vector surface).
  *
  * Scale shape: the ONLY data-sized pass is one `gram_matrix` aggregate —
  * each partition folds its rows into an O(d²) moment buffer
  * (`functions/GramMatrix.scala`), partials merge elementwise, and the
  * d(d+1)/2 covariance cells come out of ONE shuffle-free-per-row
  * aggregation. The alternative explode-and-self-join (what the DuckDB
  * oracle does) ships d²/2 rows per input row through a shuffle — fine for
  * the oracle, a scale-killer at 100 TB. The eigensolve then runs on the
  * driver over the d×d matrix — metadata-sized like the IVF k-centroid
  * collect (`Ivf.scala`), never row-count-dependent — and the projection
  * back over the corpus is k codegen'd `dot_product` expressions per row
  * (no UDF, stays in WholeStageCodegen).
  */
object Pca extends QueryModule {

  /** Population covariance matrix of the embedding column as a dense
    * symmetric d×d array, from one [[graft.functions.GramMatrixAgg]] pass.
    */
  private[graft] def covMatrix(s: SparkSession, d: String): Array[Array[Double]] = {
    val cells = T.embeddings(s, d)
      .agg(GramFunctions.gram_matrix(col("embedding")).as("g"))
      .select(explode(col("g")).as("e"))
      .select(col("e.i"), col("e.j"), col("e.cov"))
      .collect()
    require(cells.nonEmpty, "covMatrix: empty embeddings table")
    val dim = cells.iterator.map(_.getLong(1)).max.toInt + 1
    val m = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val (i, j, c) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      m(i)(j) = c; m(j)(i) = c
    }
    m
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: fixed sweep
    * order, fixed convergence threshold → fully deterministic. Returns
    * eigenvalues sorted descending (ties by original index) and the matching
    * eigenvectors as rows, each sign-canonicalized (largest-|.| element
    * positive) so downstream projections don't depend on rotation history.
    * O(d³) per sweep on the driver — d is the embedding width, so this is
    * metadata-scale math.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = Array.tabulate(n, n)((i, j) => m(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0; var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 100 && off() > 1e-20) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 0) {
            // standard numerically-stable rotation (Golub & Van Loan 8.4)
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t = (if (theta >= 0) 1.0 else -1.0) /
              (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1); val sn = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val vec = Array.tabulate(n)(k => v(k)(i))
      val maxAt = vec.indices.maxBy(k => (math.abs(vec(k)), -k))
      if (vec(maxAt) < 0) vec.map(-_) else vec
    }.toArray
    (evals, evecs)
  }

  /** Embeddings projected onto the top-k principal components: k codegen'd
    * dot products against broadcast eigenvector literals — a pure scan.
    */
  private[graft] def projected(s: SparkSession, d: String, k: Int): DataFrame = {
    val (_, evecs) = jacobiEigen(covMatrix(s, d))
    require(k <= evecs.length, s"k=$k > dim ${evecs.length}")
    val dots: Seq[Column] = (0 until k).map(c =>
      VectorFunctions.dot_product(col("embedding"), VectorFunctions.array_lit(evecs(c))))
    T.embeddings(s, d)
      .select(col("vec_id"), array(dots: _*).as("proj"), col("label"))
  }

  /** Upper triangle of the embedding covariance matrix, cell by cell —
    * oracle-checked against DuckDB's explode-and-self-join formulation of
    * the same population-covariance moments.
    */
  private def qEmbedGram(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d)
      .agg(GramFunctions.gram_matrix(col("embedding")).as("g"))
      .select(explode(col("g")).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"),
        // + 0.0 canonicalizes IEEE −0.0 (a tiny negative covariance rounds
        // to −0.0, which hash-compares unequal to the oracle's +0.0)
        (round(col("e.cov"), 6) + lit(0.0)).as("cov"))
      .orderBy("i", "j")

  /** The covariance triangle computed as a two-stage rollup: per-shard
    * `gram_sketch` moment bytes (what an ingest pipeline persists per shard
    * — the `histogram_sketch`/HLL posture) merged by `gram_merge_cov`.
    * Shares `q_embed_gram`'s oracle verbatim: a shard rollup must answer
    * exactly what the single-pass aggregate answers, which is the whole
    * point of mergeable moment state — at 100 TB the diagnostic reads
    * |shards| × O(d²) sketch bytes instead of rescanning the corpus.
    */
  private def qEmbedGramShard(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d)
      .groupBy((col("vec_id") % 4).as("shard"))
      .agg(GramFunctions.gram_sketch(col("embedding")).as("sk"))
      .agg(GramFunctions.gram_merge_cov(col("sk")).as("g"))
      .select(explode(col("g")).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"),
        (round(col("e.cov"), 6) + lit(0.0)).as("cov"))
      .orderBy("i", "j")

  /** PCA spectrum summary: top-16 eigenvalues with per-component and
    * cumulative explained-variance ratios. No SQL oracle (DuckDB has no
    * eigensolver); PcaSpec locks the math instead — Σλ = trace(cov),
    * λ descending, ‖Cv − λv‖∞ residuals, and distributed-projection parity
    * against the driver matmul.
    */
  private def qEmbedPca(s: SparkSession, d: String): DataFrame = {
    val cov = covMatrix(s, d)
    val (evals, _) = jacobiEigen(cov)
    val total = evals.sum
    var cum = 0.0
    val rows = evals.take(16).zipWithIndex.map { case (ev, i) =>
      cum += ev
      (i.toLong, math.rint(ev * 1e6) / 1e6,
        math.rint(ev / total * 1e6) / 1e6, math.rint(cum / total * 1e6) / 1e6)
    }.toSeq
    import s.implicits._
    rows.toDF("component", "eigenvalue", "var_ratio", "cum_ratio")
      .orderBy("component")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_gram" -> qEmbedGram,
    "q_embed_gram_shard" -> qEmbedGramShard,
    "q_embed_pca" -> qEmbedPca
  )

  val oracleSql: Map[String, String] = Map(
    "q_embed_gram" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
        |    unnest(range(len(embedding))) AS dim
        |  FROM embeddings)
        |SELECT a.dim AS i, b.dim AS j,
        |  round((sum(a.v*b.v) - sum(a.v)*sum(b.v)/count(*))/count(*), 6) + 0.0 AS cov
        |FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the rollup must answer exactly what the single-pass aggregate answers
    "q_embed_gram_shard" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
        |    unnest(range(len(embedding))) AS dim
        |  FROM embeddings)
        |SELECT a.dim AS i, b.dim AS j,
        |  round((sum(a.v*b.v) - sum(a.v)*sum(b.v)/count(*))/count(*), 6) + 0.0 AS cov
        |FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
