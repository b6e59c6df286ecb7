package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{array_lit, cosine_sim, dot_product}

/** Product quantization (PQ) ANN — the embedding-compression scale path next
  * to sign-LSH (Similarity) and IVF (Ivf). Jégou/Douze/Schmid's design
  * (TPAMI 2011) re-expressed Spark-first:
  *
  *   - TRAIN: the dim-D space splits into `m` subspaces of D/m dims; each
  *     subspace gets its own `ksub`-centroid k-means codebook. One Lloyd
  *     round is ONE distributed pass for all m subspaces (an `inline` fan of
  *     subvector rows, a `when`-dispatched argmin, one (s, cid, dim) mean
  *     aggregation); only m×ksub×dsub doubles ever reach the driver.
  *   - ENCODE: each vector becomes m small codes + its L2 norm — a pure
  *     codegen projection (argmin over dot products, no shuffle). At 64 dims
  *     and m=16/ksub=16 that is 16 nibble codes (8 B) + a 4 B norm = 12 B
  *     per vector vs 64 floats (256 B) — ~21× smaller: the representation that lets a 100 TB embedding
  *     corpus sit in an in-memory/columnar index (codes are 4 bits each;
  *     stored here as ints for schema simplicity — the cost model is
  *     unchanged).
  *   - SEARCH (ADC): the query builds an m×ksub lookup table of subspace dot
  *     products ONCE (driver-side, metadata-sized), then every encoded
  *     vector is scored by m `element_at` picks summed — no vector math on
  *     the corpus at all. Dividing by the stored norm turns the approximate
  *     inner product into approximate cosine. The ADC top-`rerank`
  *     candidates are exactly re-scored against the raw vectors (broadcast
  *     semi-join), which is the production shape: a cheap compressed scan
  *     bounds the candidate set, exact math runs on a few dozen rows.
  *
  * Approximate by construction → `q_cosine_pq` is a no-oracle row;
  * SimilaritySpec asserts recall against the exact brute-force top-k and
  * determinism across runs. Codebooks are memoized per (dataset, params)
  * like `Ivf.trainCached` — index build is ingest-time work.
  */
object Pq {

  /** cents(s)(j) is centroid j of subspace s, each of length dsub. */
  case class Codebooks(dsub: Int, cents: IndexedSeq[IndexedSeq[Array[Double]]]) {
    def m: Int = cents.length
    def ksub: Int = cents.head.length
  }

  /** argmin_j ||sv − c_j||² expressed as argmax_j (sv·c_j − ||c_j||²/2) so it
    * reuses the codegen'd dot_product; `greatest` over (score, −j) structs
    * breaks ties to the lowest code, keeping encode deterministic.
    */
  private[similarity] def nearestCode(sv: Column, cs: Seq[Array[Double]]): Column =
    greatest(cs.zipWithIndex.map { case (c, j) =>
      val halfNorm = c.map(x => x * x).sum / 2.0
      struct((dot_product(sv, array_lit(c)) - lit(halfNorm)).as("sc"), lit(-j).as("nj"))
    }: _*).getField("nj") * lit(-1)

  /** Subvector fan-out: one scan → (vec_id, s, sv) rows for all m subspaces. */
  private def subRows(emb: DataFrame, m: Int, dsub: Int): DataFrame =
    emb.select(col("vec_id"), expr(
      s"""inline(transform(sequence(0, ${m - 1}),
         |  s -> struct(s AS s, transform(slice(embedding, s * $dsub + 1, $dsub),
         |              x -> CAST(x AS DOUBLE)) AS sv)))""".stripMargin))

  /** Deterministic per-subspace k-means: init = subvectors of the first ksub
    * vectors by vec_id; each Lloyd round is one distributed
    * assignment+aggregation pass covering ALL subspaces.
    */
  def train(emb: DataFrame, m: Int, ksub: Int, iters: Int): Codebooks = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val init = emb.orderBy("vec_id").limit(ksub).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(init.length == ksub, s"need at least $ksub vectors to seed PQ")
    var cb: IndexedSeq[IndexedSeq[Array[Double]]] =
      (0 until m).map(s => init.map(v => v.slice(s * dsub, (s + 1) * dsub)).toIndexedSeq)
    val rows = subRows(emb, m, dsub)
    for (_ <- 0 until iters) {
      var assign: Column = when(col("s") === 0, nearestCode(col("sv"), cb(0)))
      for (s <- 1 until m) assign = assign.when(col("s") === s, nearestCode(col("sv"), cb(s)))
      val means = rows
        .select(col("s"), assign.as("cid"), posexplode(col("sv")).as(Seq("d", "v")))
        .groupBy("s", "cid", "d").agg(avg("v").as("mv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
      cb = (0 until m).map { s =>
        (0 until ksub).map { j =>
          // empty cells keep their previous centroid (standard Lloyd fix)
          if (means.contains((s, j, 0)))
            Array.tabulate(dsub)(d => means((s, j, d)))
          else cb(s)(j)
        }
      }
    }
    Codebooks(dsub, cb)
  }

  private val codebookCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Int, Int), Codebooks]()
  def trainCached(emb: DataFrame, key: String, m: Int, ksub: Int, iters: Int): Codebooks =
    codebookCache.computeIfAbsent((key, m, ksub, iters), _ => train(emb, m, ksub, iters))

  /** The encoded table is the INDEX — built once per (dataset, params) per
    * JVM and persisted, like the bucketed/z-ordered layouts and the IVF
    * centroids. Queries then measure the ADC scan, not the (deliberately
    * heavy, 256-dot-product) encode projection; on a real deployment the
    * codes are written at ingest.
    */
  def encodeCached(emb: DataFrame, key: String, cb: Codebooks, iters: Int): DataFrame =
    graft.PersistedCache(emb.sparkSession,
      ("pq-encoded", key, cb.m, cb.ksub, iters))(encode(emb, cb))

  /** The stored index: (vec_id, m codes, L2 norm) — a shuffle-free codegen
    * projection of the raw vectors.
    */
  def encode(emb: DataFrame, cb: Codebooks): DataFrame = {
    val codes = array(cb.cents.indices.map { s =>
      val sv = expr(
        s"transform(slice(embedding, ${s * cb.dsub + 1}, ${cb.dsub}), x -> CAST(x AS DOUBLE))")
      nearestCode(sv, cb.cents(s))
    }: _*)
    emb.select(col("vec_id"), codes.as("codes"),
      sqrt(dot_product(col("embedding"), col("embedding"))).as("norm"))
  }

  /** Incremental index maintenance — the ANN twin of
    * `Dedup.incrementalDedup`'s nightly-ingest shape: a NEW shard is
    * encoded against the FROZEN codebooks (one shuffle-free projection
    * over the shard alone) and unioned with the already-encoded index.
    * The existing codes are never recomputed and the raw corpus is never
    * rescanned — per-shard cost scales with the shard, not the corpus,
    * which is the only affordable maintenance shape at 100 TB. The
    * codebooks must stay frozen: retraining would silently change the
    * meaning of every stored code (the same contract as a real IVFADC
    * deployment, where codebooks are versioned ingest-time constants).
    */
  def appendShard(index: DataFrame, shard: DataFrame, cb: Codebooks): DataFrame =
    index.unionByName(encode(shard, cb))

  /** The query vector, collected driver-side (one row — metadata-sized). */
  private[similarity] def queryVec(emb: DataFrame, queryId: Long): Array[Double] =
    emb.filter(col("vec_id") === queryId).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray

  /** Σ_s LUT[s][code_s] — the approximate dot product of the query with
    * whatever the codes quantize (raw vectors, or residuals in the IVFADC
    * composition): the query's m×ksub lookup table is built ONCE
    * driver-side, then each row costs m `element_at` picks summed.
    */
  private[similarity] def adcDot(q: Array[Double], cb: Codebooks): Column = {
    val lut: IndexedSeq[Array[Double]] = cb.cents.zipWithIndex.map { case (cs, s) =>
      cs.map(c => c.zip(q.slice(s * cb.dsub, (s + 1) * cb.dsub))
        .map { case (a, b) => a * b }.sum).toArray
    }
    lut.indices.map(s =>
      element_at(array_lit(lut(s)), element_at(col("codes"), s + 1) + 1)).reduce(_ + _)
  }

  /** The ADC score column over an encoded table's (codes, norm), normalised
    * to approximate cosine.
    */
  private[similarity] def adcSim(q: Array[Double], cb: Codebooks): Column = {
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    adcDot(q, cb) / (col("norm") * lit(qNorm))
  }

  /** Exact re-score of the ADC survivors: candidate ids broadcast, raw
    * vectors read only for those rows.
    */
  private[similarity] def rerankExact(emb: DataFrame, candIds: DataFrame,
      q: Array[Double], k: Int): DataFrame =
    emb.join(broadcast(candIds.select("vec_id")), "vec_id")
      .select(col("vec_id"), round(cosine_sim(col("embedding"), array_lit(q)), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)

  /** ADC search + exact rerank. The scan side touches only (codes, norm);
    * the raw vectors are read again solely for the `rerank` survivors.
    */
  def topK(emb: DataFrame, cb: Codebooks, queryId: Long, k: Int, rerank: Int,
      encoded: Option[DataFrame] = None): DataFrame = {
    val q = queryVec(emb, queryId)
    val cands = encoded.getOrElse(encode(emb, cb))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), adcSim(q, cb).as("adc_sim"))
      .orderBy(col("adc_sim").desc, col("vec_id"))
      .limit(rerank)
    rerankExact(emb, cands, q, k)
  }
}
