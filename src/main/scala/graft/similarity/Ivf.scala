package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{array_lit, cosine_sim}

/** IVF (inverted-file) ANN: Lloyd's k-means coarse quantizer + probe the
  * nearest `nprobe` cells — the second scale path next to sign-LSH
  * (Similarity). The centroid set is metadata-sized, so training iterations
  * collect only k×dim doubles to the driver (like the reference's coord
  * arrays, never cell data); assignment/search are single codegen'd scans.
  */
object Ivf {

  /** struct(dist, cid) argmin over the centroid list via `least`. */
  private[similarity] def nearestCentroid(v: Column, cents: Seq[Array[Double]]): Column =
    least(cents.zipWithIndex.map { case (c, i) =>
      struct((lit(1.0d) - cosine_sim(v, array_lit(c))).as("d"), lit(i).as("cid"))
    }: _*).getField("cid")

  /** Index build is ingest-time layout work (like bucketing): train once per
    * (dataset, k, iters) per JVM and reuse — queries then measure probe cost,
    * not training. Per-key memoization (computeIfAbsent) instead of a global
    * lock — note computeIfAbsent still bin-locks, so two keys that collide
    * into one bin can serialize; acceptable for a handful of datasets per
    * JVM. Assumes the input files are immutable for the
    * JVM's lifetime (the same assumption every layout step here makes);
    * re-ingesting a path in a resident session requires a new session or an
    * explicit retrain.
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), Seq[Array[Double]]]()
  def trainCached(emb: DataFrame, key: String, k: Int, iters: Int): Seq[Array[Double]] =
    centroidCache.computeIfAbsent((key, k, iters), _ => train(emb, k, iters))

  /** Deterministic k-means: init = first k vectors by vec_id, `iters` Lloyd
    * rounds; each round is one distributed assignment + one aggregation
    * (posexplode → per-(cid, dim) mean), collecting only the k centroids.
    */
  def train(emb: DataFrame, k: Int, iters: Int): Seq[Array[Double]] = {
    var cents: Seq[Array[Double]] = emb.orderBy("vec_id").limit(k)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray).toSeq
    for (_ <- 0 until iters) {
      val assigned = emb.select(col("embedding"),
        nearestCentroid(col("embedding"), cents).as("cid"))
      val means = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cid", "dim").agg(avg(col("v").cast("double")).as("m"))
        .groupBy("cid").agg(map_from_arrays(collect_list("dim"), collect_list("m")).as("dims"))
        .collect()
      val dim = cents.head.length
      val updated = means.map { r =>
        val m = r.getMap[Int, Double](1)
        r.getInt(0) -> Array.tabulate(dim)(d => m.getOrElse(d, 0.0))
      }.toMap
      cents = cents.indices.map(i => updated.getOrElse(i, cents(i)))
    }
    cents
  }

  /** The query's `nprobe` closest coarse cells by cosine distance — driver
    * math over the metadata-sized centroid list (shared by the plain IVF
    * probe and the IVF×PQ composed scan, and by their scan-count locks).
    */
  private[similarity] def probeCells(cents: Seq[Array[Double]], q: Array[Double],
      nprobe: Int): Seq[Int] =
    cents.zipWithIndex.map { case (c, i) =>
      val dot = c.zip(q).map { case (a, b) => a * b }.sum
      val sim = dot / (math.sqrt(c.map(x => x * x).sum) * math.sqrt(q.map(x => x * x).sum))
      (1.0 - sim, i)
    }.sorted.take(nprobe).map(_._2)

  /** (vec_id, embedding, cid) — one shuffle-free codegen projection. */
  def assign(emb: DataFrame, cents: Seq[Array[Double]]): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
      nearestCentroid(col("embedding"), cents).as("cid"))

  /** The assignment table is ingest-time state, like the PQ code tables:
    * persisted clustered by cell so the probe-time `cid` filter prunes
    * cached columnar batches via their min/max stats (on disk, the same
    * filter becomes partition pruning — the probed cells are the only
    * files read). Without this every query would re-run the k-dot-product
    * assignment over the WHOLE corpus.
    */
  def assignCached(emb: DataFrame, key: String, cents: Seq[Array[Double]]): DataFrame =
    graft.PersistedCache(emb.sparkSession, ("ivf-assigned", key, cents.length,
      java.util.Arrays.deepHashCode(cents.map(_.asInstanceOf[AnyRef]).toArray)))(
      assign(emb, cents).repartition(col("cid")))

  /** Search: find the query's `nprobe` closest centroids, scan only vectors
    * assigned to those cells (|data|·nprobe/k of the corpus), exact cosine on
    * the survivors.
    */
  def topK(emb: DataFrame, cents: Seq[Array[Double]], queryId: Long, k: Int,
      nprobe: Int, assigned: Option[DataFrame] = None): DataFrame = {
    val a = assigned.getOrElse(assign(emb, cents))
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe")).head().getSeq[Float](0)
    val probeCids = probeCells(cents, q.map(_.toDouble).toArray, nprobe)
    a.filter(col("cid").isin(probeCids: _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(cosine_sim(col("embedding"), lit(q.toArray)), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Filtered ANN (the vector-DB "metadata filter" path): probe the same
    * `nprobe` cells, then drop candidates failing `pred` BEFORE any scoring
    * dot product runs. The predicate evaluates on a vec_id semi-join
    * against the metadata projection of `emb` — candidate-sized on the
    * probe side, so AQE broadcasts it at fixture scale; in production the
    * assignment table carries the filter columns itself (it is ingest-time
    * state) and the join disappears into the cell-pruned scan. Recall vs
    * the filtered exact scan is locked in SimilaritySpec — filtering after
    * probing means low-selectivity predicates need a higher nprobe, the
    * standard filtered-ANN trade.
    */
  def topKFiltered(emb: DataFrame, cents: Seq[Array[Double]], queryId: Long,
      k: Int, nprobe: Int, pred: org.apache.spark.sql.Column,
      assigned: Option[DataFrame] = None): DataFrame = {
    val a = assigned.getOrElse(assign(emb, cents))
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe")).head().getSeq[Float](0)
    val probeCids = probeCells(cents, q.map(_.toDouble).toArray, nprobe)
    val allowed = emb.filter(pred).select("vec_id")
    a.filter(col("cid").isin(probeCids: _*) && col("vec_id") =!= queryId)
      .join(allowed, Seq("vec_id"), "left_semi")
      .select(col("vec_id"),
        round(cosine_sim(col("embedding"), lit(q.toArray)), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
