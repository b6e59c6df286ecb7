package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables => T}
import graft.functions.VectorFunctions.{cosine_sim, dot_product}

/** Similarity search over embedding columns (north-star op; the reference's
  * nearest lookup `Gddp.scala:25-38` is the 2-D special case of this).
  *
  * Two paths:
  *  - brute-force cosine top-k — a single codegen'd scan + TakeOrderedAndProject
  *    (the exact baseline; at 100 TB it's one full pass, embarrassingly parallel);
  *  - random-hyperplane LSH buckets (Charikar sign-LSH) — signatures are 16
  *    codegen'd dot products per row, search touches only the query's bucket
  *    (~1/2^16 of the data per probe), the standard ANN scale path when a full
  *    scan per query is too expensive.
  */
object Similarity extends QueryModule {

  // 8 planes → 256 buckets: the floor (and the pinned constant the
  // oracle-checked queries use so their DuckDB twins can regenerate the
  // exact plane constants). Production candidate generation derives the
  // plane count from corpus size via `planesFor` — see `embeddingNearDups`.
  val NumPlanes = 8

  /** Plane count for a corpus of n vectors: enough buckets that expected
    * occupancy stays ≤ targetPerBucket, so the in-bucket pair join generates
    * O(n · targetPerBucket) candidates — LINEAR in n — instead of the
    * O(n²/2^planes) a fixed plane count degrades to. Capped at 30 so bucket
    * ids pack into an int.
    */
  def planesFor(n: Long, targetPerBucket: Long = 64L): Int = {
    val buckets = math.max(1L, n / math.max(1L, targetPerBucket))
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, buckets - 1))
    math.min(30, math.max(NumPlanes, bits))
  }

  /** Deterministic pseudo-random Gaussian hyperplanes, dim 64. Each OR-table
    * draws from its own seed (42 + table) so tables are independent.
    */
  private[similarity] def planes(dim: Int = 64, n: Int = NumPlanes,
      seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit i = sign(dot(v, plane_i)), packed into an int. */
  def lshBucket(v: Column, dim: Int = 64, numPlanes: Int = NumPlanes,
      seed: Long = 42L): Column = {
    require(numPlanes <= 30, s"numPlanes $numPlanes exceeds int bucket width")
    planes(dim, numPlanes, seed).zipWithIndex.map { case (p, i) =>
      when(dot_product(v, graft.functions.VectorFunctions.array_lit(p)) > 0d, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** AND-OR amplified candidate pairs: `numTables` independent sign-LSH
    * tables (OR — a pair is a candidate if it collides in ANY table), each
    * ANDing `numPlanes` sign bits. Raising planes keeps candidate volume
    * linear in n; raising tables restores the recall that stricter buckets
    * cost. One shuffle on (table, bucket); the pair set is distinct so
    * verification pays each candidate once.
    */
  def lshCandidates(emb: DataFrame, numPlanes: Int, numTables: Int): DataFrame = {
    val tables = (0 until numTables).map(t =>
      struct(lit(t).as("tbl"),
        lshBucket(col("embedding"), 64, numPlanes, 42L + t).as("bucket")))
    val b = emb.select(col("vec_id"), explode(array(tables: _*)).as("tb"))
      .select(col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"), col("vec_id"))
    val l = b.select(col("tbl"), col("bucket"), col("vec_id").as("id1"))
    val r = b.select(col("tbl"), col("bucket"), col("vec_id").as("id2"))
    l.join(r, Seq("tbl", "bucket")).filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Brute-force cosine top-k against the query vector (vec_id = queryId).
    * `pred` is the metadata pre-filter of filtered vector search: it cuts
    * the scan BEFORE any dot product runs (and, on disk, reaches the
    * parquet scan as a pushed filter) — the exact twin the ANN variants'
    * recall is measured against.
    */
  def cosineTopK(emb: DataFrame, queryId: Long, k: Int,
      pred: Column = lit(true)): DataFrame = {
    val q = emb.filter(col("vec_id") === queryId).select(col("embedding").as("qe"))
    emb.filter(col("vec_id") =!= queryId && pred)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosine_sim(col("embedding"), col("qe")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** ANN top-k: restrict the scan to LSH buckets within Hamming distance 1 of
    * the query's bucket (multi-probe: the query plus its 8 neighbor buckets,
    * ~9/256 of the data). Approximate — recall is asserted against brute force
    * in ScalaTest.
    */
  def cosineTopKLsh(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val withBucket = emb.withColumn("bucket", lshBucket(col("embedding")))
    val q = withBucket.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"), col("bucket").as("qbucket"))
    withBucket.join(broadcast(q),
        bit_count(col("bucket").bitwiseXOR(col("qbucket"))) <= 1)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), round(cosine_sim(col("embedding"), col("qe")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    * 1998): greedily select k results from the top-n relevance candidates,
    * each pick maximizing `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` —
    * the diversification rerank RAG retrieval runs after the ANN stage so
    * near-duplicate passages don't crowd out coverage.
    *
    * Shape: the corpus pays ONE distributed scan (TakeOrdered bounds the
    * candidates to n, exactly like [[qRankFusion]]'s arms), the n² pairwise
    * similarities compute distributed over the bounded candidate set, and
    * only then does the inherently-sequential greedy run driver-side over
    * n rows — the same candidate-bounded collect class as the k-centroid
    * and skyline-summary sites. At 100 TB only the first scan grows.
    *
    * Both relevance and pairwise sims are rounded to 4 decimals BEFORE the
    * greedy: the argmax then compares identical doubles in any engine, which
    * is what makes the recursive-CTE DuckDB twin exact rather than
    * float-fragile.
    */
  def mmrTopK(emb: DataFrame, queryId: Long, n: Int = 50, k: Int = 10,
      lambda: Double = 0.7): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q = emb.filter(col("vec_id") === queryId).select(col("embedding").as("qe"))
    val cand = emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosine_sim(col("embedding"), col("qe")), 4).as("rel"),
        col("embedding"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(n)
    val a = cand.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = cand.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val rels: Map[Long, Double] = cand.select(col("vec_id"), col("rel"))
      .as[(Long, Double)].collect().toMap                  // ≤ n rows
    val sims: Map[(Long, Long), Double] = a.crossJoin(b)
      .filter(col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"), round(cosine_sim(col("ea"), col("eb")), 4).as("s"))
      .as[(Long, Long, Double)].collect()                  // ≤ n² rows
      .map { case (i, j, v) => (i, j) -> v }.toMap
    val picked = scala.collection.mutable.ArrayBuffer[(Int, Long, Double, Double)]()
    val selected = scala.collection.mutable.ArrayBuffer[Long]()
    for (rank <- 1 to math.min(k, rels.size)) {
      // argmax of the MMR objective; ties break on the smaller id (both
      // engines order by score DESC, id ASC)
      val (id, score) = rels.keysIterator
        .filterNot(selected.contains)
        .map { c =>
          val maxS = if (selected.isEmpty) 0d
          else selected.iterator.map(s => sims((c, s))).max
          c -> (lambda * rels(c) - (1 - lambda) * maxS)
        }
        .reduceLeft((x, y) => if (y._2 > x._2 || (y._2 == x._2 && y._1 < x._1)) y else x)
      picked += ((rank, id, rels(id), BigDecimal(score)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      selected += id
    }
    picked.toSeq.toDF("rank", "vec_id", "rel", "mmr").orderBy("rank")
  }

  /** Embedding near-duplicate detection: AND-OR LSH candidates + exact
    * cosine verification — the embedding twin of MinHash banding.
    * `numPlanes = None` (the production default) derives the plane count
    * from the corpus size so candidate volume stays linear in n; the
    * oracle-checked query pins `Some(NumPlanes)`/1 table, which reproduces
    * the deterministic single-table form DuckDB can regenerate.
    */
  def embeddingNearDups(emb: DataFrame, minCos: Double,
      numPlanes: Option[Int] = None, numTables: Int = 2): DataFrame = {
    val p = numPlanes.getOrElse(planesFor(emb.count()))
    val cand = lshCandidates(emb, p, numTables)
    cand
      .join(emb.select(col("vec_id").as("id1"), col("embedding").as("e1")), "id1")
      .join(emb.select(col("vec_id").as("id2"), col("embedding").as("e2")), "id2")
      .select(col("id1"), col("id2"), round(cosine_sim(col("e1"), col("e2")), 4).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Shared tail of both kNN join paths: per-query ranking via the bounded
    * [[graft.functions.TopKByScore]] aggregate, so the shuffle carries k rows
    * per query — NOT the |queries|×|corpus| scored pairs a window-rank
    * formulation would move. Input: (q_id, cand struct(sim, id)).
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("q_id")
      .agg(graft.functions.TopKFunctions.top_k_by_score(col("cand"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("rank", "entry")))
      .select(col("q_id"), col("rank"), col("entry.id").as("vec_id"),
        col("entry.sim").as("sim"))

  private def scoredCand(qe: Column): Column = struct(
    round(cosine_sim(col("embedding"), qe), 4).as("sim"),
    col("vec_id").as("id"))

  /** Batch kNN JOIN, broadcast form: every query vector gets its k nearest
    * corpus neighbors in ONE corpus scan — the cross-dataset shape (dedup a
    * new shard against the corpus, retrieval evaluation). Exact; requires the
    * query set to fit in a broadcast table.
    */
  def knnJoinBroadcast(corpus: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    // excludeSelf fits the self-join kNN queries; CROSS-SET consumers
    // (admission) must keep id collisions — a shard id equal to a corpus id
    // is two different vectors from different namespaces, and excluding the
    // pair would hide an exact duplicate
    rankTopK(
      corpus.join(broadcast(q),
        if (excludeSelf) col("vec_id") =!= col("q_id") else lit(true))
        .select(col("q_id"), scoredCand(col("qe")).as("cand")), k)
  }

  /** Batch kNN JOIN, shuffle form for query sets too large to broadcast:
    * bucket BOTH sides by sign-LSH cell, replicate each query to the cells
    * within Hamming distance `probeHamming` of its own (multiprobe), and
    * equi-join within cell — a plain shuffle join keyed on the cell id, so
    * neither side ever materializes whole on any node. Each (query, corpus)
    * pair meets in at most one probed cell, so nothing is scored twice.
    *
    * With `probeHamming < numPlanes` this is ANN (recall asserted in
    * ScaleSpec); `probeHamming = numPlanes` probes every cell — the exact
    * replicated-fragment join (query side replicated 2^planes ×), which
    * ScaleSpec uses to check the path against the broadcast form bit-for-bit.
    */
  def knnJoinShuffled(corpus: DataFrame, queries: DataFrame, k: Int,
      numPlanes: Int = NumPlanes, probeHamming: Int = 1): DataFrame = {
    require(numPlanes <= 12, s"numPlanes $numPlanes: probe-mask enumeration is 2^planes")
    val masks = (0 until (1 << numPlanes))
      .filter(m => Integer.bitCount(m) <= probeHamming)
    val cb = corpus.withColumn("cell", lshBucket(col("embedding"), 64, numPlanes))
    val qb = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        lshBucket(col("embedding"), 64, numPlanes).as("qcell"))
      .withColumn("cell", explode(array(masks.map(m =>
        col("qcell").bitwiseXOR(lit(m))): _*)))
    rankTopK(
      cb.join(qb.hint("merge"), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), scoredCand(col("qe")).as("cand")), k)
  }

  /** In-memory bytes a broadcast of the query side would take (64-dim vector
    * widened to double + row overhead) — compared against the session's
    * `autoBroadcastJoinThreshold` to pick a path.
    */
  private def estQueryBytes(n: Long): Long = n * (64L * 8 + 64)

  /** Batch kNN JOIN: auto-selects the broadcast form while the query side
    * fits the session broadcast threshold, else the shuffled LSH-cell form
    * (approximate — multiprobe; see [[knnJoinShuffled]]). One count job on
    * the (smaller) query side decides.
    */
  def knnJoin(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val threshold = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    if (threshold >= 0 && estQueryBytes(queries.count()) <= threshold)
      knnJoinBroadcast(corpus, queries, k)
    else knnJoinShuffled(corpus, queries, k)
  }

  /** kNN CLASSIFICATION — majority label among the k nearest corpus
    * neighbors (ties to the smallest label, mirroring the kNN rank
    * tie-break): the label-propagation / weak-annotation member of the
    * similarity family, e.g. propagating quality or topic labels from a
    * small annotated set onto an unlabeled corpus. Cost = the exact
    * broadcast kNN join + a (q, label) vote aggregate; at scale the
    * shuffled/ANN join forms substitute for the probe stage unchanged.
    */
  private def qKnnClassify(s: SparkSession, d: String): DataFrame = {
    val emb = T.embeddings(s, d)
    val queries = emb.filter(col("vec_id") % 50 === 7)
    val corpus = emb.filter(col("vec_id") % 50 =!= 7)
    val nn = knnJoinBroadcast(corpus, queries, k = 10, excludeSelf = false)
    val votes = nn.join(emb.select(col("vec_id"), col("label")), "vec_id")
      .groupBy("q_id", "label").agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("votes").desc, col("label"))
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(queries.select(col("vec_id").as("q_id"),
        col("label").as("true_label")), "q_id")
      .select(col("q_id"), col("true_label"),
        col("label").as("pred_label"), col("votes"))
      .orderBy("q_id")
  }

  /** CALIBRATION of the kNN classifier — the reliability table behind an
    * expected-calibration-error readout: group predictions by the winning
    * vote count (the confidence is votes/k, discrete, so the bins are
    * exact integers), report per-bin population, hits, and the
    * |accuracy − confidence| gap. Everything is integer counts until the
    * one terminal rounded division; the aggregate is k-row-sized.
    */
  private def qKnnCalibration(s: SparkSession, d: String): DataFrame =
    qKnnClassify(s, d)
      .withColumn("correct",
        when(col("pred_label") === col("true_label"), 1L).otherwise(0L))
      .groupBy(col("votes").as("conf_votes"))
      .agg(count(lit(1)).as("n"), sum("correct").as("n_correct"))
      .withColumn("gap", round(abs(
        col("n_correct").cast("double") / col("n") -
          col("conf_votes").cast("double") / 10), 4))
      .orderBy("conf_votes")

  private def qEmbedKnn(s: SparkSession, d: String): DataFrame = {
    val emb = T.embeddings(s, d)
    knnJoin(emb, emb.filter(col("vec_id") % 100 === 0), k = 5)
      .orderBy("q_id", "rank")
  }

  /** Semantic shard ADMISSION — the embedding-space member of the admission
    * family ([[graft.dedup.Dedup.incrementalDedupAgainstIndex]] covers
    * near-identical text, `incrementalContainmentAdmit` covers subset text;
    * this covers PARAPHRASES, which share no shingles at all): each new
    * vector's single nearest corpus neighbor decides — best cosine ≥ tau is
    * a semantic duplicate. One VERDICT row per new vector (best neighbor,
    * similarity, admitted flag) so the decision is auditable downstream;
    * cost is the k=1 EXACT broadcast kNN join (shard-linear: one corpus
    * scan per shard; id collisions across the two namespaces are NOT
    * excluded, and a new vector with no corpus candidate — bootstrap
    * against an empty corpus — gets an admitted verdict with null
    * neighbor, never a silently dropped row). For a shard too large to
    * broadcast, run [[knnJoinShuffled]] with full multiprobe and apply the
    * same verdict projection — the default multiprobe setting is ANN and
    * could admit a paraphrase whose neighbor sits outside the probed
    * cells, the exact class this gate rejects.
    */
  def embedAdmit(corpus: DataFrame, newVecs: DataFrame, tau: Double): DataFrame = {
    val best = knnJoinBroadcast(corpus, newVecs, k = 1, excludeSelf = false)
      .select(col("q_id").as("vec_id"), col("vec_id").as("best_corp"),
        col("sim").as("best_cos"))
    newVecs.select(col("vec_id")).join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("best_corp"), col("best_cos"),
        when(col("best_cos") >= tau, 0).otherwise(1).as("admitted"))
  }

  private def qEmbedAdmit(s: SparkSession, d: String): DataFrame = {
    val emb = T.embeddings(s, d)
    embedAdmit(emb.filter(col("vec_id") % 10 =!= 0),
        emb.filter(col("vec_id") % 10 === 0), tau = 0.9)
      .orderBy("vec_id")
  }

  /** The shuffle-form kNN join in its exact configuration (full multiprobe
    * over 3 planes = every cell probed) — same results as the broadcast form,
    * so it shares `q_embed_knn`'s window-rank oracle while exercising the
    * cell-bucketed shuffle join end-to-end.
    */
  private def qEmbedKnnShuffle(s: SparkSession, d: String): DataFrame = {
    val emb = T.embeddings(s, d)
    knnJoinShuffled(emb, emb.filter(col("vec_id") % 100 === 0), k = 5,
        numPlanes = 3, probeHamming = 3)
      .orderBy("q_id", "rank")
  }

  private def qCosineTopk(s: SparkSession, d: String): DataFrame =
    cosineTopK(T.embeddings(s, d), queryId = 1L, k = 20)

  /** Filtered vector search, exact arm (full oracle): brute-force cosine
    * top-k restricted to `label % 3 = 0` vectors — the predicate prunes
    * the scan before any dot product.
    */
  private def qCosineTopkFiltered(s: SparkSession, d: String): DataFrame =
    cosineTopK(T.embeddings(s, d), queryId = 1L, k = 20,
      pred = col("label") % 3 === 0)

  /** Filtered vector search, ANN arm (no oracle — approximate): IVF cell
    * probe then the same metadata predicate before scoring. nprobe is 6
    * (vs the unfiltered query's 2) — filtering KEEPS 1/3 of each cell, so
    * the filtered top-20 reaches ~3× deeper into the unfiltered ranking
    * and needs proportionally more cells: the standard selectivity⇄nprobe
    * trade of filtered ANN. SimilaritySpec locks recall ≥ 0.9 on a
    * clustered corpus (the geometry IVF is designed for) and the graceful
    * ≥ 0.5 floor on this uniform fixture.
    */
  private def qCosineIvfFiltered(s: SparkSession, d: String): DataFrame = {
    val cents = prepareIvfIndex(s, d)
    Ivf.topKFiltered(T.embeddings(s, d), cents, queryId = 1L, k = 20,
      nprobe = 6, pred = col("label") % 3 === 0,
      assigned = Some(Ivf.assignCached(T.embeddings(s, d), d, cents)))
  }

  /** Hybrid retrieval via reciprocal-rank fusion (RRF): a lexical arm
    * (query-term frequency over `documents`) and a vector arm (exact cosine
    * against the query embedding) each produce a bounded top-100 candidate
    * list; candidates fuse as Σ 1/(60+rank), missing arms contributing 0.
    * Scale shape: each arm is one scan + TakeOrdered (no global sort ever
    * materializes), the rank windows run over the BOUNDED candidate lists
    * (100 rows — a driver-sized single partition by construction, not the
    * corpus), and the fusion join is candidate×candidate sized. At 100 TB
    * the arms swap for their indexed forms (an inverted index / the IVF-PQ
    * scan) — the fusion algebra is arm-agnostic and stays this cheap.
    */
  private def qRankFusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = 100
    val lexTop = T.documents(s, d)
      .select(col("doc_id"),
        size(expr("filter(split(text, ' '), t -> t = 'spark' OR t = 'window')"))
          .as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id")).limit(n)
      .withColumn("r_lex",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
    val vecTop = cosineTopK(T.embeddings(s, d), queryId = 1L, k = n)
      .select(col("vec_id").as("doc_id"), col("sim"))
      .withColumn("r_vec",
        row_number().over(Window.orderBy(col("sim").desc, col("doc_id"))))
    lexTop.select("doc_id", "r_lex")
      .join(vecTop.select("doc_id", "r_vec"), Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0)), 6))
      .select(col("doc_id"), col("r_lex"), col("r_vec"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  private def qCosineLsh(s: SparkSession, d: String): DataFrame =
    cosineTopKLsh(T.embeddings(s, d), queryId = 1L, k = 20)

  /** DuckDB twin of `lshBucket` over a double-list column `e`, generated from
    * the SAME seed-42 plane constants (Double.toString round-trips exactly, and
    * both engines fold list_dot_product/DotProduct sequentially in double) —
    * the buckets, and therefore the LSH candidate sets, are deterministic and
    * oracle-checkable, not just "approximate".
    */
  private def bucketSql(col: String): String =
    planes().zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product($col, [${p.mkString(", ")}]) > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic duplicate
    * pruning at CLUSTER scope — every embedding is assigned to its nearest
    * of k centroids (one broadcast pass over the corpus), duplicates are
    * then searched only WITHIN a cluster: any pair with cosine ≥ τ drops
    * the higher vec_id. The clustering is exactly what makes the quadratic
    * pairwise step tractable at 100 TB: k grows with the corpus so cluster
    * sizes stay bounded, and the self-join shuffles on the cluster id
    * alone (no global n² pass). Deterministic twin of the paper's k-means:
    * centroids are the k lowest vec_ids, assignment ties break to the
    * smaller centroid, and similarities round to 4 decimals before any
    * comparison — so the DuckDB oracle matches bit-for-bit. The declared
    * result is the per-cluster keep/drop census.
    */
  private def qSemDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 8
    val tau = 0.3
    val emb = T.embeddings(s, d).select("vec_id", "embedding")
    val cents = emb.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cid"))
    val assigned = emb.crossJoin(broadcast(cents))
      .withColumn("sim", round(cosine_sim(col("embedding"), col("ce")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "embedding", "cid")
    val drops = assigned.select(col("cid"), col("vec_id").as("id1"),
        col("embedding").as("e1"))
      .join(assigned.select(col("cid"), col("vec_id").as("id2"),
        col("embedding").as("e2")), Seq("cid"))
      .filter(col("id1") < col("id2") &&
        round(cosine_sim(col("e1"), col("e2")), 4) >= tau)
      .select(col("id2").as("drop_id")).distinct()
    assigned.join(drops, assigned("vec_id") === drops("drop_id"), "left")
      .groupBy(col("cid").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("drop_id").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("drop_id").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
      .orderBy("cluster")
  }

  /** Declared as "top in-bucket candidate pairs" (threshold 0 + limit) so the
    * result is non-empty on the synthetic corpus, which has no true near-dups
    * at any sane threshold; the thresholded form is what a pipeline would run.
    */
  private def qEmbedNearDup(s: SparkSession, d: String): DataFrame =
    embeddingNearDups(T.embeddings(s, d), minCos = 0.0,
        numPlanes = Some(NumPlanes), numTables = 1)
      .orderBy(col("cos").desc, col("id1"), col("id2")).limit(50)

  /** Semantic dedup END TO END: the embedding-space twin of
    * `q_dedup_cluster_lsh` — sign-LSH in-bucket pairs thresholded on EXACT
    * cosine become edges, connected components contract them, and every
    * vector gets a cluster label (its component's min vec_id = the kept
    * representative; singletons keep themselves). Oracle-checkable because
    * the edge set is exact-verified (seed-42 hyperplanes reproduced in SQL,
    * same rounding) and the CC is a recursive CTE. Scale shape: candidate
    * join linear in bucket occupancy, CC cost linear in verified pairs —
    * the components machinery (driver cutover vs distributed propagation)
    * is shared with the text pipeline.
    */
  private def qEmbedDedupCluster(s: SparkSession, d: String): DataFrame = {
    val emb = T.embeddings(s, d)
    val edges = embeddingNearDups(emb, minCos = 0.2,
        numPlanes = Some(NumPlanes), numTables = 1)
      .select(col("id1").as("doc1"), col("id2").as("doc2"))
    val comps = graft.dedup.Dedup.connectedComponents(edges)
    emb.select(col("vec_id"))
      .join(comps, emb("vec_id") === comps("id"), "left")
      .select(col("vec_id"), coalesce(col("component"), col("vec_id")).as("cluster"))
      .orderBy("vec_id")
  }

  /** Semantic clustering: assign every vector to its nearest of k fixed
    * centroids — the corpus-scale ASSIGN step of seeded k-means (the
    * centroid refine loop is k×dim-sized, metadata next to the corpus).
    * The centroid table collapses to ONE broadcast row holding a sorted
    * array of (c_id, vector) structs, and the argmax runs as an in-row
    * `aggregate` fold — a pure scan: no join, no groupBy, zero shuffle at
    * any corpus size. Strict `>` keeps the first (lowest c_id) on ties.
    */
  def centroidAssign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids
      .agg(sort_array(collect_list(
        struct(col("vec_id").as("c_id"), col("embedding").as("ce")))).as("cents"))
    val init = struct(lit(-2.0).as("sim"), lit(-1L).as("cid"))
    val best = aggregate(col("cents"), init, (acc, c) => {
      val s = cosine_sim(col("embedding"), c.getField("ce"))
      when(s > acc.getField("sim"),
        struct(s.as("sim"), c.getField("c_id").as("cid"))).otherwise(acc)
    })
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), best.as("best"))
      .select(col("vec_id"), col("best.cid").as("cluster"),
        round(col("best.sim"), 4).as("sim"))
  }

  private def qEmbedCentroid(s: SparkSession, d: String): DataFrame = {
    val emb = T.embeddings(s, d)
    centroidAssign(emb, emb.filter(col("vec_id") < 8)).orderBy("vec_id")
  }

  /** Symmetric int8 quantization of the embedding column — the storage/
    * bandwidth step before ANN serving (4× smaller vectors, dot products in
    * integer). Per-vector scale = max|x| / 127; pure per-row array math
    * (`aggregate` fold for the max, `transform` for the quantized codes),
    * so the whole op is a shuffle-free scan. round() before the int cast
    * keeps Spark (truncating cast) and DuckDB (rounding cast) identical.
    * The codes come out as one comma-joined string column (not a raw
    * array<int>): the driver's comparator sorts output columns in pandas,
    * which cannot hash numpy arrays — scalar columns keep the row hashable
    * while preserving every code byte-for-byte.
    */
  private def qEmbedQuantize(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .select(col("vec_id"), col("e"),
        greatest(aggregate(col("e"), lit(0.0), (a, x) => greatest(a, abs(x))),
          lit(1e-12)).as("maxabs"))
      .select(col("vec_id"),
        round(col("maxabs") / 127.0, 6).as("scale"),
        array_join(transform(col("e"),
          x => round(x * lit(127.0) / col("maxabs"), 0).cast("int").cast("string")),
          ",").as("q"))
      .orderBy("vec_id")

  /** IVF path (no oracle — approximate): k-means coarse cells, probe 2.
    * The quantizer comes from the per-JVM index cache (`Ivf.trainCached`) —
    * Bench warms it so the query measures the probe, not index build. The
    * query and the warm-up share ONE train call (same constants), so tuning
    * one cannot silently defeat the other.
    */
  val IvfK = 16; val IvfIters = 2

  def prepareIvfIndex(s: SparkSession, d: String): Seq[Array[Double]] =
    Ivf.trainCached(T.embeddings(s, d), d, IvfK, IvfIters)

  private def qCosineIvf(s: SparkSession, d: String): DataFrame = {
    val cents = prepareIvfIndex(s, d)
    Ivf.topK(T.embeddings(s, d), cents, queryId = 1L, k = 20, nprobe = 2,
      assigned = Some(Ivf.assignCached(T.embeddings(s, d), d, cents)))
  }

  /** PQ path (no oracle — approximate): 16 subspaces × 16 codes compress
    * each 64-float vector to 16 nibble codes + a norm (~21× smaller); ADC
    * scan + exact rerank of the top 100. Codebooks come from the per-JVM
    * index cache (Bench warms it), same contract as the IVF quantizer above.
    */
  val PqM = 16; val PqKsub = 16; val PqIters = 3; val PqRerank = 100

  def preparePqIndex(s: SparkSession, d: String): Pq.Codebooks = {
    val cb = Pq.trainCached(T.embeddings(s, d), d, PqM, PqKsub, PqIters)
    Pq.encodeCached(T.embeddings(s, d), d, cb, PqIters)
    cb
  }

  private def qCosinePq(s: SparkSession, d: String): DataFrame = {
    val cb = preparePqIndex(s, d)
    Pq.topK(T.embeddings(s, d), cb, queryId = 1L, k = 20, rerank = PqRerank,
      encoded = Some(Pq.encodeCached(T.embeddings(s, d), d, cb, PqIters)))
  }

  /** IVF×PQ composed path (no oracle — approximate): the coarse quantizer
    * prunes to `IvfPqNprobe` of `IvfK` cells, the ADC scan scores only those
    * cells' codes, exact rerank on the survivors. Reuses the SAME cached IVF
    * centroids and PQ codebooks as the standalone paths, so the three
    * queries stay comparable; only the composed (vec_id, cid, codes, norm)
    * table is built extra (ingest-time, Bench-warmed).
    */
  val IvfPqNprobe = 4

  def prepareIvfPqIndex(s: SparkSession, d: String): (Seq[Array[Double]], Pq.Codebooks) = {
    val cents = prepareIvfIndex(s, d)
    val cb = Pq.trainCached(T.embeddings(s, d), d, PqM, PqKsub, PqIters)
    IvfPq.encodeCached(T.embeddings(s, d), d, cents, cb)
    (cents, cb)
  }

  private def qCosineIvfPq(s: SparkSession, d: String): DataFrame = {
    val (cents, cb) = prepareIvfPqIndex(s, d)
    IvfPq.topK(T.embeddings(s, d), cents, cb, queryId = 1L, k = 20,
      nprobe = IvfPqNprobe, rerank = PqRerank,
      encoded = Some(IvfPq.encodeCached(T.embeddings(s, d), d, cents, cb)))
  }

  /** IVFADC-proper variant (no oracle — approximate): the PQ codebooks are
    * trained on and encode RESIDUALS x − c(cell) instead of raw vectors —
    * the coarse quantizer absorbs the between-cell spread, so the same
    * 16-nibble budget quantizes a much tighter distribution. Search adds
    * the per-cell q·c constant to the residual lookup-table sum.
    * SimilaritySpec locks recall ≥ the shared-codebook composed path on
    * the same corpus.
    */
  def prepareIvfPqResIndex(s: SparkSession, d: String): (Seq[Array[Double]], Pq.Codebooks) = {
    val cents = prepareIvfIndex(s, d)
    val cbr = IvfPq.trainResidualCached(T.embeddings(s, d), d, cents, PqM, PqKsub, PqIters)
    IvfPq.encodeResidualCached(T.embeddings(s, d), d, cents, cbr)
    (cents, cbr)
  }

  private def qCosineIvfPqRes(s: SparkSession, d: String): DataFrame = {
    val (cents, cbr) = prepareIvfPqResIndex(s, d)
    IvfPq.topKResidual(T.embeddings(s, d), cents, cbr, queryId = 1L, k = 20,
      nprobe = IvfPqNprobe, rerank = PqRerank,
      encoded = Some(IvfPq.encodeResidualCached(T.embeddings(s, d), d, cents, cbr)))
  }

  private def qMmr(s: SparkSession, d: String): DataFrame =
    mmrTopK(T.embeddings(s, d), queryId = 1L)

  /** Lloyd's k-means over the embedding corpus — the clustering step the
    * SemDeDup / DataComp-style pipelines run BEFORE balancing or pruning —
    * made deterministic so DuckDB mirrors it: init = the k lowest vec_ids,
    * every assignment score rounded to 4 decimals before the argmax (ties
    * to the smaller centroid id), exactly one refinement pass. The score
    * is argmin squared distance in argmax form (e·c − c·c/2, the e·e term
    * is rank-constant). 100 TB shape: both assignment passes are a corpus
    * × k BROADCAST product (k centroids are metadata-sized), the mean step
    * is one posexplode aggregate whose map-side partials collapse to k ×
    * dims groups, and the driver holds only the k × dims centroid matrix —
    * never rows.
    */
  private val KmeansK = 5
  /** Refined (pass-1) centroids per (app, dataset) — k × dims doubles of
    * driver-held metadata, memoized so the three clustering queries
    * (census, balanced sample, keywords) pay the pass-1 aggregate once.
    */
  private val kmCentroids = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Seq[(Long, Seq[Double], Double)]]()
  private def kmeansAssign(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val emb = T.embeddings(s, d).select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("e"))
    val w = Window.partitionBy("vec_id").orderBy(col("score").desc, col("cid"))
    val cents = kmCentroids.computeIfAbsent((s.sparkContext.applicationId, d),
      _ => {
        val init = emb.orderBy("vec_id").limit(KmeansK)
          .select(col("vec_id").as("cid"), col("e").as("ce"))
        val a1 = emb.crossJoin(broadcast(init))
          .withColumn("score", round(
            dot_product(col("e"), col("ce")) -
              dot_product(col("ce"), col("ce")) / 2, 4))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select("vec_id", "e", "cid")
        // refined centroids: element-wise means, k×dims driver metadata
        a1.select(col("cid"), posexplode(col("e")).as(Seq("d", "v")))
          .groupBy("cid", "d").agg(avg("v").as("cv"))
          .collect().groupBy(_.getLong(0))
          .map { case (cid, rows) =>
            val ce = rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
            (cid, ce, ce.map(x => x * x).sum)
          }.toSeq.sortBy(_._1)
      })
    emb.crossJoin(broadcast(cents.toDF("cid", "ce", "cc")))
      .withColumn("score",
        round(dot_product(col("e"), col("ce")) - col("cc") / 2, 4))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("vec_id", "cid")
  }

  private def qKmeans(s: SparkSession, d: String): DataFrame =
    kmeansAssign(s, d)
      .groupBy(col("cid").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"), sum("vec_id").as("id_sum"))
      .orderBy("cluster")

  /** Cluster-BALANCED downsample (the DataComp mixing move): every cluster
    * keeps exactly min-cluster-size members, chosen by a deterministic
    * integer hash rank so both engines draw the identical "sample". No
    * global window: sizes are a k-row aggregate, the cutoff a 1-row
    * broadcast.
    */
  private def qKmeansBalanced(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val asg = kmeansAssign(s, d)
    val mRow = asg.groupBy("cid").agg(count(lit(1)).as("n"))
      .agg(min("n").as("m"))
    val wS = Window.partitionBy("cid").orderBy(col("h"), col("vec_id"))
    asg.withColumn("h", col("vec_id") * lit(2654435761L) % 999983)
      .withColumn("rn", row_number().over(wS))
      .crossJoin(broadcast(mRow))
      .filter(col("rn") <= col("m"))
      .groupBy(col("cid").as("cluster"))
      .agg(count(lit(1)).as("n_sampled"), sum("vec_id").as("id_sum"))
      .orderBy("cluster")
  }

  /** Cluster LABELING — the step after clustering in a curation pipeline:
    * each k-means cluster gets its top TF-IDF terms (what IS this cluster
    * about?), joining the embedding-space assignment onto the text corpus
    * by id. IDF is cluster-scoped (ln(1 + k / #clusters-containing-term)),
    * so corpus-wide boilerplate ranks low. Scale shape: the tokens×assign
    * join shuffles on the doc key; the tf rollup collapses map-side to
    * k × vocab; the rank window runs over k groups of vocab size.
    */
  private def qClusterKeywords(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val asg = kmeansAssign(s, d).withColumnRenamed("vec_id", "doc_id")
    val toks = T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val tf = toks.join(asg, "doc_id")
      .groupBy("cid", "token").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("cid")
      .orderBy(col("score").desc, col("token"))
    // tf rows are unique per (cid, token), so clusters-containing-term is a
    // plain count window over token — no separate countDistinct aggregate
    // joined back (which re-ran the tokens x assignment join a second time)
    tf.withColumn("cdf", count(lit(1)).over(Window.partitionBy("token")))
      .withColumn("score",
        round(col("tf") * log(lit(1.0) + lit(KmeansK.toDouble) / col("cdf")), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("cid").as("cluster"), col("rnk"), col("token"), col("score"))
      .orderBy("cluster", "rnk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk" -> qCosineTopk,
    "q_cosine_topk_filtered" -> qCosineTopkFiltered,
    "q_cosine_ivf_filtered" -> qCosineIvfFiltered,
    "q_mmr" -> qMmr,
    "q_rank_fusion" -> qRankFusion,
    "q_cosine_lsh" -> qCosineLsh,
    "q_cosine_ivf" -> qCosineIvf,
    "q_cosine_pq" -> qCosinePq,
    "q_cosine_ivfpq" -> qCosineIvfPq,
    "q_cosine_ivfpq_res" -> qCosineIvfPqRes,
    "q_embed_neardup" -> qEmbedNearDup,
    "q_semdedup" -> qSemDedup,
    "q_kmeans" -> qKmeans,
    "q_kmeans_balanced" -> qKmeansBalanced,
    "q_cluster_keywords" -> qClusterKeywords,
    "q_embed_dedup_cluster" -> qEmbedDedupCluster,
    "q_embed_knn" -> qEmbedKnn,
    "q_embed_knn_shuffle" -> qEmbedKnnShuffle,
    "q_knn_classify" -> qKnnClassify,
    "q_knn_calibration" -> qKnnCalibration,
    "q_embed_admit" -> qEmbedAdmit,
    "q_embed_centroid" -> qEmbedCentroid,
    "q_embed_quantize" -> qEmbedQuantize
  )

  // window-rank twin of the bounded top-k aggregate (identical results:
  // both order by sim DESC then id ASC); the full-probe shuffle form is
  // exact, so it shares this oracle verbatim
  private val knnOracleSql: String =
    """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, ev AS qe FROM e WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT q.q_id, e.vec_id,
        |    round(list_dot_product(e.ev, q.qe)
        |          / (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(q.qe, q.qe))), 4) AS sim
        |  FROM e, q WHERE e.vec_id <> q.q_id)
        |SELECT q_id, CAST(rnk AS INT) AS rank, vec_id, sim FROM (
        |  SELECT q_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) - 1 AS rnk
        |  FROM scored)
        |WHERE rnk < 5 ORDER BY q_id, rank""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // argmax twin: row_number ties (equal sim) fall to the lowest c_id,
    // matching the fold's strict-> first-wins over the c_id-sorted array
    "q_embed_centroid" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings),
        |c AS (SELECT vec_id AS c_id, ev AS ce FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.c_id,
        |    list_dot_product(e.ev, c.ce)
        |      / (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(c.ce, c.ce))) AS s
        |  FROM e CROSS JOIN c),
        |best AS (
        |  SELECT vec_id, c_id, s,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c_id) AS rn
        |  FROM scored)
        |SELECT vec_id, c_id AS cluster, round(s, 4) AS sim
        |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "q_embed_knn" -> knnOracleSql,
    "q_embed_knn_shuffle" -> knnOracleSql,
    // same rank tie-break as the kNN oracle; vote ties fall to the
    // smallest label, matching the window's (votes DESC, label) order
    "q_knn_classify" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS true_label, ev AS qe
        |      FROM e WHERE vec_id % 50 = 7),
        |c AS (SELECT vec_id, label, ev FROM e WHERE vec_id % 50 <> 7),
        |scored AS (
        |  SELECT q.q_id, q.true_label, c.vec_id, c.label,
        |    round(list_dot_product(c.ev, q.qe)
        |      / (sqrt(list_dot_product(c.ev, c.ev))
        |         * sqrt(list_dot_product(q.qe, q.qe))), 4) AS sim
        |  FROM c, q),
        |top AS (SELECT * FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY sim DESC, vec_id) AS rk FROM scored) WHERE rk <= 10),
        |votes AS (
        |  SELECT q_id, true_label, label, count(*) AS votes
        |  FROM top GROUP BY 1, 2, 3)
        |SELECT q_id, true_label, label AS pred_label, votes FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY votes DESC, label) AS rn FROM votes)
        |WHERE rn = 1 ORDER BY q_id""".stripMargin,
    // the classify chain rolled into the reliability table: integer bins
    // (votes of 10), one terminal rounded division
    "q_knn_calibration" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS true_label, ev AS qe
        |      FROM e WHERE vec_id % 50 = 7),
        |c AS (SELECT vec_id, label, ev FROM e WHERE vec_id % 50 <> 7),
        |scored AS (
        |  SELECT q.q_id, q.true_label, c.vec_id, c.label,
        |    round(list_dot_product(c.ev, q.qe)
        |      / (sqrt(list_dot_product(c.ev, c.ev))
        |         * sqrt(list_dot_product(q.qe, q.qe))), 4) AS sim
        |  FROM c, q),
        |top AS (SELECT * FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY sim DESC, vec_id) AS rk FROM scored) WHERE rk <= 10),
        |votes AS (
        |  SELECT q_id, true_label, label, count(*) AS votes
        |  FROM top GROUP BY 1, 2, 3),
        |pred AS (
        |  SELECT q_id, true_label, label AS pred_label, votes FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY votes DESC, label) AS rn FROM votes)
        |  WHERE rn = 1),
        |bins AS (
        |  SELECT votes AS conf_votes, count(*) AS n,
        |    CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_correct
        |  FROM pred GROUP BY 1)
        |SELECT conf_votes, n, n_correct,
        |  round(abs(CAST(n_correct AS DOUBLE) / n
        |    - CAST(conf_votes AS DOUBLE) / 10), 4) AS gap
        |FROM bins ORDER BY conf_votes""".stripMargin,
    // semantic admission verdicts: best corpus neighbor per new vector
    // (same rank tie-break as the kNN oracle), admitted iff best < 0.9
    "q_embed_admit" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, ev AS qe FROM e WHERE vec_id % 10 = 0),
        |c AS (SELECT vec_id, ev FROM e WHERE vec_id % 10 <> 0),
        |scored AS (
        |  SELECT q.q_id, c.vec_id,
        |    round(list_dot_product(c.ev, q.qe)
        |          / (sqrt(list_dot_product(c.ev, c.ev)) * sqrt(list_dot_product(q.qe, q.qe))), 4) AS sim
        |  FROM c, q),
        |best AS (
        |  SELECT q_id, vec_id, sim FROM (
        |    SELECT q_id, vec_id, sim,
        |      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
        |    FROM scored)
        |  WHERE rnk = 1)
        |SELECT q_id AS vec_id, vec_id AS best_corp, sim AS best_cos,
        |  CAST(CASE WHEN sim >= 0.9 THEN 0 ELSE 1 END AS INT) AS admitted
        |FROM best ORDER BY vec_id""".stripMargin,
    "q_embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, ev,
        |    greatest(list_aggregate(list_transform(ev, x -> abs(x)), 'max'),
        |      1e-12) AS maxabs
        |  FROM e)
        |SELECT vec_id, round(maxabs / 127.0, 6) AS scale,
        |  array_to_string(list_transform(ev,
        |    x -> CAST(CAST(round(x * 127.0 / maxabs) AS INT) AS VARCHAR)), ',') AS q
        |FROM m ORDER BY vec_id""".stripMargin,
    // mirrors CosineSimilarity exactly: per-element double widening, sequential
    // folds, dot/(sqrt(na)*sqrt(nb))
    "q_rank_fusion" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings),
        |q AS (SELECT ev AS qe FROM e WHERE vec_id = 1),
        |vec AS (
        |  SELECT vec_id AS doc_id,
        |    round(list_dot_product(ev, qe)
        |          / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qe, qe))), 4) AS sim
        |  FROM e, q WHERE vec_id <> 1),
        |vtop AS (SELECT doc_id, sim FROM vec ORDER BY sim DESC, doc_id LIMIT 100),
        |vr AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS INT) AS r_vec
        |  FROM vtop),
        |lex AS (
        |  SELECT doc_id, CAST(len(list_filter(string_split(text, ' '),
        |    t -> t = 'spark' OR t = 'window')) AS INT) AS score
        |  FROM documents),
        |ltop AS (SELECT doc_id, score FROM lex WHERE score > 0
        |  ORDER BY score DESC, doc_id LIMIT 100),
        |lr AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS r_lex
        |  FROM ltop)
        |SELECT COALESCE(lr.doc_id, vr.doc_id) AS doc_id, r_lex, r_vec,
        |  round(COALESCE(CAST(1 AS DOUBLE) / (60 + r_lex), 0)
        |      + COALESCE(CAST(1 AS DOUBLE) / (60 + r_vec), 0), 6) AS rrf
        |FROM lr FULL OUTER JOIN vr ON lr.doc_id = vr.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    // the greedy argmax runs over 4-decimal-rounded doubles in BOTH engines,
    // so selection is order-deterministic; state (the selected-id list) rides
    // the recursive CTE as a DuckDB LIST
    "q_mmr" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |      FROM embeddings),
        |q AS (SELECT e AS qe FROM e WHERE vec_id = 1),
        |cand AS (
        |  SELECT vec_id, round(list_dot_product(e, qe)
        |      / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))), 4) AS rel, e
        |  FROM e, q WHERE vec_id <> 1
        |  ORDER BY rel DESC, vec_id LIMIT 50),
        |p AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib,
        |    round(list_dot_product(a.e, b.e)
        |      / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 4) AS s
        |  FROM cand a, cand b WHERE a.vec_id <> b.vec_id),
        |sel AS (
        |  SELECT 1 AS rank,
        |    first(vec_id ORDER BY rel DESC, vec_id) AS vec_id,
        |    first(round(0.7 * rel, 4) ORDER BY rel DESC, vec_id) AS mmr,
        |    [first(vec_id ORDER BY rel DESC, vec_id)] AS ids
        |  FROM cand
        |  UNION ALL
        |  SELECT rank + 1, pick.vec_id, pick.mmr, list_append(ids, pick.vec_id)
        |  FROM sel, LATERAL (
        |    SELECT c.vec_id,
        |      round(0.7 * c.rel - 0.3 * (SELECT max(p.s) FROM p
        |        WHERE p.ia = c.vec_id AND list_contains(sel.ids, p.ib)), 4) AS mmr
        |    FROM cand c
        |    WHERE NOT list_contains(sel.ids, c.vec_id)
        |    ORDER BY 0.7 * c.rel - 0.3 * (SELECT max(p.s) FROM p
        |        WHERE p.ia = c.vec_id AND list_contains(sel.ids, p.ib)) DESC, c.vec_id
        |    LIMIT 1) pick
        |  WHERE rank < 10)
        |SELECT s.rank, s.vec_id, c.rel, s.mmr
        |FROM sel s JOIN cand c USING (vec_id) ORDER BY s.rank""".stripMargin,
    // filtered-search twin: the exact arm's predicate lands in the inner
    // scan, mirroring the Spark-side pre-score filter
    "q_cosine_topk_filtered" ->
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
        |  FROM embeddings WHERE vec_id = 1)
        |SELECT vec_id,
        |  round(list_dot_product(e, qe)
        |        / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))), 4) AS sim
        |FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |      FROM embeddings WHERE vec_id <> 1 AND label % 3 = 0), q
        |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin,
    "q_cosine_topk" ->
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
        |  FROM embeddings WHERE vec_id = 1)
        |SELECT vec_id,
        |  round(list_dot_product(e, qe)
        |        / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))), 4) AS sim
        |FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |      FROM embeddings WHERE vec_id <> 1), q
        |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin,
    "q_cosine_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, e, ${bucketSql("e")} AS bucket
         |  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |        FROM embeddings)),
         |q AS (SELECT e AS qe, bucket AS qbucket FROM b WHERE vec_id = 1)
         |SELECT vec_id,
         |  round(list_dot_product(e, qe)
         |        / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))), 4) AS sim
         |FROM b, q
         |WHERE bit_count(CAST(xor(bucket, qbucket) AS INTEGER)) <= 1 AND vec_id <> 1
         |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin,
    // same seed-42 bucket + exact-cosine edge set as the Spark side, then
    // min-reachable-id components as a recursive CTE (q_dedup_cluster shape)
    "q_embed_dedup_cluster" ->
      s"""WITH RECURSIVE bk AS (
         |  SELECT vec_id, e, ${bucketSql("e")} AS bucket
         |  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |        FROM embeddings)),
         |pairs AS (
         |  SELECT l.vec_id AS src, r.vec_id AS dst
         |  FROM bk l JOIN bk r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
         |  WHERE round(list_dot_product(l.e, r.e)
         |        / (sqrt(list_dot_product(l.e, l.e)) * sqrt(list_dot_product(r.e, r.e))), 4) >= 0.2),
         |edges AS (
         |  SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
         |cc AS (
         |  SELECT vec_id AS id, vec_id AS comp FROM bk
         |  UNION
         |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON e.src = cc.id)
         |SELECT id AS vec_id, min(comp) AS cluster
         |FROM cc GROUP BY id ORDER BY vec_id""".stripMargin,
    // same deterministic recipe: k = 8 lowest-id centroids, cosine rounded
    // to 4 decimals before every comparison, ties to the smaller centroid
    "q_semdedup" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, e AS ce FROM e ORDER BY vec_id LIMIT 8),
        |a AS (
        |  SELECT vec_id, e, cid, row_number() OVER (
        |    PARTITION BY vec_id
        |    ORDER BY round(list_dot_product(e, ce)
        |      / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(ce, ce))), 4) DESC,
        |      cid) AS rn
        |  FROM e, c),
        |asg AS (SELECT vec_id, e, cid FROM a WHERE rn = 1),
        |drops AS (
        |  SELECT DISTINCT r.vec_id AS drop_id
        |  FROM asg l JOIN asg r ON l.cid = r.cid AND l.vec_id < r.vec_id
        |  WHERE round(list_dot_product(l.e, r.e)
        |    / (sqrt(list_dot_product(l.e, l.e)) * sqrt(list_dot_product(r.e, r.e))), 4) >= 0.3)
        |SELECT asg.cid AS cluster, count(*) AS n_vecs,
        |  count(*) - count(d.drop_id) AS n_kept,
        |  count(d.drop_id) AS n_dropped
        |FROM asg LEFT JOIN drops d ON asg.vec_id = d.drop_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_embed_neardup" ->
      s"""WITH b AS (
         |  SELECT vec_id, e, ${bucketSql("e")} AS bucket
         |  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |        FROM embeddings))
         |SELECT l.vec_id AS id1, r.vec_id AS id2,
         |  round(list_dot_product(l.e, r.e)
         |        / (sqrt(list_dot_product(l.e, l.e)) * sqrt(list_dot_product(r.e, r.e))), 4) AS cos
         |FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
         |WHERE round(list_dot_product(l.e, r.e)
         |        / (sqrt(list_dot_product(l.e, l.e)) * sqrt(list_dot_product(r.e, r.e))), 4) >= 0.0
         |ORDER BY cos DESC, id1, id2 LIMIT 50""".stripMargin,
    "q_kmeans" ->
      s"""$kmeansCte
         |SELECT cid AS cluster, count(*) AS n_vecs,
         |  CAST(sum(vec_id) AS BIGINT) AS id_sum
         |FROM a2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cluster_keywords" ->
      s"""$kmeansCte,
         |toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |tf AS (
         |  SELECT a2.cid, toks.token, count(*) AS tf
         |  FROM toks JOIN a2 ON toks.doc_id = a2.vec_id
         |  GROUP BY 1, 2),
         |cdf AS (SELECT token, count(DISTINCT cid) AS cdf FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT tf.cid, tf.token,
         |    round(tf.tf * ln(1.0 + $KmeansK.0 / cdf.cdf), 4) AS score,
         |    row_number() OVER (PARTITION BY tf.cid
         |      ORDER BY round(tf.tf * ln(1.0 + $KmeansK.0 / cdf.cdf), 4) DESC,
         |        tf.token) AS rnk
         |  FROM tf JOIN cdf USING (token))
         |SELECT cid AS cluster, rnk, token, score
         |FROM scored WHERE rnk <= 3 ORDER BY cluster, rnk""".stripMargin,
    "q_kmeans_balanced" ->
      s"""$kmeansCte,
         |m AS (SELECT min(n) AS m FROM (
         |  SELECT count(*) AS n FROM a2 GROUP BY cid)),
         |ranked AS (
         |  SELECT vec_id, cid, row_number() OVER (
         |    PARTITION BY cid
         |    ORDER BY (vec_id * 2654435761) % 999983, vec_id) AS rn
         |  FROM a2)
         |SELECT cid AS cluster, count(*) AS n_sampled,
         |  CAST(sum(vec_id) AS BIGINT) AS id_sum
         |FROM ranked, m WHERE rn <= m.m GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** The deterministic two-pass Lloyd recipe as one CTE chain ending in the
    * final assignment `a2(vec_id, cid)` — the mirror of [[kmeansAssign]]:
    * init = the $KmeansK lowest vec_ids, scores `e·c − c·c/2` rounded to 4
    * decimals before every argmax, ties to the smaller centroid id,
    * refined centroids as element-wise means over the pass-1 clusters.
    */
  private def kmeansCte: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |init AS (SELECT vec_id AS cid, e AS ce FROM e ORDER BY vec_id LIMIT $KmeansK),
       |a1 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, init.cid, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY round(list_dot_product(e.e, init.ce)
       |        - list_dot_product(init.ce, init.ce) / 2, 4) DESC, init.cid) AS rn
       |    FROM e, init) WHERE rn = 1),
       |ex AS (SELECT vec_id, unnest(e) AS v, generate_subscripts(e, 1) AS d FROM e),
       |c1 AS (
       |  SELECT a1.cid, ex.d, avg(ex.v) AS cv
       |  FROM ex JOIN a1 USING (vec_id) GROUP BY 1, 2),
       |cnorm AS (SELECT cid, sum(cv * cv) AS cc FROM c1 GROUP BY 1),
       |dots AS (
       |  SELECT ex.vec_id, c1.cid, sum(ex.v * c1.cv) AS ec
       |  FROM ex JOIN c1 USING (d) GROUP BY 1, 2),
       |a2 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT dots.vec_id, dots.cid, row_number() OVER (
       |      PARTITION BY dots.vec_id
       |      ORDER BY round(dots.ec - cnorm.cc / 2, 4) DESC, dots.cid) AS rn
       |    FROM dots JOIN cnorm USING (cid)) WHERE rn = 1)""".stripMargin
}
