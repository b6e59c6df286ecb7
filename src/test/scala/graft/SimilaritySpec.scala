package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("brute-force top-k is ordered by similarity desc") {
    val top = Similarity.cosineTopK(Tables.embeddings(spark, TestSpark.sf), 1L, 10)
      .select("sim").as[Double].collect()
    assert(top.length == 10)
    assert(top.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("MMR: λ=1 degenerates to relevance order, λ=0.7 diversifies, picks unique") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val pure = Similarity.cosineTopK(emb, 1L, 10)
      .select("vec_id").as[Long].collect().toSeq
    val lam1 = Similarity.mmrTopK(emb, 1L, n = 50, k = 10, lambda = 1.0)
      .select("vec_id").as[Long].collect().toSeq
    assert(lam1 == pure, "λ=1 must reduce to plain relevance top-k order")
    val mmr = Similarity.mmrTopK(emb, 1L).select("rank", "vec_id", "rel", "mmr")
      .as[(Int, Long, Double, Double)].collect()
    assert(mmr.map(_._2).distinct.length == mmr.length, "no repeats")
    assert(mmr.head._2 == pure.head, "first pick is the most relevant")
    assert(mmr.map(_._2).toSeq != pure, "default λ should reorder for diversity")
    // true marginals are non-increasing (each step's penalty only grows);
    // the emitted scores are 4-decimal-rounded, hence the 1e-4 slack
    assert(mmr.sliding(2).forall(p => p(0)._4 >= p(1)._4 - 1e-4),
      "marginal scores are non-increasing down the ranking")
  }

  test("LSH top-k hits are a subset of a deep exact ranking with decent recall") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val exactTop = Similarity.cosineTopK(emb, 1L, 50)
      .select("vec_id").as[Long].collect().toSet
    val lsh = Similarity.cosineTopKLsh(emb, 1L, 10)
      .select("vec_id").as[Long].collect()
    assert(lsh.nonEmpty, "LSH probe found no candidates")
    // every LSH hit must be a genuinely similar vector (graded vs exact top-50)
    val recall = lsh.count(exactTop.contains).toDouble / lsh.length
    assert(recall >= 0.2, s"recall $recall too low for hamming-1 multiprobe")
  }

  test("filtered ANN: predicate never leaks; recall >= 0.9 clustered, >= 0.5 uniform fixture") {
    // strict bound on a clustered corpus (the geometry IVF is built for):
    // 10 planted clusters of 50, labels interleaved so each cluster holds
    // vectors on both sides of the predicate
    val rows = (0 until 500).map { i =>
      val c = i % 10
      val vec = (0 until 64).map { d =>
        (math.sin(c * 131.0 + d * 17.0) + math.sin(i * 1009.0 + d * 37.0) * 0.05).toFloat
      }
      (i.toLong, vec, i % 5)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val cents = graft.similarity.Ivf.train(emb, k = 16, iters = 2)
    val pred = col("label") % 3 === 0
    val exactC = Similarity.cosineTopK(emb, 1L, 20, pred)
      .select("vec_id").as[Long].collect().toSet
    val gotC = graft.similarity.Ivf.topKFiltered(emb, cents, 1L, 20, nprobe = 4, pred)
      .select("vec_id").as[Long].collect()
    gotC.foreach(id => assert(id % 5 % 3 == 0, s"clustered: leaked vec $id"))
    val recallC = gotC.count(exactC.contains).toDouble / exactC.size
    assert(recallC >= 0.9, s"clustered filtered recall@20 $recallC below 0.9 (nprobe=4)")
    // graceful floor on the uniform fixture via the declared queries
    val exact = SparkEntry.queries("q_cosine_topk_filtered")(spark, TestSpark.sf)
      .select("vec_id").as[Long].collect().toSet
    val ivf = SparkEntry.queries("q_cosine_ivf_filtered")(spark, TestSpark.sf)
      .select("vec_id").as[Long].collect()
    assert(ivf.nonEmpty, "filtered IVF probe found no candidates")
    val labels = Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    ivf.foreach(id => assert(labels(id) % 3 == 0,
      s"filtered ANN leaked vec $id with label ${labels(id)}"))
    val recall = ivf.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.5, s"uniform filtered recall@20 $recall below 0.5 (nprobe=6)")
  }

  test("embedAdmit rejects a planted paraphrase vector, admits the rest") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val corpus = emb.take(50).toSeq.toDF("vec_id", "embedding")
    val near = emb.head._2.toArray; near(0) = near(0) + 1e-4f
    val fresh = emb.drop(50).head._2 // a real vector NOT in the 50-corpus
    // 9001 is a planted paraphrase; the near-dup ALSO ships under the
    // corpus head's OWN id — cross-namespace id collision must still be
    // compared against its corpus twin, not excluded as a self-pair
    val shard = Seq((9001L, near.toSeq), (9002L, fresh),
      (emb.head._1, near.toSeq)).toDF("vec_id", "embedding")
    val verdicts = Similarity.embedAdmit(corpus, shard, tau = 0.98)
      .select("vec_id", "best_corp", "admitted")
      .as[(Long, Long, Int)].collect()
      .map { case (v, b, a) => v -> (b, a) }.toMap
    assert(verdicts(9001L)._2 == 0, s"near-dup admitted: $verdicts")
    assert(verdicts(9001L)._1 == emb.head._1, "wrong best neighbor")
    assert(verdicts(9002L)._2 == 1, s"fresh vector rejected: $verdicts")
    assert(verdicts(emb.head._1)._2 == 0, s"id-colliding duplicate admitted: $verdicts")
    // bootstrap: empty corpus admits everything, one verdict row per vector
    val boot = Similarity.embedAdmit(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"), shard, tau = 0.98)
      .select("vec_id", "admitted").as[(Long, Int)].collect()
    assert(boot.length == 3 && boot.forall(_._2 == 1), boot.toSeq)
  }

  test("a planted near-duplicate is found by the bucketed near-dup join") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val v = emb.head._2.toArray
    val dup = v.clone(); dup(0) = dup(0) + 1e-4f // near-identical
    val planted = (emb.toSeq :+ (9999L, dup.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDups(planted, minCos = 0.999)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((emb.head._1, 9999L)))
  }

  test("PQ ADC+rerank top-k recalls the exact top-k") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val cb = Similarity.preparePqIndex(spark, TestSpark.sf)
    val exact = Similarity.cosineTopK(emb, 1L, 20).select("vec_id").as[Long].collect().toSet
    val pq = graft.similarity.Pq.topK(emb, cb, 1L, 20, rerank = 100)
      .select("vec_id").as[Long].collect()
    assert(pq.length == 20)
    val recall = pq.count(exact.contains).toDouble / 20
    assert(recall >= 0.9, s"PQ recall@20 $recall below 0.9 (rerank=100 of 500)")
  }

  test("IVF×PQ composed top-k: recall@20 ≥ 0.9 at nprobe=4/16 on a clustered corpus") {
    // Cell pruning preserves recall when neighbors cluster (the geometry real
    // embedding corpora have and the one IVFADC is designed for): 10 planted
    // clusters of 50, deterministic centers ± small deterministic noise.
    val rows = (0 until 500).map { i =>
      val c = i % 10
      val vec = (0 until 64).map { d =>
        (math.sin(c * 131.0 + d * 17.0) + math.sin(i * 1009.0 + d * 37.0) * 0.05).toFloat
      }
      (i.toLong, vec)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val cents = graft.similarity.Ivf.train(emb, k = 16, iters = 2)
    val cb = graft.similarity.Pq.train(emb, m = 16, ksub = 16, iters = 3)
    val exact = Similarity.cosineTopK(emb, 1L, 20).select("vec_id").as[Long].collect().toSet
    val got = graft.similarity.IvfPq.topK(emb, cents, cb, 1L, 20,
        nprobe = Similarity.IvfPqNprobe, rerank = Similarity.PqRerank)
      .select("vec_id").as[Long].collect()
    assert(got.length == 20)
    val recall = got.count(exact.contains).toDouble / 20
    assert(recall >= 0.9, s"IVF×PQ recall@20 $recall below 0.9 (nprobe=4 of 16)")
  }

  test("IVFADC residual encoding: recall holds and reconstruction beats raw-vector PQ") {
    // clustered corpus (same fixture as the composed test): residual recall
    // must hit the same bar and never fall below the shared-codebook path
    val rows = (0 until 500).map { i =>
      val c = i % 10
      val vec = (0 until 64).map { d =>
        (math.sin(c * 131.0 + d * 17.0) + math.sin(i * 1009.0 + d * 37.0) * 0.05).toFloat
      }
      (i.toLong, vec)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val cents = graft.similarity.Ivf.train(emb, k = 16, iters = 2)
    val cb = graft.similarity.Pq.train(emb, m = 16, ksub = 16, iters = 3)
    val cbr = graft.similarity.IvfPq.trainResidual(emb, cents, m = 16, ksub = 16, iters = 3)
    val exact = Similarity.cosineTopK(emb, 1L, 20).select("vec_id").as[Long].collect().toSet
    def recallOf(got: Array[Long]) = got.count(exact.contains).toDouble / 20
    val shared = recallOf(graft.similarity.IvfPq.topK(emb, cents, cb, 1L, 20,
      nprobe = Similarity.IvfPqNprobe, rerank = Similarity.PqRerank)
      .select("vec_id").as[Long].collect())
    val residual = recallOf(graft.similarity.IvfPq.topKResidual(emb, cents, cbr, 1L, 20,
      nprobe = Similarity.IvfPqNprobe, rerank = Similarity.PqRerank)
      .select("vec_id").as[Long].collect())
    assert(residual >= 0.9, s"residual recall@20 $residual below 0.9")
    assert(residual >= shared,
      s"residual recall $residual fell below shared-codebook recall $shared")

    // the paper's core claim, isolated from cell pruning: quantizing
    // residuals reconstructs the corpus with LOWER error than quantizing
    // raw vectors on the same code budget — checked on the harness table
    val hemb = Tables.embeddings(spark, TestSpark.sf)
    val hcb = Similarity.preparePqIndex(spark, TestSpark.sf)
    val (hcents, hcbr) = Similarity.prepareIvfPqResIndex(spark, TestSpark.sf)
    val raw = hemb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    def mse(recons: Map[Long, Array[Double]]): Double =
      recons.map { case (id, rec) =>
        raw(id).zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum / recons.size
    val rawRec = graft.similarity.Pq.encode(hemb, hcb)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
      .map { case (id, codes) =>
        id -> codes.zipWithIndex.flatMap { case (c, s) => hcb.cents(s)(c) }.toArray
      }
    val resRec = graft.similarity.IvfPq.encodeResidual(hemb, hcents, hcbr)
      .select("vec_id", "cid", "codes").as[(Long, Int, Seq[Int])].collect()
      .map { case (id, cid, codes) =>
        val r = codes.zipWithIndex.flatMap { case (c, s) => hcbr.cents(s)(c) }
        id -> hcents(cid).zip(r).map { case (a, b) => a + b }.toArray
      }.toMap
    val (mRaw, mRes) = (mse(rawRec), mse(resRec))
    assert(mRes < mRaw,
      s"residual reconstruction MSE $mRes not below raw-PQ MSE $mRaw")
  }

  test("IVF×PQ on the uniform table degrades gracefully, never below half the exact set") {
    // The harness embeddings are near-uniform (balanced cells, top-20 spread
    // across many cells) — the documented worst case for ANY cell-pruned
    // scan. The lock here is graceful degradation at the query's config, not
    // the clustered-corpus recall above.
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val (cents, cb) = Similarity.prepareIvfPqIndex(spark, TestSpark.sf)
    val exact = Similarity.cosineTopK(emb, 1L, 20).select("vec_id").as[Long].collect().toSet
    val got = graft.similarity.IvfPq.topK(emb, cents, cb, 1L, 20,
        nprobe = Similarity.IvfPqNprobe, rerank = Similarity.PqRerank)
      .select("vec_id").as[Long].collect()
    assert(got.length == 20)
    val recall = got.count(exact.contains).toDouble / 20
    assert(recall >= 0.5, s"IVF×PQ uniform-corpus recall@20 $recall below 0.5")
  }

  test("IVF×PQ at full probe equals plain PQ (composition degenerates correctly)") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val (cents, cb) = Similarity.prepareIvfPqIndex(spark, TestSpark.sf)
    val full = graft.similarity.IvfPq.topK(emb, cents, cb, 1L, 20,
        nprobe = Similarity.IvfK, rerank = Similarity.PqRerank)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    val pq = graft.similarity.Pq.topK(emb, cb, 1L, 20, rerank = Similarity.PqRerank)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(full.sameElements(pq),
      "probing every cell must reduce to the un-pruned ADC scan")
  }

  test("incremental PQ encode: shard-only work, identical index and topK vs full re-encode") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val cb = Similarity.preparePqIndex(spark, TestSpark.sf) // frozen codebooks
    val corpus = emb.filter(col("vec_id") < 400)
    val shard = emb.filter(col("vec_id") >= 400)
    assert(shard.count() > 0)
    // every raw-corpus row read bumps the accumulator — the lock that
    // appendShard pays for the shard only, never a corpus rescan
    val corpusScans = spark.sparkContext.longAccumulator("corpus-scans")
    val corpusCounted = corpus.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .map { r => corpusScans.add(1); r }.toDF("vec_id", "embedding")
    val index = graft.similarity.Pq.encode(corpusCounted, cb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    index.count() // ingest-time materialization
    val scansAtIngest = corpusScans.value
    val combined = graft.similarity.Pq.appendShard(index, shard, cb)
    combined.count()
    assert(corpusScans.value == scansAtIngest,
      s"appendShard rescanned the raw corpus (${corpusScans.value} vs $scansAtIngest)")
    // the maintained index is byte-identical to a full re-encode...
    val full = graft.similarity.Pq.encode(emb, cb)
    assert(combined.orderBy("vec_id").collect()
      .sameElements(full.orderBy("vec_id").collect()))
    // ...so search over it is too
    val a = graft.similarity.Pq.topK(emb, cb, 1L, 20, rerank = Similarity.PqRerank,
      encoded = Some(combined)).collect()
    val b = graft.similarity.Pq.topK(emb, cb, 1L, 20, rerank = Similarity.PqRerank,
      encoded = Some(full)).collect()
    assert(a.sameElements(b), "topK over the maintained index diverged")
    // the composed IVF×PQ index maintains the same way (cell assign rides
    // the same shard-only projection)
    val (cents, _) = Similarity.prepareIvfPqIndex(spark, TestSpark.sf)
    val combined2 = graft.similarity.IvfPq.appendShard(
      graft.similarity.IvfPq.encode(corpus, cents, cb), shard, cents, cb)
    assert(combined2.orderBy("vec_id").collect()
      .sameElements(graft.similarity.IvfPq.encode(emb, cents, cb).orderBy("vec_id").collect()))
    // ...and so does the residual (IVFADC-proper) variant
    val (rcents, rcbr) = Similarity.prepareIvfPqResIndex(spark, TestSpark.sf)
    val combined3 = graft.similarity.IvfPq.appendShardResidual(
      graft.similarity.IvfPq.encodeResidual(corpus, rcents, rcbr), shard, rcents, rcbr)
    assert(combined3.orderBy("vec_id").collect()
      .sameElements(graft.similarity.IvfPq.encodeResidual(emb, rcents, rcbr)
        .orderBy("vec_id").collect()),
      "residual appendShard diverged from full re-encode")
    index.unpersist()
  }

  test("PQ encode is deterministic, codes in range, norm exact") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val cb = Similarity.preparePqIndex(spark, TestSpark.sf)
    assert(cb.m == 16 && cb.ksub == 16 && cb.dsub == 4)
    val a = graft.similarity.Pq.encode(emb, cb).orderBy("vec_id").collect()
    val b = graft.similarity.Pq.encode(emb, cb).orderBy("vec_id").collect()
    assert(a.sameElements(b), "encode not deterministic")
    a.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == cb.m && codes.forall(c => c >= 0 && c < cb.ksub))
      assert(r.getDouble(2) > 0.0)
    }
    // compression accounting: 16 nibble codes + 1 float norm ≪ 64 floats
    assert(cb.m * cb.ksub * cb.dsub == 1024, "codebook must stay driver-sized")
  }

  test("embedding dedup clusters: labels are component minima, edges never cross clusters") {
    val label = SparkEntry.queries("q_embed_dedup_cluster")(spark, TestSpark.sf)
      .as[(Long, Long)].collect().toMap
    assert(label.forall { case (id, c) => c <= id }, "label must be a component min id")
    val edges = Similarity.embeddingNearDups(Tables.embeddings(spark, TestSpark.sf),
        minCos = 0.2, numPlanes = Some(Similarity.NumPlanes), numTables = 1)
      .select("id1", "id2").as[(Long, Long)].collect()
    assert(edges.nonEmpty, "fixture should produce at least one near-dup edge")
    edges.foreach { case (a, b) =>
      assert(label(a) == label(b), s"edge ($a,$b) crosses clusters")
    }
  }

  test("LSH bucket is stable and within range") {
    val b = Tables.embeddings(spark, TestSpark.sf)
      .select(Similarity.lshBucket(col("embedding")).as("b")).as[Int].collect()
    assert(b.forall(x => x >= 0 && x < (1 << Similarity.NumPlanes)))
  }

  test("semdedup census partitions the corpus and actually prunes") {
    val census = SparkEntry.queries("q_semdedup")(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect()
    val corpus = Tables.embeddings(spark, TestSpark.sf).count()
    assert(census.map(_._2).sum == corpus,
      "every vector must land in exactly one cluster")
    assert(census.forall { case (_, n, kept, dropped) => kept + dropped == n },
      "keep/drop must partition each cluster")
    assert(census.map(_._4).sum > 0, "no semantic duplicates pruned at all")
    assert(census.map(_._3).sum > census.map(_._4).sum,
      "pruning degenerated: dropped the majority of the corpus")
  }

  test("k-means census partitions the corpus; refinement does not lose clusters") {
    val census = SparkEntry.queries("q_kmeans")(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    val corpus = Tables.embeddings(spark, TestSpark.sf).count()
    assert(census.map(_._2).sum == corpus,
      "every vector must land in exactly one cluster")
    assert(census.length == 5, "a refined centroid starved to zero members")
    assert(census.forall(_._2 > 0))
  }

  test("balanced downsample: every cluster keeps exactly min-cluster-size members") {
    val census = SparkEntry.queries("q_kmeans")(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    val sampled = SparkEntry.queries("q_kmeans_balanced")(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    val m = census.map(_._2).min
    assert(sampled.map(_._1).sorted.sameElements(census.map(_._1).sorted),
      "sample must cover the same clusters")
    assert(sampled.forall(_._2 == m),
      s"every cluster must keep exactly $m members: ${sampled.mkString(",")}")
    // the sample is a SUBSET census-wise: id_sum of a cluster's sample
    // can't exceed the full cluster's id_sum
    val full = census.map(r => r._1 -> r._3).toMap
    assert(sampled.forall(r => r._3 <= full(r._1)))
  }
}
