package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away today"
  // near-dup: one word changed; distinct: different text entirely
  private val nearDup = "the quick brown fox jumps over the lazy cat and runs far away today"
  private val other = "completely different content with no overlap whatsoever in any token here at all"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, other), (4L, base)
  ).toDF("doc_id", "text")

  test("minhash LSH finds the near-duplicate pair and skips the unrelated doc") {
    val pairs = Dedup.minhashPairs(docs, minJ = 0.4)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "near-dup pair missed")
    assert(pairs.contains((1L, 4L)), "exact-dup pair missed")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc flagged")
  }

  test("minhash exact jaccard is 1.0 for identical docs") {
    val j = Dedup.minhashPairs(docs, minJ = 0.4)
      .filter(col("doc1") === 1L && col("doc2") === 4L)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("simhash hamming distance: identical 0, near-dup small, unrelated large") {
    val fps = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(4L))
    val near = java.lang.Long.bitCount(fps(1L) ^ fps(2L))
    val far = java.lang.Long.bitCount(fps(1L) ^ fps(3L))
    assert(near < far, s"near=$near far=$far")
    val pairs = Dedup.simhashPairs(docs, maxDist = 8)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("shingle hashes are set-semantic (duplicates collapse)") {
    val n = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
      .select(size(Dedup.shingleHashes(col("text"))).as("n")).as[Int].head()
    // shingles of 'a b c' repeated: only 3 distinct 3-token shingles exist
    assert(n == 3)
  }

  test("short documents fall back to whole-text hash") {
    val n = Seq((1L, "one two")).toDF("doc_id", "text")
      .select(size(Dedup.shingleHashes(col("text"))).as("n")).as[Int].head()
    assert(n == 1)
  }

  test("signature length and band count are as configured") {
    val sig = Dedup.signatures(docs).select("sig").head().getSeq[Long](0)
    assert(sig.length == Dedup.NumPerms)
  }

  test("SimHash64 expression matches a plain Scala majority-bit reference") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val rows = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      val hs = text.split(" ").map(t =>
        XXH64.hashUTF8String(org.apache.spark.unsafe.types.UTF8String.fromString(t), 42L))
      var expect = 0L
      for (k <- 0 until 64)
        if (2L * hs.count(h => ((h >>> k) & 1L) == 1L) > hs.length) expect |= 1L << k
      assert(rows(id) == expect, s"doc $id")
    }
  }

  test("hash expressions: interpreted eval agrees with codegen") {
    def run(): (Map[Long, Long], Map[Long, Seq[Long]],
        Map[Long, Seq[(Int, Long)]], Map[Long, Seq[(Int, Long)]]) = {
      val fp = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
        .as[(Long, Long)].collect().toMap
      val sig = Dedup.signatures(docs).select("doc_id", "sig")
        .as[(Long, Seq[Long])].collect().toMap
      val bands = Dedup.signatures(docs)
        .select(col("doc_id"), Dedup.bandHashes(col("sig")).as("b"))
        .as[(Long, Seq[(Int, Long)])].collect().toMap
      val keys = docs
        .select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
        .select(col("doc_id"),
          graft.functions.SimHashFunctions.simhash_block_keys(col("fp"), 3).as("k"))
        .as[(Long, Seq[(Int, Long)])].collect().toMap
      (fp, sig, bands, keys)
    }
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == gen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("incremental dedup: new docs with a corpus near-dup are dropped, others admitted") {
    val corpus = Seq((10L, base), (11L, other)).toDF("doc_id", "text")
    val fresh = Seq(
      (20L, base),     // exact dup of corpus 10 → dropped
      (21L, nearDup),  // near-dup of corpus 10 → dropped
      (22L, "entirely novel sentence about glaciers and thermoclines in the lake basin today")
    ).toDF("doc_id", "text")
    val admitted = Dedup.incrementalDedup(fresh, corpus, minJ = 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(22L), s"admitted=$admitted")
    // admitting against an EMPTY corpus keeps everything
    val all = Dedup.incrementalDedup(fresh, corpus.limit(0), minJ = 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(all == Set(20L, 21L, 22L))
  }

  test("configured checkpoint dir switches dedup to RELIABLE checkpoints, results unchanged") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "test assumes no pre-set checkpoint dir")
    val baseline = Dedup.minhashPairs(docs, minJ = 0.4)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck").toFile.getAbsolutePath
    sc.setCheckpointDir(ckDir)
    try {
      val pairs = Dedup.minhashPairs(docs, minJ = 0.4)
      val got = pairs.select("doc1", "doc2").as[(Long, Long)].collect().toSet
      assert(got == baseline, s"reliable path diverged: $got vs $baseline")
      // the reliable path actually engaged: RDD checkpoint files landed
      // under the configured dir (localCheckpoint writes nothing there)
      def ckFiles: Int = {
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        try walk.filter(java.nio.file.Files.isRegularFile(_)).count().toInt
        finally walk.close()
      }
      assert(ckFiles > 0, "no checkpoint files written under the configured dir")
      // incremental dedup + CC take the same switch
      val corpus = Seq((10L, base)).toDF("doc_id", "text")
      val fresh = Seq((20L, base), (21L, other)).toDF("doc_id", "text")
      val admitted = Dedup.incrementalDedup(fresh, corpus, minJ = 0.4)
        .select("doc_id").as[Long].collect().toSet
      assert(admitted == Set(21L))
      val cc = Dedup.connectedComponents(
          Seq((2L, 1L), (2L, 3L)).toDF("doc1", "doc2"))
        .as[(Long, Long)].collect().toMap
      assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    } finally {
      sc.setCheckpointDir(null) // restore executor-local behavior for other suites
      assert(sc.getCheckpointDir.isEmpty)
    }
  }

  test("connected components: chains propagate, components stay separate") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, needs >1 round), pair {10,11}, and an
    // isolated edge endpoint set {20,21}; 99 never appears (caller's job)
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L))
      .toDF("doc1", "doc2")
    val got = Dedup.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("CC on zero edges returns an empty labeling (both paths)") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("doc1", "doc2")
    assert(Dedup.connectedComponents(none).count() == 0L)
    spark.conf.set("graft.cc.localEdgeThreshold", "-1") // force distributed
    try assert(Dedup.connectedComponents(none).count() == 0L)
    finally spark.conf.unset("graft.cc.localEdgeThreshold")
  }

  test("CC local union-find path equals the distributed propagation loop") {
    import spark.implicits._
    // random-ish graph with chains, a star, and singleton-free pairs; run
    // once on the small-edge fast path and once with the threshold forced
    // to 0 (distributed loop), and require identical labelings
    val rnd = new scala.util.Random(7)
    val edges = (Seq.tabulate(60)(i => (i.toLong, (i + 1).toLong)) ++ // chain
      Seq.tabulate(20)(i => (1000L, 1000L + i + 1)) ++                // star
      Seq.fill(40)((2000L + rnd.nextInt(50), 2000L + rnd.nextInt(50)))
        .filter(p => p._1 != p._2))
      .toDF("doc1", "doc2")
    val local = Dedup.connectedComponents(edges).as[(Long, Long)].collect().toMap
    spark.conf.set("graft.cc.localEdgeThreshold", "0")
    try {
      val dist = Dedup.connectedComponents(edges).as[(Long, Long)].collect().toMap
      assert(local == dist)
    } finally spark.conf.unset("graft.cc.localEdgeThreshold")
    // chain head label propagated to the tail (min-id labeling)
    assert(local(60L) == 0L && local(1020L) == 1000L)
  }

  test("dedupClusters from banded edges matches CC over exact all-pairs edges") {
    // corpus with known near-dup structure: cluster {1,2,4} (template + one
    // word changed + exact copy), cluster {5,6} (another template pair),
    // singletons 3 and 7
    val tpl = "large scale training data pipelines need careful deduplication of web documents"
    val corpus = Seq(
      (1L, base), (2L, nearDup), (3L, other), (4L, base),
      (5L, tpl), (6L, tpl + " indeed"),
      (7L, "yet another entirely unrelated snippet about cooking pasta with garlic butter")
    ).toDF("doc_id", "text")
    // exact all-pairs edge set at the same threshold (the oracle form)
    val sigs = Dedup.signatures(corpus)
    val l = sigs.select(col("doc_id").as("doc1"), col("shingles").as("g1"))
    val r = sigs.select(col("doc_id").as("doc2"), col("shingles").as("g2"))
    val exactEdges = l.crossJoin(r).filter(col("doc1") < col("doc2"))
      .filter(round(size(array_intersect(col("g1"), col("g2"))).cast("double") /
        size(array_union(col("g1"), col("g2"))), 4) >= 0.5)
      .select("doc1", "doc2")
    val exactCc = Dedup.connectedComponents(exactEdges)
    val exact = corpus.select(col("doc_id")).join(exactCc, corpus("doc_id") === exactCc("id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"))
      .as[(Long, Long)].collect().toMap
    val banded = Dedup.dedupClusters(corpus)
      .as[(Long, Long)].collect().toMap
    assert(banded == exact, s"banded=$banded exact=$exact")
    assert(banded(1L) == 1L && banded(2L) == 1L && banded(4L) == 1L)
    assert(banded(5L) == banded(6L))
    assert(banded(3L) == 3L && banded(7L) == 7L)
  }

  test("single-pass MinHashSignature expression is bit-identical to the compositional form") {
    val withShingles = docs.select(col("doc_id"), Dedup.shingleHashes(col("text")).as("sh"))
    val rows = withShingles.select(col("doc_id"),
      graft.functions.MinHashFunctions.minhash_signature(col("sh"), Dedup.NumPerms).as("fast"),
      Dedup.minhashSignature(col("sh")).as("ref"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, fast, ref) => assert(fast == ref, s"doc $id") }
  }

  test("containment finds doc-in-doc pairs that Jaccard misses") {
    // small doc fully quoted inside a much larger doc: containment = 1.0 but
    // Jaccard is low — the structural blind spot of MinHash-LSH dedup
    val small = "alpha beta gamma delta epsilon zeta"
    val big = ("padding words one two three four five six seven eight nine ten " +
      small + " more filler content eleven twelve thirteen fourteen fifteen " +
      "sixteen seventeen eighteen nineteen twenty twentyone twentytwo")
    val corpus = Seq((1L, small), (2L, big), (3L, other)).toDF("doc_id", "text")
    // same construction as q_containment_pairs, inlined on a tiny corpus
    // (the declared query's index cache is per (session, dir) — not this df)
    val grams = org.apache.spark.sql.functions.expr(
      "array_distinct(transform(sequence(1, size(t) - 2), i -> array_join(slice(t, i, 3), ' ')))")
    val sh = corpus.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(grams).as("g"))
    val n = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shared = sh.select(col("g"), col("doc_id").as("doc1"))
      .join(sh.select(col("g"), col("doc_id").as("doc2")), "g")
      .filter(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2").agg(count(lit(1)).as("shared"))
    val out = shared
      .join(n.select(col("doc_id").as("doc1"), col("n_sh").as("n1")), "doc1")
      .join(n.select(col("doc_id").as("doc2"), col("n_sh").as("n2")), "doc2")
      .withColumn("containment",
        col("shared").cast("double") / least(col("n1"), col("n2")))
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => ((r._2, r._1), r._6)).toMap
    assert(out((1L, 2L)) == 1.0, s"doc-in-doc pair not fully contained: $out")
    assert(!out.contains((1L, 3L)) && !out.contains((2L, 3L)),
      s"unrelated doc produced a containment pair: $out")
    // and the Jaccard of the contained pair is indeed low (the LSH blind spot)
    val smallSet = small.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val bigSet = big.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val jac = smallSet.intersect(bigSet).size.toDouble / smallSet.union(bigSet).size
    assert(jac < 0.2, s"fixture broken: Jaccard $jac not low")
  }

  test("appendContainmentShard: maintained posting state equals a full rebuild") {
    val corpus = Tables.documents(spark, TestSpark.sf).filter(col("doc_id") % 10 =!= 0)
    val shard = Tables.documents(spark, TestSpark.sf).filter(col("doc_id") % 10 === 0)
    val all = Tables.documents(spark, TestSpark.sf)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("g"), col("df"), array_sort(col("ds")).as("ds"))
      .as[(Long, Long, Seq[Long])].collect().toSet
    val merged = canon(Dedup.appendContainmentShard(
      Dedup.containmentPostings(corpus), shard))
    val full = canon(Dedup.containmentPostings(all))
    assert(merged == full, "maintained state diverges from full rebuild")
    // the gate really fires both ways: some shingle crossed maxDf only in
    // the merge (list dropped), and gated lists stayed bounded
    assert(full.exists(_._3 == null) || full.forall(_._2 <= 20),
      "fixture never exercises the df gate")
    full.filter(_._3 != null).foreach { case (_, df, ds) =>
      assert(ds.length == df && df <= 20)
    }
  }

  test("incrementalContainmentAdmit rejects a quote of a corpus doc, admits fresh content") {
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val big = ("padding words one two three four five six seven eight nine ten " +
      small + " more filler content eleven twelve thirteen fourteen fifteen")
    val corpus = Seq((2L, big), (3L, other)).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, small),                                   // a quote → rejected
      (11L, "entirely novel words nobody wrote before in any corpus document"),
      (12L, "hi")                                     // < 3 tokens → admitted
    ).toDF("doc_id", "text")
    val admitted = Dedup.incrementalContainmentAdmit(
      fresh, Dedup.containmentPostings(corpus))
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(11L, 12L), s"got $admitted")
  }

  test("containmentDropIds drops the subset side (smaller kept-shingle set; ties drop the larger id)") {
    // the pipeline's containment-drop stage rule, on pairs where each case
    // fires: n1 < n2 (drop doc1), n1 > n2 (drop doc2), tie (drop max id)
    val pairs = Seq(
      (1L, 2L, 4L, 30L),  // doc1 is the contained excerpt
      (5L, 3L, 25L, 6L),  // doc2 is the contained excerpt
      (7L, 8L, 10L, 10L), // tie: deterministic larger-id drop
      (9L, 2L, 4L, 30L)   // second pair naming an already-dropped size class
    ).toDF("doc1", "doc2", "n1", "n2")
    val drops = Dedup.containmentDropIds(pairs)
      .as[Long].collect().toSet
    assert(drops == Set(1L, 3L, 8L, 9L), s"got $drops")
  }

  test("BandHashes and SimHashBlockKeys compile under CODEGEN_ONLY") {
    // CODEGEN_ONLY turns a silent interpreted fallback into a hard failure
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val bands = Dedup.signatures(docs)
        .select(Dedup.bandHashes(col("sig")).as("b")).collect()
      assert(bands.nonEmpty)
      val keys = docs.select(Dedup.simhash(col("text")).as("fp"))
        .select(graft.functions.SimHashFunctions.simhash_block_keys(col("fp"), 3).as("k"))
        .collect()
      assert(keys.nonEmpty)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("single-loop SimHashBlockKeys expression is bit-identical to the compositional form") {
    for (maxDist <- Seq(1, 3, 8)) {
      val fps = Dedup.simhashTable(docs)
      val rows = fps.select(col("doc_id"),
        graft.functions.SimHashFunctions.simhash_block_keys(col("fp"), maxDist).as("fast"),
        Dedup.simhashBlockKeysCompositional(col("fp"), maxDist).as("ref"))
        .as[(Long, Seq[(Int, Long)], Seq[(Int, Long)])].collect()
      assert(rows.nonEmpty)
      val b = maxDist + 3
      val expectGroups = (0 until b).combinations(3).size
      rows.foreach { case (id, fast, ref) =>
        assert(fast.length == expectGroups, s"doc $id group count at maxDist=$maxDist")
        assert(fast == ref, s"doc $id at maxDist=$maxDist")
      }
    }
  }

  test("quality-aware survivorship keeps exactly the longest copy per cluster") {
    val rows = SparkEntry.queries("q_dedup_keep_best")(spark, TestSpark.sf)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      val kept = members.filter(_._4)
      assert(kept.length == 1, s"cluster $c keeps ${kept.length} docs")
      val best = members.minBy(m => (-m._3, m._1)) // longest, doc_id tie-break
      assert(kept.head._1 == best._1, s"cluster $c kept ${kept.head._1}, best is ${best._1}")
    }
    assert(byCluster.exists(_._2.length > 1), "fixture should contain a multi-doc cluster")
  }

  test("single-loop BandHashes expression is bit-identical to the compositional form") {
    val sigs = Dedup.signatures(docs)
    val rows = sigs.select(col("doc_id"),
      Dedup.bandHashes(col("sig")).as("fast"),
      Dedup.bandHashesCompositional(col("sig")).as("ref"))
      .as[(Long, Seq[(Int, Long)], Seq[(Int, Long)])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, fast, ref) =>
      assert(fast.length == Dedup.NumPerms / Dedup.BandRows, s"doc $id band count")
      assert(fast == ref, s"doc $id")
    }
  }

  test("exact-substring scrub: window covering removes whole repeats, keeps one copy") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a 6-token boilerplate planted inside three otherwise-unique docs
    // (longer than l = 4, so covering must remove it END TO END), plus a
    // doc with no repeats and a doc shorter than the window
    val boiler = "all rights reserved by acme corp"
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma delta"),
      (2L, s"one two three $boiler"),
      (3L, s"$boiler nine ten"),
      (4L, "totally unique text with no repeats at all"),
      (5L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrScrub(docs, l = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    // doc 1 holds the canonical (smallest doc_id/start) occurrence → intact
    assert(byId(1L)._4 == s"alpha beta $boiler gamma delta",
      s"canonical copy scrubbed: ${byId(1L)}")
    // docs 2 and 3: the WHOLE 6-token repeat vanishes (covering, not just
    // one window), everything else survives in order
    assert(byId(2L)._4 == "one two three", byId(2L))
    assert(byId(3L)._4 == "nine ten", byId(3L))
    assert(byId(2L)._2 == 9 && byId(2L)._3 == 3)
    // untouched docs round-trip exactly
    assert(byId(4L)._4 == "totally unique text with no repeats at all")
    assert(byId(5L)._4 == "tiny doc" && byId(5L)._2 == 2 && byId(5L)._3 == 2)
  }

  test("exact-substring canonical key survives million-token documents") {
    import spark.implicits._
    // Regression lock for the keep-one key: the old arithmetic packing
    // (doc_id * 1e6 + start) aliased (doc 1, start 1,000,001) with
    // (doc 2, start 1) — both occurrences matched the aliased keep_key and
    // BOTH copies were kept. The struct-min key must scrub exactly one.
    val n = 1000000
    val filler = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"$filler dup0 dup1"), // shared bigram at start = n + 1
      (2L, "dup0 dup1 tail0 tail1") // shared bigram at start = 1
    ).toDF("doc_id", "text")
    val spans = Dedup.exactSubstrSpans(docs, l = 2)
      .as[(Long, Long)].collect().toSet
    // canonical = lexicographic min (doc 1, n+1) kept; (doc 2, 1) scrubbed
    assert(spans == Set((2L, 1L)), s"spans=$spans")
  }
}
