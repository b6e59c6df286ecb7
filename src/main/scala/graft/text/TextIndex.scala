package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent inverted index for retrieval — the ingest-time structure a
  * 100 TB corpus serves search from. Every other retrieval query in this
  * repo (`q_bm25`, `q_tfidf`, `q_keywords`) re-tokenizes the corpus at
  * query time, which is the right shape for one-off analytics but not for
  * serving: at scale the tokenize+explode pass IS the cost, and it is the
  * same work every query. This module moves it to ingest. (North-star op;
  * the reference has no text processing — its only string work is CSV arg
  * splitting, `Gddp.scala:108,114`.)
  *
  * On-disk layout (all parquet, shard-partitioned, append-only):
  *
  *   dir/postings/shard=K/   (token, doc_id, tf, dl)
  *   dir/positions/shard=K/  (token, doc_id, ps: array&lt;int&gt;)
  *   dir/bigrams/shard=K/    (w1, w2, c)
  *   dir/df/shard=K/         (token, df)
  *   dir/stats/shard=K/      (n_docs, n_dl, sum_dl)
  *   dir/_commits/K          (empty marker, written LAST)
  *
  * Four scale decisions:
  *
  *   - Document length is DENORMALIZED into the posting rows. BM25 needs
  *     per-doc dl; a separate doclen table would force a doc-count-sized
  *     join (a full doclen scan under any join strategy, since the hit set
  *     isn't known until runtime). Inline, the query touches ONLY the
  *     postings of its query terms — the classic forward-index-in-the-
  *     posting trick, at +8 bytes per posting.
  *   - Postings are hash-partitioned on token and SORTED by token within
  *     each file, so parquet row-group min/max stats answer the query-term
  *     `IN` filter: a k-term query reads ~k row groups per shard, not the
  *     index. (The on-disk analogue at 100 TB is the same table bucketed
  *     by token; the sort is what makes the pushed filter selective.)
  *   - df, bigrams and stats are per-shard partial aggregates merged BY SUM
  *     at query time. A posting (token, doc_id) appears in exactly one
  *     shard — shards partition the docs, and bigrams never cross doc
  *     boundaries — so sum-of-shard-partials equals the full-corpus value
  *     and appending a shard never rewrites existing state. All three are
  *     vocabulary-/constant-sized: merge cost is metadata.
  *   - A shard becomes VISIBLE only when its `_commits/K` marker lands,
  *     written after all five table writes succeed. Readers resolve the
  *     committed shard set first and scan exactly those paths, so an
  *     ingest that dies mid-shard leaves queries answering from the last
  *     consistent state; the repair is re-running the shard with
  *     `overwrite = true` (which replaces the partial output), not a
  *     manual cleanup.
  *
  * TextIndexSpec property-locks merge-equals-rebuild (any slicing of the
  * corpus into shards yields the same query answers as one shard), the
  * uncommitted-shard invisibility + repair contract, and the plan shape
  * (pushed `IN` filter on the postings scan, no Generate — i.e. no
  * query-time tokenization anywhere in the plan).
  */
object TextIndex {

  /** Tokenize `docs` (doc_id, text) and append its postings + partial
    * aggregates as shard `shard` of the index at `dir`. Three corpus-linear
    * passes over the ARRIVING SHARD (tf, positions, bigrams), each one
    * explode + one aggregate; df rolls up from the cached tf table and
    * stats from tf's per-doc slice plus a tokenize-free total count.
    * Ingest-time cost, paid once per shard — queries never re-tokenize
    * anything.
    *
    * `overwrite = true` makes the write idempotent PER SHARD — the mode a
    * streaming maintainer needs: a retried micro-batch (shard = batchId)
    * replaces all five of its per-shard directories instead of erroring on
    * the partial output the failed attempt left behind (StreamingSpec
    * locks the streamed index against a batch build).
    */
  def writeShard(docs: DataFrame, dir: String, shard: Int,
      overwrite: Boolean = false): Unit = {
    val s = docs.sparkSession
    val mode = if (overwrite) "overwrite" else "errorifexists"
    val tf = docs
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).as("dl"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      tf.select("token", "doc_id", "tf", "dl")
        .repartition(s.sessionState.conf.numShufflePartitions min 8, col("token"))
        .sortWithinPartitions("token", "doc_id")
        .write.mode(mode).parquet(s"$dir/postings/shard=$shard")
      tf.groupBy("token").agg(count(lit(1)).as("df"))
        .coalesce(1)
        .write.mode(mode).parquet(s"$dir/df/shard=$shard")
      // positional postings (phrase/proximity retrieval) — the SAME
      // tokenize pass, positions folded to one sorted array per posting,
      // token-clustered like the tf postings so term filters prune
      docs
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens(col("text"))).as(Seq("p", "token")))
        .groupBy("token", "doc_id")
        .agg(sort_array(collect_list(col("p"))).as("ps"))
        .repartition(s.sessionState.conf.numShufflePartitions min 8, col("token"))
        .sortWithinPartitions("token", "doc_id")
        .write.mode(mode).parquet(s"$dir/positions/shard=$shard")
      // per-shard bigram counts (phrase statistics) — bigrams never cross
      // doc boundaries, so shard counts merge by sum like df
      TextAnalysis.bigramRows(
          docs.select(TextAnalysis.tokens(col("text")).as("t")))
        .groupBy("w1", "w2")
        .agg(count(lit(1)).as("c"))
        .coalesce(1)
        .write.mode(mode).parquet(s"$dir/bigrams/shard=$shard")
      // stats WITHOUT another tokenize pass: per-doc dl is one row per doc
      // in the cached tf table (null-text docs have no tf rows, so n_dl /
      // sum_dl skip them — mirroring avg()'s null semantics in q_bm25 and
      // the DuckDB oracle); n_docs counts ALL docs (BM25's idf N), a
      // column-pruned count that never touches text
      val nDocs = docs.count()
      tf.select("doc_id", "dl").dropDuplicates("doc_id")
        .agg(count(lit(1)).as("n_dl"), sum("dl").as("sum_dl"))
        .select(lit(nDocs).as("n_docs"), col("n_dl"), col("sum_dl"))
        .coalesce(1)
        .write.mode(mode).parquet(s"$dir/stats/shard=$shard")
      commitShard(dir, shard)
    } finally tf.unpersist()
  }

  /** Mark shard `shard` committed (write the empty `_commits/K` marker).
    * Idempotent — a retried already-successful batch re-marks harmlessly.
    */
  private def commitShard(dir: String, shard: Int): Unit = {
    val commits = new java.io.File(dir, "_commits")
    commits.mkdirs()
    new java.io.File(commits, shard.toString).createNewFile()
    ()
  }

  /** The committed shard ids at `dir` — the ONLY shards queries may see. */
  def committedShards(dir: String): Seq[Int] = {
    val commits = new java.io.File(dir, "_commits")
    Option(commits.list()).map(_.toSeq.map(_.toInt).sorted).getOrElse(Seq.empty)
  }

  /** Read one index table restricted to the committed shards. */
  private def readTable(s: SparkSession, dir: String, table: String): DataFrame = {
    val shards = committedShards(dir)
    require(shards.nonEmpty, s"index at $dir has no committed shard")
    s.read.parquet(shards.map(k => s"$dir/$table/shard=$k"): _*)
  }

  /** Merged document frequency across all committed shards — vocab-sized. */
  def mergedDf(s: SparkSession, dir: String): DataFrame =
    readTable(s, dir, "df")
      .groupBy("token").agg(sum("df").as("df"))

  /** Okapi BM25 (k1 = 1.2, b = 0.75) served FROM the index: same query-term
    * derivation (corpus tokens ranked 6th–13th by merged df), same
    * constants, same round-before-order rule as `q_bm25`, so the two share
    * one oracle. The term table is collected ONCE — the 8 (token, df) rows
    * drive both the literal `IN` pushdown into the postings scan and the
    * broadcast join side (rebuilt locally, so the vocab scan runs once).
    * Everything doc-sized the query touches is the hit postings.
    */
  def bm25Indexed(s: SparkSession, dir: String, nTerms: Int = 8,
      skip: Int = 5, k1: Double = 1.2, b: Double = 0.75,
      k: Int = 20): DataFrame = {
    val qtPlan = mergedDf(s, dir)
      .orderBy(col("df").desc, col("token")).offset(skip).limit(nTerms)
    val qtRows = qtPlan.collect()
    val qt = s.createDataFrame(
      java.util.Arrays.asList(qtRows: _*), qtPlan.schema)
    val terms = qtRows.map(_.getString(0))
    val stats = readTable(s, dir, "stats")
      .agg(sum("n_docs").as("n_docs"),
        (sum("sum_dl").cast("double") / sum("n_dl")).as("avgdl"))
    readTable(s, dir, "postings")
      .filter(col("token").isin(terms.toSeq: _*))
      .join(broadcast(qt), "token")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1)) /
          (col("tf") +
            lit(k1) * (lit(b) * col("dl") / col("avgdl") + (1 - b)))).as("s"))
      .groupBy("doc_id").agg(round(sum(col("s")), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Phrase search served from the POSITIONAL index: retrieve the docs
    * containing the corpus' top bigram (count desc, then (w1, w2) asc —
    * deterministic in any engine) with per-doc occurrence counts.
    * The phrase comes from the merged bigram table (vocab²-bounded partial
    * sums, a metadata-sized aggregate), is collected (1 row — the literal
    * the scan pruning needs), and the only data-sized work is the
    * positions scan FILTERED to the two phrase words: per-doc hits are
    * `|shift(ps₁) ∩ ps₂|`, which counts overlapping occurrences exactly
    * (positions are distinct, so "a a a" scores 2 for phrase "a a").
    * The w1 = w2 self-phrase case joins the same posting row to itself and
    * needs no special path. No Generate, no doc-sized join — the same
    * query-from-state shape as [[bm25Indexed]].
    */
  def phraseSearch(s: SparkSession, dir: String, limit: Int = 50): DataFrame = {
    val topRows = readTable(s, dir, "bigrams")
      .groupBy("w1", "w2").agg(sum("c").as("c"))
      .orderBy(col("c").desc, col("w1"), col("w2"))
      .limit(1).collect()
    require(topRows.nonEmpty,
      s"index at $dir has an empty bigram table (no doc with >= 2 tokens); " +
        "no phrase exists to search for")
    val (w1, w2) = (topRows.head.getString(0), topRows.head.getString(1))
    val pos = readTable(s, dir, "positions")
    val p1 = pos.filter(col("token") === w1)
      .select(col("doc_id"), col("ps").as("ps1"))
    val p2 = pos.filter(col("token") === w2)
      .select(col("doc_id"), col("ps").as("ps2"))
    p1.join(p2, "doc_id")
      .select(col("doc_id"),
        size(array_intersect(transform(col("ps1"), x => x + 1), col("ps2")))
          .as("n_hits"))
      .filter(col("n_hits") >= 1)
      .orderBy(col("n_hits").desc, col("doc_id"))
      .limit(limit)
  }

  /** Storage maintenance: rewrite an N-shard index as one shard at
    * `dstDir`. Streaming ingest leaves one shard per micro-batch, so a
    * k-term query pays ~k row groups TIMES N shards; compaction restores
    * the ~k bound. The rewrite merges the EXISTING committed tables —
    * postings/positions re-clustered by token, df/bigrams/stats folded by
    * sum — so its cost is index-sized, never a corpus re-tokenize (same
    * maintenance contract as `Scale.compactTiledDir` / `IvfPq.compactIndex`:
    * answers must be byte-identical before and after, TextIndexSpec-locked).
    * In-place compaction is unsupported: the rewrite lazily reads what it
    * would be overwriting.
    */
  def compactIndex(s: SparkSession, srcDir: String, dstDir: String): Unit = {
    require(new java.io.File(srcDir).getCanonicalPath !=
      new java.io.File(dstDir).getCanonicalPath,
      "compactIndex cannot compact in place: pass a fresh dstDir")
    readTable(s, srcDir, "postings")
      .select("token", "doc_id", "tf", "dl")
      .repartition(s.sessionState.conf.numShufflePartitions min 8, col("token"))
      .sortWithinPartitions("token", "doc_id")
      .write.mode("errorifexists").parquet(s"$dstDir/postings/shard=0")
    readTable(s, srcDir, "positions")
      .select("token", "doc_id", "ps")
      .repartition(s.sessionState.conf.numShufflePartitions min 8, col("token"))
      .sortWithinPartitions("token", "doc_id")
      .write.mode("errorifexists").parquet(s"$dstDir/positions/shard=0")
    readTable(s, srcDir, "bigrams")
      .groupBy("w1", "w2").agg(sum("c").as("c"))
      .coalesce(1)
      .write.mode("errorifexists").parquet(s"$dstDir/bigrams/shard=0")
    mergedDf(s, srcDir)
      .coalesce(1)
      .write.mode("errorifexists").parquet(s"$dstDir/df/shard=0")
    readTable(s, srcDir, "stats")
      .agg(sum("n_docs").as("n_docs"), sum("n_dl").as("n_dl"),
        sum("sum_dl").as("sum_dl"))
      .coalesce(1)
      .write.mode("errorifexists").parquet(s"$dstDir/stats/shard=0")
    commitShard(dstDir, 0)
  }

  // (applicationId, dataset)-keyed like the other ingest-time layouts
  private val indexDirs = scala.collection.mutable.Map[(String, String), String]()

  /** The harness index: built from the 90% corpus split, then the held-out
    * 10% APPENDED as a second shard — so the declared query's hash-green
    * row proves incremental maintenance equals a full build, the same
    * proof shape as q_mview_inc. Bench warms this with the other layouts.
    */
  def prepareIndex(s: SparkSession, d: String): String =
    indexDirs.synchronized {
      indexDirs.getOrElseUpdate((s.sparkContext.applicationId, d), {
        val dir = java.nio.file.Files.createTempDirectory("graft-textindex")
          .toFile.getAbsolutePath
        val docs = graft.Tables.documents(s, d).select("doc_id", "text")
        writeShard(docs.filter(col("doc_id") % 10 =!= 0), dir, 0)
        writeShard(docs.filter(col("doc_id") % 10 === 0), dir, 1)
        dir
      })
    }
}
