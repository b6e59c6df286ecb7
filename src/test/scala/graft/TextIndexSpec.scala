package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.{TextAnalysis, TextIndex}

/** Locks for the persistent inverted index (text/TextIndex.scala): the
  * indexed retrieval must answer exactly what the full-scan query answers,
  * under ANY slicing of the corpus into ingest shards, and its plan must
  * show the work really moved to ingest (pushed term filter, no
  * query-time tokenization).
  */
class TextIndexSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-tix").toFile.getAbsolutePath

  test("indexed BM25 equals the full-scan q_bm25 on the harness corpus") {
    val indexed = SparkEntry.queries("q_bm25_indexed")(s, sf).collect()
    val scan = SparkEntry.queries("q_bm25")(s, sf).collect()
    assert(indexed.toSeq == scan.toSeq)
  }

  test("merge equals rebuild: any shard slicing answers like one shard") {
    val docs = Tables.documents(s, sf).select("doc_id", "text")
    val one = freshDir()
    TextIndex.writeShard(docs, one, 0)
    val expected = TextIndex.bm25Indexed(s, one).collect().toSeq
    val expectedDf = TextIndex.mergedDf(s, one)
      .orderBy("token").collect().toSeq
    // 1, 3 and 7 shards, sliced by unrelated keys (mod and hash ranges)
    for ((nShards, key) <- Seq(
        (3, col("doc_id") % 3), (7, abs(hash(col("text"))) % 7))) {
      val dir = freshDir()
      for (k <- 0 until nShards)
        TextIndex.writeShard(docs.filter(key === k), dir, k)
      assert(TextIndex.mergedDf(s, dir).orderBy("token").collect().toSeq ==
        expectedDf, s"df diverged at $nShards shards")
      assert(TextIndex.bm25Indexed(s, dir).collect().toSeq == expected,
        s"bm25 diverged at $nShards shards")
      assert(TextIndex.phraseSearch(s, dir).collect().toSeq ==
        TextIndex.phraseSearch(s, one).collect().toSeq,
        s"phrase search diverged at $nShards shards")
    }
  }

  test("empty shards are harmless: append of zero docs changes nothing") {
    val docs = Tables.documents(s, sf).select("doc_id", "text")
    val dir = freshDir()
    TextIndex.writeShard(docs, dir, 0)
    val before = TextIndex.bm25Indexed(s, dir).collect().toSeq
    TextIndex.writeShard(docs.filter(lit(false)), dir, 1)
    assert(TextIndex.bm25Indexed(s, dir).collect().toSeq == before)
  }

  test("the indexed plan pushes the term IN filter and never tokenizes") {
    val df = TextIndex.bm25Indexed(s, TextIndex.prepareIndex(s, sf))
    val plan = df.queryExecution.executedPlan.toString
    // the postings scan receives the 8 query terms as a pushed IN filter —
    // with token-sorted files this is the row-group-pruning path
    assert(plan.contains("PushedFilters: [In(token"),
      s"no pushed term filter in:\n$plan")
    // no Generate node: the corpus explode happened at ingest, not here
    assert(!plan.contains("Generate"), s"query-time explode in:\n$plan")
    // and the documents table itself is never scanned at query time
    assert(!TestSpark.scannedDirs(df).exists(_.contains("documents")),
      "indexed query still reads the documents table")
  }

  test("postings files are token-sorted so min/max stats can prune") {
    val dir = TextIndex.prepareIndex(s, sf)
    val post = s.read.parquet(s"$dir/postings")
    import org.apache.spark.sql.expressions.Window
    val byFile = Window.partitionBy(input_file_name())
      .orderBy(monotonically_increasing_id())
    val unsorted = post
      .withColumn("prev", lag(col("token"), 1).over(byFile))
      .filter(col("prev") > col("token"))
    assert(unsorted.isEmpty, "postings not sorted by token within files")
  }

  test("phrase search counts overlapping occurrences and self-phrases") {
    import s.implicits._
    val dir = freshDir()
    // "a a a" contains "a a" twice (overlap); doc 2 has the phrase once;
    // doc 3 has both words but never adjacent in order
    TextIndex.writeShard(Seq(
      (1L, "a a a x"), (2L, "x a a y"), (3L, "a x y a"),
      (4L, "b b b b b")).toDF("doc_id", "text"), dir, 0)
    // corpus top bigram is (b, b) c=4; force the (a, a) phrase by checking
    // against a corpus whose top IS the self-phrase a a (c=3)
    val hits = TextIndex.phraseSearch(s, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(hits == Map(4L -> 4)) // "b b b b b": 4 overlapping b-b hits
    val dir2 = freshDir()
    TextIndex.writeShard(Seq(
      (1L, "a a a x"), (2L, "x a a y"), (3L, "a x y a")).toDF("doc_id", "text"),
      dir2, 0)
    val hits2 = TextIndex.phraseSearch(s, dir2).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(hits2 == Map(1L -> 2, 2L -> 1)) // doc 3 excluded: not adjacent
  }

  test("phrase search plan reads only the index, filtered to the phrase words") {
    val df = graft.text.TextIndex.phraseSearch(s, TextIndex.prepareIndex(s, sf))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"query-time explode in:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(token), EqualTo(token"),
      s"phrase-word filter not pushed in:\n$plan")
    assert(!TestSpark.scannedDirs(df).exists(_.contains("documents")),
      "phrase query still reads the documents table")
  }

  test("an uncommitted shard is invisible until repaired (partial-ingest safety)") {
    val docs = Tables.documents(s, sf).select("doc_id", "text")
    val dir = freshDir()
    TextIndex.writeShard(docs.filter(col("doc_id") % 2 === 0), dir, 0)
    val committedOnly = TextIndex.bm25Indexed(s, dir).collect().toSeq
    // simulate an ingest that died mid-shard: tables half-written (here:
    // fully written, marker removed — the weakest observable difference)
    TextIndex.writeShard(docs.filter(col("doc_id") % 2 === 1), dir, 1)
    assert(new java.io.File(s"$dir/_commits/1").delete())
    assert(TextIndex.committedShards(dir) == Seq(0))
    assert(TextIndex.bm25Indexed(s, dir).collect().toSeq == committedOnly,
      "uncommitted shard leaked into query results")
    // the documented repair: re-run the shard with overwrite = true
    TextIndex.writeShard(docs.filter(col("doc_id") % 2 === 1), dir, 1,
      overwrite = true)
    assert(TextIndex.committedShards(dir) == Seq(0, 1))
    val full = freshDir()
    TextIndex.writeShard(docs, full, 0)
    assert(TextIndex.bm25Indexed(s, dir).collect().toSeq ==
      TextIndex.bm25Indexed(s, full).collect().toSeq,
      "repaired index diverged from a clean build")
  }

  test("null-text docs count in idf's N but not in avgdl (avg() semantics)") {
    import s.implicits._
    val dir = freshDir()
    TextIndex.writeShard(Seq((1L, Some("a b c")), (2L, Some("a b")),
      (3L, None)).toDF("doc_id", "text"), dir, 0)
    val st = s.read.parquet(s"$dir/stats/shard=0").collect().head
    assert(st.getLong(st.fieldIndex("n_docs")) == 3) // all docs: BM25's N
    assert(st.getLong(st.fieldIndex("n_dl")) == 2)   // avg() skips null text
    assert(st.getLong(st.fieldIndex("sum_dl")) == 5) // 3 + 2
  }

  test("compaction refuses to run in place") {
    val dir = TextIndex.prepareIndex(s, sf)
    val e = intercept[IllegalArgumentException](
      TextIndex.compactIndex(s, dir, dir))
    assert(e.getMessage.contains("in place"))
  }

  test("compaction merges shards without changing any answer") {
    val docs = Tables.documents(s, sf).select("doc_id", "text")
    val src = freshDir()
    for (k <- 0 until 7) // streaming-ingest aftermath: one shard per batch
      TextIndex.writeShard(docs.filter(col("doc_id") % 7 === k), src, k)
    val dst = freshDir()
    TextIndex.compactIndex(s, src, dst)
    assert(TextIndex.mergedDf(s, dst).orderBy("token").collect().toSeq ==
      TextIndex.mergedDf(s, src).orderBy("token").collect().toSeq)
    assert(TextIndex.bm25Indexed(s, dst).collect().toSeq ==
      TextIndex.bm25Indexed(s, src).collect().toSeq)
    assert(TextIndex.phraseSearch(s, dst).collect().toSeq ==
      TextIndex.phraseSearch(s, src).collect().toSeq)
    def files(d: String) = s.read.parquet(s"$d/postings")
      .select(input_file_name()).distinct().count()
    assert(files(dst) < files(src),
      s"compaction did not shrink the file count: ${files(src)} -> ${files(dst)}")
    // the compacted layout keeps the pruning invariant
    val post = s.read.parquet(s"$dst/postings")
    import org.apache.spark.sql.expressions.Window
    val byFile = Window.partitionBy(input_file_name())
      .orderBy(monotonically_increasing_id())
    assert(post.withColumn("prev", lag(col("token"), 1).over(byFile))
      .filter(col("prev") > col("token")).isEmpty,
      "compacted postings not token-sorted within files")
  }

  test("a tombstoned doc never resurfaces: rebuild-without is the contract") {
    // the index is append-only; deletes are a shard rebuild (same contract
    // as Scale.compactTiledDir). Verify the rebuilt index forgets the doc.
    val docs = Tables.documents(s, sf).select("doc_id", "text")
    val victim = TextIndex.bm25Indexed(s, TextIndex.prepareIndex(s, sf))
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .head()
    val dir = freshDir()
    TextIndex.writeShard(docs.filter(col("doc_id") =!= victim), dir, 0)
    val hits = TextIndex.bm25Indexed(s, dir)
      .filter(col("doc_id") === victim)
    assert(hits.isEmpty, s"doc $victim still retrieved after rebuild")
  }
}
