package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables => T}

/** Text-analysis operators for a training-data pipeline (north-star ops — the
  * reference has no text processing; its only string work is CSV arg splitting,
  * `Gddp.scala:108,114`). Everything is built from codegen'd builtins
  * (`split`/`explode`/`transform`/`aggregate`), no UDFs, so the per-document
  * work stays in WholeStageCodegen and scales embarrassingly-parallel: no
  * operator here shuffles more than one aggregation.
  */
object TextAnalysis extends QueryModule {

  def tokens(c: Column): Column = split(c, " ")

  /** Token frequency: tokenize → explode → count. Partial aggregation
    * (map-side combine) keeps the shuffle at |vocab| not |tokens|.
    */
  private def qTokens(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(100)

  /** Per-document quality scores: length, token count, avg token length,
    * lexical diversity (distinct/total tokens). All single-pass, no shuffle.
    */
  private def qTextQuality(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"),
        length(col("text")).as("len"),
        size(tokens(col("text"))).as("n_tokens"),
        round(length(col("text")).cast("double") / size(tokens(col("text"))), 4)
          .as("avg_tok_len"),
        round(size(array_distinct(tokens(col("text")))).cast("double") /
          size(tokens(col("text"))), 4).as("diversity"))
      .orderBy("doc_id")

  /** Corpus token counting per source (whitespace tokenizer — the BPE-ish
    * regex variant is `qTokenCountBpe`, oracle-less due to regex dialects).
    */
  private def qTokenCount(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .groupBy("source")
      .agg(sum(size(tokens(col("text")))).as("total_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")

  /** Data-RECIPE mixing — the "data mixture" step of corpus prep: given
    * per-source weights and a total token budget, keep each source's docs
    * (in doc_id order) until that source's token quota `weight × budget`
    * is filled. One scan + one per-source running-sum window: the shuffle
    * carries source keys once, selection is the windowed cumsum compare.
    * At 100 TB a single mega-source makes its window partition the long
    * pole; the standard fix is pre-aggregating per-shard token counts to
    * pick a doc_id cutoff first (two metadata-sized passes) — the
    * windowed form is the general one and what the oracle states.
    */
  def mixRecipe(docs: DataFrame, weights: Map[String, Double],
      tokenBudget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    docs.select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("tok"))
      .withColumn("cum", sum("tok").over(w))
      .filter(col("cum") <=
        element_at(typedLit(weights), col("source")) * tokenBudget)
  }

  /** src0-src9 are "high-quality" at 7% each, src10-src19 at 3% — the
    * 2:1-ish upweighting a real recipe applies; Σ = 1.0 of the budget. */
  private[graft] val recipeWeights: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (if (i < 10) 0.07 else 0.03)).toMap

  private def qMixRecipe(s: SparkSession, d: String): DataFrame =
    mixRecipe(T.documents(s, d), recipeWeights, tokenBudget = 2000L)
      .orderBy("doc_id")

  /** BPE-ish token estimate: whitespace word-pieces counted as ceil(len/4)
    * pieces — the common "~4 chars per token" heuristic. Pure array
    * arithmetic, so it carries a full DuckDB oracle.
    */
  private def qTokenCountBpe(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"),
        aggregate(
          transform(tokens(col("text")), t => ceil(length(t).cast("double") / 4.0d).cast("long")),
          lit(0L), (acc, x) => acc + x).as("bpe_tokens"))
      .orderBy("doc_id")

  /** Stopword-profile language ID: scores each language by overlap between
    * the document's token set and a tiny per-language profile; profiles ride
    * along as array literals (broadcast-sized, like dimension tables). The
    * argmax is deterministic ((score, lang) struct max, tie-break on code),
    * so it carries a full DuckDB oracle; accuracy on crafted multilingual
    * fixtures is additionally asserted in ScalaTest.
    */
  private val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "que", "pour"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "von", "ist", "mit", "den", "im"))

  def langId(text: Column): Column = {
    val toks = array_distinct(split(text, " "))
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax by (score, lang) — deterministic tie-break on language code
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  private def qLangId(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"), col("lang").as("labeled_lang"), langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  /** Document fingerprint: order-sensitive rolling hash over token hashes
    * (h ← xxhash64(h, token)) — chained hashing instead of the classic
    * polynomial form because ANSI mode (Spark 4 default) rejects the
    * intentional multiply overflow. No oracle (xxhash64 is Spark-specific).
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))

  private def qFingerprint(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** tf·idf: term frequency per (doc, token) × ln(N / doc-frequency). Two
    * aggregations (both map-side combined) + a broadcast of the token→df dim
    * and the scalar N — no O(docs × vocab) blowup.
    */
  private def qTfidf(s: SparkSession, d: String): DataFrame = {
    val tf = T.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // tf holds exactly one row per (doc, token), so a count over the token
    // partition IS the document frequency — one corpus explode instead of
    // two, and no vocabulary-sized broadcast join (vocabularies don't fit
    // in a broadcast at corpus scale; a token-partitioned window shuffles
    // the same rows the join would and nothing else)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("token")
    val n = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
    tf.withColumn("df", count(lit(1)).over(w))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4).as("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id"), col("token"))
      .limit(200)
  }

  /** Okapi BM25 retrieval (k1 = 1.2, b = 0.75): score every document
    * against a deterministic query-term set (the corpus tokens ranked
    * 6th–13th by document frequency — mid-df terms, so the retrieval is
    * neither stopword-flooded nor single-doc-trivial) and return the
    * top-20 docs. The scale shape: ONE corpus explode builds per-(doc,
    * token) tf; df rolls up from tf (vocab-sized input, never re-exploding
    * the corpus); the 8-term query set broadcasts, so the big tf table is
    * FILTERED by a BroadcastHashJoin before anything doc-sized joins —
    * after the term filter only query-hit rows survive, and AQE turns the
    * hit⋈dl join into a broadcast at fixture scale. Document length comes
    * from a shuffle-free `size(split(...))` projection, NOT a second
    * explode. Scores round to 4 decimals before the ordering (the MMR
    * rule) so the top-k tie-breaks identically in any engine. At 100 TB
    * the per-doc scan dominates and everything downstream of the term
    * filter is hit-sized.
    */
  private def qBm25(s: SparkSession, d: String): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    val docs = T.documents(s, d)
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val queryTerms = dfTbl.orderBy(col("df").desc, col("token"))
      .offset(5).limit(8)
    val dl = docs.select(col("doc_id"), size(tokens(col("text"))).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      avg(size(tokens(col("text")))).as("avgdl"))
    tf.join(broadcast(queryTerms), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1)) /
          (col("tf") +
            lit(k1) * (lit(b) * col("dl") / col("avgdl") + (1 - b)))).as("s"))
      .groupBy("doc_id").agg(round(sum(col("s")), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** C4-style composed quality filter: per-source kept/total after the
    * standard length / avg-token-length / lexical-diversity gates. The gates
    * are one codegen'd projection; the only shuffle is the per-source rollup.
    */
  private def qQualityFilter(s: SparkSession, d: String): DataFrame = {
    val t = tokens(col("text"))
    T.documents(s, d)
      .select(col("source"),
        size(t).as("n_tokens"),
        (length(col("text")).cast("double") / size(t)).as("atl"),
        (size(array_distinct(t)).cast("double") / size(t)).as("div"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_tokens").between(20, 80) &&
          col("atl").between(2.0, 10.0) && col("div") >= 0.45, 1L).otherwise(0L)).as("n_kept"))
      .orderBy("source")
  }

  /** Gopher-style repetition signal: fraction of a document's bigrams taken
    * by its single most frequent bigram. Two partial-aggregated shuffles on
    * (doc, bigram) then (doc) — both keyed finer than or equal to doc, so
    * state is bounded by the corpus' distinct bigrams per doc.
    */
  private def qTopBigram(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    docs
      .select(col("doc_id"), size(col("t")).as("n"),
        explode(transform(sequence(lit(0), size(col("t")) - 2),
          i => concat_ws(" ", element_at(col("t"), i + 1), element_at(col("t"), i + 2)))).as("bg"))
      .groupBy("doc_id", "n", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n").agg(max("c").as("top"))
      .select(col("doc_id"),
        round(col("top").cast("double") / (col("n") - 1), 4).as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  /** Per-document keyword extraction: each doc's top-tfidf token (argmax
    * via a doc-keyed row_number window; score-then-token ordering makes
    * ties deterministic in both engines). Same one-explode tfidf shape as
    * [[qTfidf]] — (doc, token) tf aggregate, df as a token-partitioned
    * window over that table, scalar N broadcast — plus one doc-keyed
    * window to pick the winner; nothing corpus-quadratic.
    */
  private def qKeywords(s: SparkSession, d: String): DataFrame = {
    val tf = T.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val wDf = org.apache.spark.sql.expressions.Window.partitionBy("token")
    val wTop = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("token"))
    val n = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
    tf.withColumn("df", count(lit(1)).over(wDf))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4).as("tfidf"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("token").as("keyword"), col("tfidf"))
      .transform(graft.SortedDist(_, "doc_id")) // data-sized tail: see SortedDist
  }

  /** Consecutive-token (w1, w2) bigram rows of a tokenized corpus (a `t`
    * array column), keeping `keep` columns alongside. One Generate pass —
    * the only data-sized scan the LM/PMI queries make over the corpus;
    * package-visible so [[TextIndex]] builds its bigram statistics from
    * the same definition.
    */
  private[text] def bigramRows(docs: DataFrame, keep: Column*): DataFrame =
    docs
      .filter(size(col("t")) >= 2)
      .select(keep :+ explode(transform(sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("w1"),
          element_at(col("t"), i + 2).as("w2")))).as("bg"): _*)
      .select(keep :+ col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)

  /** CCNet-style LM quality scoring (Wenzek et al. 2020, "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data"): train an
    * add-one-smoothed bigram LM on the English slice, then score EVERY
    * document by its average negative log-likelihood under that LM — low
    * score = fluent in-distribution text, high = other languages / junk.
    * The reference has no model-based filtering at all.
    *
    * Scale shape: the train pass is one bigram explode feeding two
    * vocab-sized count tables (c12, c1) plus a 1-row vocab size; the score
    * pass is one explode + two left joins against those count tables (AQE
    * broadcasts them at fixture scale; on a 100 TB corpus they become hash
    * joins keyed on (w1, w2) / w1, still vocab- not corpus-sized) + one
    * doc-keyed aggregate. Nothing all-pairs, nothing driver-side.
    */
  /** Bigram-LM ingest-time state over a train corpus (docs with `text`):
    * the (w1, w2) count table plus the distinct vocabulary. Both are
    * EXACTLY mergeable across disjoint shards — bigram counts add,
    * vocabularies union ([[appendLmShard]], StreamingSpec parity-locked) —
    * so a deployment maintains them at ingest and admission-time scoring
    * never rescans the train corpus. c1 is NOT stored: it rolls up from
    * c12 at score time (Σ_w2 c12, vocab-sized input).
    */
  def lmCounts(train: DataFrame): (DataFrame, DataFrame) = {
    val t = train.select(tokens(col("text")).as("t"))
    val c12 = bigramRows(t).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val vocab = t.select(explode(col("t")).as("w")).distinct()
    (c12, vocab)
  }

  /** Fold one ingested shard into the LM state: one full-outer merge on the
    * bigram key (counts add exactly) + a vocabulary union-distinct.
    */
  def appendLmShard(c12: DataFrame, vocab: DataFrame,
      shard: DataFrame): (DataFrame, DataFrame) = {
    val (s12, sv) = lmCounts(shard)
    val merged = c12.select(col("w1"), col("w2"), col("c12").as("a"))
      .join(s12.select(col("w1"), col("w2"), col("c12").as("b")),
        Seq("w1", "w2"), "full_outer")
      .select(col("w1"), col("w2"),
        (coalesce(col("a"), lit(0L)) + coalesce(col("b"), lit(0L))).as("c12"))
    (merged, vocab.union(sv).distinct())
  }

  /** Per-doc average negative log-likelihood of `docs` (doc_id, lang, text)
    * under the add-one-smoothed bigram LM state. See [[qNgramLm]] for the
    * scale shape.
    */
  def lmScoreAgainst(docs: DataFrame, c12: DataFrame,
      vocab: DataFrame): DataFrame = {
    val v = vocab.agg(count(lit(1)).as("v"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    bigramRows(docs.select(col("doc_id"), col("lang"), tokens(col("text")).as("t")),
        col("doc_id"), col("lang"))
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(v)
      .select(col("doc_id"), col("lang"),
        (-log((coalesce(col("c12"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")))).as("nll"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("nll")), 4).as("lm_score"))
  }

  private def qNgramLm(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val (c12, vocab) = lmCounts(docs.filter(col("lang") === "en"))
    lmScoreAgainst(docs, c12, vocab).orderBy("doc_id")
  }

  /** LM-based shard admission — the model-scoring member of the admission
    * family (MinHash admit / containment admit / embedding admit / segment
    * scrub / this): the 90% corpus contributes only its trained LM count
    * tables (at a real deployment, maintained ingest state — vocab-sized,
    * mergeable across shards by summing counts), the 10% shard is scored
    * against them, and docs above the nll threshold are rejected. CCNet's
    * perplexity gate applied at admission time; the corpus is never
    * re-scanned at admit.
    */
  private def qLmAdmit(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val (c12, vocab) = lmCounts(
      docs.filter(col("lang") === "en" && col("doc_id") % 10 =!= 0))
    lmScoreAgainst(docs.filter(col("doc_id") % 10 === 0), c12, vocab)
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("lm_score"),
        when(col("lm_score") <= 3.4, 1).otherwise(0).as("admit"))
      .orderBy("doc_id")
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): score every pool document by the log importance
    * ratio log p_target(x) − log p_raw(x) under two cheap bag-of-bigram
    * LMs — one trained on the TARGET domain (here the `src18` slice
    * standing in for "looks like Wikipedia"), one on the raw pool — and
    * select the top-k. This is the pretraining-mix curation step that
    * upweights in-domain text without a neural scorer. Deterministic
    * variant: the paper's Gumbel-top-k resample is taken at its
    * temperature→0 limit (straight arg-top-k; the stochastic member of
    * the family is `q_sample_temperature`), both arms reuse the
    * add-one-smoothed [[lmCounts]]/[[lmScoreAgainst]] state, and the
    * per-doc ratio is a difference of the two 4-decimal-rounded avg NLLs
    * so the DuckDB twin is exact.
    *
    * Scale shape: two vocab-sized count tables (ingest-state, mergeable
    * across shards via [[appendLmShard]]), two score passes that each join
    * the corpus explode against them, one TakeOrdered(k) — no global sort,
    * nothing driver-side, nothing all-pairs.
    */
  private def qDsir(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    // The target slice (src18) is a SUBSET of the raw en pool, so both
    // arms' count tables fall out of ONE flagged explode + aggregate
    // (tc12 counts target rows only, rc12 all rows) instead of two full
    // lmCounts passes over overlapping slices — and the score pass joins
    // ONE combined table per key level ((w1, w2) and w1) instead of two,
    // halving the train-side corpus work and two of the four score joins.
    // Absent-key semantics are unchanged: a bigram the target never saw
    // carries tc12 = 0 here where the two-table form produced a missed
    // join -> NULL -> coalesce 0.
    val enT = docs.filter(col("lang") === "en")
      .select((col("source") === "src18").as("tgt"), tokens(col("text")).as("t"))
    val c12 = bigramRows(enT, col("tgt"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("rc12"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("tc12"))
    val c1 = c12.groupBy("w1")
      .agg(sum("rc12").as("rc1"), sum("tc12").as("tc1"))
    val vc = enT.select(col("tgt"), explode(col("t")).as("w"))
      .groupBy("w")
      .agg((sum(when(col("tgt"), 1L).otherwise(0L)) > 0).as("tgt"))
      .agg(count(lit(1)).as("rv"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("tv"))
    bigramRows(docs.select(col("doc_id"), col("lang"), tokens(col("text")).as("t")),
        col("doc_id"), col("lang"))
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(vc)
      .select(col("doc_id"), col("lang"),
        (-log((coalesce(col("tc12"), lit(0L)) + 1).cast("double") /
          (coalesce(col("tc1"), lit(0L)) + col("tv")))).as("nt"),
        (-log((coalesce(col("rc12"), lit(0L)) + 1).cast("double") /
          (coalesce(col("rc1"), lit(0L)) + col("rv")))).as("nr"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("nt")), 4).as("nll_tgt"),
        round(avg(col("nr")), 4).as("nll_raw"))
      .withColumn("log_ratio", round(col("nll_raw") - col("nll_tgt"), 4))
      .orderBy(col("log_ratio").desc, col("doc_id"))
      .limit(100)
      .select("doc_id", "lang", "n_bigrams", "nll_tgt", "nll_raw", "log_ratio")
  }

  /** PMI collocation mining: pointwise mutual information
    * ln(c12·N / (c1·c2)) over corpus bigrams with a min-support gate,
    * top 50. c1/c2 count a token's occurrences as bigram-left / bigram-right
    * and N the total bigram count, so all four tables are vocab-sized
    * aggregates of ONE corpus explode. The min-support HAVING prunes c12
    * before it joins; products are computed in double so counts can't
    * overflow at web scale; top-50 is TakeOrderedAndProject, never a full
    * sort.
    */
  private def qPmi(s: SparkSession, d: String): DataFrame = {
    // ONE corpus explode feeds one (w1, w2) aggregate; N / c1 / c2 all roll
    // up from that vocab-sized table (Σc12 marginals), so the three extra
    // aggregates never touch the corpus again
    val c12all = bigramRows(
      T.documents(s, d).select(tokens(col("text")).as("t")))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val n = c12all.agg(sum("c12").as("n"))
    // c1/c2 as window sums over the vocab-sized bigram table instead of two
    // marginal aggregates joined back: two exchanges fewer and no join-side
    // re-aggregation (the corpus explode itself was already shared through
    // the (w1, w2) exchange; `n` still reads that same reused exchange).
    // The min-support filter applies AFTER the marginals, as before.
    import org.apache.spark.sql.expressions.{Window => W}
    c12all
      .withColumn("c1", sum("c12").over(W.partitionBy("w1")))
      .withColumn("c2", sum("c12").over(W.partitionBy("w2")))
      .filter(col("c12") >= 5)
      .crossJoin(broadcast(n))
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"), col("c12"),
        round(log(col("c12").cast("double") * col("n") /
          (col("c1").cast("double") * col("c2"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(50)
  }

  /** Character-class composition ratios (alpha/digit/space) — the usual
    * symbol-soup quality gates; single projection, shuffle-free.
    */
  private def qCharRatios(s: SparkSession, d: String): DataFrame = {
    def ratio(keep: String): Column =
      round(length(regexp_replace(col("text"), keep, "")).cast("double") /
        length(col("text")), 4)
    T.documents(s, d)
      .select(col("doc_id"),
        ratio("[^a-z]").as("alpha_ratio"),
        ratio("[^0-9]").as("digit_ratio"),
        ratio("[^ ]").as("space_ratio"))
      .orderBy("doc_id")
  }

  /** Stopword ratio against the English profile — low values flag non-prose
    * (logs, tables, boilerplate); the profile is a constant-folded array.
    */
  private def qStopwordRatio(s: SparkSession, d: String): DataFrame = {
    val sw = array(langProfiles("en").map(lit): _*)
    val t = tokens(col("text"))
    T.documents(s, d)
      .select(col("doc_id"),
        round(size(filter(t, tok => array_contains(sw, tok))).cast("double") /
          size(t), 4).as("stopword_ratio"))
      .orderBy("doc_id")
  }

  /** Exact corpus-wide top tokens — the full-shuffle baseline. */
  private def qTopTokens(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(10)

  /** The same question through the Misra-Gries sketch (ApproxTopK): a
    * bounded-state mergeable aggregate instead of a full-cardinality
    * groupBy shuffle — the 100 TB path. The fixture vocabulary (31 tokens)
    * is far under the sketch capacity, so counts here are provably exact
    * and the query keeps a full oracle; compression behavior under
    * capacity pressure is asserted in ApproxTopKSpec.
    */
  private def qTopTokensApprox(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .agg(graft.functions.ApproxTopKFunctions
        .approx_top_k(col("token"), k = 10, capacity = 512).as("top"))
      .select(posexplode(col("top")).as(Seq("rank", "entry")))
      .select(col("rank"), col("entry.item").as("token"), col("entry.est_n").as("n"))
      .orderBy("rank")

  /** Per-source token frequencies through a count-min sketch: the mergeable
    * fixed-state path for "how often does token X appear per shard" at
    * corpus scale. The sketch aggregate (Spark's built-in
    * `count_min_sketch`, partial+final with map-side combine) carries
    * depth×width counters per source through the shuffle — NOT the token
    * cardinality — and the probe ([[graft.functions.CmsEstimate]]) runs on
    * the 20 aggregated group rows only. The fixture vocabulary (~31 tokens)
    * is far below the 2/eps=2000-bucket width, so estimates here are exact
    * and the query keeps a full oracle; overcount behavior under width
    * pressure is asserted in CmsSpec.
    */
  private def qTokenCms(s: SparkSession, d: String): DataFrame = {
    val probes = Seq("join", "hash", "scan", "filter", "merge")
    val sketches = T.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy("source")
      .agg(count_min_sketch(col("token"), lit(0.001d), lit(0.99d), lit(42)).as("cms"))
    sketches
      .select(col("source"), explode(array(probes.map(lit): _*)).as("token"), col("cms"))
      .select(col("source"), col("token"),
        graft.functions.CmsFunctions.cms_estimate(col("cms"), col("token")).as("est_n"))
      .orderBy("source", "token")
  }

  /** Text normalization — the standard pre-tokenization cleanup pass of a
    * training-data pipeline (lowercase, strip non-alphanumerics, collapse
    * runs of spaces, trim). Pure codegen'd string expressions; no UDFs.
    */
  private def qNormalize(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " ")).as("norm_text"))
      .select(col("doc_id"), col("norm_text"),
        size(split(col("norm_text"), " ")).as("n_tokens"))
      .orderBy("doc_id")

  /** Repetition ratios (the Gopher-class quality signal): fraction of
    * duplicate word bigrams/trigrams per document — high values flag
    * boilerplate and degenerate generations. Pure per-row array math on the
    * already-split token column: a scan, no explode, no shuffle.
    */
  private def qRepetition(s: SparkSession, d: String): DataFrame = {
    def grams(toks: Column, k: Int): Column =
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(array())
    def dupRatio(g: Column): Column =
      when(size(g) > 0,
        round(lit(1.0) - size(array_distinct(g)).cast("double") / size(g), 4))
        .otherwise(lit(0.0))
    T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), grams(col("toks"), 2).as("g2"), grams(col("toks"), 3).as("g3"))
      .select(col("doc_id"),
        dupRatio(col("g2")).as("dup_bigram_ratio"),
        dupRatio(col("g3")).as("dup_trigram_ratio"))
      .orderBy("doc_id")
  }

  /** Context packing, concat-and-chunk form (the GPT-style pipeline: docs
    * are concatenated in a stable order and split into fixed-token training
    * contexts): each doc's sequence id is the budget-chunk its START offset
    * falls in, from one window cumsum per source partition. seq_fill is the
    * cumulative fill through the doc's end relative to its chunk (> 1.0 ⇒
    * the doc straddles into the next chunk) — the packing-efficiency /
    * boundary-split signal.
    */
  private def qPackContexts(s: SparkSession, d: String): DataFrame = {
    val budget = 512
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    T.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("seq_id",
        floor((col("cum") - col("n_tokens")) / budget).cast("long"))
      .withColumn("seq_fill",
        round((col("cum") - col("seq_id") * budget) / lit(budget.toDouble), 4))
      .select("doc_id", "source", "n_tokens", "seq_id", "seq_fill")
      .transform(graft.SortedDist(_, "doc_id")) // data-sized tail: see SortedDist
  }

  /** The SALTED twin of [[qPackContexts]] — same output contract, scalable
    * partitioning. The plain form's only shuffle keys on `source` (bounded
    * cardinality), so one giant source becomes one giant window partition.
    * Here the partition key is salted with ORDERED doc_id ranges
    * (`bucket = doc_id / width` — ranges, not hashes, because packing is
    * order-dependent), the cumsum runs per (source, bucket), and the global
    * positions are restored by adding each bucket's offset — the running
    * total of all earlier buckets in its source, computed on the
    * metadata-sized (source, bucket, total) table and broadcast back.
    * seq_id/seq_fill are arithmetic on the restored global cumsum, so the
    * output is row-identical to the unsalted form (same oracle) while the
    * wide shuffle carries sources × buckets keys.
    */
  def packContextsSalted(docs: DataFrame, budget: Int, bucketWidth: Long): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wB = W.partitionBy("source", "bucket").orderBy("doc_id")
    val toks = docs
      .select(col("doc_id"), col("source"), size(tokens(col("text"))).as("n_tokens"))
      .withColumn("bucket", floor(col("doc_id") / bucketWidth))
      // explicit join-key not-null filters: the broadcast join infers them
      // on its streamed side only, which would make the two consumers'
      // exchange subtrees canonically different and defeat the reuse below
      .filter(col("source").isNotNull && col("bucket").isNotNull)
    val toksW = toks.withColumn("lcum", sum("n_tokens").over(wB))
    // per-bucket offsets DERIVED FROM the windowed output (bucket total =
    // max cumulative), not from a second aggregate over `toks`: both
    // consumers then share one canonical Exchange subtree, so the corpus
    // tokenize runs ONCE (ReusedExchange) instead of once per consumer —
    // at scale the tokenize pass is the dominant cost of this query
    val wOff = W.partitionBy("source").orderBy("bucket")
      .rowsBetween(W.unboundedPreceding, -1)
    val offs = toksW.groupBy("source", "bucket").agg(max("lcum").as("btotal"))
      .withColumn("boff", coalesce(sum("btotal").over(wOff), lit(0L)))
      .select("source", "bucket", "boff")
    toksW
      .join(broadcast(offs), Seq("source", "bucket"))
      .withColumn("cum", col("lcum") + col("boff"))
      .withColumn("seq_id",
        floor((col("cum") - col("n_tokens")) / budget).cast("long"))
      .withColumn("seq_fill",
        round((col("cum") - col("seq_id") * budget) / lit(budget.toDouble), 4))
      .select("doc_id", "source", "n_tokens", "seq_id", "seq_fill")
  }

  private def qPackContextsSalted(s: SparkSession, d: String): DataFrame =
    packContextsSalted(T.documents(s, d), budget = 512, bucketWidth = 64)
      .orderBy("doc_id")

  /** Benchmark-contamination check — the train/test leakage scan every LLM
    * corpus needs before training: for each training document, the fraction
    * of its distinct token 5-grams that also appear in the evaluation set
    * (here the deterministic doc_id % 97 == 0 subset standing in for a
    * benchmark). The eval side's distinct-shingle set is benchmark-sized
    * (MBs even for real suites) → broadcast; the corpus side pays one scan
    * + explode + broadcast left-join + per-doc aggregates. No corpus
    * self-join ever forms, so the shape survives any corpus size.
    *
    * Explode shape matters: Generate re-evaluates an INLINE generator per
    * OUTPUT row, so exploding a built-per-doc shingle array re-built the
    * array (transform + array_distinct) once per shingle — O(len²) per doc,
    * 13× slower end to end. Exploding the cheap POSITION sequence instead
    * and building each shingle string once per output row keeps the
    * expensive work linear; the per-doc distinct moves into the (doc_id, g)
    * pre-aggregation, whose map-side partial dedups before the exchange.
    * (At real scale the shuffle would carry shingle HASHES, as the MinHash
    * path does; strings here keep the DuckDB oracle exact.)
    */
  /** Distinct (doc_id, 5-gram) rows via the fast position-explode shape
    * (see [[qContamination]]'s scaladoc for why NOT explode-the-array).
    */
  private def shingleRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 5)
      .select(col("doc_id"), col("t"),
        explode(expr("sequence(1, size(t) - 4)")).as("i"))
      .select(col("doc_id"), expr("array_join(slice(t, i, 5), ' ')").as("g"))
      .distinct() // per-doc distinct shingles; partial agg dedups map-side

  private def qContamination(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val evalSet = shingleRows(docs.filter(col("doc_id") % 97 === 0))
      .select("g").distinct()
      .withColumn("hit", lit(1))
    shingleRows(docs.filter(col("doc_id") % 97 =!= 0))
      .join(broadcast(evalSet), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .withColumn("contamination", round(col("n_hit") / col("n_shingles"), 4))
      .orderBy("doc_id")
  }

  /** The corpus-prep pipeline END TO END as one declared query — the
    * composition a pipeline user actually runs nightly: eval-doc exclusion →
    * quality gate (q_quality_filter's predicate) → exact dedup (min doc_id
    * per identical text) → benchmark decontamination (q_contamination's
    * position-explode shape, frac < 0.05 gate) → train split
    * (q_split_assign's LCG) → context packing (q_pack_contexts' window
    * cumsum). Proves the operators COMPOSE: one Catalyst plan, stages fused
    * where possible. Shuffle budget at any corpus size: dedup keys one
    * exchange on text (a content hash at real scale), decontamination the
    * (doc_id, g) pre-agg + per-doc agg (eval set stays broadcast), packing
    * one window keyed on source — nothing quadratic, no corpus self-join.
    * Fully row-oracle-checked as one CTE chain.
    */
  private def qPipelineE2e(s: SparkSession, d: String): DataFrame = {
    val budget = 512
    val t = tokens(col("text"))
    val quality = T.documents(s, d)
      .filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("source"), col("text"),
        size(t).as("n_tokens"),
        (length(col("text")).cast("double") / size(t)).as("atl"),
        (size(array_distinct(t)).cast("double") / size(t)).as("div"))
      .filter(col("n_tokens").between(20, 80) &&
        col("atl").between(2.0, 10.0) && col("div") >= 0.45)
      .select("doc_id", "source", "text", "n_tokens")
    val wTxt = org.apache.spark.sql.expressions.Window.partitionBy("text")
    val deduped = quality
      .withColumn("keep_id", min("doc_id").over(wTxt))
      .filter(col("doc_id") === col("keep_id"))
      .drop("keep_id")
    val evalSet = shingleRows(T.documents(s, d).filter(col("doc_id") % 97 === 0))
      .select("g").distinct()
      .withColumn("hit", lit(1))
    // (source, n_tokens) ride the shingle expansion — functionally dependent
    // on doc_id, so grouping by all three is the same per-doc aggregate, and
    // the post-dedup subtree is consumed ONCE (no join-back recomputing the
    // quality+dedup stages; two small extra columns on the shingle exchange
    // is the whole price)
    val train = deduped
      .select(col("doc_id"), col("source"), col("n_tokens"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 5)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("t"),
        explode(expr("sequence(1, size(t) - 4)")).as("i"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr("array_join(slice(t, i, 5), ' ')").as("g"))
      .distinct()
      .join(broadcast(evalSet), Seq("g"), "left")
      .groupBy("doc_id", "source", "n_tokens")
      .agg((sum(coalesce(col("hit"), lit(0))) / count(lit(1))).as("frac"))
      .filter(col("frac") < 0.05)
      .filter(((col("doc_id") % 1000003L) * 1103515245L + 12345L) % 1000000L < 900000L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    train
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("seq_id", floor((col("cum") - col("n_tokens")) / budget).cast("long"))
      .withColumn("seq_fill",
        round((col("cum") - col("seq_id") * budget) / lit(budget.toDouble), 4))
      .select("doc_id", "source", "n_tokens", "seq_id", "seq_fill")
      .transform(graft.SortedDist(_, "doc_id")) // data-sized tail: see SortedDist
  }

  /** The corpus-prep pipeline with the PRODUCTION near-dedup stage: the same
    * stages as [[qPipelineE2e]], but the exact-dedup window is replaced by
    * the banded-LSH path ([[graft.dedup.Dedup.dedupClusters]]): MinHash band
    * buckets → candidate equi-join → exact-Jaccard ≥ 0.5 verification →
    * connected components, keeping each cluster's smallest doc_id. Not one
    * Catalyst plan like the exact twin — CC is iterative by construction
    * (eagerly checkpointed rounds) — but every expensive subtree keeps the
    * production shape: candidates from the band equi-join (O(candidates),
    * never all-pairs), verification touching candidates only, the
    * doc-count-sized component table joining back broadcast-small. ONE
    * corpus tokenize for the quality stage (the filtered result is
    * eagerly materialized and every consumer — the signature slice, the
    * CC join-back, the survivor join — reads the survivor-sized
    * checkpoint), and the signatures themselves come from the shared
    * corpus cache sliced by survivor ids.
    *
    * Oracle: the e2e CTE chain with the dedup stage as a recursive CTE over
    * the identical exact-verified edge set — sound because banded candidates
    * are verified with exact shingle Jaccard and banding recall is total at
    * j ≥ 0.5 on this corpus (q_dedup_cluster_lsh's standing contract).
    */
  private def qPipelineNear(s: SparkSession, d: String): DataFrame =
    pipelineNearBase(s, d, postDedup = (_, deduped) => deduped)

  /** [[qPipelineNear]] plus the CONTAINMENT-drop stage — what a real
    * corpus-prep run does with the containment pairs q_containment_pairs
    * surfaces: after Jaccard-CC near-dedup, a doc ≥80%-contained in another
    * surviving doc is a subset document (a quote, an excerpt, a template
    * instantiation) and is dropped. The contained SIDE is the one with the
    * smaller kept-shingle set (ties: the larger doc_id). Pairs restrict to
    * dedup survivors — a pair against an already-dropped doc is moot. The
    * pair set is candidate-sized (posting-list-bounded), so both joins here
    * broadcast; the stage adds no shuffle of the corpus itself.
    */
  private def qPipelineFull(s: SparkSession, d: String): DataFrame =
    pipelineNearBase(s, d, postDedup = (spark, deduped0) => {
      // the quality+CC-join subtree is consumed TWICE here (survivor ids for
      // the pair restriction + the anti-join input) — materialize it once;
      // doc-count-sized, same eager-checkpoint trade as the CC rounds
      val deduped = graft.dedup.Dedup.eagerCheckpoint(deduped0)
      val surv = deduped.select("doc_id")
      val contSurv = graft.dedup.Dedup.containmentPairsCached(spark, d)
        .join(surv.withColumnRenamed("doc_id", "doc1"), "doc1")
        .join(surv.withColumnRenamed("doc_id", "doc2"), "doc2")
      val dropIds = graft.dedup.Dedup.containmentDropIds(contSurv)
      deduped.join(broadcast(dropIds), Seq("doc_id"), "left_anti")
    })

  private def pipelineNearBase(s: SparkSession, d: String,
      postDedup: (SparkSession, DataFrame) => DataFrame): DataFrame = {
    val budget = 512
    val t = tokens(col("text"))
    val quality = T.documents(s, d)
      .filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("source"), col("text"),
        size(t).as("n_tokens"),
        (length(col("text")).cast("double") / size(t)).as("atl"),
        (size(array_distinct(t)).cast("double") / size(t)).as("div"))
      .filter(col("n_tokens").between(20, 80) &&
        col("atl").between(2.0, 10.0) && col("div") >= 0.45)
      .select("doc_id", "source", "text", "n_tokens")
      // the quality scan is consumed by the signature slice, the CC
      // join-back, and the survivor join — materialize the (survivor-sized)
      // result once instead of re-tokenizing the corpus per consumer
      .transform(graft.dedup.Dedup.eagerCheckpoint)
    // the dedup stage consumes the SHARED corpus signature cache sliced to
    // the quality survivors (per-row purity makes the slice identical to
    // re-deriving signatures over the subset) — previously this stage
    // re-tokenized and re-minhashed the quality docs on every run
    val qualitySigs = graft.dedup.Dedup.sigsCached(s, d)
      .join(quality.select("doc_id"), Seq("doc_id"))
    val comps = graft.dedup.Dedup.dedupClustersFromSigs(quality, qualitySigs)
    val deduped = postDedup(s, quality.join(comps, Seq("doc_id"))
      .filter(col("doc_id") === col("component")).drop("component"))
    val evalSet = shingleRows(T.documents(s, d).filter(col("doc_id") % 97 === 0))
      .select("g").distinct()
      .withColumn("hit", lit(1))
    val train = deduped
      .select(col("doc_id"), col("source"), col("n_tokens"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 5)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("t"),
        explode(expr("sequence(1, size(t) - 4)")).as("i"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr("array_join(slice(t, i, 5), ' ')").as("g"))
      .distinct()
      .join(broadcast(evalSet), Seq("g"), "left")
      .groupBy("doc_id", "source", "n_tokens")
      .agg((sum(coalesce(col("hit"), lit(0))) / count(lit(1))).as("frac"))
      .filter(col("frac") < 0.05)
      .filter(((col("doc_id") % 1000003L) * 1103515245L + 12345L) % 1000000L < 900000L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    train
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("seq_id", floor((col("cum") - col("n_tokens")) / budget).cast("long"))
      .withColumn("seq_fill",
        round((col("cum") - col("seq_id") * budget) / lit(budget.toDouble), 4))
      .select("doc_id", "source", "n_tokens", "seq_id", "seq_fill")
      .orderBy("doc_id")
  }

  /** PII redaction scrub — the regex pass every pre-training pipeline runs
    * before tokenization. The synthetic corpus carries no PII, so the query
    * first derives a deterministic contact-bearing column (identical
    * construction in the DuckDB oracle); the operator under test is the
    * redaction itself: count the matches, scrub them with replacement tags,
    * and prove the scrub left nothing behind. Patterns stay in the
    * RE2∩Java-regex common dialect so both engines match identically. Pure
    * per-row regex projections (codegen'd, shuffle-free): at 100 TB this is
    * an embarrassingly-parallel single scan.
    */
  private def qPiiRedact(s: SparkSession, d: String): DataFrame = {
    val email = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\d{3}-\\d{4}"
    val redacted =
      regexp_replace(regexp_replace(col("contact"), email, "[EMAIL]"),
        phone, "[PHONE]")
    T.documents(s, d)
      .withColumn("contact",
        concat(col("text"), lit(" reach user"), col("doc_id"),
          lit("@example.com or 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .select(col("doc_id"),
        regexp_count(col("contact"), lit(email)).as("n_emails"),
        regexp_count(col("contact"), lit(phone)).as("n_phones"),
        length(redacted).as("len_redacted"),
        (regexp_count(redacted, lit(email)) +
          regexp_count(redacted, lit(phone))).as("n_left"))
      .orderBy("doc_id")
  }

  /** Curriculum phases: equal-width document-length buckets with per-phase
    * corpus stats — the short-to-long ordering pass of curriculum training.
    * All-integer bucket arithmetic (`DIV`), so both engines agree exactly.
    * Shape: one broadcast scalar agg + a 4-key groupBy — no global sort; a
    * global `ntile` window would serialize the corpus through ONE partition,
    * which is exactly what this avoids at 100 TB.
    */
  private def qCurriculum(s: SparkSession, d: String): DataFrame = {
    val bounds = broadcast(T.documents(s, d)
      .agg(min("n_chars").as("mn"), max("n_chars").as("mx")))
    T.documents(s, d).crossJoin(bounds)
      .withColumn("phase",
        expr("CAST((n_chars - mn) * 4 DIV (mx - mn + 1) AS INT)"))
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text")))).as("total_tokens"),
        round(avg(col("n_chars")), 4).as("avg_chars"))
      .orderBy("phase")
  }

  /** Sliding-window document chunking with overlap — the other half of the
    * context-prep story next to [[qPackContexts]]: long documents split
    * into fixed-size token windows (size 64, stride 48 → 16-token overlap)
    * so no training context straddles a hard cut. Pure per-row array math
    * (`sequence` over starts + `slice`), explode fan-out only — no shuffle
    * before the oracle sort, embarrassingly parallel at any corpus size.
    */
  private def qChunkDocs(s: SparkSession, d: String): DataFrame = {
    val (size_, stride) = (64, 48)
    T.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"), posexplode(
        sequence(lit(0), greatest(size(col("t")) - 1, lit(0)), lit(stride)))
        .as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ", slice(col("t"), col("start") + 1, lit(size_))).as("chunk_text"),
        least(size(col("t")) - col("start"), lit(size_)).as("chunk_len"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Corpus-frequency segment dedup — the duplicated-line/boilerplate removal
    * pass (C4's "discard any line seen more than once"; RefinedWeb/Dolma run
    * the same rule per line or paragraph). The synthetic corpus has no
    * newlines, so the unit is a fixed non-overlapping 4-token segment: any
    * segment whose exact text occurs in ≥ 3 distinct documents is corpus
    * boilerplate, every occurrence is dropped, and each document is
    * reassembled from its surviving segments in order. Unlike the doc-level
    * dedup family this rewrites documents rather than dropping them.
    *
    * Shape: one segment explode, a two-level distinct-doc-count aggregate on
    * the segment key, a join back on that same key, and a per-doc reassembly
    * aggregate — every exchange is segment- or doc-keyed, nothing quadratic.
    * At 100 TB the df table is vocabulary-of-segments-sized and would live as
    * warmed ingest-time state exactly like the containment posting index
    * (df-only, no posting lists, so it is strictly smaller state).
    */
  /** Non-overlapping k-token segments of each document: (doc_id, seg_id, seg). */
  def segments(docs: DataFrame, k: Int = 4): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"), posexplode(
        sequence(lit(0), greatest(size(col("t")) - 1, lit(0)), lit(k)))
        .as(Seq("seg_id", "start")))
      .select(col("doc_id"), col("seg_id"),
        concat_ws(" ", slice(col("t"), col("start") + 1, lit(k))).as("seg"))

  /** Segment document-frequency table (seg, df) — df counts DISTINCT docs, so
    * a doc repeating its own segment contributes once. This is mergeable
    * ingest-time state: disjoint shards have disjoint doc sets, so shard dfs
    * ADD exactly ([[appendSegmentShard]]); unlike the containment posting
    * state there are no lists to cap — the state is vocabulary-of-segments
    * sized, strictly bounded.
    */
  def segmentDf(docs: DataFrame, k: Int = 4): DataFrame =
    segments(docs, k).groupBy("seg").agg(count_distinct(col("doc_id")).as("df"))

  /** Fold one ingested shard into the segment-df state: one full-outer merge
    * on the segment key, dfs add (exact — shard doc sets are disjoint).
    */
  def appendSegmentShard(state: DataFrame, newDocs: DataFrame, k: Int = 4): DataFrame =
    state.select(col("seg"), col("df").as("df1"))
      .join(segmentDf(newDocs, k).select(col("seg"), col("df").as("df2")),
        Seq("seg"), "full_outer")
      .select(col("seg"),
        (coalesce(col("df1"), lit(0L)) + coalesce(col("df2"), lit(0L))).as("df"))

  /** Scrub documents against a segment-df state: every segment whose df in
    * `state` is ≥ minDf is dropped, and each document is reassembled from its
    * surviving segments in order. Segments absent from the state count df 0.
    * Cost is linear in `docs` — the state is never rebuilt here, so a nightly
    * shard pays its own explode + one seg-keyed join + one doc-keyed
    * reassembly aggregate.
    */
  def scrubSegments(docs: DataFrame, state: DataFrame, minDf: Int,
      k: Int = 4): DataFrame =
    segments(docs, k)
      .join(state, Seq("seg"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_seg"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_dropped"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("df") < minDf,
            struct(col("seg_id"), col("seg"))))),
          x => x.getField("seg"))).as("clean_text"))

  private def qSegmentDedup(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    scrubSegments(docs, segmentDf(docs), minDf = 3).orderBy("doc_id")
  }

  /** The shard-linear form: the 90% corpus's segment-df table is the
    * maintained ingest state, and the 10% shard is scrubbed against it —
    * C4's "line seen more than once" rule (minDf = 2) applied at admission
    * time, the segment member of the admission family (MinHash admit /
    * containment admit / embedding admit / this). The corpus is touched only
    * to build state the deployment would already hold.
    */
  private def qSegmentScrub(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val state = segmentDf(docs.filter(col("doc_id") % 10 =!= 0))
    scrubSegments(docs.filter(col("doc_id") % 10 === 0), state, minDf = 2)
      .orderBy("doc_id")
  }

  // ---- BPE tokenizer training

  /** The one BPE word tokenization (lowercase alpha runs): training, the
    * vocabulary build, and encode must use the byte-identical rule or
    * encode silently falls back to per-character counts — one definition
    * makes the invariant structural.
    */
  private def bpeWords(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** Word table for BPE training: lowercase alpha tokens → corpus counts,
    * capped at the `maxVocab` most frequent words (every real BPE trainer
    * caps the word table — a tail word below the cut can move any pair
    * count by at most its own count). `syms` is the space-joined character
    * sequence the merge loop rewrites. The ONE corpus-scale pass: after
    * this aggregate everything is vocab-bounded.
    */
  private[graft] def bpeWordTable(docs: DataFrame, maxVocab: Int): DataFrame =
    docs.select(explode(bpeWords(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(maxVocab)
      .select(concat_ws(" ", split(col("word"), "")).as("syms"), col("cnt"))

  /** One BPE merge applied to a space-joined symbol string: the greedy
    * left-to-right fold — append each symbol unless the accumulated tail is
    * `a` and the symbol is `b`, in which case replace the tail with the
    * merged symbol. The fold form gets overlap right for free ("a a a"
    * under (a,a) → "aa a", leftmost-first), which a string replace over the
    * space-joined form would not (the shared delimiter breaks the second
    * match). The DuckDB oracle runs the identical fold via `list_reduce`.
    */
  private def bpeApply(syms: Column, a: String, b: String, m: String): Column =
    aggregate(split(syms, " "), lit(""), (acc, sym) =>
      when(acc === "", sym)
        .when(element_at(split(acc, " "), -1) === a && sym === b,
          concat(acc.substr(lit(1), length(acc) - lit(a.length)), lit(m)))
        .otherwise(concat(acc, lit(" "), sym)))

  /** Byte-pair-encoding tokenizer training (Sennrich et al., the standard
    * LLM-tokenizer construction): from the capped word-count table, repeat
    * `merges` times — count adjacent symbol pairs weighted by word count,
    * merge the most frequent pair everywhere (ties: lexicographically
    * smallest pair, so both engines and both paths pick identically).
    * Returns the learned merge table (step, l_sym, r_sym, merged, cnt) —
    * the artifact a tokenizer ships.
    *
    * Scale: the corpus is touched ONCE ([[bpeWordTable]]'s token count);
    * the merge loop runs on the vocab-bounded word table — under
    * `localVocabLimit` driver-locally (the word table is the small thing
    * the collect gate exists for; HF-style trainers do exactly this), above
    * it as a distributed loop whose per-step shuffle is pair-vocab-sized
    * with map-side partials, collecting only the 1-row argmax per step.
    * OperatorSpec locks local/distributed parity on the fixture.
    */
  private[graft] def bpeTrain(docs: DataFrame, merges: Int = 10,
      maxVocab: Int = 30000, localVocabLimit: Long = 200000L): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val wt = bpeWordTable(docs, maxVocab)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
      if (wt.count() <= localVocabLimit) {
        var words = wt.collect().map(r => (r.getString(0).split(" "), r.getLong(1)))
        for (k <- 1 to merges) {
          val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
          words.foreach { case (ss, cnt) =>
            var i = 0
            while (i < ss.length - 1) {
              val key = (ss(i), ss(i + 1))
              pairCounts(key) = pairCounts.getOrElse(key, 0L) + cnt
              i += 1
            }
          }
          if (pairCounts.nonEmpty) {
            val ((a, b), c) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
            val m = a + b
            learned += ((k, a, b, m, c))
            words = words.map { case (ss, cnt) =>
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              ss.foreach { sym =>
                if (out.nonEmpty && out.last == a && sym == b)
                  out(out.length - 1) = m
                else out += sym
              }
              (out.toArray, cnt)
            }
          }
        }
      } else {
        var cur = wt.select("syms", "cnt")
        for (k <- 1 to merges) {
          val arr = split(col("syms"), " ")
          val pairs = cur.filter(size(arr) >= 2)
            .select(col("cnt"), explode(transform(
              sequence(lit(0), size(arr) - 2),
              i => struct(element_at(arr, i + 1).as("a"),
                element_at(arr, i + 2).as("b")))).as("p"))
            .groupBy(col("p.a").as("a"), col("p.b").as("b"))
            .agg(sum("cnt").as("c"))
          val best = pairs.orderBy(col("c").desc, col("a"), col("b"))
            .limit(1).collect()
          if (best.nonEmpty) {
            val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
            val m = a + b
            learned += ((k, a, b, m, c))
            cur = cur.select(bpeApply(col("syms"), a, b, m).as("syms"), col("cnt"))
            // truncate lineage every few folds: 10+ nested aggregates on one
            // column otherwise stack up in a single codegen stage
            if (k % 4 == 0) cur = cur.localCheckpoint(true)
          }
        }
      }
      learned.toSeq.toDF("step", "l_sym", "r_sym", "merged", "cnt")
        .orderBy("step")
    } finally { wt.unpersist(); () }
  }

  /** The learned merge table over the harness corpus — the tokenizer
    * artifact as a query, full unrolled-CTE oracle (each step's pair count,
    * argmax, and fold rerun in DuckDB via `list_reduce`).
    */
  private def qBpeTrain(s: SparkSession, d: String): DataFrame =
    bpeTrain(T.documents(s, d), merges = 10, maxVocab = 30000)

  /** The learned merges per harness dir — train once per JVM, reuse across
    * the train and encode queries (the merge table IS the tokenizer
    * artifact; rerunning training per consumer would repeat the corpus
    * pass).
    */
  private val bpeMergesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String, String)]]()
  private[graft] def bpeMergesCached(s: SparkSession, d: String): Seq[(String, String, String)] =
    bpeMergesMemo.computeIfAbsent(d, _ =>
      bpeTrain(T.documents(s, d), merges = 10, maxVocab = 30000)
        .orderBy("step").collect().toSeq
        .map(r => (r.getString(1), r.getString(2), r.getString(3))))

  /** ENCODE with a learned merge table: per distinct word, apply the merges
    * in training order (each a full greedy pass — [[bpeApply]], the same
    * fold training used), yielding the word's BPE sub-token count. The
    * vocabulary table is the unit of work — corpus text is touched only by
    * the tokenize-explode — and stays distributed; nothing driver-side but
    * the 10-row merge table.
    */
  private[graft] def bpeSubtokenCounts(docs: DataFrame,
      merges: Seq[(String, String, String)]): DataFrame = {
    val words = docs.select(explode(bpeWords(col("text"))).as("word"))
      .distinct()
    var t = words.select(col("word"),
      concat_ws(" ", split(col("word"), "")).as("syms"))
    merges.foreach { case (a, b, m) =>
      t = t.select(col("word"), bpeApply(col("syms"), a, b, m).as("syms"))
    }
    t.select(col("word"), size(split(col("syms"), " ")).as("n_sub"))
  }

  /** Per-document BPE token counts under the learned tokenizer — the
    * pre-training sizing pass every corpus goes through (token budgets,
    * context packing, cost estimates all key off it). The merges apply to
    * EVERY distinct word, trained-vocab or not — that is the point of BPE:
    * unseen words still merge their learned pairs, bottoming out at
    * characters (the left join's coalesce is only a guard for a word that
    * somehow missed the vocabulary build). The word→n_sub table is
    * vocab-sized, so at 100 TB the join broadcasts (or AQE picks a hash
    * join keyed by word); the corpus side is one explode + one doc-keyed
    * aggregate.
    */
  private def qBpeEncode(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val sub = bpeSubtokenCounts(docs, bpeMergesCached(s, d))
    docs.select(col("doc_id"), explode(bpeWords(col("text"))).as("word"))
      .join(sub, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_sub"), length(col("word")))).as("n_bpe_tokens"))
      .withColumn("ratio",
        round(col("n_bpe_tokens").cast("double") / col("n_words"), 4))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_train" -> qBpeTrain,
    "q_bpe_encode" -> qBpeEncode,
    "q_chunk_docs" -> qChunkDocs,
    "q_segment_dedup" -> qSegmentDedup,
    "q_segment_scrub" -> qSegmentScrub,
    "q_contamination" -> qContamination,
    "q_curriculum" -> qCurriculum,
    "q_pii_redact" -> qPiiRedact,
    "q_pipeline_e2e" -> qPipelineE2e,
    "q_pipeline_near" -> qPipelineNear,
    "q_pipeline_full" -> qPipelineFull,
    "q_pack_contexts" -> qPackContexts,
    "q_pack_contexts_salted" -> qPackContextsSalted,
    "q_repetition" -> qRepetition,
    "q_token_cms" -> qTokenCms,
    "q_normalize" -> qNormalize,
    "q_top_tokens" -> qTopTokens,
    "q_top_tokens_approx" -> qTopTokensApprox,
    "q_quality_filter" -> qQualityFilter,
    "q_top_bigram" -> qTopBigram,
    "q_ngram_lm" -> qNgramLm,
    "q_lm_admit" -> qLmAdmit,
    "q_dsir" -> qDsir,
    "q_keywords" -> qKeywords,
    "q_pmi" -> qPmi,
    "q_char_ratios" -> qCharRatios,
    "q_stopword_ratio" -> qStopwordRatio,
    "q_tokens" -> qTokens,
    "q_tfidf" -> qTfidf,
    "q_bm25" -> qBm25,
    "q_bm25_indexed" -> ((s: SparkSession, d: String) =>
      TextIndex.bm25Indexed(s, TextIndex.prepareIndex(s, d))),
    "q_phrase_search" -> ((s: SparkSession, d: String) =>
      TextIndex.phraseSearch(s, TextIndex.prepareIndex(s, d))),
    "q_text_quality" -> qTextQuality,
    "q_token_count" -> qTokenCount,
    "q_token_count_bpe" -> qTokenCountBpe,
    "q_mix_recipe" -> qMixRecipe,
    "q_lang_id" -> qLangId,
    "q_fingerprint" -> qFingerprint
  )

  /** Shared bigram-LM oracle CTE chain, parameterized by the train / score
    * slices so q_ngram_lm and q_lm_admit run the identical recurrence.
    */
  private def ngramLmCtes(trainWhere: String, scoreWhere: String): String =
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       |train AS (SELECT * FROM t WHERE $trainWhere),
       |v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM train)),
       |tbg AS (SELECT t[i] AS w1, t[i + 1] AS w2
       |  FROM train, LATERAL (SELECT unnest(range(1, len(t))) AS i) g
       |  WHERE len(t) >= 2),
       |c12 AS (SELECT w1, w2, count(*) AS c12 FROM tbg GROUP BY 1, 2),
       |c1 AS (SELECT w1, count(*) AS c1 FROM tbg GROUP BY 1),
       |score AS (
       |  SELECT d.doc_id, d.lang,
       |    -ln(CAST(coalesce(c12.c12, 0) + 1 AS DOUBLE)
       |        / (coalesce(c1.c1, 0) + v.v)) AS nll
       |  FROM (SELECT doc_id, lang, t[i] AS w1, t[i + 1] AS w2
       |        FROM t, LATERAL (SELECT unnest(range(1, len(t))) AS i) g
       |        WHERE len(t) >= 2 AND ($scoreWhere)) d
       |  LEFT JOIN c12 ON d.w1 = c12.w1 AND d.w2 = c12.w2
       |  LEFT JOIN c1 ON d.w1 = c1.w1
       |  CROSS JOIN v),
       |sc AS (SELECT doc_id, lang, count(*) AS n_bigrams,
       |       round(avg(nll), 4) AS lm_score FROM score GROUP BY 1, 2)""".stripMargin

  /** q_bpe_train's oracle: the identical recurrence unrolled — per step a
    * pair-count aggregate, the (cnt DESC, pair ASC) argmax, and the same
    * greedy left-to-right fold as [[bpeApply]] via `list_reduce` (the
    * accumulator is the space-joined prefix; its last token is compared to
    * the step's left symbol). Generated programmatically so both engines
    * run byte-identical step logic.
    */
  private val bpeMergeSteps = 10

  /** The greedy-fold rewrite of `w.syms` by step k's best pair — shared by
    * the training chain (w$k) and the encode chain (ew$k).
    */
  private def bpeFoldSql(k: Int): String =
    s"""list_reduce(string_split(w.syms, ' '),
       |           (acc, s) -> CASE
       |             WHEN regexp_extract(acc, '[^ ]+$$') = b$k.a AND s = b$k.b
       |               THEN left(acc, length(acc) - length(b$k.a)) || b$k.m
       |             ELSE acc || ' ' || s END)""".stripMargin

  /** The shared training chain: word counts (capped like the Scala side),
    * then per step the pair-count aggregate, the (cnt DESC, pair ASC)
    * argmax b$k, and the folded word table w$k.
    */
  private val bpeChainCtes: String = {
    val steps = (1 to bpeMergeSteps).map { k =>
      s""",p$k AS (
         |  SELECT l[i] AS a, l[i+1] AS b, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT string_split(syms, ' ') AS l, cnt FROM w${k - 1}) ww,
         |       UNNEST(range(1, length(l))) AS t(i)
         |  GROUP BY 1, 2),
         |b$k AS (SELECT a, b, a||b AS m, c FROM p$k ORDER BY c DESC, a, b LIMIT 1),
         |w$k AS (
         |  SELECT ${bpeFoldSql(k)} AS syms, cnt
         |  FROM w${k - 1} w CROSS JOIN b$k)""".stripMargin
    }.mkString
    s"""toks AS (
       |  SELECT lower(t.tok) AS word
       |  FROM documents, UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS t(tok)),
       |words0 AS (
       |  SELECT word, count(*) AS cnt FROM toks GROUP BY word
       |  ORDER BY cnt DESC, word LIMIT 30000),
       |w0 AS (SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS syms, cnt
       |       FROM words0)$steps""".stripMargin
  }

  private val bpeTrainSql: String = {
    val out = (1 to bpeMergeSteps).map(k =>
      s"SELECT $k AS step, a AS l_sym, b AS r_sym, m AS merged, c AS cnt FROM b$k")
      .mkString("\n", "\nUNION ALL\n", "\n")
    s"WITH $bpeChainCtes$out\nORDER BY step"
  }

  /** q_bpe_encode's oracle: the training chain for the merge tables b1..bN,
    * then the SAME folds applied in order to EVERY distinct corpus word
    * (ew0..ewN — trained-vocab capping does not apply at encode time), and
    * the per-document aggregate over the word→sub-token-count table.
    */
  private val bpeEncodeSql: String = {
    val esteps = (1 to bpeMergeSteps).map { k =>
      s""",ew$k AS (
         |  SELECT w.word, ${bpeFoldSql(k)} AS syms
         |  FROM ew${k - 1} w CROSS JOIN b$k)""".stripMargin
    }.mkString
    s"""WITH $bpeChainCtes,
       |docw AS (
       |  SELECT doc_id, lower(t.tok) AS word
       |  FROM documents, UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS t(tok)),
       |ew0 AS (
       |  SELECT word, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS syms
       |  FROM (SELECT DISTINCT word FROM docw))$esteps,
       |sub AS (SELECT word, length(string_split(syms, ' ')) AS n_sub FROM ew$bpeMergeSteps)
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(coalesce(n_sub, length(word))) AS BIGINT) AS n_bpe_tokens,
       |  round(CAST(sum(coalesce(n_sub, length(word))) AS DOUBLE) / count(*), 4) AS ratio
       |FROM docw LEFT JOIN sub USING (word)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_bpe_train" -> bpeTrainSql,
    "q_bpe_encode" -> bpeEncodeSql,
    "q_segment_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |segs AS (
        |  SELECT doc_id, CAST(s.i // 4 AS INT) AS seg_id,
        |    array_to_string(toks[s.i + 1 : s.i + 4], ' ') AS seg
        |  FROM t, LATERAL (SELECT unnest(range(0, greatest(len(toks), 1), 4)) AS i) s),
        |df AS (SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg)
        |SELECT s.doc_id,
        |  count(*) AS n_seg,
        |  CAST(sum(CASE WHEN df.df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  coalesce(string_agg(s.seg, ' ' ORDER BY s.seg_id)
        |    FILTER (WHERE df.df < 3), '') AS clean_text
        |FROM segs s JOIN df ON s.seg = df.seg
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "q_segment_scrub" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |segs AS (
        |  SELECT doc_id, CAST(s.i // 4 AS INT) AS seg_id,
        |    array_to_string(toks[s.i + 1 : s.i + 4], ' ') AS seg
        |  FROM t, LATERAL (SELECT unnest(range(0, greatest(len(toks), 1), 4)) AS i) s),
        |state AS (
        |  SELECT seg, count(DISTINCT doc_id) AS df FROM segs
        |  WHERE doc_id % 10 <> 0 GROUP BY seg)
        |SELECT s.doc_id,
        |  count(*) AS n_seg,
        |  CAST(sum(CASE WHEN coalesce(st.df, 0) >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped,
        |  coalesce(string_agg(s.seg, ' ' ORDER BY s.seg_id)
        |    FILTER (WHERE coalesce(st.df, 0) < 2), '') AS clean_text
        |FROM segs s LEFT JOIN state st ON s.seg = st.seg
        |WHERE s.doc_id % 10 = 0
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "q_pack_contexts" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
        |  round((cum - ((cum - n_tokens) // 512) * 512) / 512.0, 4) AS seq_fill
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, UNNEST(list_distinct(list_transform(
        |    range(greatest(len(t) - 4, 0)),
        |    i -> array_to_string(t[i + 1 : i + 5], ' ')))) AS g
        |  FROM toks),
        |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
        |SELECT doc_id, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN g IN (SELECT g FROM ev) THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  round(sum(CASE WHEN g IN (SELECT g FROM ev) THEN 1 ELSE 0 END) / count(*), 4) AS contamination
        |FROM g WHERE doc_id % 97 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_pipeline_e2e" ->
      """WITH base AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS t FROM documents
        |  WHERE doc_id % 97 <> 0),
        |q AS (
        |  SELECT doc_id, source, text, t, len(t) AS n_tokens,
        |    CAST(length(text) AS DOUBLE) / len(t) AS atl,
        |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS div
        |  FROM base),
        |keep_q AS (
        |  SELECT doc_id, source, text, t, n_tokens FROM q
        |  WHERE n_tokens BETWEEN 20 AND 80 AND atl BETWEEN 2.0 AND 10.0 AND div >= 0.45),
        |dedup AS (
        |  SELECT doc_id, source, text, t, n_tokens FROM (
        |    SELECT *, min(doc_id) OVER (PARTITION BY text) AS keep_id FROM keep_q)
        |  WHERE doc_id = keep_id),
        |g AS (
        |  SELECT doc_id, UNNEST(list_distinct(list_transform(
        |    range(greatest(len(t) - 4, 0)), i -> array_to_string(t[i + 1 : i + 5], ' ')))) AS g
        |  FROM dedup),
        |ev AS (
        |  SELECT DISTINCT UNNEST(list_distinct(list_transform(
        |    range(greatest(len(string_split(text, ' ')) - 4, 0)),
        |    i -> array_to_string(string_split(text, ' ')[i + 1 : i + 5], ' ')))) AS g
        |  FROM documents WHERE doc_id % 97 = 0),
        |contam AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN g IN (SELECT g FROM ev) THEN 1 ELSE 0 END) / count(*) AS frac
        |  FROM g GROUP BY doc_id),
        |train AS (
        |  SELECT d.doc_id, d.source, d.n_tokens FROM dedup d
        |  JOIN contam c USING (doc_id)
        |  WHERE c.frac < 0.05
        |    AND ((d.doc_id % 1000003) * 1103515245 + 12345) % 1000000 < 900000),
        |packed AS (
        |  SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM train)
        |SELECT doc_id, source, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
        |  round((cum - ((cum - n_tokens) // 512) * 512) / 512.0, 4) AS seq_fill
        |FROM packed ORDER BY doc_id""".stripMargin,
    // the near-dedup pipeline twin: e2e's chain with the dedup stage as a
    // recursive CTE over the exact-verified word-3-gram Jaccard edge set
    // (same construction as q_dedup_cluster_lsh's oracle, restricted to the
    // quality survivors)
    "q_pipeline_near" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS t FROM documents
        |  WHERE doc_id % 97 <> 0),
        |q AS (
        |  SELECT doc_id, source, text, t, len(t) AS n_tokens,
        |    CAST(length(text) AS DOUBLE) / len(t) AS atl,
        |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS div
        |  FROM base),
        |keep_q AS (
        |  SELECT doc_id, source, text, t, n_tokens FROM q
        |  WHERE n_tokens BETWEEN 20 AND 80 AND atl BETWEEN 2.0 AND 10.0 AND div >= 0.45),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) >= 3 THEN
        |      list_distinct(list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        |    ELSE [array_to_string(t, ' ')] END AS grams
        |  FROM keep_q),
        |pairs AS (
        |  SELECT l.doc_id AS doc1, r.doc_id AS doc2
        |  FROM sh l JOIN sh r ON l.doc_id < r.doc_id
        |  WHERE round(CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE)
        |        / len(list_distinct(list_concat(l.grams, r.grams))), 4) >= 0.5),
        |edges AS (
        |  SELECT doc1 AS src, doc2 AS dst FROM pairs
        |  UNION ALL SELECT doc2, doc1 FROM pairs),
        |cc AS (
        |  SELECT doc_id AS id, doc_id AS comp FROM keep_q
        |  UNION
        |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON e.src = cc.id),
        |comp AS (
        |  SELECT id AS doc_id, min(comp) AS component FROM cc GROUP BY id),
        |dedup AS (
        |  SELECT k.doc_id, k.source, k.text, k.t, k.n_tokens
        |  FROM keep_q k JOIN comp c ON k.doc_id = c.doc_id AND k.doc_id = c.component),
        |g AS (
        |  SELECT doc_id, UNNEST(list_distinct(list_transform(
        |    range(greatest(len(t) - 4, 0)), i -> array_to_string(t[i + 1 : i + 5], ' ')))) AS g
        |  FROM dedup),
        |ev AS (
        |  SELECT DISTINCT UNNEST(list_distinct(list_transform(
        |    range(greatest(len(string_split(text, ' ')) - 4, 0)),
        |    i -> array_to_string(string_split(text, ' ')[i + 1 : i + 5], ' ')))) AS g
        |  FROM documents WHERE doc_id % 97 = 0),
        |contam AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN g IN (SELECT g FROM ev) THEN 1 ELSE 0 END) / count(*) AS frac
        |  FROM g GROUP BY doc_id),
        |train AS (
        |  SELECT d.doc_id, d.source, d.n_tokens FROM dedup d
        |  JOIN contam c USING (doc_id)
        |  WHERE c.frac < 0.05
        |    AND ((d.doc_id % 1000003) * 1103515245 + 12345) % 1000000 < 900000),
        |packed AS (
        |  SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM train)
        |SELECT doc_id, source, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
        |  round((cum - ((cum - n_tokens) // 512) * 512) / 512.0, 4) AS seq_fill
        |FROM packed ORDER BY doc_id""".stripMargin,
    // the full pipeline twin: q_pipeline_near's chain plus the containment
    // stage — q_containment_pairs' CTEs (corpus-wide df gate and
    // kept-shingle counts), pairs restricted to dedup survivors, the
    // smaller-kept-shingle side (ties: larger doc_id) dropped before
    // contamination/pack
    "q_pipeline_full" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS t FROM documents
        |  WHERE doc_id % 97 <> 0),
        |q AS (
        |  SELECT doc_id, source, text, t, len(t) AS n_tokens,
        |    CAST(length(text) AS DOUBLE) / len(t) AS atl,
        |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS div
        |  FROM base),
        |keep_q AS (
        |  SELECT doc_id, source, text, t, n_tokens FROM q
        |  WHERE n_tokens BETWEEN 20 AND 80 AND atl BETWEEN 2.0 AND 10.0 AND div >= 0.45),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) >= 3 THEN
        |      list_distinct(list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        |    ELSE [array_to_string(t, ' ')] END AS grams
        |  FROM keep_q),
        |pairs AS (
        |  SELECT l.doc_id AS doc1, r.doc_id AS doc2
        |  FROM sh l JOIN sh r ON l.doc_id < r.doc_id
        |  WHERE round(CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE)
        |        / len(list_distinct(list_concat(l.grams, r.grams))), 4) >= 0.5),
        |edges AS (
        |  SELECT doc1 AS src, doc2 AS dst FROM pairs
        |  UNION ALL SELECT doc2, doc1 FROM pairs),
        |cc AS (
        |  SELECT doc_id AS id, doc_id AS comp FROM keep_q
        |  UNION
        |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON e.src = cc.id),
        |comp AS (
        |  SELECT id AS doc_id, min(comp) AS component FROM cc GROUP BY id),
        |dedup AS (
        |  SELECT k.doc_id, k.source, k.text, k.t, k.n_tokens
        |  FROM keep_q k JOIN comp c ON k.doc_id = c.doc_id AND k.doc_id = c.component),
        |ctoks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |csh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(t) - 1),
        |    i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
        |  FROM ctoks),
        |ckeep AS (SELECT g FROM csh GROUP BY g HAVING count(*) <= 20),
        |cksh AS (SELECT csh.doc_id, csh.g FROM csh JOIN ckeep USING (g)),
        |cn AS (SELECT doc_id, count(*) AS n_sh FROM cksh GROUP BY doc_id),
        |cpairs AS (
        |  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS shared
        |  FROM cksh a JOIN cksh b USING (g) WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |cont AS (
        |  SELECT doc1, doc2, n1.n_sh AS n1, n2.n_sh AS n2
        |  FROM cpairs
        |  JOIN cn n1 ON n1.doc_id = cpairs.doc1
        |  JOIN cn n2 ON n2.doc_id = cpairs.doc2
        |  WHERE round(CAST(shared AS DOUBLE) / least(n1.n_sh, n2.n_sh), 4) >= 0.8),
        |drops AS (
        |  SELECT CASE WHEN n1 < n2 THEN doc1 WHEN n2 < n1 THEN doc2
        |    ELSE greatest(doc1, doc2) END AS doc_id
        |  FROM cont
        |  WHERE doc1 IN (SELECT doc_id FROM dedup)
        |    AND doc2 IN (SELECT doc_id FROM dedup)),
        |kept AS (
        |  SELECT * FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
        |g AS (
        |  SELECT doc_id, UNNEST(list_distinct(list_transform(
        |    range(greatest(len(t) - 4, 0)), i -> array_to_string(t[i + 1 : i + 5], ' ')))) AS g
        |  FROM kept),
        |ev AS (
        |  SELECT DISTINCT UNNEST(list_distinct(list_transform(
        |    range(greatest(len(string_split(text, ' ')) - 4, 0)),
        |    i -> array_to_string(string_split(text, ' ')[i + 1 : i + 5], ' ')))) AS g
        |  FROM documents WHERE doc_id % 97 = 0),
        |contam AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN g IN (SELECT g FROM ev) THEN 1 ELSE 0 END) / count(*) AS frac
        |  FROM g GROUP BY doc_id),
        |train AS (
        |  SELECT d.doc_id, d.source, d.n_tokens FROM kept d
        |  JOIN contam c USING (doc_id)
        |  WHERE c.frac < 0.05
        |    AND ((d.doc_id % 1000003) * 1103515245 + 12345) % 1000000 < 900000),
        |packed AS (
        |  SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM train)
        |SELECT doc_id, source, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
        |  round((cum - ((cum - n_tokens) // 512) * 512) / 512.0, 4) AS seq_fill
        |FROM packed ORDER BY doc_id""".stripMargin,
    "q_pii_redact" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    text || ' reach user' || doc_id || '@example.com or 555-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS contact
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, contact,
        |    regexp_replace(regexp_replace(contact,
        |      '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |      '\d{3}-\d{4}', '[PHONE]', 'g') AS red
        |  FROM c)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(contact, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(contact, '\d{3}-\d{4}')) AS INT) AS n_phones,
        |  CAST(len(red) AS INT) AS len_redacted,
        |  CAST(len(regexp_extract_all(red, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}'))
        |    + len(regexp_extract_all(red, '\d{3}-\d{4}')) AS INT) AS n_left
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_curriculum" ->
      """WITH b AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents)
        |SELECT CAST((n_chars - mn) * 4 // (mx - mn + 1) AS INT) AS phase,
        |  count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  round(avg(n_chars), 4) AS avg_chars
        |FROM documents, b
        |GROUP BY 1 ORDER BY phase""".stripMargin,
    // the salted form is output-identical by construction, so it shares the
    // unsalted oracle verbatim
    "q_pack_contexts_salted" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
        |  round((cum - ((cum - n_tokens) // 512) * 512) / 512.0, 4) AS seq_fill
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 2 THEN
        |      list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |    ELSE [] END AS g2,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [] END AS g3
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN len(g2) > 0
        |    THEN round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 4)
        |    ELSE 0.0 END AS dup_bigram_ratio,
        |  CASE WHEN len(g3) > 0
        |    THEN round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 4)
        |    ELSE 0.0 END AS dup_trigram_ratio
        |FROM g ORDER BY doc_id""".stripMargin,
    // starts = 0, 48, 96, … < n_tokens; 1-based list slicing in DuckDB
    "q_chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(s.i // 48 AS INT) AS chunk_id,
        |  array_to_string(toks[s.i + 1 : s.i + 64], ' ') AS chunk_text,
        |  CAST(least(len(toks) - s.i, 64) AS INT) AS chunk_len
        |FROM t, LATERAL (SELECT unnest(range(0, greatest(len(toks), 1), 48)) AS i) s
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // exact per-source counts: the sketch width (2000) dwarfs the fixture
    // vocabulary (~31), so the CMS estimates equal the true counts
    // full source × probe grid with COALESCE(0): the Spark side emits a row
    // for every probe (est_n = 0 when absent), so the oracle must too —
    // a GROUP BY that drops absent tokens only matches while the fixture
    // happens to contain all probes in all sources
    "q_token_cms" ->
      """WITH counts AS (
        |  SELECT source, token, count(*) AS n
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  WHERE token IN ('join', 'hash', 'scan', 'filter', 'merge')
        |  GROUP BY source, token),
        |grid AS (SELECT DISTINCT source FROM documents),
        |probes AS (
        |  SELECT unnest(['join', 'hash', 'scan', 'filter', 'merge']) AS token)
        |SELECT g.source, p.token, CAST(COALESCE(c.n, 0) AS BIGINT) AS est_n
        |FROM grid g CROSS JOIN probes p
        |LEFT JOIN counts c ON c.source = g.source AND c.token = p.token
        |ORDER BY g.source, p.token""".stripMargin,
    "q_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g')) AS norm_text,
        |  CAST(len(string_split(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g')), ' ')) AS INT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_top_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 10""".stripMargin,
    "q_top_tokens_approx" ->
      """SELECT CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS INT) AS rank,
        |       token, n
        |FROM (SELECT token, count(*) AS n
        |      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |      GROUP BY token)
        |ORDER BY n DESC, token LIMIT 10""".stripMargin,
    "q_quality_filter" ->
      """WITH q AS (
        |  SELECT source,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS atl,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS div
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN n_tokens BETWEEN 20 AND 80
        |                 AND atl BETWEEN 2.0 AND 10.0
        |                 AND div >= 0.45 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "q_keywords" ->
      """WITH tf AS (
        |  SELECT doc_id, t.token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |        FROM documents) t
        |  GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, token,
        |    round(tf * ln(CAST(n.n_docs AS DOUBLE)
        |          / count(*) OVER (PARTITION BY token)), 4) AS tfidf
        |  FROM tf CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, token, tfidf, row_number()
        |    OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
        |  FROM scored)
        |SELECT doc_id, token AS keyword, tfidf FROM ranked
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_ngram_lm" ->
      (ngramLmCtes("lang = 'en'", "TRUE") +
        "\nSELECT doc_id, lang, n_bigrams, lm_score FROM sc ORDER BY doc_id"),
    "q_lm_admit" ->
      (ngramLmCtes("lang = 'en' AND doc_id % 10 <> 0", "doc_id % 10 = 0") +
        """
          |SELECT doc_id, lang, n_bigrams, lm_score,
          |  CASE WHEN lm_score <= 3.4 THEN 1 ELSE 0 END AS admit
          |FROM sc ORDER BY doc_id""".stripMargin),
    // two ngramLmCtes-shaped arms (target = en & src18, raw = en), scored
    // over every doc; log_ratio = difference of the two ROUNDED avg NLLs
    "q_dsir" ->
      """WITH t AS (SELECT doc_id, lang, source, string_split(text, ' ') AS t FROM documents),
        |ttr AS (SELECT * FROM t WHERE lang = 'en' AND source = 'src18'),
        |rtr AS (SELECT * FROM t WHERE lang = 'en'),
        |tvv AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM ttr)),
        |rvv AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM rtr)),
        |tbg AS (SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM ttr, LATERAL (SELECT unnest(range(1, len(t))) AS i) g WHERE len(t) >= 2),
        |rbg AS (SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM rtr, LATERAL (SELECT unnest(range(1, len(t))) AS i) g WHERE len(t) >= 2),
        |tc12 AS (SELECT w1, w2, count(*) AS c12 FROM tbg GROUP BY 1, 2),
        |tc1 AS (SELECT w1, count(*) AS c1 FROM tbg GROUP BY 1),
        |rc12 AS (SELECT w1, w2, count(*) AS c12 FROM rbg GROUP BY 1, 2),
        |rc1 AS (SELECT w1, count(*) AS c1 FROM rbg GROUP BY 1),
        |dbg AS (SELECT doc_id, lang, t[i] AS w1, t[i + 1] AS w2
        |  FROM t, LATERAL (SELECT unnest(range(1, len(t))) AS i) g WHERE len(t) >= 2),
        |sct AS (SELECT d.doc_id, d.lang, count(*) AS n_bigrams,
        |  round(avg(-ln(CAST(coalesce(tc12.c12, 0) + 1 AS DOUBLE)
        |    / (coalesce(tc1.c1, 0) + tvv.v))), 4) AS nll_tgt
        |  FROM dbg d LEFT JOIN tc12 ON d.w1 = tc12.w1 AND d.w2 = tc12.w2
        |  LEFT JOIN tc1 ON d.w1 = tc1.w1 CROSS JOIN tvv GROUP BY 1, 2),
        |scr AS (SELECT d.doc_id,
        |  round(avg(-ln(CAST(coalesce(rc12.c12, 0) + 1 AS DOUBLE)
        |    / (coalesce(rc1.c1, 0) + rvv.v))), 4) AS nll_raw
        |  FROM dbg d LEFT JOIN rc12 ON d.w1 = rc12.w1 AND d.w2 = rc12.w2
        |  LEFT JOIN rc1 ON d.w1 = rc1.w1 CROSS JOIN rvv GROUP BY 1)
        |SELECT sct.doc_id, sct.lang, sct.n_bigrams, sct.nll_tgt, scr.nll_raw,
        |  round(scr.nll_raw - sct.nll_tgt, 4) AS log_ratio
        |FROM sct JOIN scr ON sct.doc_id = scr.doc_id
        |ORDER BY log_ratio DESC, sct.doc_id LIMIT 100""".stripMargin,
    "q_pmi" ->
      """WITH t AS (SELECT string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM t, LATERAL (SELECT unnest(range(1, len(t))) AS i) g),
        |n AS (SELECT count(*) AS n FROM bg),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2
        |  HAVING count(*) >= 5),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |c2 AS (SELECT w2, count(*) AS c2 FROM bg GROUP BY 1)
        |SELECT c12.w1 || ' ' || c12.w2 AS bigram, c12.c12 AS c12,
        |  round(ln(CAST(c12.c12 AS DOUBLE) * n.n
        |        / (CAST(c1.c1 AS DOUBLE) * c2.c2)), 4) AS pmi
        |FROM c12 JOIN c1 ON c12.w1 = c1.w1 JOIN c2 ON c12.w2 = c2.w2 CROSS JOIN n
        |ORDER BY pmi DESC, bigram LIMIT 50""".stripMargin,
    "q_top_bigram" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT doc_id, len(t) AS n,
        |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bg
        |  FROM toks),
        |cnt AS (SELECT doc_id, n, bg, count(*) AS c FROM bg GROUP BY doc_id, n, bg)
        |SELECT doc_id, round(CAST(max(c) AS DOUBLE) / (n - 1), 4) AS top_bigram_frac
        |FROM cnt GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    "q_char_ratios" ->
      """SELECT doc_id,
        |  round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |        / length(text), 4) AS alpha_ratio,
        |  round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |        / length(text), 4) AS digit_ratio,
        |  round(CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
        |        / length(text), 4) AS space_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_stopword_ratio" ->
      """SELECT doc_id,
        |  round(CAST(len(list_filter(string_split(text, ' '),
        |          x -> list_contains(['the','and','of','to','a','in','is','that','it','for'], x)))
        |        AS DOUBLE) / len(string_split(text, ' ')), 4) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    // BM25 twin: same query-term derivation (df rank 6..13), same Okapi
    // constants, same round-before-order rule as the Spark side
    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
        |dfx AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |qt AS (SELECT token, df FROM dfx ORDER BY df DESC, token LIMIT 8 OFFSET 5),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |stats AS (SELECT count(*) AS n_docs,
        |          avg(len(string_split(text, ' '))) AS avgdl FROM documents)
        |SELECT tf.doc_id,
        |  round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
        |    (tf * (1.2 + 1)) /
        |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
        |FROM tf JOIN qt USING (token) JOIN dl USING (doc_id), stats
        |GROUP BY tf.doc_id ORDER BY bm25 DESC, tf.doc_id LIMIT 20""".stripMargin,
    // phrase oracle: position semantics (overlapping occurrences), top
    // bigram picked (count DESC, w1, w2) — both engines tie-break alike
    "q_phrase_search" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        |       FROM t, LATERAL (SELECT unnest(range(1, len(t))) AS i) g
        |       WHERE len(t) >= 2),
        |top AS (SELECT w1, w2 FROM (SELECT w1, w2, count(*) AS c FROM bg
        |        GROUP BY 1, 2 ORDER BY c DESC, w1, w2 LIMIT 1))
        |SELECT doc_id, CAST(count(*) AS INT) AS n_hits
        |FROM bg JOIN top USING (w1, w2)
        |GROUP BY doc_id ORDER BY n_hits DESC, doc_id LIMIT 50""".stripMargin,
    // the indexed variant answers the SAME retrieval — identical oracle;
    // what changes is where the work happens (ingest vs query time)
    "q_bm25_indexed" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
        |dfx AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |qt AS (SELECT token, df FROM dfx ORDER BY df DESC, token LIMIT 8 OFFSET 5),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |stats AS (SELECT count(*) AS n_docs,
        |          avg(len(string_split(text, ' '))) AS avgdl FROM documents)
        |SELECT tf.doc_id,
        |  round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
        |    (tf * (1.2 + 1)) /
        |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
        |FROM tf JOIN qt USING (token) JOIN dl USING (doc_id), stats
        |GROUP BY tf.doc_id ORDER BY bm25 DESC, tf.doc_id LIMIT 20""".stripMargin,
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.token,
        |  round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
        |FROM tf JOIN df ON tf.token = df.token, n
        |ORDER BY tfidf DESC, tf.doc_id, tf.token LIMIT 200""".stripMargin,
    "q_tokens" ->
      """SELECT token, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS len,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 4) AS avg_tok_len,
        |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |        / len(string_split(text, ' ')), 4) AS diversity
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT source,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  count(*) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_mix_recipe" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |cums AS (
        |  SELECT doc_id, source, tok,
        |    CAST(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id)
        |      AS BIGINT) AS cum
        |  FROM toks)
        |SELECT doc_id, source, tok, cum FROM cums
        |WHERE cum <= CASE WHEN CAST(substr(source, 4) AS INT) < 10
        |  THEN 0.07 ELSE 0.03 END * 2000
        |ORDER BY doc_id""".stripMargin,
    "q_token_count_bpe" ->
      """SELECT doc_id,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // same (score, lang) struct-max argmax as the Spark greatest(struct…)
    "q_lang_id" -> {
      val structs = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
        s"{'score': len(list_intersect(toks, [${words.map("'" + _ + "'").mkString(",")}])), " +
          s"'lang': '$lang'}"
      }.mkString(", ")
      s"""WITH t AS (
         |  SELECT doc_id, lang AS labeled_lang,
         |    list_distinct(string_split(text, ' ')) AS toks FROM documents),
         |s AS (SELECT doc_id, labeled_lang,
         |        list_aggregate([$structs], 'max') AS best FROM t)
         |SELECT doc_id, labeled_lang,
         |  CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS pred_lang
         |FROM s ORDER BY doc_id""".stripMargin
    }
  )
}
