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

  /** BPE-ish token estimate: word-pieces via regex (letters / digits /
    * punctuation runs, long words counted as ceil(len/4) pieces — the common
    * "~4 chars per token" heuristic). No oracle (regex dialects differ).
    */
  private def qTokenCountBpe(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"),
        aggregate(
          transform(tokens(col("text")), t => ceil(length(t).cast("double") / 4.0d).cast("long")),
          lit(0L), (acc, x) => acc + x).as("bpe_tokens"))
      .orderBy("doc_id")

  /** Stopword-profile language ID (n-gram/stopword heuristic, no oracle —
    * accuracy is asserted in ScalaTest on crafted multilingual fixtures).
    * Scores each language by overlap between the document's token set and a
    * tiny per-language profile; profiles ride along as array literals
    * (broadcast-sized, like dimension tables).
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
    val toks = T.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = toks.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
    val n = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(df), "token").crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4).as("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id"), col("token"))
      .limit(200)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tokens" -> qTokens,
    "q_tfidf" -> qTfidf,
    "q_text_quality" -> qTextQuality,
    "q_token_count" -> qTokenCount,
    "q_token_count_bpe" -> qTokenCountBpe,
    "q_lang_id" -> qLangId,
    "q_fingerprint" -> qFingerprint
  )

  val oracleSql: Map[String, String] = Map(
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
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
