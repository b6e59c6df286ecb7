package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables => T}

/** Corpus drift monitoring: compare the distribution of a NEW data slice
  * against a reference slice — the check a training-data pipeline runs on
  * every refresh before retraining (a shifted length/language/token mix is
  * usually the first visible symptom of a broken upstream crawl or filter).
  *
  * Reference scope: no reference twin; generalization category per
  * SURVEY.md §2B / the LLM-pipeline mandate. Two standard detectors:
  *
  *  - '''PSI / KL per feature bucket''' (`q_drift_psi`): population
  *    stability index terms `(cur−ref)·ln(cur/ref)` and KL terms
  *    `cur·ln(cur/ref)` over bucketed features (language, length band).
  *    Each slice folds to a CELL-sized count table in one hash aggregate;
  *    everything after (totals, fractions, the log terms) is arithmetic
  *    over metadata-sized tables. Fractions are clamped at 1e-4 (the
  *    standard smoothing) so a bucket empty on one side stays finite.
  *  - '''Top token movers''' (`q_drift_tokens`): the tokens whose corpus
  *    frequency moved most between slices — tokenize → per-slice token
  *    counts (the tf-idf aggregate shape) → full-outer merge →
  *    TakeOrdered top-20 by |Δfrac|. Token-sized intermediate state, one
  *    top-k, no corpus-sized join.
  *
  * The declared queries split the documents table deterministically:
  * ref = even doc_ids, cur = odd doc_ids with ≥ 150 chars — a planted
  * length drift, so the length-band PSI carries signal while language
  * stays flat.
  */
object Monitoring extends QueryModule {

  /** Smoothing floor for per-bucket fractions (standard PSI practice). */
  val Eps = 1e-4

  private def refSlice(docs: DataFrame): DataFrame = docs.filter(col("doc_id") % 2 === 0)
  private def curSlice(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 2 === 1 && col("n_chars") >= 150)

  /** (feature, bucket, frac) for one slice: language plus 200-char length
    * band, each one cell-sized hash aggregate; total rides in via a
    * broadcast 1-row cross join (never a window). */
  private def bucketFracs(slice: DataFrame): DataFrame = {
    val feats = slice.select(lit("lang").as("feature"), col("lang").as("bucket"))
      .unionByName(slice.select(lit("len_band").as("feature"),
        (floor(col("n_chars") / 200) * 200).cast("long").cast("string").as("bucket")))
    val counts = feats.groupBy("feature", "bucket").agg(count(lit(1)).as("n"))
    val totals = feats.groupBy("feature").agg(count(lit(1)).as("total"))
    counts.join(broadcast(totals), "feature")
      .select(col("feature"), col("bucket"),
        (col("n").cast("double") / col("total")).as("frac"))
  }

  private def clamp(c: Column): Column = greatest(c, lit(Eps))

  /** Per-bucket PSI and KL contributions between two slices of `docs`. */
  def driftPsi(ref: DataFrame, cur: DataFrame): DataFrame = {
    val r = bucketFracs(ref).withColumnRenamed("frac", "rf")
    val c = bucketFracs(cur).withColumnRenamed("frac", "cf")
    r.join(c, Seq("feature", "bucket"), "full_outer")
      .select(col("feature"), col("bucket"),
        round(coalesce(col("rf"), lit(0.0)), 4).as("ref_frac"),
        round(coalesce(col("cf"), lit(0.0)), 4).as("cur_frac"),
        round((clamp(coalesce(col("cf"), lit(0.0))) - clamp(coalesce(col("rf"), lit(0.0)))) *
          log(clamp(coalesce(col("cf"), lit(0.0))) / clamp(coalesce(col("rf"), lit(0.0)))), 4)
          .as("psi"),
        round(clamp(coalesce(col("cf"), lit(0.0))) *
          log(clamp(coalesce(col("cf"), lit(0.0))) / clamp(coalesce(col("rf"), lit(0.0)))), 4)
          .as("kl"))
  }

  /** Top-k tokens by absolute corpus-frequency movement between slices. */
  def driftTokens(ref: DataFrame, cur: DataFrame, k: Int = 20): DataFrame = {
    def tokenFracs(slice: DataFrame): DataFrame = {
      val toks = slice.select(explode(split(col("text"), " ")).as("token"))
      val counts = toks.groupBy("token").agg(count(lit(1)).as("n"))
      counts.crossJoin(broadcast(toks.select(count(lit(1)).as("total"))))
        .select(col("token"), (col("n").cast("double") / col("total")).as("frac"))
    }
    val r = tokenFracs(ref).withColumnRenamed("frac", "rf")
    val c = tokenFracs(cur).withColumnRenamed("frac", "cf")
    r.join(c, Seq("token"), "full_outer")
      .select(col("token"),
        round(coalesce(col("rf"), lit(0.0)), 6).as("ref_frac"),
        round(coalesce(col("cf"), lit(0.0)), 6).as("cur_frac"),
        round(coalesce(col("cf"), lit(0.0)) - coalesce(col("rf"), lit(0.0)), 6).as("delta"))
      .orderBy(abs(col("delta")).desc, col("token"))
      .limit(k)
  }

  /** A/B experiment readout: a two-proportion z-test on user conversion
    * between two deterministic arms (user_id parity — the hash-split
    * `q_split_assign` would produce); a user converts when it logs at
    * least `minConversions` purchase events. The data-sized pass is ONE
    * user-keyed aggregate; arms and the z statistic fold from the 2-row
    * arm table (degenerate all/none-convert experiments yield null z, not
    * a division error). At 100 TB of events this is a single shuffle on
    * user_id — the same key the funnel/retention family already uses.
    */
  def abTest(events: DataFrame, convType: String = "purchase",
      minConversions: Int = 14): DataFrame = {
    val users = events.groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === convType, 1).otherwise(0)).as("np"))
      .select((col("user_id") % 2).as("arm"),
        when(col("np") >= minConversions, 1).otherwise(0).as("conv"))
    val arms = users.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("conv").cast("long").as("c"))
    val flat = arms.agg(
      max(when(col("arm") === 0, col("n"))).as("n_a"),
      max(when(col("arm") === 0, col("c"))).as("c_a"),
      max(when(col("arm") === 1, col("n"))).as("n_b"),
      max(when(col("arm") === 1, col("c"))).as("c_b"))
    val (na, ca, nb, cb) = (col("n_a").cast("double"), col("c_a").cast("double"),
      col("n_b").cast("double"), col("c_b").cast("double"))
    val pool = (ca + cb) / (na + nb)
    // degenerate experiment (all or none convert) → null z, not a crash
    val denom = sqrt(pool * (lit(1.0) - pool) * (lit(1.0) / na + lit(1.0) / nb))
    val z = when(denom =!= 0, (ca / na - cb / nb) / denom)
    flat.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      round(ca / na, 4).as("rate_a"), round(cb / nb, 4).as("rate_b"),
      round(z, 4).as("z"), (abs(z) > 1.96).as("significant"))
  }

  // ---- declared queries ----

  private def qAbTest(s: SparkSession, d: String): DataFrame =
    abTest(T.events(s, d))

  private def qDriftPsi(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    driftPsi(refSlice(docs), curSlice(docs)).orderBy("feature", "bucket")
  }

  private def qDriftTokens(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    driftTokens(refSlice(docs), curSlice(docs))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_drift_psi" -> qDriftPsi,
    "q_drift_tokens" -> qDriftTokens,
    "q_ab_test" -> qAbTest
  )

  private val slicesCte =
    """ref AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
      |cur AS (SELECT * FROM documents WHERE doc_id % 2 = 1 AND n_chars >= 150)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_ab_test" ->
      """WITH users AS (
        |  SELECT user_id % 2 AS arm,
        |         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
        |              THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY user_id),
        |arms AS (
        |  SELECT arm, count(*) AS n, CAST(sum(conv) AS BIGINT) AS c
        |  FROM users GROUP BY arm),
        |flat AS (
        |  SELECT max(CASE WHEN arm = 0 THEN n END) AS n_a,
        |         max(CASE WHEN arm = 0 THEN c END) AS c_a,
        |         max(CASE WHEN arm = 1 THEN n END) AS n_b,
        |         max(CASE WHEN arm = 1 THEN c END) AS c_b
        |  FROM arms),
        |stat AS (
        |  SELECT *,
        |    (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b) /
        |    nullif(sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
        |         (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
        |         (1.0 / n_a + 1.0 / n_b)), 0) AS zraw
        |  FROM flat)
        |SELECT n_a, c_a, n_b, c_b,
        |  round(CAST(c_a AS DOUBLE) / n_a, 4) AS rate_a,
        |  round(CAST(c_b AS DOUBLE) / n_b, 4) AS rate_b,
        |  round(zraw, 4) AS z,
        |  abs(zraw) > 1.96 AS significant
        |FROM stat""".stripMargin,
    "q_drift_psi" ->
      s"""WITH $slicesCte,
         |rb AS (
         |  SELECT feature, bucket, CAST(count(*) AS DOUBLE) /
         |         sum(count(*)) OVER (PARTITION BY feature) AS rf
         |  FROM (SELECT 'lang' AS feature, lang AS bucket FROM ref
         |        UNION ALL
         |        SELECT 'len_band', CAST(CAST(floor(n_chars / 200) * 200 AS BIGINT) AS VARCHAR)
         |        FROM ref)
         |  GROUP BY feature, bucket),
         |cb AS (
         |  SELECT feature, bucket, CAST(count(*) AS DOUBLE) /
         |         sum(count(*)) OVER (PARTITION BY feature) AS cf
         |  FROM (SELECT 'lang' AS feature, lang AS bucket FROM cur
         |        UNION ALL
         |        SELECT 'len_band', CAST(CAST(floor(n_chars / 200) * 200 AS BIGINT) AS VARCHAR)
         |        FROM cur)
         |  GROUP BY feature, bucket)
         |SELECT coalesce(rb.feature, cb.feature) AS feature,
         |       coalesce(rb.bucket, cb.bucket) AS bucket,
         |       round(coalesce(rf, 0), 4) AS ref_frac,
         |       round(coalesce(cf, 0), 4) AS cur_frac,
         |       round((greatest(coalesce(cf, 0), 0.0001) - greatest(coalesce(rf, 0), 0.0001)) *
         |             ln(greatest(coalesce(cf, 0), 0.0001) / greatest(coalesce(rf, 0), 0.0001)), 4) AS psi,
         |       round(greatest(coalesce(cf, 0), 0.0001) *
         |             ln(greatest(coalesce(cf, 0), 0.0001) / greatest(coalesce(rf, 0), 0.0001)), 4) AS kl
         |FROM rb FULL OUTER JOIN cb ON rb.feature = cb.feature AND rb.bucket = cb.bucket
         |ORDER BY feature, bucket""".stripMargin,
    "q_drift_tokens" ->
      s"""WITH $slicesCte,
         |rt AS (
         |  SELECT token, CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS rf
         |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM ref)
         |  GROUP BY token),
         |ct AS (
         |  SELECT token, CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS cf
         |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM cur)
         |  GROUP BY token)
         |SELECT coalesce(rt.token, ct.token) AS token,
         |       round(coalesce(rf, 0), 6) AS ref_frac,
         |       round(coalesce(cf, 0), 6) AS cur_frac,
         |       round(coalesce(cf, 0) - coalesce(rf, 0), 6) AS delta
         |FROM rt FULL OUTER JOIN ct ON rt.token = ct.token
         |ORDER BY abs(round(coalesce(cf, 0) - coalesce(rf, 0), 6)) DESC, token
         |LIMIT 20""".stripMargin
  )
}
