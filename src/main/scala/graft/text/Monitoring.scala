package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** CUPED-adjusted A/B readout (Deng et al. 2013, "Improving the
    * sensitivity of online controlled experiments"): the experiment metric
    * is each user's POST-period purchase count, the covariate each user's
    * PRE-period purchase count, and the adjusted metric
    * `ycv = y − θ(x − x̄)` with `θ = cov(x, y)/var(x)` from the pooled
    * population removes the pre-existing between-user variance the
    * covariate explains — the standard variance-reduction step every
    * experimentation platform applies before the t-test. Reported next to
    * the unadjusted Welch z so the sensitivity gain is visible in one row;
    * `var_reduction` is the WITHIN-arm `1 − seAdj²/seRaw²` — the quantity
    * CUPED actually shrinks (the pooled ratio would also count the
    * between-arm treatment effect, which no covariate can explain).
    *
    * Scale + determinism: the data-sized pass is ONE user-keyed aggregate
    * (the q_ab_test shuffle); everything after folds the 2-row arm-moment
    * table. All moments (Σx, Σy, Σxy, Σx², Σy²) are integer-valued, so
    * partial-aggregation order can never change them, and the closed-form
    * θ/variance/z arithmetic is mirrored token-for-token in the oracle —
    * only IEEE-exact ops (+,−,×,÷,√), no transcendentals — so both engines
    * execute the identical float sequence (the q_probe_train posture).
    * A zero-variance covariate yields θ = 0 (falls back to the raw test);
    * a zero adjusted variance yields null z, not a division error.
    */
  def abCuped(events: DataFrame, convType: String = "purchase",
      split: String = "2024-01-15 00:00:00"): DataFrame = {
    val sp = lit(split).cast("timestamp")
    val isConv = col("event_type") === convType
    val users = events.groupBy(col("user_id"))
      .agg(sum(when(isConv && col("ts") < sp, 1L).otherwise(0L)).as("x"),
        sum(when(isConv && col("ts") >= sp, 1L).otherwise(0L)).as("y"))
      .select((col("user_id") % 2).as("arm"), col("x"), col("y"))
    val arms = users.groupBy("arm").agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val flat = arms.agg(
      max(when(col("arm") === 0, col("n"))).as("n_a"),
      max(when(col("arm") === 0, col("sx"))).as("sx_a"),
      max(when(col("arm") === 0, col("sy"))).as("sy_a"),
      max(when(col("arm") === 0, col("sxy"))).as("sxy_a"),
      max(when(col("arm") === 0, col("sxx"))).as("sxx_a"),
      max(when(col("arm") === 0, col("syy"))).as("syy_a"),
      max(when(col("arm") === 1, col("n"))).as("n_b"),
      max(when(col("arm") === 1, col("sx"))).as("sx_b"),
      max(when(col("arm") === 1, col("sy"))).as("sy_b"),
      max(when(col("arm") === 1, col("sxy"))).as("sxy_b"),
      max(when(col("arm") === 1, col("sxx"))).as("sxx_b"),
      max(when(col("arm") === 1, col("syy"))).as("syy_b"))
    def d(c: String) = col(c).cast("double")
    // pooled moments (exact: sums of integer-valued doubles)
    val n = d("n_a") + d("n_b")
    val sx = d("sx_a") + d("sx_b"); val sy = d("sy_a") + d("sy_b")
    val sxy = d("sxy_a") + d("sxy_b"); val sxx = d("sxx_a") + d("sxx_b")
    val xbar = sx / n
    val varXDen = sxx - sx * sx / n
    val theta = when(varXDen =!= 0, (sxy - sx * sy / n) / varXDen).otherwise(lit(0.0))
    // per-arm sample variance of y and of the CUPED-adjusted ycv, in closed
    // form from the same moments: var(ycv) = var(y) − 2θcov(x,y) + θ²var(x)
    def armStats(suf: String, th: Column): (Column, Column, Column) = {
      val (na, sxa, sya) = (d("n_" + suf), d("sx_" + suf), d("sy_" + suf))
      val (sxya, sxxa, syya) = (d("sxy_" + suf), d("sxx_" + suf), d("syy_" + suf))
      val vy = (syya - sya * sya / na) / (na - 1)
      val vx = (sxxa - sxa * sxa / na) / (na - 1)
      val cxy = (sxya - sxa * sya / na) / (na - 1)
      val adjMean = sya / na - th * (sxa / na - xbar)
      (adjMean, vy - th * cxy * 2 + th * th * vx, vy)
    }
    val (adjA, vadjA, vyA) = armStats("a", theta)
    val (adjB, vadjB, vyB) = armStats("b", theta)
    val seRaw2 = vyA / d("n_a") + vyB / d("n_b")
    val seAdj2 = vadjA / d("n_a") + vadjB / d("n_b")
    val seRaw = sqrt(seRaw2)
    val seAdj = sqrt(seAdj2)
    val zRaw = when(seRaw =!= 0, (d("sy_a") / d("n_a") - d("sy_b") / d("n_b")) / seRaw)
    val zAdj = when(seAdj =!= 0, (adjA - adjB) / seAdj)
    flat.select(col("n_a"), col("n_b"),
      round(d("sy_a") / d("n_a"), 4).as("mean_a"),
      round(d("sy_b") / d("n_b"), 4).as("mean_b"),
      round(adjA, 4).as("adj_a"), round(adjB, 4).as("adj_b"),
      round(theta, 4).as("theta"),
      round(zRaw, 4).as("z_raw"), round(zAdj, 4).as("z_cuped"),
      when(seRaw2 =!= 0, round(lit(1.0) - seAdj2 / seRaw2, 4))
        .as("var_reduction"))
  }

  /** Single-changepoint detection over a time series by binary segmentation
    * (the first split of Scott-Knott / PELT-style segmentation): for every
    * candidate boundary the variance-explained gain
    * `n₁n₂/(n₁+n₂) · (μ₁ − μ₂)²` of splitting the series there, argmax
    * wins — the alarm a pipeline monitor raises when a crawl or filter
    * change shifts daily volume. Input is a `(day, n)` series already
    * aggregated to calendar grain.
    *
    * Scale: callers aggregate the corpus to the day series first (one hash
    * aggregate — the data-sized pass); the windows here are unpartitioned
    * but run on the observation-span-sized series (≤ a few thousand rows at
    * any corpus scale — the q_survival posture). Prefix sums are integer,
    * so each candidate's means and gain are identical IEEE arithmetic in
    * both engines; ranking keys on round(gain, 6) with the day as
    * tie-break. `minSeg` (PELT's minseglen) keeps both segments at least
    * that long, so a single outlier day at either edge can't win the split.
    */
  def changepoint(series: DataFrame, minSeg: Int = 3): DataFrame = {
    val w = Window.orderBy("day")
    val tot = series.agg(count(lit(1)).as("nd"), sum("n").as("s"))
    val cand = series
      .withColumn("n1", row_number().over(w).cast("long"))
      .withColumn("s1", sum("n").over(w))
      .crossJoin(broadcast(tot))
      .filter(col("n1") >= minSeg && col("n1") <= col("nd") - minSeg)
    val n1 = col("n1").cast("double"); val n2 = (col("nd") - col("n1")).cast("double")
    val mu1 = col("s1").cast("double") / n1
    val mu2 = (col("s") - col("s1")).cast("double") / n2
    val gain = n1 * n2 / (n1 + n2) * ((mu1 - mu2) * (mu1 - mu2))
    cand.select(col("day").as("split_day"),
        col("n1").as("days_before"), (col("nd") - col("n1")).as("days_after"),
        round(mu1, 4).as("mean_before"), round(mu2, 4).as("mean_after"),
        round(gain, 4).as("gain"), round(gain, 6).as("gk"))
      .orderBy(col("gk").desc, col("split_day"))
      .limit(1)
      .drop("gk")
  }

  // ---- declared queries ----

  /** GROUP-SEQUENTIAL A/B readout (Pocock 1977): the z-statistic evaluated
    * at K interim looks of growing enrollment, each compared to the
    * CONSTANT Pocock boundary (K = 5, α = 0.05 two-sided → 2.413) instead
    * of the fixed-horizon 1.96 — the "peek without lying to yourself"
    * mechanism every experimentation platform ships, since checking an
    * unadjusted z at every look inflates false positives severalfold.
    * Looks are equal slices of users ranked by enrollment (first event ts,
    * user_id tie-break); per look the CUMULATIVE per-arm (n, conversions)
    * feed the same pooled two-proportion z as [[abTest]].
    *
    * Scale + determinism: the data-sized pass is the one user-keyed
    * aggregate; the enrollment rank runs over the USER table (one row per
    * user — at billions of users a platform would range-partition the rank
    * or cut looks by calendar time instead). Look assignment is integer
    * arithmetic, all moments are integer counts, and the z arithmetic is
    * the [[abTest]] IEEE-exact sequence mirrored token-for-token in the
    * oracle.
    */
  def abSequential(events: DataFrame, convType: String = "purchase",
      minConversions: Int = 14, looks: Int = 5,
      bound: Double = 2.413): DataFrame = {
    val users = events.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"),
        sum(when(col("event_type") === convType, 1).otherwise(0)).as("np"))
      .select(col("user_id"), col("first_ts"),
        (col("user_id") % 2).as("arm"),
        when(col("np") >= minConversions, 1L).otherwise(0L).as("conv"))
    val ranked = users
      .withColumn("rn",
        row_number().over(Window.orderBy(col("first_ts"), col("user_id"))))
      .crossJoin(broadcast(users.agg(count(lit(1)).as("nu"))))
      .withColumn("look",
        (floor(((col("rn") - 1) * looks) / col("nu")) + 1).cast("long"))
    val per = ranked.groupBy("look").agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("dn_a"),
      sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("dc_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("dn_b"),
      sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("dc_b"))
    val wc = Window.orderBy("look")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = per.select(col("look"),
      sum("dn_a").over(wc).as("n_a"), sum("dc_a").over(wc).as("c_a"),
      sum("dn_b").over(wc).as("n_b"), sum("dc_b").over(wc).as("c_b"))
    val (na, ca, nb, cb) = (col("n_a").cast("double"), col("c_a").cast("double"),
      col("n_b").cast("double"), col("c_b").cast("double"))
    val pool = (ca + cb) / (na + nb)
    val denom = sqrt(pool * (lit(1.0) - pool) * (lit(1.0) / na + lit(1.0) / nb))
    val z = when(denom =!= 0, (ca / na - cb / nb) / denom)
    cum.select(col("look"), col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        round(z, 4).as("z"), (abs(z) > bound).as("stop"))
      .orderBy("look")
  }

  private def qAbSequential(s: SparkSession, d: String): DataFrame =
    abSequential(T.events(s, d))

  private def qAbTest(s: SparkSession, d: String): DataFrame =
    abTest(T.events(s, d))

  private def qAbCuped(s: SparkSession, d: String): DataFrame =
    abCuped(T.events(s, d))

  private def qChangepoint(s: SparkSession, d: String): DataFrame =
    changepoint(T.events(s, d)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n")))

  private def qDriftPsi(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    driftPsi(refSlice(docs), curSlice(docs)).orderBy("feature", "bucket")
  }

  private def qDriftTokens(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    driftTokens(refSlice(docs), curSlice(docs))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic — the nonparametric
    * companion to the binned PSI: KS = max |F_ref − F_cur| over the union
    * of observed values, with the α = 0.05 critical value
    * 1.358·√((n+m)/(n·m)) deciding the breach flag. The cumulative window
    * runs over the DISTINCT-VALUE grid (counts collapse map-side per
    * value; integer features have a bounded grid, continuous ones should
    * quantize first), never over rows — same posture as the histogram
    * rollups. Every grid term is a ratio of exact integer counts, so both
    * engines compute bit-identical statistics. NULL feature values are
    * EXCLUDED on both sides — a null has no place on an ordered CDF, and
    * including it would make the grid's sort order engine-specific.
    *
    * `maxGrid` ENFORCES the bounded-grid contract instead of trusting it:
    * the grid materializes once (localCheckpoint — also kills the
    * double-execution of the two groupBys that feeding both the total and
    * the window would otherwise cost), its exact size is counted, and a
    * continuous feature that slipped through unquantized REFUSES with the
    * fix in the message rather than silently serializing a corpus-sized
    * CDF through the single-partition cumulative window.
    */
  def driftKs(ref: DataFrame, cur: DataFrame, feature: String,
      maxGrid: Int = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val r = ref.filter(col(feature).isNotNull)
      .groupBy(col(feature).as("v")).agg(count(lit(1)).as("rn"))
    val c = cur.filter(col(feature).isNotNull)
      .groupBy(col(feature).as("v")).agg(count(lit(1)).as("cn"))
    val j = r.join(c, Seq("v"), "full_outer").na.fill(0L, Seq("rn", "cn"))
      .localCheckpoint(true)
    val grid = j.count()
    require(grid <= maxGrid,
      s"driftKs: feature '$feature' has $grid distinct values (> $maxGrid) — " +
        "the cumulative CDF grid would serialize through one task at this " +
        "cardinality; quantize the feature first (round / width_bucket to " +
        s"<= $maxGrid bins) or raise maxGrid deliberately")
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // totals from a whole-range frame on the SAME window sort — no separate
    // aggregate + cross-join pass over the checkpointed grid
    val wAll = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    j.withColumn("crf", sum("rn").over(w))
      .withColumn("ccf", sum("cn").over(w))
      .withColumn("nr", sum("rn").over(wAll).cast("double"))
      .withColumn("nc", sum("cn").over(wAll).cast("double"))
      .groupBy("nr", "nc")
      .agg(round(max(abs(col("crf") / col("nr") - col("ccf") / col("nc"))), 4)
        .as("ks"))
      .select(col("ks"),
        col("nr").cast("long").as("n_ref"), col("nc").cast("long").as("n_cur"),
        when(col("ks") >
          round(lit(1.358) * sqrt((col("nr") + col("nc")) / (col("nr") * col("nc"))), 4),
          1).otherwise(0).as("breach"))
  }

  private def qDriftKs(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    driftKs(refSlice(docs), curSlice(docs), "n_chars")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_drift_ks" -> qDriftKs,
    "q_drift_psi" -> qDriftPsi,
    "q_drift_tokens" -> qDriftTokens,
    "q_ab_test" -> qAbTest,
    "q_ab_sequential" -> qAbSequential,
    "q_ab_cuped" -> qAbCuped,
    "q_changepoint" -> qChangepoint
  )

  private val slicesCte =
    """ref AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
      |cur AS (SELECT * FROM documents WHERE doc_id % 2 = 1 AND n_chars >= 150)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // KS over the distinct n_chars grid: every term is a ratio of exact
    // integer counts, so the max is bit-identical across engines
    "q_drift_ks" ->
      s"""WITH $slicesCte,
         |r AS (SELECT n_chars AS v, count(*) AS rn FROM ref GROUP BY 1),
         |c AS (SELECT n_chars AS v, count(*) AS cn FROM cur GROUP BY 1),
         |j AS (SELECT coalesce(r.v, c.v) AS v, coalesce(rn, 0) AS rn,
         |             coalesce(cn, 0) AS cn
         |      FROM r FULL JOIN c ON r.v = c.v),
         |t AS (SELECT CAST(sum(rn) AS DOUBLE) AS nr,
         |             CAST(sum(cn) AS DOUBLE) AS nc FROM j),
         |cum AS (SELECT v, sum(rn) OVER (ORDER BY v) AS crf,
         |               sum(cn) OVER (ORDER BY v) AS ccf FROM j),
         |agg AS (SELECT round(max(abs(crf / nr - ccf / nc)), 4) AS ks,
         |               nr, nc
         |        FROM cum, t GROUP BY nr, nc)
         |SELECT ks, CAST(nr AS BIGINT) AS n_ref, CAST(nc AS BIGINT) AS n_cur,
         |  CASE WHEN ks > round(1.358 * sqrt((nr + nc) / (nr * nc)), 4)
         |       THEN 1 ELSE 0 END AS breach
         |FROM agg""".stripMargin,
    // the abTest z mirrored at 5 cumulative Pocock looks (bound 2.413)
    "q_ab_sequential" ->
      """WITH u AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_ts,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
        |  FROM events GROUP BY user_id),
        |r AS (
        |  SELECT user_id % 2 AS arm,
        |    CASE WHEN np >= 14 THEN 1 ELSE 0 END AS conv,
        |    row_number() OVER (ORDER BY first_ts, user_id) AS rn,
        |    count(*) OVER () AS nu
        |  FROM u),
        |l AS (SELECT arm, conv,
        |    CAST(floor(((rn - 1) * 5.0) / nu) AS BIGINT) + 1 AS look FROM r),
        |per AS (
        |  SELECT look,
        |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS dn_a,
        |    sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS dc_a,
        |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS dn_b,
        |    sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS dc_b
        |  FROM l GROUP BY look),
        |cum AS (
        |  SELECT look,
        |    CAST(sum(dn_a) OVER w AS BIGINT) AS n_a,
        |    CAST(sum(dc_a) OVER w AS BIGINT) AS c_a,
        |    CAST(sum(dn_b) OVER w AS BIGINT) AS n_b,
        |    CAST(sum(dc_b) OVER w AS BIGINT) AS c_b
        |  FROM per
        |  WINDOW w AS (ORDER BY look ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND CURRENT ROW)),
        |zc AS (
        |  SELECT look, n_a, c_a, n_b, c_b,
        |    (CAST(c_a AS DOUBLE) + CAST(c_b AS DOUBLE))
        |      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pool
        |  FROM cum),
        |zz AS (
        |  SELECT look, n_a, c_a, n_b, c_b,
        |    CASE WHEN sqrt(pool * (1.0 - pool)
        |        * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) <> 0
        |      THEN (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |            - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |        / sqrt(pool * (1.0 - pool)
        |            * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |    END AS z
        |  FROM zc)
        |SELECT look, n_a, c_a, n_b, c_b, round(z, 4) AS z,
        |  abs(z) > 2.413 AS stop
        |FROM zz ORDER BY look""".stripMargin,
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
         |LIMIT 20""".stripMargin,
    "q_ab_cuped" ->
      """WITH users AS (
        |  SELECT user_id % 2 AS arm,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |                   AND ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |                   AND ts >= TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |arms AS (
        |  SELECT arm, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM users GROUP BY arm),
        |flat AS (
        |  SELECT
        |    max(CASE WHEN arm = 0 THEN n END) AS n_a,
        |    max(CASE WHEN arm = 0 THEN sx END) AS sx_a,
        |    max(CASE WHEN arm = 0 THEN sy END) AS sy_a,
        |    max(CASE WHEN arm = 0 THEN sxy END) AS sxy_a,
        |    max(CASE WHEN arm = 0 THEN sxx END) AS sxx_a,
        |    max(CASE WHEN arm = 0 THEN syy END) AS syy_a,
        |    max(CASE WHEN arm = 1 THEN n END) AS n_b,
        |    max(CASE WHEN arm = 1 THEN sx END) AS sx_b,
        |    max(CASE WHEN arm = 1 THEN sy END) AS sy_b,
        |    max(CASE WHEN arm = 1 THEN sxy END) AS sxy_b,
        |    max(CASE WHEN arm = 1 THEN sxx END) AS sxx_b,
        |    max(CASE WHEN arm = 1 THEN syy END) AS syy_b
        |  FROM arms),
        |m AS (
        |  SELECT *,
        |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n,
        |    CAST(sx_a AS DOUBLE) + CAST(sx_b AS DOUBLE) AS sx,
        |    CAST(sy_a AS DOUBLE) + CAST(sy_b AS DOUBLE) AS sy,
        |    CAST(sxy_a AS DOUBLE) + CAST(sxy_b AS DOUBLE) AS sxy,
        |    CAST(sxx_a AS DOUBLE) + CAST(sxx_b AS DOUBLE) AS sxx,
        |    CAST(syy_a AS DOUBLE) + CAST(syy_b AS DOUBLE) AS syy
        |  FROM flat),
        |t AS (
        |  SELECT *, sx / n AS xbar,
        |    CASE WHEN sxx - sx * sx / n <> 0
        |         THEN (sxy - sx * sy / n) / (sxx - sx * sx / n) ELSE 0.0 END AS theta
        |  FROM m),
        |a AS (
        |  SELECT *,
        |    (CAST(syy_a AS DOUBLE) - CAST(sy_a AS DOUBLE) * CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |      / (CAST(n_a AS DOUBLE) - 1) AS vy_a,
        |    (CAST(sxx_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |      / (CAST(n_a AS DOUBLE) - 1) AS vx_a,
        |    (CAST(sxy_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |      / (CAST(n_a AS DOUBLE) - 1) AS cxy_a,
        |    CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      - theta * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) - xbar) AS adj_a,
        |    (CAST(syy_b AS DOUBLE) - CAST(sy_b AS DOUBLE) * CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      / (CAST(n_b AS DOUBLE) - 1) AS vy_b,
        |    (CAST(sxx_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      / (CAST(n_b AS DOUBLE) - 1) AS vx_b,
        |    (CAST(sxy_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      / (CAST(n_b AS DOUBLE) - 1) AS cxy_b,
        |    CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |      - theta * (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) - xbar) AS adj_b
        |  FROM t),
        |v AS (
        |  SELECT *,
        |    vy_a - theta * cxy_a * 2 + theta * theta * vx_a AS vadj_a,
        |    vy_b - theta * cxy_b * 2 + theta * theta * vx_b AS vadj_b
        |  FROM a),
        |w AS (
        |  SELECT *,
        |    vy_a / CAST(n_a AS DOUBLE) + vy_b / CAST(n_b AS DOUBLE) AS se_raw2,
        |    vadj_a / CAST(n_a AS DOUBLE) + vadj_b / CAST(n_b AS DOUBLE) AS se_adj2
        |  FROM v),
        |z AS (
        |  SELECT *, sqrt(se_raw2) AS se_raw, sqrt(se_adj2) AS se_adj FROM w)
        |SELECT n_a, n_b,
        |  round(CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE), 4) AS mean_a,
        |  round(CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE), 4) AS mean_b,
        |  round(adj_a, 4) AS adj_a, round(adj_b, 4) AS adj_b,
        |  round(theta, 4) AS theta,
        |  CASE WHEN se_raw <> 0 THEN
        |    round((CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |           - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)) / se_raw, 4) END AS z_raw,
        |  CASE WHEN se_adj <> 0 THEN round((adj_a - adj_b) / se_adj, 4) END AS z_cuped,
        |  CASE WHEN se_raw2 <> 0 THEN round(1.0 - se_adj2 / se_raw2, 4) END AS var_reduction
        |FROM z""".stripMargin,
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1),
        |tot AS (SELECT count(*) AS nd, CAST(sum(n) AS BIGINT) AS s FROM daily),
        |pre AS (
        |  SELECT day, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS n1,
        |    CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS s1
        |  FROM daily),
        |cand AS (
        |  SELECT p.day, p.n1, p.s1, t.nd, t.s
        |  FROM pre p CROSS JOIN tot t WHERE p.n1 >= 3 AND p.n1 <= t.nd - 3),
        |g AS (
        |  SELECT day, n1, nd - n1 AS n2,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mu1,
        |    CAST(s - s1 AS DOUBLE) / CAST(nd - n1 AS DOUBLE) AS mu2,
        |    CAST(n1 AS DOUBLE) * CAST(nd - n1 AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) + CAST(nd - n1 AS DOUBLE))
        |      * ((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |          - CAST(s - s1 AS DOUBLE) / CAST(nd - n1 AS DOUBLE))
        |         * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |            - CAST(s - s1 AS DOUBLE) / CAST(nd - n1 AS DOUBLE))) AS gain
        |  FROM cand)
        |SELECT day AS split_day, n1 AS days_before, n2 AS days_after,
        |  round(mu1, 4) AS mean_before, round(mu2, 4) AS mean_after,
        |  round(gain, 4) AS gain
        |FROM g ORDER BY round(gain, 6) DESC, split_day LIMIT 1""".stripMargin
  )
}
