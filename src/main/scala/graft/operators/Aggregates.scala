package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables => T}

/** Aggregation operators.
  *
  * Reference semantics: A1 quantile sketch (`Gddp.scala:230-232` — GeoTrellis
  * StreamingHistogram → quantile breaks), A2 min/max (`Gddp.scala:127-129`),
  * G1 per-group dataflow (`Gddp.scala:164-239` — one task per variable),
  * R1 color binning (`Gddp.scala:232-236`), E1 whole-extent aggregate
  * (README.md:67-94). Rollup/cube/multi-agg are §2B generalizations.
  *
  * Scale notes: all aggregates are partial+final (map-side combine) hash
  * aggregates chosen by Catalyst; quantile uses the exact `percentile` for the
  * oracle twin and `percentile_approx` (a mergeable sketch, the direct analog
  * of the reference's StreamingHistogram) for the scale path.
  */
object Aggregates extends QueryModule {

  /** Flagship (Phase 0): TPC-H-Q1-shaped pruned scan + range filter + per-group
    * aggregate + stable sort — the reference's composed query (§2A end) on
    * `lineitem`. Exercises S1, F2, P1, A2, G1 and sort in one plan.
    */
  def q1Pricing(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1d) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A2: min/max over groups. */
  private def qMinmax(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        min("l_shipdate").as("mn_date"), max("l_shipdate").as("mx_date"),
        round(min("l_extendedprice"), 2).as("mn_price"),
        round(max("l_extendedprice"), 2).as("mx_price"))
      .orderBy("l_returnflag")

  /** G1: per-group pipeline (one group per event_type, like one task per
    * variable in `Gddp.scala:164`).
    */
  private def qPergroup(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("event_type")

  /** Multi-aggregate hash aggregation incl. distinct count (§2B). */
  private def qAggHash(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        countDistinct(col("l_partkey")).as("dparts"),
        round(sum("l_quantity"), 2).as("sq"),
        round(avg("l_discount"), 6).as("ad"),
        round(min("l_quantity"), 2).as("mnq"),
        round(max("l_quantity"), 2).as("mxq"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Rollup with NULL-safe sentinel labels (grouping nulls → 'ALL' on both
    * engines, sidestepping NULL-ordering dialect differences).
    */
  private def qRollup(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_extendedprice"), 2).as("total"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("total"), col("n"))
      .orderBy("rf", "ls")

  /** Cube over the same keys. */
  private def qCube(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_extendedprice"), 2).as("total"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("total"), col("n"))
      .orderBy("rf", "ls")

  /** Explicit GROUPING SETS (beyond rollup/cube): totals by (rf, ls), by rf
    * alone, and grand total — Spark 4's Dataset.groupingSets API.
    */
  private def qGroupingSets(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_extendedprice"), 2).as("total"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("total"), col("n"))
      .orderBy("rf", "ls")

  /** A1 (exact twin): per-group quartiles via exact `percentile` — linear
    * interpolation matches DuckDB `quantile_cont`.
    */
  private def qQuantile(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"))
      .orderBy("l_returnflag")

  /** A1 (scale path, no oracle): mergeable quantile sketch — the Spark analog
    * of `StreamingHistogram.quantileBreaks` (`Gddp.scala:230-232`). Breaks are
    * exploded to `(group, break_idx, break_value)` rows: the driver's
    * rows-check hashes scalar columns only (array cells are unhashable there).
    */
  private def qQuantileApprox(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(expr("percentile_approx(l_quantity, array(0.25, 0.5, 0.75), 10000)").as("breaks"))
      .select(col("l_returnflag"), posexplode(col("breaks")).as(Seq("break_idx", "break_value")))
      .orderBy("l_returnflag", "break_idx")

  /** R1: value→bin color mapping with fixed breaks (`Gddp.scala:232-236`),
    * as integer binning: bin = clamp(floor((v - lo) / step), 0, nbins-1).
    */
  private def qColorbin(s: SparkSession, d: String): DataFrame = {
    val lo = 900.0d; val step = 10410.0d // (105000 - 900) / 10 bins
    T.lineitem(s, d)
      .select(least(greatest(floor((col("l_extendedprice") - lo) / step), lit(0L)), lit(9L))
        .cast("int").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }

  /** A1 (faithful sketch): the reference's exact break computation —
    * Ben-Haim/Tom-Yossef streaming histogram (`Gddp.scala:230-232`) as a
    * `TypedImperativeAggregate` (live object buffer, serialized only at
    * shuffle — the typed-Aggregator form paid an encoder round-trip per row).
    * No oracle (sketch output is approximation-specific); accuracy vs exact
    * percentile is asserted in ScalaTest.
    */
  private def qHistSketch(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(graft.functions.HistogramFunctions
        .histogram_breaks(col("l_quantity"), numBreaks = 4).as("breaks"))
      .select(col("l_returnflag"),
        posexplode(col("breaks")).as(Seq("break_idx", "break_value")))
      .select(col("l_returnflag"), col("break_idx"), round(col("break_value"), 4).as("break_value"))
      .orderBy("l_returnflag", "break_idx")

  /** A1 (shard rollup): the quantile twin of `q_hll_union` — stage 1 builds
    * one histogram sketch (bytes) per shard, stage 2 merges the sketches to
    * GLOBAL quantiles without rescanning rows. At 100 TB the stage-1 bytes
    * persist at ingest (one ~1 KB blob per shard) and any shard
    * combination's quantiles come from merging blobs, not data. l_quantity
    * has 50 distinct values < 64 bins, so every sketch is in its exact
    * regime and the result equals DuckDB `quantile_cont` — a full oracle;
    * exactness degrades gracefully past the bin budget (asserted with error
    * bounds in HistogramSpec, associativity in PropertySpec).
    */
  private def qQuantileRollup(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy(pmod(col("l_orderkey"), lit(8)).as("shard"))
      .agg(graft.functions.HistogramFunctions
        .histogram_sketch(col("l_quantity")).as("sk"))
      .agg(graft.functions.HistogramFunctions
        .histogram_merge_quantiles(col("sk"), Seq(0.25, 0.5, 0.75)).as("qs"))
      .select(posexplode(col("qs")).as(Seq("q_idx", "q_value")))
      .select(col("q_idx"), round(col("q_value"), 4).as("q_value"))
      .orderBy("q_idx")

  /** HLL approximate distinct count — the scale path for count_distinct at
    * extreme cardinality (mergeable sketch, no exact-distinct shuffle).
    * No oracle: sketch estimates are implementation-specific.
    */
  private def qApproxDistinct(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Sketch rollup: per-lang HLL sketches of `source`, union-aggregated to
    * the global distinct count WITHOUT rescanning the data — the pattern
    * that makes cardinality dashboards free at 100 TB (persist per-shard
    * sketch bytes once, `hll_union_agg` answers any shard combination
    * later). Both levels are Spark built-ins (datasketches HLL), mergeable
    * partial+final. At the fixture cardinality (20 sources) the sketch is
    * still in its exact sparse mode, so the estimate equals the true
    * distinct count and the query keeps a full oracle; estimation error at
    * real cardinality is approx_count_distinct-class (~1.6% at lgK=12).
    */
  private def qHllUnion(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .groupBy("lang")
      .agg(hll_sketch_agg(col("source")).as("sk"))
      .agg(hll_union_agg(col("sk")).as("u"))
      .select(hll_sketch_estimate(col("u")).as("distinct_sources"))

  /** Skew-proof two-stage aggregation (`Scale.saltedSumCount`): stage 1 on
    * (key, salt) spreads a pathological hot key over 16 reducers, stage 2
    * combines partials. Same result as the direct aggregate — which is what
    * the oracle checks.
    */
  private def qAggSalted(s: SparkSession, d: String): DataFrame =
    Scale.saltedSumCount(T.lineitem(s, d), col("l_returnflag"), col("l_quantity"), 16)
      .select(col("k"), round(col("total"), 2).as("total"), col("n"))
      .orderBy("k")

  /** Column profiler: per-column non-null / distinct / min / max over a fixed
    * column list in ONE scan — unpivot to narrow (col_name, v) pairs, then a
    * two-level aggregate: stage 1 collapses to the DISTINCT pairs (map-side
    * combine does most of it for low-cardinality columns), stage 2 folds the
    * pairs to one row per column. This shuffles only the distinct pairs, vs
    * the 6-way Expand that Spark plans for multi-`count(DISTINCT)` (measured
    * ~2× slower here). The one-scan shape is the point at 100 TB: profiling
    * N columns costs one read of the table, not N; for key-like columns the
    * pair shuffle is the exact-count price — swap `approx_count_distinct`
    * into the same slot when estimates suffice.
    */
  private val profileCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_orderkey")

  private def qProfile(s: SparkSession, d: String): DataFrame = {
    // inline over struct pairs, not a map literal: map values reject nulls
    val pairs = profileCols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("double").as("v")))
    T.lineitem(s, d)
      .select(inline(array(pairs: _*)))
      .groupBy("col_name", "v").agg(count(lit(1)).as("n"))
      .groupBy("col_name")
      .agg(
        sum(when(col("v").isNotNull, col("n")).otherwise(0L)).as("non_null"),
        count(col("v")).as("n_distinct"),
        round(min("v"), 4).as("mn"),
        round(max("v"), 4).as("mx"))
      .orderBy("col_name")
  }

  /** Pivot: wide per-returnflag quantity totals — `groupBy().pivot()` with an
    * explicit value list (never let pivot scan for distinct values at scale).
    */
  private def qPivot(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum("l_quantity"), 2))
      .orderBy("l_linestatus")

  /** Statistical aggregate family: stddev/variance/correlation/covariance. */
  /** Per-group statistical moments. Spark's `skewness`/`kurtosis` are the
    * POPULATION moments (g1 = m3/m2^1.5, excess g2 = m4/m2² − 3) — DuckDB's
    * builtins are the bias-corrected SAMPLE versions, so the oracle
    * reproduces Spark's definition from raw power sums instead. round(4)
    * absorbs the one-pass-update vs raw-sums float noise, same as corr.
    */
  private def qStats(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(skewness(col("l_quantity")), 4).as("skew_qty"),
        round(kurtosis(col("l_quantity")), 4).as("kurt_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"))
      .orderBy("l_returnflag")

  /** Chi-square test of independence over the lang × source contingency
    * table: χ² = Σ (o − e)²/e with e = rowTotal·colTotal/N, plus degrees of
    * freedom. The ONE data-sized pass is the (lang, source) count
    * aggregate; marginals, N, and the statistic all roll up from that
    * |langs|·|sources| table, so at 100 TB only the first aggregate grows.
    * The standard "is this metadata dimension independent of that one"
    * profiling question for corpus audits.
    */
  private def qChi2(s: SparkSession, d: String): DataFrame = {
    // marginals (row/column totals, grand total, alphabet sizes) as window
    // sums over the vocabulary-sized contingency table — the corpus-sized
    // groupBy runs ONCE (the r20 plan recomputed it for rt, ct and tot and
    // joined them back). nl/ns count groups exactly via first-row-per-group
    // markers; all-integer until the single n cast, as before.
    import org.apache.spark.sql.expressions.{Window => W}
    val wAll = W.partitionBy(lit(1))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val obs = T.documents(s, d).groupBy("lang", "source")
      .agg(count(lit(1)).as("o"))
      .withColumn("rt", sum("o").over(W.partitionBy("lang")))
      .withColumn("ct", sum("o").over(W.partitionBy("source")))
      .withColumn("rl", row_number().over(W.partitionBy("lang").orderBy("source")))
      .withColumn("rs", row_number().over(W.partitionBy("source").orderBy("lang")))
      .withColumn("n", sum("o").over(wAll).cast("double"))
      .withColumn("nl", sum(when(col("rl") === 1, 1L).otherwise(0L)).over(wAll))
      .withColumn("ns", sum(when(col("rs") === 1, 1L).otherwise(0L)).over(wAll))
    obs
      .select(
        (((col("o") - col("rt") * col("ct") / col("n"))
          * (col("o") - col("rt") * col("ct") / col("n")))
          / (col("rt") * col("ct") / col("n"))).as("cell"),
        ((col("nl") - 1) * (col("ns") - 1)).as("dof"),
        col("n"))
      .groupBy("dof", "n")
      .agg(round(sum("cell"), 4).as("chi2"))
      .select(col("chi2"), col("dof"), col("n").cast("long").as("n_docs"))
      .orderBy("chi2")
  }

  /** Association rules (market-basket): support / confidence / lift for
    * every ordered event-type pair over per-user itemsets. The data-sized
    * pass is ONE distinct over (user, event_type) — map-side partials
    * collapse each user's repeats before the shuffle; the self-join that
    * builds co-occurrence is keyed on user with fan-out bounded by
    * |type vocab|² per user, so it stays corpus-linear (never all-pairs
    * across users). Marginals and totals are vocab-sized rollups; ratios
    * compute in double so counts can't overflow at web scale.
    */
  private def qAssocRules(s: SparkSession, d: String): DataFrame = {
    val ue = T.events(s, d).select(col("user_id"), col("event_type")).distinct()
    val cnt = ue.groupBy("event_type").agg(count(lit(1)).as("cnt"))
    val total = ue.agg(countDistinct(col("user_id")).as("total"))
    val both = ue.select(col("user_id"), col("event_type").as("a"))
      .join(ue.select(col("user_id"), col("event_type").as("b")), "user_id")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("nab"))
    both
      .join(cnt.select(col("event_type").as("a"), col("cnt").as("na")), "a")
      .join(cnt.select(col("event_type").as("b"), col("cnt").as("nb")), "b")
      .crossJoin(total)
      .select(col("a").as("antecedent"), col("b").as("consequent"),
        round(col("nab").cast("double") / col("total"), 4).as("support"),
        round(col("nab").cast("double") / col("na"), 4).as("confidence"),
        round(col("nab").cast("double") * col("total") /
          (col("na").cast("double") * col("nb")), 4).as("lift"))
      .orderBy("antecedent", "consequent")
  }

  /** Per-group least-squares fit: the regr_* aggregate family (slope,
    * intercept, R², mean point, count) — one partial+final hash agg like
    * any other aggregate; both engines share the textbook definitions so
    * the oracle is direct.
    */
  private def qRegr(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
        round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 4).as("avg_x"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy("l_returnflag")

  /** Ordered string aggregation (the LISTAGG surface): collect_set →
    * sort_array → array_join makes the concatenation deterministic without
    * relying on input order — the only shape an oracle can check. Deduped
    * per group map-side (collect_set partials), so the shuffle carries
    * distinct values, not rows.
    */
  private def qStragg(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** Weekly cohort retention — the product-analytics staple: users grouped
    * by first-activity week, then distinct-user counts per weeks-since-
    * cohort offset. Shape: distinct over (user, week) pairs FIRST — the
    * map-side partial dedup collapses each user-week's many events before
    * anything shuffles — then the per-user min as a WINDOW over the user
    * key and one tiny (cohort, offset)-keyed count. Every post-dedup
    * exchange carries user-week PAIRS, not events; repartitioning raw
    * events by user up front would save one pair-sized exchange but ship
    * every raw event through the shuffle, the wrong trade at any scale.
    * Count(*) IS the distinct-user count because the input is one row per
    * (user, week).
    */
  private def qRetention(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    T.events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
      .withColumn("cohort", min("wk").over(w))
      .select(col("cohort"),
        expr("CAST(datediff(wk, cohort) DIV 7 AS INT)").as("week_offset"))
      .groupBy("cohort", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort", "week_offset")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_retention" -> qRetention,
    "q_pivot" -> qPivot,
    "q_regr" -> qRegr,
    "q_stragg" -> qStragg,
    "q_profile" -> qProfile,
    "q_stats" -> qStats,
    "q_agg_salted" -> qAggSalted,
    "q1_pricing" -> q1Pricing,
    "q_hist_sketch" -> qHistSketch,
    "q_approx_distinct" -> qApproxDistinct,
    "q_hll_union" -> qHllUnion,
    "q_minmax" -> qMinmax,
    "q_pergroup" -> qPergroup,
    "q_agg_hash" -> qAggHash,
    "q_rollup" -> qRollup,
    "q_cube" -> qCube,
    "q_grouping_sets" -> qGroupingSets,
    "q_quantile" -> qQuantile,
    "q_quantile_approx" -> qQuantileApprox,
    "q_quantile_rollup" -> qQuantileRollup,
    "q_colorbin" -> qColorbin,
    "q_chi2" -> qChi2,
    "q_assoc_rules" -> qAssocRules
  )

  val oracleSql: Map[String, String] = Map(
    "q_assoc_rules" ->
      """WITH ue AS (SELECT DISTINCT user_id, event_type FROM events),
        |cnt AS (SELECT event_type, count(*) AS cnt FROM ue GROUP BY 1),
        |total AS (SELECT count(DISTINCT user_id) AS total FROM ue),
        |pair AS (
        |  SELECT x.event_type AS a, y.event_type AS b, count(*) AS nab
        |  FROM ue x JOIN ue y ON x.user_id = y.user_id
        |  WHERE x.event_type <> y.event_type GROUP BY 1, 2)
        |SELECT a AS antecedent, b AS consequent,
        |  round(CAST(nab AS DOUBLE) / total.total, 4) AS support,
        |  round(CAST(nab AS DOUBLE) / na.cnt, 4) AS confidence,
        |  round(CAST(nab AS DOUBLE) * total.total
        |        / (CAST(na.cnt AS DOUBLE) * nb.cnt), 4) AS lift
        |FROM pair
        |JOIN cnt na ON na.event_type = pair.a
        |JOIN cnt nb ON nb.event_type = pair.b
        |CROSS JOIN total
        |ORDER BY antecedent, consequent""".stripMargin,
    "q_chi2" ->
      """WITH obs AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, sum(o) AS rt FROM obs GROUP BY 1),
        |ct AS (SELECT source, sum(o) AS ct FROM obs GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS DOUBLE) AS n,
        |  count(DISTINCT lang) AS nl, count(DISTINCT source) AS ns FROM obs)
        |SELECT
        |  round(sum((o - rt.rt*ct.ct/tot.n) * (o - rt.rt*ct.ct/tot.n)
        |        / (rt.rt*ct.ct/tot.n)), 4) AS chi2,
        |  (nl - 1) * (ns - 1) AS dof,
        |  CAST(tot.n AS BIGINT) AS n_docs
        |FROM obs JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN tot
        |GROUP BY dof, n_docs ORDER BY chi2""".stripMargin,
    "q_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |c AS (
        |  SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort
        |  FROM a)
        |SELECT cohort,
        |  CAST(date_diff('day', cohort, wk) // 7 AS INT) AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM c GROUP BY 1, 2
        |ORDER BY cohort, week_offset""".stripMargin,
    "q_profile" -> {
      val branches = profileCols.map { c =>
        s"""SELECT '$c' AS col_name, count($c) AS non_null, count(DISTINCT $c) AS n_distinct,
           |  round(CAST(min($c) AS DOUBLE), 4) AS mn, round(CAST(max($c) AS DOUBLE), 4) AS mx
           |FROM lineitem""".stripMargin
      }
      branches.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")
    },
    // the HLL union is in exact sparse mode at this cardinality
    "q_hll_union" ->
      "SELECT count(DISTINCT source) AS distinct_sources FROM documents",
    // 50 distinct l_quantity values < 64 bins: the sketch rollup is exact
    "q_quantile_rollup" ->
      """SELECT q_idx, round(q_value, 4) AS q_value FROM (
        |  SELECT 0 AS q_idx, quantile_cont(l_quantity, 0.25) AS q_value FROM lineitem
        |  UNION ALL
        |  SELECT 1, quantile_cont(l_quantity, 0.5) FROM lineitem
        |  UNION ALL
        |  SELECT 2, quantile_cont(l_quantity, 0.75) FROM lineitem
        |) ORDER BY q_idx""".stripMargin,
    "q_pivot" ->
      """SELECT l_linestatus,
        |  round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
        |  round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
        |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_stragg" ->
      """SELECT o_orderpriority,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_regr" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    round(stddev_samp(l_quantity), 4) AS sd_qty,
        |    round(var_samp(l_quantity), 4) AS var_qty,
        |    round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |    round(covar_samp(l_quantity, l_discount), 6) AS cov_qd,
        |    avg(l_quantity) AS mu,
        |    avg(l_quantity * l_quantity) AS p2,
        |    avg(l_quantity * l_quantity * l_quantity) AS p3,
        |    avg(l_quantity * l_quantity * l_quantity * l_quantity) AS p4
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, sd_qty, var_qty,
        |  round((p3 - 3 * mu * p2 + 2 * mu * mu * mu)
        |        / pow(p2 - mu * mu, 1.5), 4) AS skew_qty,
        |  round((p4 - 4 * mu * p3 + 6 * mu * mu * p2 - 3 * pow(mu, 4))
        |        / pow(p2 - mu * mu, 2) - 3, 4) AS kurt_qty,
        |  corr_qp, cov_qd
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_agg_salted" ->
      """SELECT l_returnflag AS k, round(sum(l_quantity), 2) AS total, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY k""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_minmax" ->
      """SELECT l_returnflag, min(l_shipdate) AS mn_date, max(l_shipdate) AS mx_date,
        |  round(min(l_extendedprice), 2) AS mn_price, round(max(l_extendedprice), 2) AS mx_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_pergroup" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(DISTINCT l_partkey) AS dparts,
        |  round(sum(l_quantity), 2) AS sq,
        |  round(avg(l_discount), 6) AS ad,
        |  round(min(l_quantity), 2) AS mnq,
        |  round(max(l_quantity), 2) AS mxq
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  round(sum(l_extendedprice), 2) AS total, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  round(sum(l_extendedprice), 2) AS total, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  round(sum(l_extendedprice), 2) AS total, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY rf, ls""".stripMargin,
    "q_quantile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_colorbin" ->
      """SELECT CAST(least(greatest(floor((l_extendedprice - 900.0) / 10410.0), 0), 9) AS INT) AS bin,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin
  )
}
