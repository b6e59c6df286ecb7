package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables => T}

/** Window-function operators (§2B — absent in the reference; the closest
  * reference shape is the L1 argmin `Gddp.scala:25-38`, generalized here to
  * ranked/as-of forms).
  *
  * Scale notes: each window shuffles once on its partition key and sorts
  * within partitions; partition keys (customer, user) are high-cardinality so
  * partitions stay small and AQE handles skew. No windows over an empty
  * `partitionBy` (a single-partition global sort) are declared.
  */
object WindowOps extends QueryModule {

  /** Ranking family over a per-customer frame with deterministic tie-break. */
  private def qWindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    T.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"),
        round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"))
      .orderBy("o_custkey", "rn")
  }

  /** Moving-frame aggregates (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW). */
  private def qWindowFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    T.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("mov3"),
        round(avg(col("o_totalprice")).over(w), 4).as("mavg3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** As-of lookup: for each purchase event, the latest strictly-prior event of
    * the same user — the reference's nearest-lookup (L1) generalized to the
    * time axis. One shuffle on user_id; `lag` avoids the O(n²) self-join.
    * prior_ts is second-truncated: the source is nanosecond parquet and Spark
    * (µs) vs DuckDB must agree on the emitted value.
    */
  private def qAsof(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .select(col("event_id"), col("event_type"),
        lag(col("event_id"), 1).over(w).as("prior_id"),
        date_trunc("second", lag(col("ts"), 1).over(w)).as("prior_ts"))
      .filter(col("event_type") === "purchase")
      .select("event_id", "prior_id", "prior_ts")
      .orderBy("event_id")
  }

  /** TABLE-to-TABLE as-of join (trades/quotes shape): every purchase picks
    * the latest click at-or-before it for the same user — via the union-tag
    * trick: tag both sides, union, ONE window per user ordered by (ts,
    * side, id), and `last(click_id, ignoreNulls)` is the as-of match. This
    * is the scale-safe as-of form — one shuffle on the key, no range-join
    * candidate explosion, no broadcast requirement; DuckDB verifies with a
    * lateral top-1 subquery. Ties: clicks sort before purchases at equal
    * (µs-truncated) ts and the highest click id wins — the oracle encodes
    * the same ordering, and both engines compare µs-truncated timestamps.
    */
  private def qJoinAsof(s: SparkSession, d: String): DataFrame = {
    val e = T.events(s, d)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"),
        lit(null).cast("long").as("c_id"), lit(1).as("side"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        lit(null).cast("long").as("p_id"), col("event_id").as("c_id"), lit(0).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("c_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(c)
      .withColumn("asof_c_id", last(col("c_id"), ignoreNulls = true).over(w))
      .filter(col("p_id").isNotNull)
      .select(col("p_id"), col("asof_c_id").as("c_id"))
      .orderBy("p_id")
  }

  /** Distribution family: ntile / percent_rank / cume_dist / lead. */
  private def qWindowDist(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    T.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        lead(col("o_orderkey"), 1).over(w).as("next_id"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Value-navigation family: first/last/nth over the full partition frame
    * (last_value needs the unbounded-following frame or it degenerates to the
    * current row — the classic window-function trap, made explicit here).
    */
  private def qWindowFirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    T.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_id"),
        last(col("o_orderkey")).over(w).as("last_id"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_id"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** RANGE frame over event time (interval-bounded, unlike the ROWS frames
    * above): events in the preceding hour per user — the time-series rolling
    * count. Through spark.sql: interval RANGE bounds are SQL-only surface.
    */
  private def qWindowRange(s: SparkSession, d: String): DataFrame = {
    T.events(s, d).createOrReplaceTempView("graft_events_v")
    s.sql(
      """SELECT event_id,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last_hour
        |FROM graft_events_v ORDER BY event_id""".stripMargin)
  }

  /** Truncated exponentially-weighted moving average (α = 0.25, last 8
    * observations) per user over event time — the time-series smoothing
    * primitive. The textbook EWMA recursion is inherently sequential; the
    * 8-term truncation (residual weight 0.75⁸ ≈ 10%) re-expresses it as a
    * fixed fan of `lag` terms over ONE window — a single shuffle on user_id,
    * fully parallel, identical cost shape to the other window queries. The
    * weights and the per-prefix normalizers are exact binary decimal
    * literals (0.75^k is dyadic·3^k, exactly representable), NOT `power()`
    * calls — Math.pow (JVM) and libm pow (DuckDB) are each allowed 1 ulp, so
    * shared literals are what make the oracle hash bit-stable. Both engines
    * run the same SQL text, so the double addition order matches too.
    */
  private val ewmaWeights: Seq[BigDecimal] =
    (0 until 8).map(k => BigDecimal("0.75").pow(k))

  /** Cumulative distinct users by day — the growth-accounting staple
    * (new vs returning): each user's FIRST activity day via a user-keyed
    * min, then per-day new-user counts and a running total. The global
    * window runs over |days| rows (the day aggregate), never over raw
    * events, so the unpartitioned cumsum is metadata-sized at any corpus
    * scale; the data-sized passes are both keyed (user, then day).
    */
  private def qCumDistinct(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.events(s, d)
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum("new_users").over(w))
      .orderBy("day")
  }

  private def ewmaSql(table: String): String = {
    val win = "(PARTITION BY user_id ORDER BY ts, event_id)"
    val num = ewmaWeights.zipWithIndex.map { case (w, k) =>
      val v = if (k == 0) "value" else s"lag(value, $k) OVER $win"
      s"coalesce($v * $w, 0)"
    }.mkString(" + ")
    // normalizer for short prefixes: sum of the first m weights, m = min(rn, 8)
    val partials = ewmaWeights.scanLeft(BigDecimal(0))(_ + _).tail
    val den = partials.zipWithIndex.init.reverse
      .foldLeft(s"${partials.last}") { case (acc, (p, i)) =>
        s"CASE WHEN row_number() OVER $win = ${i + 1} THEN $p ELSE $acc END"
      }
    s"""SELECT event_id, ewma FROM (
       |  SELECT event_id, event_type,
       |    round(($num) / ($den), 6) AS ewma
       |  FROM $table
       |) WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin
  }

  private def qEwma(s: SparkSession, d: String): DataFrame = {
    T.events(s, d).createOrReplaceTempView("graft_events_ewma")
    s.sql(ewmaSql("graft_events_ewma"))
  }

  /** Funnel / conversion analysis in ONE window pass: for every purchase,
    * whether the same user clicked within the prior 30 minutes and viewed
    * within the prior 2 hours — running "latest ts per event type" maxima
    * over a single user window replace the 3-way self-join a naive funnel
    * would shuffle (the classic product-analytics rewrite; one exchange on
    * user_id at any scale). Rolled up to daily conversion counts. Shared
    * SQL text keeps both engines' evaluation identical.
    */
  private def funnelSql(table: String): String = {
    val win = "(PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    s"""SELECT day, count(*) AS purchases,
       |  count(CASE WHEN last_click >= ts - INTERVAL 30 MINUTE THEN 1 END) AS with_click,
       |  count(CASE WHEN last_click >= ts - INTERVAL 30 MINUTE
       |              AND last_view >= ts - INTERVAL 2 HOUR THEN 1 END) AS full_funnel
       |FROM (
       |  SELECT event_type, ts, CAST(ts AS DATE) AS day,
       |    max(CASE WHEN event_type = 'click' THEN ts END) OVER $win AS last_click,
       |    max(CASE WHEN event_type = 'view' THEN ts END) OVER $win AS last_view
       |  FROM $table)
       |WHERE event_type = 'purchase'
       |GROUP BY day ORDER BY day""".stripMargin
  }

  private def qFunnel(s: SparkSession, d: String): DataFrame = {
    T.events(s, d).createOrReplaceTempView("graft_events_funnel")
    s.sql(funnelSql("graft_events_funnel"))
  }

  /** Event path mining — top per-user event-type trigrams: each user's
    * stream ordered by (ts, event_id) (the id tiebreak makes simultaneous
    * events deterministic in both engines), two LEADs fan the next two
    * types onto every row in ONE window pass, then a trigram count and
    * top-20. The window shuffles user-keyed once; the count aggregate
    * carries only distinct trigrams (map-side combined) — nothing here
    * materializes a per-user sequence, so skewed users cost one partition's
    * sort, not memory.
    */
  private def qEventPaths(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    T.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  /** The CEP patterns [[qEventPattern]] evaluates — sequence shapes the
    * funnel CANNOT express: ADJACENCY (immediately-followed-by, no events
    * between), bounded REPETITION, ALTERNATION, and an anchored prefix.
    * Sequences are '>'-delimited with sentinels on both ends so every
    * event occurrence is '>'-enclosed and patterns can anchor on the
    * delimiter; the regex subset used (non-capturing groups, alternation,
    * {n} repeats, ^ anchor) behaves identically in Java regex (Spark) and
    * RE2 (DuckDB).
    */
  private[graft] val eventPatterns: Seq[(String, String)] = Seq(
    ("error_then_recovery", ">error>(?:click|view)>purchase>"),
    ("immediate_rebuy", ">purchase>purchase>"),
    ("signup_direct_purchase", "^>signup>(?:view>|click>)*purchase>"),
    ("view_streak3", "(?:>view){3}>"))

  /** MATCH_RECOGNIZE-style sequence pattern matching (the CEP class —
    * Flink/Esper territory): per user, the event-type sequence ordered by
    * (ts, event_id), then each pattern's user-match count and rate. One
    * user-keyed aggregate builds the sequences (sorted struct collect —
    * per-user history, the same state any CEP engine holds per key); the
    * pattern tests are ONE pass of codegen'd regexes over that table,
    * unpivoted to a row per pattern. At 100 TB the sequence build is the
    * one shuffle and patterns are constants; a pathological user's history
    * is one partition's array, the usual per-key-state caveat of CEP.
    */
  private def qEventPattern(s: SparkSession, d: String): DataFrame = {
    val seqs = T.events(s, d)
      .groupBy("user_id")
      .agg(concat(lit(">"), concat_ws(">", transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))),
        e => e.getField("event_type"))), lit(">")).as("seq"))
    val aggCols = eventPatterns.map { case (name, re) =>
      sum(when(col("seq").rlike(re), 1).otherwise(0)).as(name)
    } :+ count(lit(1)).as("n_users")
    val flags = seqs.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = eventPatterns
      .map { case (name, _) => s"'$name', $name" }.mkString(", ")
    flags.select(
        expr(s"stack(${eventPatterns.length}, $stackArgs) AS (pattern, n_matched)"),
        col("n_users"))
      .select(col("pattern"), col("n_matched"),
        round(col("n_matched").cast("double") / col("n_users"), 4).as("match_rate"))
      .orderBy("pattern")
  }

  /** Forecast backtest: per event type, score two one-step daily-total
    * forecasters over the series' own history — seasonal naive (y[t-7])
    * and a trailing 7-day moving average — by MAPE. The data-sized pass is
    * one (type, day) hash aggregate; the windows then run over the
    * DAY-sized series (rows = types × days, metadata-sized at any event
    * volume), so adding a forecaster costs nothing at scale. Day totals
    * and the MA round to 4 places before ratioing, keeping the two
    * engines' float paths aligned. Backtest rows need a full 7-row
    * history window and a nonzero actual (MAPE's domain).
    */
  private def qForecast(s: SparkSession, d: String): DataFrame = {
    val daily = T.events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(round(sum("value"), 4).as("y"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val trail = w.rowsBetween(-7, -1)
    daily
      .withColumn("sn", lag("y", 7).over(w))
      .withColumn("ma", round(avg("y").over(trail), 4))
      .withColumn("nprev", count("y").over(trail))
      .filter(col("sn").isNotNull && col("nprev") === 7 && col("y") =!= 0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        round(avg(abs(col("y") - col("sn")) / abs(col("y"))), 4).as("mape_sn"),
        round(avg(abs(col("y") - col("ma")) / abs(col("y"))), 4).as("mape_ma"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_forecast_backtest" -> qForecast,
    "q_cum_distinct" -> qCumDistinct,
    "q_event_paths" -> qEventPaths,
    "q_event_pattern" -> qEventPattern,
    "q_ewma" -> qEwma,
    "q_funnel" -> qFunnel,
    "q_join_asof" -> qJoinAsof,
    "q_window_range" -> qWindowRange,
    "q_window_rank" -> qWindowRank,
    "q_window_frame" -> qWindowFrame,
    "q_window_dist" -> qWindowDist,
    "q_window_firstlast" -> qWindowFirstLast,
    "q_asof" -> qAsof
  )

  /** q_event_pattern's oracle, generated from the SAME pattern list so the
    * two engines can never drift: per-user ordered sequence via string_agg,
    * one flag-sum per pattern, unpivoted by UNION ALL.
    */
  private val eventPatternSql: String = {
    val flagCols = eventPatterns.map { case (name, re) =>
      s"""CAST(sum(CASE WHEN regexp_matches(seq, '$re') THEN 1 ELSE 0 END) AS BIGINT) AS $name"""
    }.mkString(",\n  ")
    val unpivot = eventPatterns.map { case (name, _) =>
      s"SELECT '$name' AS pattern, $name AS n_matched, n_users FROM m"
    }.mkString("\n  UNION ALL ")
    s"""WITH seqs AS (
       |  SELECT user_id,
       |    '>' || string_agg(event_type, '>' ORDER BY ts, event_id) || '>' AS seq
       |  FROM events GROUP BY user_id),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
       |  $flagCols
       |  FROM seqs)
       |SELECT pattern, n_matched,
       |  round(CAST(n_matched AS DOUBLE) / n_users, 4) AS match_rate
       |FROM ($unpivot)
       |ORDER BY pattern""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_event_pattern" -> eventPatternSql,
    "q_forecast_backtest" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |         round(sum(value), 4) AS y
        |  FROM events GROUP BY 1, 2),
        |f AS (
        |  SELECT event_type, day, y,
        |    lag(y, 7) OVER w AS sn,
        |    round(avg(y) OVER (w ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 4) AS ma,
        |    count(y) OVER (w ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS nprev
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, count(*) AS n_days,
        |       round(avg(abs(y - sn) / abs(y)), 4) AS mape_sn,
        |       round(avg(abs(y - ma) / abs(y)), 4) AS mape_ma
        |FROM f WHERE sn IS NOT NULL AND nprev = 7 AND y <> 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_cum_distinct" ->
      """WITH first AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
        |daily AS (SELECT day, count(*) AS new_users FROM first GROUP BY 1)
        |SELECT day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM daily ORDER BY day""".stripMargin,
    "q_event_paths" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        |  FROM events)
        |SELECT concat_ws('>', event_type, e2, e3) AS path, count(*) AS n
        |FROM seq WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "q_ewma" -> ewmaSql("events"),
    "q_funnel" -> funnelSql("events"),
    "q_join_asof" ->
      """SELECT p.event_id AS p_id, l.c_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN LATERAL (
        |  SELECT c.event_id AS c_id
        |  FROM events c
        |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |    AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |  ORDER BY CAST(c.ts AS TIMESTAMP) DESC, c.event_id DESC LIMIT 1) l ON TRUE
        |ORDER BY p_id""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_window_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER w, 2) AS mov3,
        |  round(avg(o_totalprice) OVER w, 4) AS mavg3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_dist" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  lead(o_orderkey, 1) OVER w AS next_id
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_range" ->
      """SELECT event_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM events ORDER BY event_id""".stripMargin,
    "q_window_firstlast" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_id,
        |  last_value(o_orderkey) OVER w AS last_id,
        |  nth_value(o_orderkey, 2) OVER w AS second_id
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_asof" ->
      """SELECT event_id, prior_id, prior_ts FROM (
        |  SELECT event_id, event_type,
        |    lag(event_id, 1) OVER w AS prior_id,
        |    date_trunc('second', lag(ts, 1) OVER w) AS prior_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin
  )
}
