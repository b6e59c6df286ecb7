package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables => T}

/** Streaming windows (§2B — the reference is strictly batch-per-HTTP-request,
  * `main.py:106-110`; it has no stream processing at all).
  *
  * The declared queries are the batch twins — `window()` / `session_window()`
  * evaluate identically in batch and streaming, which is what makes them
  * oracle-checkable — and `eventsStream`/`sessionize` provide the true
  * Structured Streaming path (file source → watermark → windowed agg /
  * flatMapGroupsWithState), exercised by ScalaTest.
  *
  * Scale notes: tumbling/sliding aggregation is a single shuffle on
  * (window, key); session windows and the stateful sessionizer shuffle on the
  * user key; the watermark bounds state so a 100 TB/day stream retains only
  * the open-window tail per key.
  */
object Streaming extends QueryModule {

  /** Tumbling 1-hour windows per event type. */
  private def qTumble(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))
      .orderBy("window_start", "event_type")

  /** Per-window heavy hitters: tumbling 1-hour windows × the Misra-Gries
    * top-k aggregate ([[graft.functions.ApproxTopK]]) — the streaming-shaped
    * "trending items per window" question with bounded sketch state per
    * window through the shuffle, not the full (window × item) cardinality.
    * The same composition runs under `readStream` (the aggregate is
    * mergeable partial+final); the fixture's 5 event types sit far under
    * capacity 64, so counts are exact and the query keeps a full oracle.
    */
  private def qTumbleTopk(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.ApproxTopKFunctions
        .approx_top_k(col("event_type"), k = 3, capacity = 64).as("top"))
      .select(col("w.start").as("window_start"),
        posexplode(col("top")).as(Seq("rank", "entry")))
      .select(col("window_start"), col("rank"),
        col("entry.item").as("event_type"), col("entry.est_n").as("n"))
      .orderBy("window_start", "rank")

  /** Sliding 1-hour windows every 30 minutes (each event lands in 2 windows). */
  private def qSlide(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("window_start"), col("n"), col("total"))
      .orderBy("window_start")

  /** Session windows with a 30-minute gap per user. Timestamps in the output
    * are second-truncated (ns-source parity, see Tables.events). Boundary
    * semantics: a gap of exactly 30 minutes starts a new session (Spark merges
    * only on strict overlap) — the oracle's islands formulation uses `>` to
    * match, and the synthetic ns-precision data cannot produce exact-boundary
    * gaps.
    */
  private def qSession(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        date_trunc("second", col("w.start")).as("session_start"),
        date_trunc("second", col("w.end")).as("session_end"),
        col("n"))
      .orderBy("user_id", "session_start")

  /** Batch shadow of the streaming watermark drop: with watermark = max event
    * time − 10 minutes, a fully-caught-up stream retains exactly the events at
    * or after the watermark — sessionizing that tail is what the stateful
    * query's open state holds. Gives the late-data semantics an
    * oracle-checkable twin (the true watermarked path is StreamingSpec).
    */
  private def qSessionLate(s: SparkSession, d: String): DataFrame = {
    val e = T.events(s, d)
    val wm = e.agg((max(col("ts")) - expr("INTERVAL 10 MINUTES")).as("wm"))
    e.crossJoin(broadcast(wm))
      .filter(col("ts") >= col("wm"))
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        date_trunc("second", col("w.start")).as("session_start"),
        date_trunc("second", col("w.end")).as("session_end"),
        col("n"))
      .orderBy("user_id", "session_start")
  }

  /** Batch twin of `purchaseAttribution` (interval joins evaluate identically
    * in batch, which is what makes the streaming semantics oracle-checkable).
    */
  private def qAttribution(s: SparkSession, d: String): DataFrame = {
    val e = T.events(s, d)
    purchaseAttribution(
      e.filter(col("event_type") === "purchase"),
      e.filter(col("event_type") === "click"))
      .orderBy("p_id", "c_id")
  }

  // ---- true Structured Streaming surface ----

  /** events as a file-source stream (same ns→µs conversion as Tables.events). */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // readStream needs an explicit schema, and the fixture's physical ts type
    // has drifted across regenerations (ns-as-long / µs NTZ / µs TZ — see
    // Tables.events). Sniff the actual type with a batch footer read (driver
    // metadata only, no data scan) so the stream schema matches the file and
    // the normalization mirrors the batch loader exactly.
    val tsType = s.read.parquet(s"$d/events.parquet").schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // file-stream sources take a directory; select the events file by glob
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    tsType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // same session-tz-INDEPENDENT as-UTC interpretation as Tables.events
        // (a bare cast reinterprets in the session zone — stream/batch twins
        // would diverge on any non-UTC session)
        raw.withColumn("ts", expr(
          "timestamp_micros(timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts))"))
      case org.apache.spark.sql.types.TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unhandled parquet type $other — update Streaming.eventsStream")
    }
  }

  /** Streaming tumbling aggregation with a 10-minute watermark: late events
    * beyond the watermark are dropped; state for closed windows is evicted.
    */
  def windowedCounts(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Stream-static enrichment join: the static dim side is re-read per
    * micro-batch and broadcast — the streaming form of the bounded-dimension
    * join used across the relational set (no state, no stream shuffle).
    */
  def enriched(stream: DataFrame, dim: DataFrame): DataFrame =
    stream.join(broadcast(dim), "user_id")

  /** Streaming exact dedup: drops duplicate event_ids arriving within the
    * watermark. The watermark bounds the dedup state — the streaming twin of
    * `q_dedup_exact`'s keep-one-copy semantics, with eviction instead of an
    * unbounded seen-set (the 100 TB/day requirement).
    */
  def dedupedStream(stream: DataFrame): DataFrame =
    stream.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** The static reference distribution a live drift monitor compares
    * against: (event_type, rf) fractions — cell-sized, broadcast per
    * micro-batch. */
  def refDistribution(events: DataFrame): DataFrame = {
    val counts = events.groupBy("event_type").agg(count(lit(1)).as("rn"))
    counts.crossJoin(broadcast(counts.select(sum("rn").as("rtot"))))
      .select(col("event_type"), (col("rn").cast("double") / col("rtot")).as("rf"))
  }

  /** Live drift monitoring: per closed 1-hour window, the PSI of the
    * window's event-type mix against a static reference distribution
    * ([[graft.text.Monitoring]]'s detector, streaming-shaped). Two CHAINED
    * stateful aggregations — (window, type) counts, then the per-window
    * fold — with the stateless broadcast reference join between them;
    * Spark's multi-stateful-operator support propagates the watermark
    * through `window_time`, so state for both stages evicts as windows
    * close. Per-window state is |event types|, and the emitted row is one
    * PSI scalar per hour: the monitor a 100 TB/day ingest runs
    * continuously without retaining the stream. Buckets absent from a
    * window contribute through the 1e-4 clamp on the observed side only
    * (one-sided PSI over observed buckets — same convention in the batch
    * twin and oracle).
    */
  def driftStream(stream: DataFrame, refFracs: DataFrame): DataFrame = {
    val eps = graft.text.Monitoring.Eps
    def clamp(c: Column): Column = greatest(c, lit(eps))
    stream.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(refFracs), "event_type")
      .groupBy(window(window_time(col("window")), "1 hour").as("w2"))
      .agg(sum("n").as("n_events"),
        collect_list(struct(col("n"), col("rf"))).as("bs"))
      .select(col("w2.start").as("window_start"), col("n_events"),
        round(aggregate(col("bs"), lit(0.0d), (acc, b) => {
          val cf = clamp(b.getField("n").cast("double") / col("n_events"))
          val rfc = clamp(b.getField("rf"))
          acc + (cf - rfc) * log(cf / rfc)
        }), 4).as("psi"))
  }

  /** Stream-stream interval join: purchases matched to the same user's
    * clicks in the preceding 30 minutes. Both sides are watermarked and the
    * join condition bounds event time on both sides, so each side's buffered
    * state is evicted once the other's watermark passes the interval — the
    * only join shape that runs stream-to-stream with bounded state.
    */
  def purchaseAttribution(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c, expr(
      "p_user = c_user AND c_ts >= p_ts - INTERVAL 30 MINUTES AND c_ts < p_ts"))
      .select("p_id", "c_id", "p_user")
  }

  /** Left-outer stream-stream interval join: every purchase row survives,
    * with NULL click columns when no click preceded it within 30 minutes.
    * The outer semantics are the subtle part in streaming: an unmatched
    * purchase is emitted (with nulls) only once the CLICK-side watermark has
    * passed its interval — before that the row is neither matched nor
    * provably unmatched, so it stays buffered. The batch twin
    * (`q_attribution_left`) evaluates the same condition where every
    * watermark has trivially passed.
    */
  def purchaseAttributionLeft(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c, expr(
      "p_user = c_user AND c_ts >= p_ts - INTERVAL 30 MINUTES AND c_ts < p_ts"),
      "left_outer")
      .select("p_id", "c_id", "p_user")
  }

  /** Batch twin of `purchaseAttributionLeft` (oracle-checked; the true
    * watermarked null-emission path is StreamingSpec).
    */
  private def qAttributionLeft(s: SparkSession, d: String): DataFrame = {
    val e = T.events(s, d)
    purchaseAttributionLeft(
      e.filter(col("event_type") === "purchase"),
      e.filter(col("event_type") === "click"))
      .orderBy("p_id", "c_id")
  }

  /** FULL-OUTER stream-stream interval join — the last member of the
    * family: matched (purchase, click) pairs PLUS never-matched purchases
    * AND never-matched clicks, each null side emitted only once its own
    * watermark proves no partner can still arrive. State stays bounded by
    * the same watermark bookkeeping as the inner/left forms.
    */
  def purchaseAttributionFull(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c, expr(
      "p_user = c_user AND c_ts >= p_ts - INTERVAL 30 MINUTES AND c_ts < p_ts"),
      "full_outer")
      .select(col("p_id"), col("c_id"),
        coalesce(col("p_user"), col("c_user")).as("user_id"))
  }

  /** Batch twin of `purchaseAttributionFull`. Both join keys are nullable
    * in the output, so the total order pins null placement explicitly on
    * both engines (Spark defaults nulls first, DuckDB nulls last).
    */
  private def qAttributionFull(s: SparkSession, d: String): DataFrame = {
    val e = T.events(s, d)
    purchaseAttributionFull(
      e.filter(col("event_type") === "purchase"),
      e.filter(col("event_type") === "click"))
      .orderBy(col("p_id").asc_nulls_first, col("c_id").asc_nulls_first)
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  case class SessionState(start: Long, last: Long, n: Int)
  case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * hand-rolled twin of `session_window` demonstrating arbitrary per-key
    * state (gap timeout = 30 min, emits a session when a new event breaks it).
    */
  def sessionize(events: Dataset[Event]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
          var st = state.getOption.orNull
          for (e <- sorted) {
            val t = e.ts.getTime
            if (st == null) st = SessionState(t, t, 1)
            else if (t - st.last > gapMs) {
              out += UserSession(userId, new java.sql.Timestamp(st.start),
                new java.sql.Timestamp(st.last + gapMs), st.n.toLong)
              st = SessionState(t, t, 1)
            // clamp BOTH bounds: a cross-batch out-of-order event (above the
            // watermark) must neither regress last nor be ignored when it
            // precedes start — session_window extends the session backward.
            // (An event a full gap before start would be a separate session;
            // unreachable while watermarkDelay < gap, the configuration both
            // declared uses run.)
            } else st = SessionState(math.min(st.start, t), math.max(st.last, t), st.n + 1)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Sessionization as a `StatefulProcessor` (the `transformWithState` API,
    * Spark 4.x): same gap semantics as [[sessionize]], plus the piece
    * `flatMapGroupsWithState` cannot express — an EVENT-TIME TIMER at
    * `last + gap` per open session, so a session closes and emits when the
    * WATERMARK passes its gap, not only when a later event for the same key
    * happens to arrive. On an idle key (the common case in a real event
    * stream: most users stop clicking) the fMGWS version holds state and
    * emits nothing forever; this one emits the session and clears its state
    * the moment the stream's event time moves on — bounded state by
    * construction at 100 TB/day. Requires the RocksDB state-store provider
    * (timers + column families), which is how a 1000-executor deployment
    * runs stateful streaming anyway.
    */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, UserSession] {
    @transient private var state: ValueState[SessionState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserSession] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
      var st = if (state.exists()) state.get() else null
      // one live timer per key: drop the previous batch's before re-arming
      if (st != null) getHandle.deleteTimer(st.last + gapMs)
      for (e <- sorted) {
        val t = e.ts.getTime
        if (st == null) st = SessionState(t, t, 1)
        else if (t - st.last > gapMs) {
          out += UserSession(userId, new java.sql.Timestamp(st.start),
            new java.sql.Timestamp(st.last + gapMs), st.n.toLong)
          st = SessionState(t, t, 1)
        // both bounds clamped, for parity with sessionize: regressing last
        // would re-arm the timer EARLIER and close the session before
        // true-last + gap; ignoring an earlier t would emit a late
        // session_start (session_window extends backward)
        } else st = SessionState(math.min(st.start, t), math.max(st.last, t), st.n + 1)
      }
      if (st != null) {
        state.update(st)
        getHandle.registerTimer(st.last + gapMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[UserSession] = {
      if (!state.exists()) Iterator.empty
      else {
        val st = state.get()
        // a stale timer (state advanced, old timer already fired) emits nothing
        if (st.last + gapMs != expired.getExpiryTimeInMs) Iterator.empty
        else {
          state.clear()
          Iterator.single(UserSession(userId, new java.sql.Timestamp(st.start),
            new java.sql.Timestamp(st.last + gapMs), st.n.toLong))
        }
      }
    }
  }

  /** [[SessionProcessor]] over a watermarked stream: the timer-closing twin
    * of [[sessionize]] (StreamingSpec drives both and checks agreement with
    * the batch `session_window` result).
    */
  def sessionizeTws(events: Dataset[Event], gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes * 60L * 1000),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Batch twin of `dedupedStream` (dropDuplicatesWithinWatermark): the
    * events stream unioned with a 5-minute-delayed replay of itself — every
    * event_id arrives twice within the watermark — must collapse back to one
    * copy each, keeping the earliest. The true watermarked streaming path is
    * driven in StreamingSpec; this row oracle-checks the keep-first
    * semantics.
    */
  /** Batch twin of [[driftStream]]: identical per-window one-sided PSI
    * semantics, expressed relationally (counts → window totals → broadcast
    * reference join → per-window fold) so DuckDB can replay it. The true
    * chained-stateful-aggregation path is StreamingSpec's
    * parity-with-this-twin lock.
    */
  private def qDriftStream(s: SparkSession, d: String): DataFrame = {
    val eps = graft.text.Monitoring.Eps
    def clamp(c: Column): Column = greatest(c, lit(eps))
    val ev = T.events(s, d)
    val ref = refDistribution(ev)
    val cur = ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cur.groupBy("w").agg(sum("n").as("n_events"))
    val cf = clamp(col("n").cast("double") / col("n_events"))
    val rfc = clamp(col("rf"))
    cur.join(tot, "w").join(broadcast(ref), "event_type")
      .groupBy(col("w"), col("n_events"))
      .agg(round(sum((cf - rfc) * log(cf / rfc)), 4).as("psi"))
      .select(col("w.start").as("window_start"), col("n_events"), col("psi"))
      .orderBy("window_start")
  }

  private def qDedupStream(s: SparkSession, d: String): DataFrame = {
    val e = T.events(s, d).select("event_id", "ts")
    val replayed = e.union(e.withColumn("ts", col("ts") + expr("INTERVAL 5 MINUTES")))
    replayed.groupBy("event_id")
      .agg(min("ts").as("first_ts"), count(lit(1)).as("n_copies"))
      .orderBy("event_id")
  }

  // ---- streaming CEP: sequence patterns over live event streams ----

  case class TypedEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String)
  /** Per-user CEP state: the '>'-joined tail of the history (bounded at
    * `maxTail` events), whether the front has ever been trimmed (anchored
    * patterns are only decidable on an untrimmed prefix), and a bitmask of
    * patterns already emitted (first-match-only).
    */
  case class PatternState(tail: String, nTail: Int, trimmed: Boolean, emitted: Int)
  case class PatternMatch(user_id: Long, pattern: String)

  /** [[graft.operators.WindowOps.eventPatterns]] over a LIVE stream — the
    * CEP engine's native habitat (a batch sweep tells you who matched
    * yesterday; the stream emits the moment a user completes the shape).
    * flatMapGroupsWithState keeps per-user state BOUNDED by construction:
    * the last `maxTail` event types plus one bitmask — not the full
    * history, which is what makes this run forever at 100 TB/day. The
    * trade: a pattern spanning more than `maxTail` events is undetectable
    * (size the cap to the longest pattern's horizon), and ^-anchored
    * patterns are only tested while the prefix is untrimmed — after a trim
    * the state can no longer prove where history began, so the matcher
    * abstains rather than guesses (locked in StreamingSpec). Within a
    * batch, events sort by (ts, event_id); a cross-batch straggler appends
    * in arrival order — the usual unwatermarked-CEP caveat, same contract
    * as [[sessionize]]'s cross-batch clamps but without a reorder buffer.
    * Each emitted match fires once (the bitmask), in the micro-batch that
    * completes it.
    */
  def patternMatches(events: Dataset[TypedEvent],
      patterns: Seq[(String, String)] = graft.operators.WindowOps.eventPatterns,
      maxTail: Int = 512): Dataset[PatternMatch] = {
    import events.sparkSession.implicits._
    // the first-match bitmask is an Int — one more pattern would silently
    // alias bit 0 and drop matches, so refuse loudly instead
    require(patterns.length <= 32,
      s"patternMatches supports at most 32 patterns (got ${patterns.length})")
    // compiled once on the driver, shipped in the closure (Pattern is
    // serializable); anchored-ness decided from the regex itself
    val compiled = patterns.zipWithIndex.map { case ((name, re), i) =>
      (name, java.util.regex.Pattern.compile(re), re.startsWith("^"), i)
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[PatternState, PatternMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[TypedEvent], state: GroupState[PatternState]) =>
          var st = state.getOption.getOrElse(PatternState("", 0, trimmed = false, 0))
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var tail = st.tail
          sorted.foreach { e =>
            tail = if (tail.isEmpty) e.event_type else tail + ">" + e.event_type
          }
          var n = st.nTail + sorted.length
          var trimmed = st.trimmed
          if (n > maxTail) {
            val parts = tail.split(">")
            tail = parts.drop(parts.length - maxTail).mkString(">")
            n = maxTail
            trimmed = true
          }
          val probe = ">" + tail + ">"
          val out = scala.collection.mutable.ArrayBuffer.empty[PatternMatch]
          var emitted = st.emitted
          compiled.foreach { case (name, p, anchored, i) =>
            if ((emitted & (1 << i)) == 0 && (!anchored || !trimmed) &&
              p.matcher(probe).find()) {
              out += PatternMatch(userId, name)
              emitted |= 1 << i
            }
          }
          state.update(PatternState(tail, n, trimmed, emitted))
          out.iterator
      }
  }

  // ---- streaming CDC apply into a snapshot table ----

  /** Newest `graft.cdc.batch` marker at or below the current version — the
    * exactly-once watermark [[applyCdcBatch]] reads before every apply. The
    * backward scan stops at the first CDC commit, so in steady state (every
    * commit a CDC apply) it is one sidecar read; interleaved non-CDC
    * commits only deepen it by their count.
    */
  def lastAppliedCdcBatch(s: SparkSession, dir: String): Option[Long] =
    graft.operators.Snapshots.currentVersion(s, dir).flatMap { cur =>
      Iterator.range(cur, 0, -1)
        .map(v => graft.operators.Snapshots.commitMeta(s, dir, v)
          .get("graft.cdc.batch"))
        .collectFirst { case Some(b) => b.toLong }
    }

  /** Apply ONE CDC micro-batch to the snapshot table at `dir`, keyed by
    * `key`, idempotently. `foreachBatch` replays the in-flight batch after
    * a restart (at-least-once); exactly-once application comes from the
    * `graft.cdc.batch` marker riding each commit's metadata ATOMICALLY
    * (the sidecar lands before the manifest rename publishes) — a replayed
    * batch whose id is ≤ the recorded watermark returns before any write.
    * Within the batch, rows collapse to one per key by `ord` DESC (ts
    * first, then a unique tiebreaker), because a double-keyed update would
    * otherwise be order-dependent; across batches the LAST APPLIED batch
    * wins per key — standard CDC upsert semantics. The first batch creates
    * the table; later ones merge (file-pruned: only files holding touched
    * keys rewrite).
    */
  def applyCdcBatch(batch: DataFrame, dir: String, key: String,
      ord: Seq[String], batchId: Long): Unit = {
    val s = batch.sparkSession
    if (lastAppliedCdcBatch(s, dir).exists(_ >= batchId)) return
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(ord.map(c => col(c).desc): _*)
    val collapsed = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val meta = Map("graft.cdc.batch" -> batchId.toString)
    if (graft.operators.Snapshots.currentVersion(s, dir).isEmpty)
      graft.operators.Snapshots.commit(s, dir, collapsed, meta = meta)
    else
      graft.operators.Snapshots.mergeInto(s, dir, collapsed, key, meta)
    ()
  }

  /** OP-AWARE CDC apply — the full Debezium-shaped op set: each batch
    * collapses to one latest row per key (the `ord` tie-break), rows whose
    * `opCol` is `"d"` DELETE their key (merge-on-read, zero file
    * rewrites), the rest UPSERT (merge-on-read appends). The `batch_id`
    * marker rides the LAST commit of the batch, so a fully-applied batch
    * replays as a no-op; a crash between the upsert and the delete commit
    * replays the whole batch, and both halves are idempotent (same-key
    * upserts overwrite themselves, deletes of absent keys no-op) — the
    * effect is exactly-once. When the batch's last data half publishes
    * NOTHING (a delete whose keys all missed, or an empty batch), a
    * metadata-only [[graft.operators.Snapshots.commitMarker]] stamps the
    * watermark anyway — otherwise every restart would replay the batch
    * forever, republishing the upsert half as duplicate content-identical
    * versions and duplicate change-feed entries. One deliberate residual:
    * an all-delete batch arriving BEFORE the table exists leaves no
    * watermark (there is no table to mark) — its replay is a pure no-op
    * by construction, so nothing is published or duplicated. A delete
    * followed by a later batch's upsert re-inserts the key, per CDC
    * semantics.
    */
  def applyCdcBatchOps(batch: DataFrame, dir: String, key: String,
      ord: Seq[String], opCol: String, batchId: Long): Unit = {
    import graft.operators.Snapshots
    val s = batch.sparkSession
    if (lastAppliedCdcBatch(s, dir).exists(_ >= batchId)) return
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(ord.map(c => col(c).desc): _*)
    val collapsed = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dels = collapsed.filter(col(opCol) === "d").select(col(key))
      val ups = collapsed.filter(col(opCol) =!= "d").drop(opCol)
      val meta = Map("graft.cdc.batch" -> batchId.toString)
      val hasDel = !dels.isEmpty
      if (!ups.isEmpty) {
        val upMeta = if (hasDel) Map.empty[String, String] else meta
        if (Snapshots.currentVersion(s, dir).isEmpty)
          Snapshots.commit(s, dir, ups, meta = upMeta)
        else Snapshots.mergeIntoMor(s, dir, ups, key, upMeta)
      }
      if (hasDel && Snapshots.currentVersion(s, dir).nonEmpty)
        Snapshots.deleteByKeysMor(s, dir, dels, key, meta)
      // deleteByKeysMor publishes nothing when no key matches (and an
      // all-empty batch publishes nothing at all) — stamp the watermark
      // with a data-preserving marker commit so the batch never replays
      if (Snapshots.currentVersion(s, dir).nonEmpty &&
          !lastAppliedCdcBatch(s, dir).exists(_ >= batchId))
        Snapshots.commitMarker(s, dir, meta)
      ()
    } finally { collapsed.unpersist(); () }
  }

  /** The streaming entry: upsert a CDC stream into the snapshot table at
    * `tableDir` via `foreachBatch` + [[applyCdcBatch]]. Restart-safe from
    * `checkpointDir` (StreamingSpec kills and resumes it mid-stream and
    * asserts no double-application). At 100 TB the per-batch cost is the
    * merge's: envelope-pruned candidate files + one hit-sized rewrite.
    */
  def cdcApply(updates: DataFrame, tableDir: String, key: String,
      ord: Seq[String], checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyCdcBatch(b.toDF(), tableDir, key, ord, id))
      .option("checkpointLocation", checkpointDir)
      .start()

  private val cdcApplyDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Batch twin of the CDC upsert loop, fully oracle-checked: events split
    * into three interleaved CDC batches (`event_id % 3`), applied in order
    * through the SAME [[applyCdcBatch]] path the stream runs — commit,
    * then two metadata-marked merges — and the final table read back. Per
    * user the highest-numbered batch containing that user wins, and within
    * it the (ts, event_id)-latest row: exactly the oracle's
    * `row_number() OVER (ORDER BY event_id % 3 DESC, ts DESC, event_id
    * DESC)` fold, so a hash-green row proves three real merge commits
    * equal the one-shot SQL.
    */
  private def qCdcApply(s: SparkSession, d: String): DataFrame = {
    val dir = cdcApplyDirs.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft-cdcapply")
        .toFile.getAbsolutePath
      val ev = T.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
      (0 to 2).foreach { k =>
        applyCdcBatch(ev.filter(col("event_id") % 3 === k), dir,
          "user_id", Seq("ts", "event_id"), k.toLong)
      }
      dir
    })
    graft.operators.Snapshots.read(s, dir)
      .select("user_id", "event_id", "ts", "event_type", "value")
      .orderBy("user_id")
  }

  /** LIVE materialized view, end to end: [[graft.operators.Mview.serveViaFeed]]
    * tails the source's CDF stream and folds every micro-batch through the
    * signed-weight refresh while an append, an upsert MERGE, a COMPACTION
    * (feed-invisible maintenance) and a range DELETE land on the source.
    * The declared result is the final view; the oracle aggregates the final
    * source state directly — any drift in the streamed folds (double-fold,
    * missed delta, maintenance leak) hash-mismatches. StreamingSpec
    * additionally locks kill+restart recovery of the same loop.
    */
  private val mviewLiveDirs =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private def qMviewLive(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{Mview, Snapshots}
    val (_, view) = mviewLiveDirs.computeIfAbsent(d, _ => {
      def tmp(tag: String) = java.nio.file.Files
        .createTempDirectory(s"graft-mvlive-$tag").toFile.getAbsolutePath
      val (src, view, ckpt) = (tmp("src"), tmp("v"), tmp("ck"))
      val orders = T.orders(s, d).select((col("o_orderkey") % 7).as("g"),
        col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      Snapshots.commit(s, src, orders.filter(col("k") % 3 === 0))
      val q = Mview.serveViaFeed(s, src, view, Seq("g"), Seq("p"), ckpt)
      try {
        q.processAllAvailable() // initial full build
        Snapshots.commit(s, src, orders.filter(col("k") % 3 === 1))
        Snapshots.mergeInto(s, src,
          orders.filter(col("k") % 10 === 0)
            .select(col("g"), col("k"), (col("p") + 1000).as("p")), "k")
        q.processAllAvailable() // append + merge fold
        Snapshots.compact(s, src, targetBytes = 1L << 22) // feed-invisible
        Snapshots.deleteRange(s, src, "k", Some(100L), Some(499L))
        q.processAllAvailable() // maintenance skip + delete fold
      } finally q.stop()
      (src, view)
    })
    Snapshots.read(s, view)
      .select(col("g"), col("cnt"), round(col("sum_p"), 2).as("total"),
        col("cntv_p").as("n_priced"))
      .orderBy("g")
  }

  /** Bench warm-up hook: the live-mview fixture runs a streaming query —
    * an ingest-time cost, paid with the other prepared layouts. */
  def prepareMviewLive(s: SparkSession, d: String): Unit = { qMviewLive(s, d); () }

  /** The op-aware twin of [[qCdcApply]]: every 17th event arrives as a
    * DELETE op, the rest upsert — three batches applied through
    * [[applyCdcBatchOps]] (merge-on-read upserts + key-driven DV deletes).
    * Per user the highest batch's (ts, event_id)-latest row decides:
    * upsert → that row, delete → the user leaves the table (a later
    * batch's upsert re-inserts). The oracle folds the same rule in one
    * window.
    */
  private val cdcApplyDelDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def qCdcApplyDel(s: SparkSession, d: String): DataFrame = {
    val dir = cdcApplyDelDirs.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft-cdcdel")
        .toFile.getAbsolutePath
      val ev = T.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("op", when(col("event_id") % 17 === 0, "d").otherwise("u"))
      (0 to 2).foreach { k =>
        applyCdcBatchOps(ev.filter(col("event_id") % 3 === k), dir,
          "user_id", Seq("ts", "event_id"), "op", k.toLong)
      }
      dir
    })
    graft.operators.Snapshots.read(s, dir)
      .select("user_id", "event_id", "ts", "event_type", "value")
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_stream" -> qDedupStream,
    "q_cdc_apply" -> qCdcApply,
    "q_cdc_apply_del" -> qCdcApplyDel,
    "q_mview_live" -> qMviewLive,
    "q_tumble" -> qTumble,
    "q_drift_stream" -> qDriftStream,
    "q_tumble_topk" -> qTumbleTopk,
    "q_slide" -> qSlide,
    "q_session" -> qSession,
    "q_session_late" -> qSessionLate,
    "q_attribution" -> qAttribution,
    "q_attribution_left" -> qAttributionLeft,
    "q_attribution_full" -> qAttributionFull
  )

  val oracleSql: Map[String, String] = Map(
    // the live view's final state restated from the base data: rows present
    // after append (k%3 in 0,1) + merge (k%10=0 upsert/insert, +1000) +
    // delete (k in [100,499]), aggregated per group
    "q_mview_live" ->
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
        |state AS (
        |  SELECT k % 7 AS g, k,
        |    CASE WHEN k % 10 = 0 THEN p + 1000 ELSE p END AS p
        |  FROM o
        |  WHERE (k % 3 IN (0, 1) OR k % 10 = 0)
        |    AND NOT (k BETWEEN 100 AND 499))
        |SELECT g, count(*) AS cnt, round(sum(p), 2) AS total,
        |  count(p) AS n_priced
        |FROM state GROUP BY g ORDER BY g""".stripMargin,
    // op-aware CDC apply: same per-user fold, but a winning DELETE op
    // removes the user from the final table
    "q_cdc_apply_del" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY (event_id % 3) DESC, ts DESC, event_id DESC) AS rn,
        |    CASE WHEN event_id % 17 = 0 THEN 1 ELSE 0 END AS is_del
        |  FROM events)
        |WHERE rn = 1 AND is_del = 0 ORDER BY user_id""".stripMargin,
    // CDC-apply twin: the three-merge upsert loop folds to one window —
    // highest batch (event_id % 3) per user wins, then latest (ts,
    // event_id) within it
    "q_cdc_apply" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY (event_id % 3) DESC, ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_dedup_stream" ->
      """SELECT event_id, min(ts) AS first_ts, count(*) AS n_copies
        |FROM (SELECT event_id, ts FROM events
        |      UNION ALL
        |      SELECT event_id, ts + INTERVAL 5 MINUTE FROM events)
        |GROUP BY event_id ORDER BY event_id""".stripMargin,
    "q_tumble" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q_drift_stream" ->
      """WITH ref AS (
        |  SELECT event_type,
        |         CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS rf
        |  FROM events GROUP BY event_type),
        |cur AS (
        |  SELECT date_trunc('hour', ts) AS window_start, event_type,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT window_start, CAST(sum(n) AS BIGINT) AS n_events FROM cur GROUP BY 1)
        |SELECT cur.window_start, tot.n_events,
        |  round(sum(
        |    (greatest(CAST(n AS DOUBLE) / n_events, 0.0001) - greatest(rf, 0.0001)) *
        |    ln(greatest(CAST(n AS DOUBLE) / n_events, 0.0001) / greatest(rf, 0.0001))), 4) AS psi
        |FROM cur JOIN tot USING (window_start) JOIN ref USING (event_type)
        |GROUP BY cur.window_start, tot.n_events
        |ORDER BY window_start""".stripMargin,
    // ApproxTopK orders (count desc, item asc); exact at 5 types vs cap 64
    "q_tumble_topk" ->
      """SELECT window_start, rank, event_type, n FROM (
        |  SELECT date_trunc('hour', ts) AS window_start, event_type,
        |    count(*) AS n,
        |    CAST(row_number() OVER (PARTITION BY date_trunc('hour', ts)
        |      ORDER BY count(*) DESC, event_type) - 1 AS INT) AS rank
        |  FROM events GROUP BY 1, 2)
        |WHERE rank < 3 ORDER BY window_start, rank""".stripMargin,
    // each event belongs to exactly 2 hour-long windows sliding by 30 min:
    // time_bucket(30 min) and the one 30 min earlier (origins align: both
    // Spark's epoch and DuckDB's 2000-01-03 are multiples of 30 min)
    "q_slide" ->
      """SELECT ws AS window_start, count(*) AS n, round(sum(value), 2) AS total
        |FROM (SELECT value,
        |        unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
        |      FROM events)
        |GROUP BY ws ORDER BY window_start""".stripMargin,
    // gaps-and-islands twin of session_window(gap = 30 min)
    "q_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id,
        |  date_trunc('second', min(ts)) AS session_start,
        |  date_trunc('second', max(ts) + INTERVAL '30 minutes') AS session_end,
        |  count(*) AS n
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // watermark-tail twin: same islands formulation over only the events at or
    // after max(ts) - 10 minutes
    "q_session_late" ->
      """WITH late AS (
        |  SELECT user_id, ts FROM events
        |  WHERE ts >= (SELECT max(ts) - INTERVAL '10 minutes' FROM events)),
        |flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_sess
        |  FROM late WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id,
        |  date_trunc('second', min(ts)) AS session_start,
        |  date_trunc('second', max(ts) + INTERVAL '30 minutes') AS session_end,
        |  count(*) AS n
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_attribution" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id AS p_user
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL '30 minutes' AND c.ts < p.ts
        |ORDER BY p_id, c_id""".stripMargin,
    "q_attribution_left" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id AS p_user
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL '30 minutes' AND c.ts < p.ts
        |ORDER BY p_id, c_id""".stripMargin,
    "q_attribution_full" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id,
        |  coalesce(p.user_id, c.user_id) AS user_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL '30 minutes' AND c.ts < p.ts
        |ORDER BY p_id ASC NULLS FIRST, c_id ASC NULLS FIRST""".stripMargin
  )
}
