package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables => T}

/** Entity resolution (record linkage): fuse records that describe the SAME
  * real-world entity across systems that spell it differently — the
  * structured-metadata twin of document dedup, and a standard corpus-prep
  * stage when training data carries provenance records (same author/site/
  * license entity keyed differently per source).
  *
  * Reference scope: the reference engine (YIXIN-WANG/netcdf-olap) has no
  * linkage operator; this generalizes its dedup-adjacent surface per
  * SURVEY.md §2B. The pipeline is the textbook Fellegi–Sunter shape,
  * Spark-first:
  *
  *  1. '''Blocking''' — records group by a cheap deterministic key
  *     (nation × name-digit suffix). Pair generation is a self-join ON the
  *     block key, so candidate volume is Σ_b |block_b|² — never all-pairs.
  *     At 100 TB the block key is exactly the kind of key an ingest
  *     pipeline hash-partitions by, so the join co-locates and the biggest
  *     block (not the corpus) bounds any task.
  *  2. '''Pairwise scoring''' — normalized-name Levenshtein (codegen'd
  *     built-in, shared with `q_str_distance`) plus an attribute-closeness
  *     gate on account balance. Both sides of a pair arrive in one row, so
  *     scoring is a projection: no further shuffle.
  *  3. '''Clustering''' — matched pairs are edges; [[Dedup.connectedComponents]]
  *     (edge-gated local union-find / distributed min-label propagation —
  *     the 100 TB path) contracts them into entities, catching transitive
  *     matches the pair stage misses (a↔b and a↔c link b and c even when
  *     b↔c alone scores below threshold — see the fixture's B↔C legs).
  *  4. '''Golden record''' — one survivor per entity: min rec_id as the
  *     entity key, the arg-min name, the mean balance. One hash aggregate.
  *
  * The dirty fixture derives deterministically from `customer` inside the
  * query (three "systems" with SQL-expressible perturbations), so the
  * DuckDB oracle rebuilds the identical input and the whole pipeline —
  * blocking, scoring, clustering, survivorship — is hash-checked end to
  * end. Ground truth (`rec_id / 10`) exists for the spec's precision/
  * recall locks but is never used by the resolver itself.
  */
object EntityResolution extends QueryModule {

  /** Max normalized-name edit distance for a candidate pair to match. */
  val MaxNameLev = 4

  /** Max |balance delta| for a match. 0.51 (not 0.50) so system B's
    * round-to-integer balances pass even at the x.50 rounding boundary. */
  val MaxBalDiff = 0.51

  /** The dirty multi-system record table, derived from `customer`:
    * system `a` holds every entity verbatim; `b` (every 3rd entity)
    * re-styles the name with a dropped letter ("CUSTOMR NO …") and stores
    * balances rounded to whole units; `c` (every 5th) uses a "cust. #…"
    * convention. Every perturbation is deterministic SQL, so the oracle
    * reconstructs the same records byte-for-byte.
    */
  def dirtyRecords(s: SparkSession, d: String): DataFrame = {
    val c = T.customer(s, d)
    val a = c.select(
      (col("c_custkey") * 10).as("rec_id"), lit("a").as("sys"),
      col("c_name").as("name"), col("c_nationkey").as("nation"),
      col("c_acctbal").as("bal"))
    val b = c.filter(col("c_custkey") % 3 === 0).select(
      (col("c_custkey") * 10 + 1).as("rec_id"), lit("b").as("sys"),
      expr("replace(upper(c_name), 'CUSTOMER#', 'CUSTOMR NO ')").as("name"),
      col("c_nationkey").as("nation"),
      round(col("c_acctbal"), 0).as("bal"))
    val c2 = c.filter(col("c_custkey") % 5 === 0).select(
      (col("c_custkey") * 10 + 2).as("rec_id"), lit("c").as("sys"),
      expr("replace(c_name, 'Customer#', 'cust. #')").as("name"),
      col("c_nationkey").as("nation"),
      col("c_acctbal").as("bal"))
    a.unionByName(b).unionByName(c2)
  }

  /** Case/punctuation-insensitive name form the scorer compares. */
  private def canon(name: Column): Column =
    lower(regexp_replace(name, "[^a-zA-Z0-9]", ""))

  /** Blocking key: nation × last-4 name digits. Perturbations touch only
    * the alphabetic prefix, so true matches always share a block; block
    * population is corpus / (|nations| × 10⁴) — skew-free by construction.
    */
  private def blockKey: Column =
    concat_ws(":", col("nation").cast("string"), expr("right(canon, 4)"))

  /** `records` + derived scoring/blocking columns. */
  def withBlocks(records: DataFrame): DataFrame =
    records.withColumn("canon", canon(col("name")))
      .withColumn("block", blockKey)

  /** Matched candidate pairs: blocked self-join, then the two-feature
    * match rule as a projection-side filter. Returns
    * (rec1, rec2, sys1, sys2, name_lev, bal_diff), rec1 < rec2.
    */
  def matchPairs(records: DataFrame): DataFrame = {
    // one keyed repartition so BOTH self-join sides read the same shuffle
    // output (ReusedExchange): the union + canon-regex + block derivation
    // runs once instead of once per side (see Dedup.minhashPairsOf)
    val r = withBlocks(records).repartition(col("block"))
    val l = r.select(col("block"), col("rec_id").as("rec1"), col("sys").as("sys1"),
      col("canon").as("canon1"), col("bal").as("bal1"))
    val rr = r.select(col("block"), col("rec_id").as("rec2"), col("sys").as("sys2"),
      col("canon").as("canon2"), col("bal").as("bal2"))
    l.join(rr, "block").filter(col("rec1") < col("rec2"))
      .withColumn("name_lev", levenshtein(col("canon1"), col("canon2")))
      .withColumn("bal_diff", round(abs(col("bal1") - col("bal2")), 2))
      .filter(col("name_lev") <= MaxNameLev &&
        abs(col("bal1") - col("bal2")) <= MaxBalDiff)
      .select("rec1", "rec2", "sys1", "sys2", "name_lev", "bal_diff")
  }

  /** Entities with golden records: cluster matched pairs with the shared
    * CC machinery (singletons stay their own entity), then one hash
    * aggregate for survivorship: entity_id = min member rec_id (the CC
    * label), name/bal from the min-rec_id member (the authoritative
    * system), bal_spread = max−min balance across members (the conflict
    * magnitude a steward would review). Arg-min survivorship and a
    * difference of 2-decimal values keep every output exactly
    * representable — no cross-engine float-rounding boundary.
    */
  def goldenRecords(records: DataFrame): DataFrame = {
    val edges = matchPairs(records).select(
      col("rec1").as("doc1"), col("rec2").as("doc2"))
    val comps = Dedup.connectedComponents(edges)
    records.join(comps, records("rec_id") === comps("id"), "left")
      .withColumn("entity_id", coalesce(col("component"), col("rec_id")))
      .groupBy("entity_id")
      .agg(count(lit(1)).as("n_recs"),
        min_by(col("name"), col("rec_id")).as("name"),
        min_by(col("bal"), col("rec_id")).as("bal"),
        round(max(col("bal")) - min(col("bal")), 2).as("bal_spread"))
  }

  /** The resolved linkage store: every record labeled with its entity —
    * what an ingest pipeline keeps BETWEEN batches (records + labels +
    * their blocking/scoring columns), so admitting a new batch never
    * re-resolves the corpus. At 100 TB this table is written partitioned
    * by `block`, making the admit join below partition-pruned.
    */
  def linkageStore(records: DataFrame): DataFrame = {
    val edges = matchPairs(records).select(
      col("rec1").as("doc1"), col("rec2").as("doc2"))
    val comps = Dedup.connectedComponents(edges)
    withBlocks(records).join(comps, col("rec_id") === comps("id"), "left")
      .select(col("rec_id"), coalesce(col("component"), col("rec_id")).as("entity_id"),
        col("block"), col("canon"), col("bal"))
  }

  /** Admit a batch against a resolved store: each new record joins the
    * store on its block and takes the min matching entity_id; records
    * matching nothing cluster among THEMSELVES (blocked pairs + CC) and
    * found new entities. Store labels are authoritative — a batch-internal
    * edge never re-merges two store entities (the same admit semantics as
    * [[Dedup.incrementalDedupAgainstIndex]]; a periodic full re-resolve
    * reconciles, exactly like dedup's compaction). Data-sized work is one
    * block-key join against the (pruned) store plus the batch-sized
    * unmatched clustering. Returns (rec_id, entity_id, is_new).
    */
  def admitRecords(newRecords: DataFrame, store: DataFrame): DataFrame = {
    val nb = withBlocks(newRecords)
    // checkpoint the (batch-sized) label tables: matched feeds the
    // anti-join, the union AND the CC edge subtree — without it the
    // store join re-executes once per consumer
    val matched = nb.join(store.select(col("block"), col("entity_id"),
        col("canon").as("s_canon"), col("bal").as("s_bal")), "block")
      .filter(levenshtein(col("canon"), col("s_canon")) <= MaxNameLev &&
        abs(col("bal") - col("s_bal")) <= MaxBalDiff)
      .groupBy("rec_id").agg(min("entity_id").as("entity_id"))
      .transform(Dedup.eagerCheckpoint)
    val unmatched = newRecords.join(matched, Seq("rec_id"), "left_anti")
      .transform(Dedup.eagerCheckpoint)
    val comps = Dedup.connectedComponents(
      matchPairs(unmatched).select(col("rec1").as("doc1"), col("rec2").as("doc2")))
    val fresh = unmatched.join(comps, unmatched("rec_id") === comps("id"), "left")
      .select(col("rec_id"), coalesce(col("component"), col("rec_id")).as("entity_id"),
        lit(true).as("is_new"))
    matched.withColumn("is_new", lit(false)).unionByName(fresh)
  }

  /** Block-population statistics: block → record count. The additive
    * (counts SUM across shards — the `q_segment_scrub` df-state posture
    * applied to entity records) ingest state the hot-gated admit keys
    * candidate generation on: at 100 TB a handful of hot blocking keys
    * ("inc", "ltd", shared name suffixes) is what turns Σ|block|² into the
    * job's straggler, and the populations are the state that detects them
    * without re-scanning the corpus.
    */
  def blockStats(records: DataFrame): DataFrame =
    withBlocks(records).groupBy("block").agg(count(lit(1)).as("pop"))

  def blockStatsCached(s: SparkSession, d: String): DataFrame =
    graft.PersistedCache(s, ("er_block_stats", d))(
      blockStats(dirtyRecords(s, d)))

  /** Blocks whose store population exceeds this refine their candidate key
    * (hierarchical blocking). Low on the synthetic fixture so the hot path
    * actually exercises; a deployment sets it to its block-size budget. */
  val HotBlockPop = 2

  /** Admit with HOT-BLOCK-GATED candidate generation: candidates must share
    * the block, and within blocks whose maintained population exceeds
    * [[HotBlockPop]] they must ALSO share a finer sub-key — the last 8
    * canon characters, which every system convention leaves intact (the
    * numeric tail), so refinement bounds the hot block's fan-out by the
    * sub-key split without costing recall on suffix-preserving
    * perturbations. This is hierarchical blocking, the standard hot-key
    * mitigation for blocked linkage: per-record candidate volume drops
    * from |hot block| to |sub-bucket|, and the gate is driven entirely by
    * the additive [[blockStats]] state (no corpus pass at admit time).
    * Unmatched records cluster among themselves exactly as
    * [[admitRecords]] (batch-sized work).
    */
  /** `df` + the hot-gated candidate sub-key ('' outside hot blocks). */
  private def subKeyed(df: DataFrame, stats: DataFrame): DataFrame = {
    val hot = stats.filter(col("pop") > HotBlockPop)
      .select(col("block"), lit(true).as("is_hot"))
    df.join(broadcast(hot), Seq("block"), "left")
      .withColumn("sub",
        when(col("is_hot"), expr("right(canon, 8)")).otherwise(lit("")))
      .drop("is_hot")
  }

  /** The store with its hot-gated sub-key — the probe side of the gated
    * admit join. */
  def hotStore(store: DataFrame, stats: DataFrame): DataFrame =
    subKeyed(store, stats)
      .select(col("block"), col("sub"), col("entity_id"),
        col("canon").as("s_canon"), col("bal").as("s_bal"))

  /** [[hotStore]] over the warmed linkage store IS serving state (store
    * rows never change between batches, and neither do their sub-keys) —
    * warmed like the store itself, so the admit pays the batch-side key
    * derivation only. */
  def hotStoreCached(s: SparkSession, d: String): DataFrame =
    graft.PersistedCache(s, ("er_store_hot", d))(
      hotStore(linkageStoreCached(s, d), blockStatsCached(s, d)))

  /** `subKeyedStore` is [[hotStore]] output (pre-keyed serving state). */
  def admitRecordsHotGated(newRecords: DataFrame, subKeyedStore: DataFrame,
      stats: DataFrame): DataFrame = {
    val nb = subKeyed(withBlocks(newRecords), stats)
      .select(col("block"), col("sub"), col("rec_id"), col("canon"), col("bal"))
    // same checkpoint posture as [[admitRecords]]: both label tables are
    // batch-sized and feed three consumers each
    val matched = nb.join(subKeyedStore, Seq("block", "sub"))
      .filter(levenshtein(col("canon"), col("s_canon")) <= MaxNameLev &&
        abs(col("bal") - col("s_bal")) <= MaxBalDiff)
      .groupBy("rec_id").agg(min("entity_id").as("entity_id"))
      .transform(Dedup.eagerCheckpoint)
    val unmatched = newRecords.join(matched, Seq("rec_id"), "left_anti")
      .transform(Dedup.eagerCheckpoint)
    val comps = Dedup.connectedComponents(
      matchPairs(unmatched).select(col("rec1").as("doc1"), col("rec2").as("doc2")))
    val fresh = unmatched.join(comps, unmatched("rec_id") === comps("id"), "left")
      .select(col("rec_id"), coalesce(col("component"), col("rec_id")).as("entity_id"),
        lit(true).as("is_new"))
    matched.withColumn("is_new", lit(false)).unionByName(fresh)
  }

  /** The incoming batch for the declared admit query: system `d` (every
    * 7th entity, a "CUST-…" convention that resolves into its existing
    * entity) and system `x` (every 11th, an "Unknown Party #…" rename no
    * name rule can link — the genuinely-new-entity path).
    */
  def batchRecords(s: SparkSession, d: String): DataFrame = {
    val c = T.customer(s, d)
    val dd = c.filter(col("c_custkey") % 7 === 0).select(
      (col("c_custkey") * 10 + 3).as("rec_id"), lit("d").as("sys"),
      expr("replace(c_name, 'Customer#', 'CUST-')").as("name"),
      col("c_nationkey").as("nation"), col("c_acctbal").as("bal"))
    val x = c.filter(col("c_custkey") % 11 === 0).select(
      (col("c_custkey") * 10 + 4).as("rec_id"), lit("x").as("sys"),
      expr("replace(c_name, 'Customer#', 'Unknown Party #')").as("name"),
      col("c_nationkey").as("nation"), col("c_acctbal").as("bal"))
    dd.unionByName(x)
  }

  // ---- declared queries ----

  /** Total-order a RECORD-SIZED result without re-executing the child: a
    * bare trailing `orderBy` plans a range-partitioned sort whose sampling
    * pass executes the whole child subtree — joins, Levenshtein scoring,
    * the CC loop — a second time, which doubled every ER query's bench
    * cost. These results are record-sized (one row per input record /
    * match pair), not label-sized, so the `coalesce(1)` cure would put a
    * one-task stage at the end of every ER query; [[graft.SortedDist]]
    * (eager localCheckpoint, then a distributed sort over the cached
    * blocks) keeps both the single-execution win and the parallel sort.
    */
  private def sorted1(df: DataFrame, cols: String*): DataFrame =
    graft.SortedDist(df, cols: _*)

  private def qErPairs(s: SparkSession, d: String): DataFrame =
    sorted1(matchPairs(dirtyRecords(s, d)), "rec1", "rec2")

  /** [[linkageStore]] as warmed ingest-time state ([[graft.PersistedCache]]):
    * the resolved store is what a deployment maintains BETWEEN batches, so
    * the admit query measures the admit, not a from-scratch corpus
    * re-resolution (same posture as [[Dedup.corpusSigsCached]] for the
    * incremental-dedup admit).
    */
  def linkageStoreCached(s: SparkSession, d: String): DataFrame =
    graft.PersistedCache(s, ("er_linkage_store", d))(
      linkageStore(dirtyRecords(s, d)))

  private def qErAdmit(s: SparkSession, d: String): DataFrame =
    sorted1(admitRecords(batchRecords(s, d), linkageStoreCached(s, d)),
      "rec_id")

  private def qErAdmitHot(s: SparkSession, d: String): DataFrame =
    sorted1(admitRecordsHotGated(batchRecords(s, d), hotStoreCached(s, d),
      blockStatsCached(s, d)), "rec_id")

  private def qErGolden(s: SparkSession, d: String): DataFrame =
    sorted1(goldenRecords(dirtyRecords(s, d)), "entity_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_er_pairs" -> qErPairs,
    "q_er_golden" -> qErGolden,
    "q_er_admit" -> qErAdmit,
    "q_er_admit_hot" -> qErAdmitHot
  )

  /** The records CTE shared by both oracles — the same three systems. */
  private val recordsCte =
    """recs0 AS (
      |  SELECT c_custkey * 10 AS rec_id, 'a' AS sys, c_name AS name,
      |         c_nationkey AS nation, c_acctbal AS bal
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey * 10 + 1, 'b',
      |         replace(upper(c_name), 'CUSTOMER#', 'CUSTOMR NO '),
      |         c_nationkey, round(c_acctbal, 0)
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey * 10 + 2, 'c',
      |         replace(c_name, 'Customer#', 'cust. #'),
      |         c_nationkey, c_acctbal
      |  FROM customer WHERE c_custkey % 5 = 0),
      |recs AS (
      |  SELECT *, lower(regexp_replace(name, '[^a-zA-Z0-9]', '', 'g')) AS canon,
      |         CAST(nation AS VARCHAR) || ':' ||
      |           right(lower(regexp_replace(name, '[^a-zA-Z0-9]', '', 'g')), 4) AS block
      |  FROM recs0),
      |pairs AS (
      |  SELECT l.rec_id AS rec1, r.rec_id AS rec2, l.sys AS sys1, r.sys AS sys2,
      |         CAST(levenshtein(l.canon, r.canon) AS INT) AS name_lev,
      |         round(abs(l.bal - r.bal), 2) AS bal_diff
      |  FROM recs l JOIN recs r ON l.block = r.block AND l.rec_id < r.rec_id
      |  WHERE levenshtein(l.canon, r.canon) <= 4 AND abs(l.bal - r.bal) <= 0.51)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_er_pairs" ->
      s"""WITH $recordsCte
         |SELECT rec1, rec2, sys1, sys2, name_lev, bal_diff
         |FROM pairs ORDER BY rec1, rec2""".stripMargin,
    // recursive-CTE twin of the CC + survivorship aggregate
    "q_er_golden" ->
      s"""WITH RECURSIVE $recordsCte,
         |edges AS (
         |  SELECT rec1 AS src, rec2 AS dst FROM pairs
         |  UNION ALL SELECT rec2, rec1 FROM pairs),
         |cc AS (
         |  SELECT rec_id AS id, rec_id AS comp FROM recs
         |  UNION
         |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON e.src = cc.id),
         |comp AS (SELECT id, min(comp) AS entity_id FROM cc GROUP BY id)
         |SELECT comp.entity_id, count(*) AS n_recs,
         |       arg_min(r.name, r.rec_id) AS name,
         |       arg_min(r.bal, r.rec_id) AS bal,
         |       round(max(r.bal) - min(r.bal), 2) AS bal_spread
         |FROM comp JOIN recs r ON r.rec_id = comp.id
         |GROUP BY comp.entity_id ORDER BY entity_id""".stripMargin,
    // store resolution (recursive CC) + block-join admit + unmatched CC
    "q_er_admit" ->
      s"""WITH RECURSIVE $recordsCte,
         |edges AS (
         |  SELECT rec1 AS src, rec2 AS dst FROM pairs
         |  UNION ALL SELECT rec2, rec1 FROM pairs),
         |cc AS (
         |  SELECT rec_id AS id, rec_id AS comp FROM recs
         |  UNION
         |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON e.src = cc.id),
         |comp AS (SELECT id, min(comp) AS entity_id FROM cc GROUP BY id),
         |store AS (
         |  SELECT r.rec_id, comp.entity_id, r.block, r.canon, r.bal
         |  FROM recs r JOIN comp ON comp.id = r.rec_id),
         |batch0 AS (
         |  SELECT c_custkey * 10 + 3 AS rec_id,
         |         replace(c_name, 'Customer#', 'CUST-') AS name,
         |         c_nationkey AS nation, c_acctbal AS bal
         |  FROM customer WHERE c_custkey % 7 = 0
         |  UNION ALL
         |  SELECT c_custkey * 10 + 4,
         |         replace(c_name, 'Customer#', 'Unknown Party #'),
         |         c_nationkey, c_acctbal
         |  FROM customer WHERE c_custkey % 11 = 0),
         |batch AS (
         |  SELECT *, lower(regexp_replace(name, '[^a-zA-Z0-9]', '', 'g')) AS canon,
         |         CAST(nation AS VARCHAR) || ':' ||
         |           right(lower(regexp_replace(name, '[^a-zA-Z0-9]', '', 'g')), 4) AS block
         |  FROM batch0),
         |matched AS (
         |  SELECT b.rec_id, min(s.entity_id) AS entity_id
         |  FROM batch b JOIN store s ON b.block = s.block
         |  WHERE levenshtein(b.canon, s.canon) <= 4 AND abs(b.bal - s.bal) <= 0.51
         |  GROUP BY b.rec_id),
         |um AS (
         |  SELECT * FROM batch
         |  WHERE rec_id NOT IN (SELECT rec_id FROM matched)),
         |upairs AS (
         |  SELECT l.rec_id AS rec1, r.rec_id AS rec2
         |  FROM um l JOIN um r ON l.block = r.block AND l.rec_id < r.rec_id
         |  WHERE levenshtein(l.canon, r.canon) <= 4 AND abs(l.bal - r.bal) <= 0.51),
         |uedges AS (
         |  SELECT rec1 AS src, rec2 AS dst FROM upairs
         |  UNION ALL SELECT rec2, rec1 FROM upairs),
         |ucc AS (
         |  SELECT rec_id AS id, rec_id AS comp FROM um
         |  UNION
         |  SELECT e.dst, ucc.comp FROM ucc JOIN uedges e ON e.src = ucc.id),
         |ucomp AS (SELECT id, min(comp) AS entity_id FROM ucc GROUP BY id)
         |SELECT rec_id, entity_id, FALSE AS is_new FROM matched
         |UNION ALL
         |SELECT id AS rec_id, entity_id, TRUE AS is_new FROM ucomp
         |ORDER BY rec_id""".stripMargin,
    // hot-block-gated admit: candidates in blocks with store pop > 2 must
    // also share right(canon, 8); otherwise identical to q_er_admit
    "q_er_admit_hot" ->
      s"""WITH RECURSIVE $recordsCte,
         |edges AS (
         |  SELECT rec1 AS src, rec2 AS dst FROM pairs
         |  UNION ALL SELECT rec2, rec1 FROM pairs),
         |cc AS (
         |  SELECT rec_id AS id, rec_id AS comp FROM recs
         |  UNION
         |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON e.src = cc.id),
         |comp AS (SELECT id, min(comp) AS entity_id FROM cc GROUP BY id),
         |stats AS (SELECT block, count(*) AS pop FROM recs GROUP BY block),
         |store AS (
         |  SELECT r.rec_id, comp.entity_id, r.block, r.canon, r.bal,
         |         CASE WHEN st.pop > 2 THEN right(r.canon, 8) ELSE '' END AS sub
         |  FROM recs r JOIN comp ON comp.id = r.rec_id
         |  JOIN stats st ON st.block = r.block),
         |batch0 AS (
         |  SELECT c_custkey * 10 + 3 AS rec_id,
         |         replace(c_name, 'Customer#', 'CUST-') AS name,
         |         c_nationkey AS nation, c_acctbal AS bal
         |  FROM customer WHERE c_custkey % 7 = 0
         |  UNION ALL
         |  SELECT c_custkey * 10 + 4,
         |         replace(c_name, 'Customer#', 'Unknown Party #'),
         |         c_nationkey, c_acctbal
         |  FROM customer WHERE c_custkey % 11 = 0),
         |batch1 AS (
         |  SELECT *, lower(regexp_replace(name, '[^a-zA-Z0-9]', '', 'g')) AS canon,
         |         CAST(nation AS VARCHAR) || ':' ||
         |           right(lower(regexp_replace(name, '[^a-zA-Z0-9]', '', 'g')), 4) AS block
         |  FROM batch0),
         |batch AS (
         |  SELECT b.*,
         |         CASE WHEN st.pop > 2 THEN right(b.canon, 8) ELSE '' END AS sub
         |  FROM batch1 b LEFT JOIN stats st ON st.block = b.block),
         |matched AS (
         |  SELECT b.rec_id, min(s.entity_id) AS entity_id
         |  FROM batch b JOIN store s ON b.block = s.block AND b.sub = s.sub
         |  WHERE levenshtein(b.canon, s.canon) <= 4 AND abs(b.bal - s.bal) <= 0.51
         |  GROUP BY b.rec_id),
         |um AS (
         |  SELECT * FROM batch
         |  WHERE rec_id NOT IN (SELECT rec_id FROM matched)),
         |upairs AS (
         |  SELECT l.rec_id AS rec1, r.rec_id AS rec2
         |  FROM um l JOIN um r ON l.block = r.block AND l.rec_id < r.rec_id
         |  WHERE levenshtein(l.canon, r.canon) <= 4 AND abs(l.bal - r.bal) <= 0.51),
         |uedges AS (
         |  SELECT rec1 AS src, rec2 AS dst FROM upairs
         |  UNION ALL SELECT rec2, rec1 FROM upairs),
         |ucc AS (
         |  SELECT rec_id AS id, rec_id AS comp FROM um
         |  UNION
         |  SELECT e.dst, ucc.comp FROM ucc JOIN uedges e ON e.src = ucc.id),
         |ucomp AS (SELECT id, min(comp) AS entity_id FROM ucc GROUP BY id)
         |SELECT rec_id, entity_id, FALSE AS is_new FROM matched
         |UNION ALL
         |SELECT id AS rec_id, entity_id, TRUE AS is_new FROM ucomp
         |ORDER BY rec_id""".stripMargin
  )
}
