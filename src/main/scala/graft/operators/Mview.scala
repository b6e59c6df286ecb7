package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregates over a
  * [[Snapshots]] table — the consumer the CDC feed (`readChanges` / the
  * `snapshots` streaming source) exists for.
  *
  * The view is `GROUP BY keys → (cnt, sum_<c>…, min_<c>/max_<c>…)` — the
  * append-decomposable family: counts and sums ADD across deltas, extrema
  * fold via least/greatest (valid precisely because the incremental feed
  * is append-only — a delete would need recompute, and source rewrites
  * refuse upstream), avg = sum/cnt at query time. Each
  * [[refresh]] folds ONLY the source rows appended since the last refresh
  * into the running totals, so refresh cost is O(delta) + O(view), never
  * O(source). At 100 TB the source is the big thing — a nightly refresh
  * reads one day's appends, not the table.
  *
  * The view is itself a snapshot table, and its exactly-once watermark is
  * the `src_version` entry in the view commit's metadata: the folded
  * version and the marker publish in ONE atomic manifest rename
  * ([[Snapshots.commit]] meta), so a crash between "computed" and
  * "recorded" cannot double-fold a delta — on restart the view's own
  * latest metadata says exactly what was already applied. A REPLACE (or
  * merge/delete rewrite) on the source makes the incremental delta
  * undefined; [[refresh]] then refuses loudly (`readChanges`' contract)
  * and [[rebuild]] resyncs from a full scan.
  */
object Mview {
  private val SrcKey = "src_version"

  /** Source version already folded into the view (None for a fresh view). */
  def appliedSrcVersion(spark: SparkSession, viewDir: String): Option[Int] =
    Snapshots.currentVersion(spark, viewDir).map { v =>
      val m = Snapshots.commitMeta(spark, viewDir, v)
      m.getOrElse(SrcKey, throw new IllegalStateException(
        s"$viewDir: view commit v$v carries no $SrcKey marker — " +
          "not a Mview-maintained table")).toInt
    }

  private def aggregated(src: DataFrame, keys: Seq[String],
      sumCols: Seq[String], minMaxCols: Seq[String]): DataFrame =
    src.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        // cntv_<c> = the NON-NULL count, also add-decomposable: it is what
        // makes avg(c) (= sum_c / cntv_c) and count(c) derivable by the
        // query-rewrite rule even on nullable columns
        sumCols.flatMap(c => Seq(sum(col(c)).as(s"sum_$c"),
            count(col(c)).as(s"cntv_$c"))) ++
          minMaxCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
            max(col(c)).as(s"max_$c"))): _*)

  /** Fold source commits `(applied, head]` into the view; returns the new
    * view version (or the current one when the source hasn't moved). The
    * first refresh of an empty view is the initial full build.
    */
  def refresh(spark: SparkSession, srcDir: String, viewDir: String,
      keys: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Seq.empty): Int = {
    val head = Snapshots.currentVersion(spark, srcDir).getOrElse(
      throw new IllegalArgumentException(s"$srcDir: no published snapshots"))
    appliedSrcVersion(spark, viewDir) match {
      case Some(applied) if applied == head =>
        Snapshots.currentVersion(spark, viewDir).get // nothing new: no-op
      case Some(applied) =>
        require(applied < head,
          s"$srcDir went backwards (v$head < applied v$applied) — expired? rebuild")
        val delta = aggregated(
          Snapshots.readChanges(spark, srcDir, applied, head),
          keys, sumCols, minMaxCols)
        val old = Snapshots.read(spark, viewDir)
        val addCols = "cnt" +: sumCols.flatMap(c => Seq(s"sum_$c", s"cntv_$c"))
        // a view materialized before the cntv_* columns cannot be folded
        // incrementally (non-null history is not recoverable from deltas) —
        // refuse with the migration path instead of crashing mid-merge
        require(addCols.forall(old.columns.contains),
          s"$viewDir predates the cntv_* non-null-count columns — run " +
            "Mview.rebuild once to migrate, then refresh resumes incrementally")
        // full-outer merge of two aggregate-sized tables: totals ADD,
        // extrema fold via least/greatest (valid because appends only ever
        // grow a group — a delete would need recompute, and deletes refuse
        // upstream via readChanges), groups new to either side contribute
        // their own rows
        val merged = old.select(old.columns.map(c => col(c).as(s"l_$c")).toSeq: _*)
          .join(delta.select(delta.columns.map(c => col(c).as(s"r_$c")).toSeq: _*),
            // null-safe: a NULL group key is one group, not a fresh row
            // per refresh (=== would never match the two NULL sides)
            keys.map(k => col(s"l_$k") <=> col(s"r_$k")).reduce(_ && _), "full_outer")
          .select(
            keys.map(k => coalesce(col(s"l_$k"), col(s"r_$k")).as(k)) ++
              addCols.map(c =>
                (coalesce(col(s"l_$c"), lit(0)) + coalesce(col(s"r_$c"), lit(0)))
                  .cast(old.schema(c).dataType).as(c)) ++
              minMaxCols.flatMap { c =>
                Seq(least(col(s"l_min_$c"), col(s"r_min_$c"))
                    .as(s"min_$c"), // least/greatest skip NULLs (absent side)
                  greatest(col(s"l_max_$c"), col(s"r_max_$c")).as(s"max_$c"))
              }: _*)
        Snapshots.commit(spark, viewDir, merged, replace = true,
          expectedVersion = Snapshots.currentVersion(spark, viewDir),
          meta = Map(SrcKey -> head.toString))
      case None =>
        Snapshots.commit(spark, viewDir,
          aggregated(Snapshots.read(spark, srcDir, Some(head)),
            keys, sumCols, minMaxCols),
          meta = Map(SrcKey -> head.toString))
    }
  }

  /** Fold the row-level CHANGE FEED `(applied, head]` into the view — the
    * merge/delete-surviving refresh ([[refresh]] refuses on both): every
    * change row carries a signed weight (insert/update_post +1,
    * update_pre/delete −1), so counts, sums, and non-null counts stay
    * exactly maintained through upserts and deletes, and a group whose
    * count reaches zero leaves the view (the base GROUP BY would not emit
    * it). Extrema are NOT delta-subtractable — a deleted minimum needs a
    * per-group recompute — so this path maintains the additive family
    * only; views needing min/max under deletes use [[rebuild]]. Replace
    * commits still refuse loudly (the feed's contract). Refresh cost is
    * O(changed rows) + O(view), never O(source) — exactly the property
    * that lets a 100 TB fact table keep live upsert-fed aggregates.
    */
  def refreshViaFeed(spark: SparkSession, srcDir: String, viewDir: String,
      keys: Seq[String], sumCols: Seq[String]): Int = {
    val head = Snapshots.currentVersion(spark, srcDir).getOrElse(
      throw new IllegalArgumentException(s"$srcDir: no published snapshots"))
    appliedSrcVersion(spark, viewDir) match {
      case Some(applied) if applied == head =>
        Snapshots.currentVersion(spark, viewDir).get
      case Some(applied) =>
        require(applied < head,
          s"$srcDir went backwards (v$head < applied v$applied) — expired? rebuild")
        val feed = Snapshots.readChangeFeed(spark, srcDir, applied, head)
        val w = when(col("_change_type").isin("insert", "update_post"), 1L)
          .otherwise(lit(-1L))
        val aggExprs = sum(w).as("cnt") +: sumCols.flatMap(c => Seq(
          sum(col(c) * w).as(s"sum_$c"),
          sum(when(col(c).isNotNull, w).otherwise(lit(0L))).as(s"cntv_$c")))
        val delta = feed.groupBy(keys.map(col): _*)
          .agg(aggExprs.head, aggExprs.tail: _*)
        val old = Snapshots.read(spark, viewDir)
        val addCols = "cnt" +: sumCols.flatMap(c => Seq(s"sum_$c", s"cntv_$c"))
        val merged = old.select(old.columns.map(c => col(c).as(s"l_$c")).toSeq: _*)
          .join(delta.select(delta.columns.map(c => col(c).as(s"r_$c")).toSeq: _*),
            keys.map(k => col(s"l_$k") <=> col(s"r_$k")).reduce(_ && _), "full_outer")
          .select(
            keys.map(k => coalesce(col(s"l_$k"), col(s"r_$k")).as(k)) ++
              addCols.map(c =>
                (coalesce(col(s"l_$c"), lit(0)) + coalesce(col(s"r_$c"), lit(0)))
                  .cast(old.schema(c).dataType).as(c)): _*)
          .filter(col("cnt") > 0) // a fully-deleted group leaves the view
        Snapshots.commit(spark, viewDir, merged, replace = true,
          expectedVersion = Snapshots.currentVersion(spark, viewDir),
          meta = Map(SrcKey -> head.toString))
      case None =>
        Snapshots.commit(spark, viewDir,
          aggregated(Snapshots.read(spark, srcDir, Some(head)),
            keys, sumCols, Seq.empty),
          meta = Map(SrcKey -> head.toString))
    }
  }

  /** CONTINUOUS materialized view: tail the source's row-level CHANGE FEED
    * as a stream and fold every arrival through [[refreshViaFeed]] — the
    * live composition of the CDF streaming source and the feed-driven
    * refresh. Each trigger costs O(changed rows) + O(view); upserts and
    * deletes fold through the signed weights; maintenance commits
    * (compaction, Z-order) are feed-invisible and fold as zero-row deltas.
    *
    * Exactly-once across restarts needs NO extra bookkeeping: the engine's
    * checkpoint replays at most the last batch, and [[refreshViaFeed]]'s
    * `src_version` commit-meta watermark (published atomically with each
    * view version) makes any replay — or a fold that already covered the
    * replayed range — a no-op. The CDF source additionally registers a
    * retention pin, so a concurrent `expire` can never strand the tail.
    * One serving stream per view (the watermark is per-table state).
    */
  def serveViaFeed(spark: SparkSession, srcDir: String, viewDir: String,
      keys: Seq[String], sumCols: Seq[String],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("snapshots")
      .option("path", srcDir)
      .option("readChangeFeed", "true")
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        // the delivered batch is the wake-up signal; the fold re-derives
        // (applied, head] from the manifests so it is idempotent under
        // engine replays AND under having already folded ahead of the
        // checkpointed offsets
        refreshViaFeed(spark, srcDir, viewDir, keys, sumCols)
        ()
      }
      .start()

  /** Full recompute at the source head — the resync after a source
    * replace/merge/delete rewrote history and [[refresh]] refused.
    */
  def rebuild(spark: SparkSession, srcDir: String, viewDir: String,
      keys: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Seq.empty): Int = {
    val head = Snapshots.currentVersion(spark, srcDir).getOrElse(
      throw new IllegalArgumentException(s"$srcDir: no published snapshots"))
    Snapshots.commit(spark, viewDir,
      aggregated(Snapshots.read(spark, srcDir, Some(head)), keys, sumCols,
        minMaxCols),
      replace = true, meta = Map(SrcKey -> head.toString))
  }
}
