package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Automatic query rewrite over [[Mview]]-maintained materialized views —
  * the classic warehouse feature (Calcite/Oracle "query rewrite"): an
  * aggregate over the SOURCE snapshot table silently answers from the
  * aggregate-sized VIEW when that is provably equivalent. The query author
  * keeps writing against the base table; whoever registered the view pays
  * its maintenance; every matching query stops scanning the fact table.
  * At 100 TB this is the difference between a full fact scan and a read of
  * a few thousand rows.
  *
  * A rewrite fires only when ALL of:
  *   - the aggregate's child is (modulo an attribute-only Project) the
  *     parquet relation of a REGISTERED source dir, planning exactly the
  *     files of the source's CURRENT version — a time-travel read of an
  *     older version keeps its full scan;
  *   - the view is FRESH: its `src_version` marker equals the source head
  *     (a stale view never answers — correctness beats the speedup);
  *   - grouping is by a subset of the view's keys, and every aggregate is
  *     derivable: `count(<literal>)` → `sum(cnt)`, `sum(x)` →
  *     `sum(sum_x)`, `min(x)`/`max(x)` → `min(min_x)`/`max(max_x)`,
  *     possibly under scalar wrappers (`round(sum(x), 2)`, arithmetic,
  *     casts) — no DISTINCT, no FILTER clauses, and every rewritten
  *     expression must carry the exact same data type (a DECIMAL sum
  *     re-widened would change the schema, so it refuses instead).
  *
  * The rewrite re-aggregates over the view, which is exact: view rows are
  * one per key group, and count/sum/min/max all fold correctly from the
  * partial per-group values when grouping by fewer keys. Output
  * expression ids are preserved, so parent operators never notice.
  */
object MviewRewrite {
  final case class Registration(srcDir: String, viewDir: String,
      keys: Seq[String], sumCols: Seq[String], minMaxCols: Seq[String])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Registration]()

  /** Declare that `viewDir` materializes `srcDir`'s aggregate (same
    * arguments as [[Mview.refresh]]). Idempotent per source dir.
    */
  def register(srcDir: String, viewDir: String, keys: Seq[String],
      sumCols: Seq[String], minMaxCols: Seq[String] = Seq.empty): Unit =
    registry.put(srcDir, Registration(srcDir, viewDir, keys, sumCols, minMaxCols))

  def deregister(srcDir: String): Unit = { registry.remove(srcDir); () }
  def clear(): Unit = registry.clear()

  private[operators] def isEmpty: Boolean = registry.isEmpty
  private[operators] def all: Seq[Registration] = {
    import scala.jdk.CollectionConverters._
    registry.values.asScala.toSeq
  }
}

class MviewRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MviewRewrite.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        tryRewrite(groupExprs, aggExprs, child).getOrElse(agg)
    }

  /** The base relation under attribute-only Projects and Filters, plus the
    * conjunction of the filter conditions met on the way (anything else —
    * joins, generators, windows — refuses). Filters are admissible only
    * when they reference just the view's grouping keys, decided later.
    */
  private def baseOf(child: LogicalPlan): Option[(LogicalRelation, Seq[Expression])] =
    child match {
      case Project(plist, c) if plist.forall(_.isInstanceOf[AttributeReference]) =>
        baseOf(c)
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, c) =>
        baseOf(c).map { case (lr, conds) => (lr, cond +: conds) }
      case c: LogicalRelation => Some((c, Nil))
      case _ => None
    }

  private def tryRewrite(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
    val (lr, filterConds) = baseOf(child).getOrElse(return None)
    // the source table appears in two relation shapes: the parquet file
    // relation Snapshots.read / snapshot_scan() plan (match by planned
    // file set), and the `USING snapshots` SQL relation (match by its own
    // dir + pin). Either way the match must pin to the source HEAD.
    val reg = lr.relation match {
      case h: HadoopFsRelation =>
        val planned = h.location.rootPaths.map(_.toUri.getPath).toSet
        if (planned.isEmpty) return None
        // LONGEST matching source dir wins: with nested registered dirs
        // (/data/a and /data/a/b) the most specific one is the only
        // candidate whose head-file check can succeed, and map iteration
        // order must not decide whether the rewrite fires
        val candidates = MviewRewrite.all
          .filter(r => planned.forall(_.startsWith(r.srcDir + "/")))
        if (candidates.isEmpty) return None
        val reg = candidates.maxBy(_.srcDir.length)
        // exact-version check: the planned file set must be the source
        // HEAD's file set — a time-travel read keeps its scan
        val head = Snapshots.currentVersion(spark, reg.srcDir).getOrElse(return None)
        val headFiles = Snapshots.files(spark, reg.srcDir, head)
          .map(f => new org.apache.hadoop.fs.Path(reg.srcDir + "/" + f).toUri.getPath)
          .toSet
        if (planned != headFiles) return None
        reg
      case sr: graft.streaming.SnapshotRelation =>
        val reg = MviewRewrite.all.find(_.srcDir == sr.dir).getOrElse(return None)
        val head = Snapshots.currentVersion(spark, reg.srcDir).getOrElse(return None)
        // an unpinned mounted view reads LATEST; the rewrite pins its
        // answer to the head seen at planning — the same exposure the
        // parquet path has (its file list is also fixed at planning). A
        // version/timestamp pin must equal the head or keep its scan.
        if (!sr.pinned.forall(_ == head)) return None
        reg
      case _ => return None
    }
    // freshness: the view must have folded exactly the source head
    // (manifests are KB-sized driver reads)
    val head = Snapshots.currentVersion(spark, reg.srcDir).getOrElse(return None)
    if (!Mview.appliedSrcVersion(spark, reg.viewDir).contains(head)) return None

    // grouping must be by view keys only
    val groupAttrs = groupExprs.map {
      case a: AttributeReference if reg.keys.contains(a.name) => a
      case _ => return None
    }

    // analyzed (NOT optimized — that would re-enter this rule) view plan;
    // fresh expression ids per rewrite, so no conflicts with the query
    val viewPlan = Snapshots.read(spark, reg.viewDir).queryExecution.analyzed
    val viewAttr: Map[String, Attribute] = viewPlan.output.map(a => a.name -> a).toMap
    def aggOf(fn: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction): Expression =
      AggregateExpression(fn, Complete, isDistinct = false)

    // safe lookup: a view refreshed by an older Mview build may lack the
    // cntv_* columns — a missing column refuses the rewrite, never throws
    def va(name: String): Option[Attribute] = viewAttr.get(name)

    /** The view-side twin of one base-table aggregate call, or None when
      * it is not derivable. Type equality is part of equivalence: a
      * type-widening rewrite (DECIMAL sums widen per aggregation) refuses.
      */
    def replacementFor(ae: AggregateExpression): Option[Expression] = {
      if (ae.mode != Complete || ae.isDistinct || ae.filter.nonEmpty) return None
      // counts fold as sums, but an EMPTY input (a global aggregate over a
      // filtered-out or empty table) sums to NULL where count returns 0 —
      // coalesce restores count's contract; harmless under grouping, where
      // empty groups emit no row on either side
      def countAs(colName: String): Option[Expression] =
        va(colName).map(a => org.apache.spark.sql.catalyst.expressions.Coalesce(
          Seq(aggOf(Sum(a)), Literal(0L))))
      val replaced: Expression = ae.aggregateFunction match {
        case Count(Seq(l: Literal)) if l.value != null =>
          countAs("cnt").getOrElse(return None)
        // count(x) — the NON-NULL count — folds from the view's cntv_x
        case Count(Seq(ar: AttributeReference)) if reg.sumCols.contains(ar.name) =>
          countAs(s"cntv_${ar.name}").getOrElse(return None)
        case Sum(ar: AttributeReference, _) if reg.sumCols.contains(ar.name) =>
          aggOf(Sum(va(s"sum_${ar.name}").getOrElse(return None)))
        case Min(ar: AttributeReference) if reg.minMaxCols.contains(ar.name) =>
          aggOf(Min(va(s"min_${ar.name}").getOrElse(return None)))
        case Max(ar: AttributeReference) if reg.minMaxCols.contains(ar.name) =>
          aggOf(Max(va(s"max_${ar.name}").getOrElse(return None)))
        // avg(x) = sum(sum_x) / sum(cntv_x), both as double — the type
        // Average itself produces for non-decimal inputs (decimal averages,
        // whose scale arithmetic differs, fail the type check and refuse).
        // The denominator is the NON-NULL count, so nullable x is exact.
        case org.apache.spark.sql.catalyst.expressions.aggregate.Average(
            ar: AttributeReference, _) if reg.sumCols.contains(ar.name) =>
          org.apache.spark.sql.catalyst.expressions.Divide(
            org.apache.spark.sql.catalyst.expressions.Cast(
              aggOf(Sum(va(s"sum_${ar.name}").getOrElse(return None))),
              org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.catalyst.expressions.Cast(
              aggOf(Sum(va(s"cntv_${ar.name}").getOrElse(return None))),
              org.apache.spark.sql.types.DoubleType))
        case _ => return None
      }
      if (replaced.dataType == ae.dataType) Some(replaced) else None
    }

    /** Top-down expression rewrite: aggregate subtrees map atomically via
      * [[replacementFor]]; bare attributes outside aggregates can only be
      * grouping keys (analysis guarantees it) and map to the view's;
      * scalar wrappers (round, arithmetic, casts) keep their shape over
      * rewritten children; any other leaf aborts the whole rewrite.
      */
    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => replacementFor(ae)
      case a: AttributeReference =>
        if (reg.keys.contains(a.name)) va(a.name) else None
      case l: Literal => Some(l)
      case other if other.children.nonEmpty =>
        val kids = other.children.map(rewriteExpr)
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
        else None
      case _ => None
    }

    // filters between the aggregate and the scan are admissible only when
    // DETERMINISTIC and over grouping keys — then they commute with the
    // aggregate and apply to the view's key columns unchanged. (The
    // determinism check matters even with an empty reference set: a
    // rand() predicate filters base ROWS, and pushing it over the view
    // would filter whole GROUPS instead.)
    if (!filterConds.forall(c => c.deterministic &&
        c.references.forall(a => reg.keys.contains(a.name))))
      return None

    val rewritten = aggExprs.map {
      case a: AttributeReference if reg.keys.contains(a.name) =>
        Alias(va(a.name).getOrElse(return None), a.name)(exprId = a.exprId)
      case al @ Alias(child, name) =>
        val newChild = rewriteExpr(child).getOrElse(return None)
        if (newChild.dataType != al.dataType) return None
        Alias(newChild, name)(exprId = al.exprId)
      case _ => return None
    }
    val newGroup = groupAttrs.map(a => va(a.name).getOrElse(return None))
    val filtered = filterConds.foldRight(viewPlan) { (c, p) =>
      org.apache.spark.sql.catalyst.plans.logical.Filter(
        rewriteExpr(c).getOrElse(return None), p)
    }
    Some(Aggregate(newGroup, rewritten, filtered))
  }
}
