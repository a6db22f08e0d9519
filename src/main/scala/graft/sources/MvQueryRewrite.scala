package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.DataType

/** AUTOMATIC MV-BASED QUERY REWRITE — the optimization materialized views
  * exist for: a user's aggregate over the 100 TB BASE table is answered
  * from the |groups|-sized stored view, transparently, whenever a FRESH
  * MV of that base subsumes the query. Without this rule an MV is a table
  * you must know about; with it, `SELECT st, count(*) FROM fact GROUP BY
  * st` plans as a scan of the rollup (the warehouse norm — Oracle query
  * rewrite, BigQuery/Redshift/Snowflake automatic MV rewrite).
  *
  * WHEN a rewrite fires (all conditions checked at plan time):
  *
  *   - the plan node is `Aggregate → [Filter] → <live-head scan of a
  *     snapshot-catalog table>` — never a time-traveled / branch / meta
  *     (`.changes`) relation: a pinned read's answer is defined by
  *     history, not by any view's freshness;
  *   - an MV of that base is FRESH: its `mv.base-version` watermark
  *     equals the base's current version and no refresh claim is pending
  *     (`mv.pending-base` — a mid-refresh or crashed view never serves);
  *   - the query's WHERE is ACCOUNTED FOR: it equals the MV's stored
  *     predicate (canonicalized SQL), or — when conjunctive — one
  *     conjunct equals it and the rest reference only MV group columns
  *     (they become a residual Filter over the view); an MV with no
  *     WHERE accepts any group-column-only predicate as residual;
  *   - every output maps onto the stored columns: group expressions map
  *     to group columns (compositionally — `upper(st)` over group column
  *     `st` maps), `count(*)`/`count(col)`/`sum(col)` (no DISTINCT, no
  *     FILTER clause) map to their stored rollup columns. Anything else
  *     (min/max/avg/UDAFs, base columns outside the group key) vetoes
  *     the rewrite — the query silently plans against the base, never
  *     wrong, just unoptimized.
  *
  * TWO REWRITE SHAPES:
  *
  *   - EXACT (query groups = the MV's group columns, possibly reordered
  *     or wrapped in scalar functions that keep every group attr bare in
  *     the list): a `Project` over the view — zero aggregation, zero
  *     shuffle;
  *   - SUBSUMPTION (query groups are a coarser function of the MV's):
  *     re-aggregate the view — `count(*)` becomes `sum(n)`, `count(col)`
  *     and `sum(col)` become sums of the stored partials (cast back to
  *     the query's types, so the result schema is unchanged). Correct
  *     because the MV holds EVERY group (its count(*) column makes group
  *     death exact) and count/sum are distributive over a partition of
  *     the rows.
  *
  * EXACTNESS: a fresh MV is hash-identical to recomputing its body (the
  * r03 gate); the mapped outputs read those very values, and subsumption
  * re-adds partial sums whose addition is associative (integral/decimal
  * only — enforced at CREATE). The r04 gate pins rewritten ≡ recomputed,
  * hash-exact, with an in-query assert that the view's scan (not the
  * base's) served the answer.
  *
  * CONSISTENCY: the substituted scan is PINNED to the MV snapshot whose
  * freshness was validated — a refresh landing between planning and
  * execution cannot shift the answer mid-query. Freshness compares the
  * session's cached view of base and MV state; both move through the
  * same store, so the comparison is internally consistent (the usual
  * snapshot-read semantics of every non-pinned scan).
  *
  * PLAN-TIME COST: an O(1) per-catalog discovery-index probe (the
  * warehouse listing is cached JVM-wide; local CREATE/DROP invalidates,
  * a 30 s TTL bounds cross-session staleness — a not-yet-indexed MV is
  * merely not served, never wrongly served) plus in-JVM state probes
  * for the base's own candidates — metadata-scale, never data-scale.
  * Disable with `spark.graft.mv.rewrite.enabled = false`.
  */
private[graft] object MvQueryRewrite {

  /** Session conf: set "false" to plan every aggregate against the base. */
  val EnabledKey = "spark.graft.mv.rewrite.enabled"

  import MaterializedViews.{MvCol, PropBaseVersion, PropCols, PropPending, PropWhere, unq}

  /** One candidate MV of some base table, resolved once per invocation. */
  private final case class Cand(ident: Identifier, key: String,
      state: SnapshotStore.TableState, cols: Seq[MvCol])

  def rewrite(spark: SparkSession, plan: LogicalPlan): LogicalPlan = {
    // Candidates memoized per invocation (a UNION of aggregates over one
    // base must not re-list the warehouse per branch).
    val memo = mutable.HashMap.empty[String, Seq[Cand]]
    plan.resolveOperatorsUp {
      case agg: Aggregate =>
        try tryRewrite(spark, agg, memo).getOrElse(agg)
        catch { case _: Exception => agg } // never fail the query over an optimization
    }
  }

  // -- plan destructuring ----------------------------------------------------

  private def strip(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => strip(c)
    // Attribute-only projections (column pruning / reorder) keep exprIds —
    // transparent to expression matching.
    case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      strip(c)
    case other => other
  }

  /** `Aggregate → [Filter] → live-head snapshot-catalog scan`, or None. */
  private def destructure(agg: Aggregate):
      Option[(Option[Expression], SnapshotCatalog, String)] = {
    def relOf(p: LogicalPlan): Option[(SnapshotCatalog, String)] = p match {
      // Reader OPTIONS veto the rewrite outright: a `files`-restricted
      // scan (the incremental-read hook) or any other option-modified
      // read is NOT the whole live table the MV materializes — plain
      // `spark.table`/SQL reads carry no options.
      case r: DataSourceV2Relation if r.options.isEmpty => r.table match {
        case m: MemTable if m.isLiveHead => r.catalog match {
          case Some(c: SnapshotCatalog) => Some((c, m.storeKey))
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }
    strip(agg.child) match {
      case Filter(cond, c) => relOf(strip(c)).map { case (cat, k) =>
        (Some(cond), cat, k) }
      case other => relOf(other).map { case (cat, k) => (None, cat, k) }
    }
  }

  // -- candidate discovery ---------------------------------------------------

  private def currentVersion(k: String): Long = {
    val st = SnapshotStore.stateOf(k)
    if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
  }

  /** catalog name → (builtAtMillis, baseKey → MV identifiers). The
    * DISCOVERY index: which tables are MVs and what base each folds —
    * membership changes only on CREATE/DROP MATERIALIZED VIEW, so the
    * warehouse listing is cached JVM-wide with local create/drop
    * invalidation ([[invalidate]]) plus a [[IndexTtlMs]] ceiling for
    * MVs created by OTHER sessions (until it refreshes, such an MV is
    * merely not yet served — never wrongly served: per-query matching
    * re-resolves each candidate's CURRENT state for every freshness/
    * shape gate). Without this, every aggregate over a catalog table
    * would pay an O(|tables|) metadata listing at plan time. */
  private val index = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Map[String, Vector[Identifier]])]()
  private val IndexTtlMs = 30000L
  /** Bumped by [[invalidate]] — an index build that STARTED before a
    * CREATE/DROP must not reinstall its pre-mutation listing over the
    * invalidation (it just goes uncached; the next query rebuilds). */
  private val generation = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Drop a catalog's discovery index (CREATE/DROP MATERIALIZED VIEW). */
  def invalidate(catalogName: String): Unit = {
    generation.incrementAndGet()
    index.remove(catalogName)
    ()
  }

  private def indexOf(cat: SnapshotCatalog): Map[String, Vector[Identifier]] = {
    val name = cat.name()
    val now = System.currentTimeMillis()
    val cur = index.get(name)
    if (cur != null && now - cur._1 < IndexTtlMs) return cur._2
    val genAtStart = generation.get()
    val built: Map[String, Vector[Identifier]] =
      try {
        cat.listNamespaces().toSeq.flatMap { ns =>
          val ids = try cat.listTables(ns).toSeq catch { case _: Exception => Nil }
          ids.flatMap { id =>
            val k = SnapshotStore.keyOf(name, id.namespace().toSeq :+ id.name())
            try {
              SnapshotStore.resolve(k)
                .filter(st => MaterializedViews.isMv(st.properties))
                .map(st => SnapshotStore.keyOf(name,
                  MaterializedViews.baseParts(st.properties)) -> id)
            } catch { case _: Exception => None }
          }
        }.groupBy(_._1).map { case (bk, xs) => bk -> xs.map(_._2).toVector }
      } catch { case _: Exception => Map.empty }
    if (generation.get() == genAtStart) index.put(name, (now, built))
    built
  }

  /** Every MV of `cat` folding `baseKey`, with its CURRENT state —
    * resolved fresh per query (the index only names candidates; every
    * gate below re-validates against live metadata). Listing errors
    * (view claim dirs, concurrent drops) skip the entry. */
  private def candidates(cat: SnapshotCatalog, baseKey: String): Seq[Cand] =
    indexOf(cat).getOrElse(baseKey, Vector.empty).flatMap { id =>
      val k = SnapshotStore.keyOf(cat.name(),
        id.namespace().toSeq :+ id.name())
      try {
        SnapshotStore.resolve(k)
          .filter(st => MaterializedViews.isMv(st.properties))
          // Star (join) MVs never serve a single-table aggregate:
          // their rows are post-join, and their stored expressions
          // carry f/d0/… qualifiers that must not string-match.
          .filter(st => !st.properties.contains(MaterializedViews.PropDims))
          .filter(st => SnapshotStore.keyOf(cat.name(),
            MaterializedViews.baseParts(st.properties)) == baseKey)
          .map(st => Cand(id, k, st,
            MaterializedViews.colsFromJson(st.properties(PropCols))))
      } catch { case _: Exception => None }
    }

  // -- matching --------------------------------------------------------------

  private def tryRewrite(spark: SparkSession, agg: Aggregate,
      memo: mutable.HashMap[String, Seq[Cand]]): Option[LogicalPlan] = {
    if (agg.groupingExpressions.isEmpty) return None // global aggregate: the
    // MV contract requires a GROUP BY, and an empty-base global agg must
    // yield its one default row — never rewritable from a keyed view.
    val (filterOpt, cat, baseKey) = destructure(agg) match {
      case Some(t) => t
      case None => return None
    }
    val cands = memo.getOrElseUpdate(baseKey, candidates(cat, baseKey))
    if (cands.isEmpty) return None
    val baseV = currentVersion(baseKey)
    cands.iterator
      .filter { c =>
        val props = c.state.properties
        val mvCurrent =
          if (c.state.snapshots.isEmpty) 0L else c.state.snapshots.last.version
        !props.contains(PropPending) &&
          props.get(PropBaseVersion).exists(_.toLong == baseV) &&
          // TAMPER gate: only refresh/create ever write the backing table
          // (PropSelfVersion is stamped after each), so a snapshot version
          // PAST the stamp means someone ran DML directly against the MV —
          // its rows no longer equal the body, and serving them would be
          // wrong for a query that never mentioned the view. (A
          // maintenance compaction of the MV table also moves the version
          // and vetoes until the next refresh re-stamps — conservative,
          // never wrong.)
          props.get(MaterializedViews.PropSelfVersion)
            .exists(_.toLong == mvCurrent)
      }
      .flatMap(c => matchOne(spark, agg, filterOpt, cat, c))
      .nextOption()
  }

  /** Split a conjunction into its conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def matchOne(spark: SparkSession, agg: Aggregate,
      filterOpt: Option[Expression], cat: SnapshotCatalog,
      cand: Cand): Option[LogicalPlan] = {
    // WHERE accounting: residual = query conjuncts not consumed by the
    // MV's stored predicate; None = unaccountable, no rewrite.
    val mvWhere = cand.state.properties.get(PropWhere)
    val residual: Seq[Expression] = (filterOpt, mvWhere) match {
      case (None, None) => Nil
      case (None, Some(_)) => return None // MV sees fewer rows than the query
      case (Some(cond), None) => conjuncts(cond)
      case (Some(cond), Some(w)) =>
        if (unq(cond) == w) Nil
        else {
          val (consumed, rest) = conjuncts(cond).partition(c => unq(c) == w)
          if (consumed.isEmpty) return None
          rest
        }
    }

    // The substituted relation: the MV pinned at its validated snapshot.
    val rel = mvRelation(cat, cand)
    val attrOf: Map[String, Attribute] =
      rel.output.map(a => a.name -> a).toMap
    def attr(out: String): Option[Attribute] = attrOf.get(out)

    val groupBySql: Map[String, Attribute] = cand.cols.collect {
      case c if c.kind == "group" => attr(c.out).map(c.expr -> _)
    }.flatten.toMap
    val countStar: Option[Attribute] =
      cand.cols.find(_.kind == "count_star").flatMap(c => attr(c.out))
    val countBySql: Map[String, Attribute] = cand.cols.collect {
      case c if c.kind == "count" => attr(c.out).map(c.expr -> _)
    }.flatten.toMap
    val sumBySql: Map[String, Attribute] = cand.cols.collect {
      case c if c.kind == "sum" => attr(c.out).map(c.expr -> _)
    }.flatten.toMap
    // A schema drifted out from under its spec (manual ALTER) maps
    // nothing — every lookup below just fails and the base serves.

    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    def castTo(e: Expression, dt: DataType): Expression =
      if (e.dataType == dt) e else Cast(e, dt, tz)

    /** Scalar mapping: group-column subtrees → MV attrs, literals pass,
      * anything touching the base otherwise vetoes. NON-DETERMINISTIC
      * expressions veto outright: `WHERE rand() < 0.5` samples base ROWS,
      * and re-evaluating it over |groups| stored rows would keep or drop
      * whole groups instead — silently wrong, not just re-randomized. */
    def mapScalar(e: Expression): Option[Expression] =
      if (!e.deterministic) None
      else groupBySql.get(unq(e)) match {
        case Some(a) => Some(a)
        case None => e match {
          case _: SubqueryExpression => None
          case _: AggregateExpression => None
          case _: Attribute => None // a base column outside the group key
          case l: Literal => Some(l)
          case other if other.children.isEmpty => Some(other)
          case other =>
            val kids = other.children.map(mapScalar)
            if (kids.forall(_.isDefined))
              Some(other.withNewChildren(kids.map(_.get)))
            else None
        }
      }

    /** Output mapping: like [[mapScalar]] plus aggregate serving. `exact`
      * reads stored values directly; otherwise re-aggregates them.
      * Non-deterministic outputs veto like scalars (per-row vs per-group
      * evaluation differs). */
    def mapValue(e: Expression, exact: Boolean): Option[Expression] =
      if (!e.deterministic) None else e match {
      case ae: AggregateExpression if ae.isDistinct || ae.filter.isDefined =>
        None
      case ae: AggregateExpression =>
        def serve(a: Attribute): Expression = {
          val v: Expression =
            if (exact) a else Sum(a).toAggregateExpression()
          castTo(v, ae.dataType)
        }
        ae.aggregateFunction match {
          case c: Count if c.children.sizeIs == 1 =>
            c.children.head match {
              case l: Literal if l.value != null => countStar.map(serve)
              case _: Literal => None // count(NULL): constant 0, not stored
              case arg => countBySql.get(unq(arg)).map(serve)
            }
          case s: Sum => sumBySql.get(unq(s.child)).map(serve)
          case _ => None // min/max/avg/first/UDAF: not in the stored rollup
        }
      case other =>
        groupBySql.get(unq(other)) match {
          case Some(a) => Some(a)
          case None => other match {
            case _: SubqueryExpression => None
            case _: Attribute => None
            case l: Literal => Some(l)
            case o if o.children.isEmpty => Some(o)
            case o =>
              val kids = o.children.map(mapValue(_, exact))
              if (kids.forall(_.isDefined))
                Some(o.withNewChildren(kids.map(_.get)))
              else None
          }
        }
    }

    // Group mapping decides the shape: every query group expr must map;
    // EXACT iff every MV group attr appears BARE among the mapped groups
    // (then each stored row is exactly one output group — Project mode).
    val mappedGroups = agg.groupingExpressions.map(mapScalar)
    if (!mappedGroups.forall(_.isDefined)) return None
    val bareMapped: Set[Attribute] = mappedGroups.flatten.collect {
      case a: Attribute => a
    }.toSet
    val exact = groupBySql.values.forall(bareMapped.contains)

    val mappedOuts = agg.aggregateExpressions.map { out =>
      val (inner, name, id) = out match {
        case al @ Alias(e, n) => (e, n, al.exprId)
        case e: NamedExpression => (e: Expression, e.name, e.exprId)
      }
      mapValue(inner, exact).map(m => Alias(m, name)(exprId = id))
    }
    if (!mappedOuts.forall(_.isDefined)) return None

    val mappedResidual = residual.map(mapScalar)
    if (!mappedResidual.forall(_.isDefined)) return None
    val child = mappedResidual.flatten
      .reduceOption(And).map(Filter(_, rel)).getOrElse(rel: LogicalPlan)

    if (exact) Some(Project(mappedOuts.flatten, child))
    else Some(agg.copy(groupingExpressions = mappedGroups.flatten,
      aggregateExpressions = mappedOuts.flatten, child = child))
  }

  /** The MV relation pinned to the snapshot whose freshness was checked
    * (an empty never-written MV has no snapshot to pin — serve the live
    * head; both read empty). */
  private def mvRelation(cat: SnapshotCatalog, cand: Cand): DataSourceV2Relation = {
    val table =
      if (cand.state.snapshots.isEmpty) cat.loadTable(cand.ident)
      else cat.loadTable(cand.ident, cand.state.snapshots.last.version.toString)
    DataSourceV2Relation.create(table, Some(cat), Some(cand.ident))
  }
}

/** The analyzer seam: post-hoc resolution (the plan is fully resolved,
  * filters not yet pushed — the WHERE is still visible to match). */
final case class GraftMvRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Session-bound setup rides the first analysis: the sort-elision
    // optimizer rule must live in `experimental.extraOptimizations` (see
    // [[SortedScanSortElision.install]] for why no extension seam fits).
    SortedScanSortElision.install(spark)
    if (!conf.getConfString(MvQueryRewrite.EnabledKey, "true").toBoolean) plan
    else MvQueryRewrite.rewrite(spark, plan)
  }
}
