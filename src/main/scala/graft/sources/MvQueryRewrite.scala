package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, Coalesce, Divide, EqualNullSafe, EqualTo, ExprId, Expression, HllSketchEstimate, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, Count, HllUnionAgg, HyperLogLogPlusPlus, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Join, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DataType, DoubleType}

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
  *     snapshot-catalog table, or an INNER-equi-join tree of them>` —
  *     never a time-traveled / branch / meta (`.changes`) relation: a
  *     pinned read's answer is defined by history, not by any view's
  *     freshness;
  *   - an MV over EXACTLY those tables is FRESH: its `mv.base-version`
  *     watermark equals the fact's current version, every dimension
  *     watermark (`mv.dim-versions`) equals its dimension's current
  *     version, and no refresh claim is pending (`mv.pending-base` — a
  *     mid-refresh or crashed view never serves);
  *   - for a JOIN query, the join tree matches the stored STAR spec:
  *     the query's table set equals {fact} ∪ dims (each table once —
  *     self-joins are ambiguous and veto), and the query's ON conjuncts
  *     equal the spec's `mv.dims` conditions as a multiset (canonicalized
  *     under the stored `f`/`d0`/… aliases, equality commuted) — an
  *     extra or missing join condition changes the row multiset the MV
  *     materialized, so either direction vetoes;
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
  * r03/r05 gates); the mapped outputs read those very values, and
  * subsumption re-adds partial sums whose addition is associative
  * (integral/decimal only — enforced at CREATE). The r04 gate pins
  * rewritten ≡ recomputed hash-exact for the single-table shape, r06 for
  * the star shape, each with an in-query assert that the view's scan
  * (not the base's) served the answer.
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

  /** Session conf gating the STALE-MV delta top-up: when the only failed
    * gate is the watermark, serve `view ∪ signed-fold(.changes (b, c])`
    * re-aggregated inline instead of falling back to the base scan. */
  val TopUpKey = "spark.graft.mv.rewrite.topup.enabled"

  import MaterializedViews.{FactAlias, MvCol, PropBaseVersion, PropCols, PropPending, PropWhere, dimAlias, unq}

  /** One candidate MV, resolved once per invocation. `factKey` is the
    * store key of the table whose `.changes` refresh folds; star specs
    * additionally carry `dimKeys` (join order), the stored join-condition
    * SQLs, and the dimension watermarks parallel to `dimKeys`. */
  private final case class Cand(ident: Identifier, key: String,
      state: SnapshotStore.TableState, cols: Seq[MvCol], factKey: String,
      dimKeys: Seq[String], joinConds: Seq[String], dimVersions: Seq[Long])

  /** The servable part of a query plan: `Aggregate → [Expand] →
    * [Filter] → <rels>` where `rels` is one live-head catalog scan or an
    * inner-equi-join tree of them (join ON conjuncts in `conds`), all of
    * one catalog. `expand` present = a ROLLUP/CUBE/GROUPING SETS
    * aggregate (the analyzer's grouping-analytics form). */
  private final case class Shape(filter: Option[Expression],
      cat: SnapshotCatalog, rels: Seq[(String, DataSourceV2Relation)],
      conds: Seq[Expression], expand: Option[Expand] = None,
      /** The grouping-analytics alias Project's exprId → child-expr map
        * (ResolveGroupingAnalytics copies every group expression under a
        * generated alias; Expand group slots reference the COPIES, which
        * must substitute back to base expressions before matching). */
      substs: Map[ExprId, Expression] = Map.empty)

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

  /** One leaf scan the rewrite may substitute for. Reader OPTIONS veto
    * outright: a `files`-restricted scan (the incremental-read hook) or
    * any other option-modified read is NOT the whole live table the MV
    * materializes — plain `spark.table`/SQL reads carry no options. */
  private def leafOf(p: LogicalPlan):
      Option[(SnapshotCatalog, String, DataSourceV2Relation)] = p match {
    case r: DataSourceV2Relation if r.options.isEmpty => r.table match {
      case m: MemTable if m.isLiveHead => r.catalog match {
        case Some(c: SnapshotCatalog) => Some((c, m.storeKey, r))
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  /** `Aggregate → [Expand] → [Filter] → scan | inner-equi-join tree`,
    * or None. */
  private def destructure(agg: Aggregate): Option[Shape] = {
    def flatten(p: LogicalPlan):
        Option[(Seq[(SnapshotCatalog, String, DataSourceV2Relation)],
                Seq[Expression])] = strip(p) match {
      case j: Join if j.joinType == Inner && j.condition.isDefined =>
        for {
          (lr, lc) <- flatten(j.left)
          (rr, rc) <- flatten(j.right)
        } yield (lr ++ rr, (lc ++ rc) ++ conjuncts(j.condition.get))
      case other => leafOf(other).map(l => (Seq(l), Nil))
    }
    // ROLLUP/CUBE/GROUPING SETS: the analyzer plans them as
    // `Aggregate → Expand → Project(child cols ++ group-expr COPIES)`;
    // the WHERE sits below that Project. The copies' alias map feeds the
    // group-slot substitution; a Project that is anything else (a
    // subquery's own computed columns) refuses the shape.
    val (expandOpt, substs, belowAgg) = strip(agg.child) match {
      case e: Expand => strip(e.child) match {
        case p @ Project(ps, pc) if ps.forall {
          case _: AttributeReference => true
          case Alias(ae, _) => ae.deterministic
          case _ => false
        } =>
          val m = ps.collect { case al @ Alias(ae, _) => al.exprId -> ae }
          (Some(e), m.toMap, strip(pc))
        case other => (Some(e), Map.empty[ExprId, Expression], other)
      }
      case other => (None, Map.empty[ExprId, Expression], other)
    }
    val (filterOpt, from) = belowAgg match {
      case Filter(cond, c) => (Some(cond), c)
      case other => (None, other: LogicalPlan)
    }
    flatten(from).flatMap { case (leaves, conds) =>
      val cats = leaves.map(_._1)
      // One catalog (the discovery index and the stored spec are
      // catalog-local), each table at most once (a self-join's alias
      // assignment is ambiguous — never guess).
      val keys = leaves.map(_._2)
      if (cats.exists(_.name() != cats.head.name())) None
      else if (keys.distinct.size != keys.size) None
      else Some(Shape(filterOpt, cats.head,
        leaves.map(l => l._2 -> l._3), conds, expandOpt, substs))
    }
  }

  // -- candidate discovery ---------------------------------------------------

  private def currentVersion(k: String): Long = {
    val st = SnapshotStore.stateOf(k)
    if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
  }

  /** catalog name → (builtAtMillis, factKey → MV identifiers). The
    * DISCOVERY index: which tables are MVs and what fact each folds —
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
    // A WHOLESALE listing failure must not be cached: one transient
    // namespace-listing error would otherwise disable rewrite for every
    // table of the catalog for a full TTL window. Per-table resolution
    // errors (view claim dirs, concurrent drops) stay best-effort — they
    // skip the entry, never the build.
    var failed = false
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
      } catch { case _: Exception => failed = true; Map.empty }
    if (!failed && generation.get() == genAtStart) index.put(name, (now, built))
    built
  }

  /** Every MV of `cat` whose FACT is `factKey`, with its CURRENT state —
    * resolved fresh per query (the index only names candidates; every
    * gate below re-validates against live metadata). Listing errors
    * (view claim dirs, concurrent drops) skip the entry. */
  private def candidates(cat: SnapshotCatalog, factKey: String): Seq[Cand] =
    indexOf(cat).getOrElse(factKey, Vector.empty).flatMap { id =>
      val k = SnapshotStore.keyOf(cat.name(),
        id.namespace().toSeq :+ id.name())
      try {
        SnapshotStore.resolve(k)
          .filter(st => MaterializedViews.isMv(st.properties))
          .filter(st => SnapshotStore.keyOf(cat.name(),
            MaterializedViews.baseParts(st.properties)) == factKey)
          .map { st =>
            val (dimsL, conds) = MaterializedViews.dimsOf(st.properties)
            Cand(id, k, st,
              MaterializedViews.colsFromJson(st.properties(PropCols)),
              factKey, dimsL.map(d => SnapshotStore.keyOf(cat.name(), d)),
              conds, MaterializedViews.dimVersionsOf(st.properties))
          }
      } catch { case _: Exception => None }
    }

  // -- matching --------------------------------------------------------------

  private def tryRewrite(spark: SparkSession, agg: Aggregate,
      memo: mutable.HashMap[String, Seq[Cand]]): Option[LogicalPlan] = {
    if (agg.groupingExpressions.isEmpty) return None // global aggregate: the
    // MV contract requires a GROUP BY, and an empty-base global agg must
    // yield its one default row — never rewritable from a keyed view.
    val shape = destructure(agg) match {
      case Some(s) => s
      case None => return None
    }
    val queryKeys = shape.rels.map(_._1).toSet
    // The discovery index is keyed by FACT — any of the query's tables
    // could be a candidate's fact, so probe each.
    val cands = shape.rels.map(_._1)
      .flatMap(k => memo.getOrElseUpdate(k, candidates(shape.cat, k)))
    if (cands.isEmpty) return None
    val topUpOn = spark.sessionState.conf
      .getConfString(TopUpKey, "true").toBoolean
    val eligible = cands.iterator
      .filter { c =>
        // TABLE-SET gate: the MV materialized exactly the query's join —
        // {fact} ∪ dims = the query's tables, each appearing once (a spec
        // with a repeated table cannot be alias-assigned unambiguously).
        val specKeys = c.factKey +: c.dimKeys
        specKeys.distinct.size == specKeys.size &&
          specKeys.toSet == queryKeys && specKeys.size == shape.rels.size
      }
      .filter { c =>
        val props = c.state.properties
        val mvCurrent =
          if (c.state.snapshots.isEmpty) 0L else c.state.snapshots.last.version
        !props.contains(PropPending) &&
          // STAR freshness: every dimension watermark must equal its
          // dimension's current version — stored rows joined a PINNED dim
          // snapshot, and a moved dim invalidates every group.
          c.dimKeys.zip(c.dimVersions).forall { case (dk, dv) =>
            currentVersion(dk) == dv } &&
          c.dimKeys.size == c.dimVersions.size &&
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
      // Freshness decides the SERVING SHAPE: an up-to-date watermark
      // serves the pinned view directly; a merely-STALE MV (single-table
      // or star — dims proved fresh above) serves view ∪ signed-fold of
      // the missed change range (the delta TOP-UP — O(|groups| + changed
      // rows ⋈ pinned dims), never the fact scan). None = unservable.
      // Fresh candidates sort first: a direct view scan beats an inline
      // fold.
      .flatMap { c =>
        val baseV = currentVersion(c.factKey)
        c.state.properties.get(PropBaseVersion).map(_.toLong) match {
          case Some(b) if b == baseV =>
            Some((c, true, None: Option[(Long, Long)],
              () => mvRelation(shape.cat, c): LogicalPlan))
          case Some(b) if b < baseV && topUpOn &&
              // Extrema and sketch MVs cannot top-up: a delete in the
              // missed range needs the refresh's affected-group
              // recompute, which writes nothing here. (Star MVs CAN: the
              // gates above proved every dim still sits at its
              // watermark, so the inline fold joins them AS OF exactly
              // like refresh.)
              !c.cols.exists(mc => mc.kind == "min" || mc.kind == "max" ||
                mc.kind == "hll" || mc.kind == "approx_distinct") &&
              changesRangeLive(c.factKey, b, baseV) =>
            Some((c, false, Some((b, baseV)): Option[(Long, Long)],
              () => MaterializedViews.topUpFrame(
                spark, shape.cat.name(),
                c.ident.namespace().toSeq :+ c.ident.name(),
                c.state, b, baseV).queryExecution.analyzed))
          case _ => None
        }
      }
      .toSeq.sortBy(t => !t._2)
    eligible.iterator
      .flatMap { case (c, _, topUp, relPlan) =>
        matchOne(spark, agg, shape, c, topUp, relPlan) }
      .nextOption()
  }

  /** ADVICE (r17): the coarser-group avg rewrite re-adds the stored
    * long partials in DOUBLE — exact (and therefore equal to the
    * un-rewritten plan, whose own Average also accumulates in double)
    * only while every absolute mass involved stays under 2^53. This
    * PROVES it from manifest metadata before serving: the total
    * absolute mass each side can accumulate is bounded by
    * Σ_files rows × max(|min|,|max|) over (the MV's hidden-sum column,
    * the base's measure column, and — for a top-up serve — the files of
    * the missed snapshot range, whose rows the inline fold re-adds).
    * Any missing piece (no stats, non-column measure, unknown file)
    * vetoes the double path — the exact shape still serves, coarser
    * shapes take the base: never wrong, just unoptimized. */
  private def doubleAvgServable(spark: SparkSession, cand: Cand,
      sumA: Attribute, measureSql: String,
      topUp: Option[(Long, Long)]): Boolean = {
    if (sumA.dataType != org.apache.spark.sql.types.LongType) return false
    val Exact = (1L << 53).toDouble
    def massOf(files: Seq[SnapshotStore.DataFile], fid: Int): Option[Double] = {
      var total = 0.0
      files.foreach { f =>
        f.stats.get(fid) match {
          case Some(cs) if cs.min == null && cs.nulls == f.rowCount => ()
          case Some(cs) if cs.min != null && cs.max != null =>
            val mx = math.max(cs.min.asInstanceOf[Number].longValue.toDouble.abs,
              cs.max.asInstanceOf[Number].longValue.toDouble.abs)
            total += mx * f.rowCount + f.rowCount // + rows: the count side
          case _ => return None
        }
      }
      Some(total)
    }
    def fidOf(schema: org.apache.spark.sql.types.StructType,
        name: String): Option[Int] =
      schema.fields.find(_.name.equalsIgnoreCase(name)).flatMap(FieldIds.idOf)
    // The measure must be a BARE column of a SINGLE-TABLE body to bound
    // the un-rewritten side from the base's manifests (star bodies
    // veto: join fan-out replicates fact rows, so no per-table manifest
    // bounds the joined mass; computed measures have no single-column
    // stats). Veto = the coarser double path falls back to the base —
    // never wrong, just unoptimized.
    val measureCol = try {
      spark.sessionState.sqlParser.parseExpression(measureSql) match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if u.nameParts.sizeIs == 1 && cand.dimKeys.isEmpty =>
          Some(u.nameParts.head)
        case _ => None
      }
    } catch { case _: Exception => None }
    val bound = for {
      mCol <- measureCol
      sumFid <- fidOf(cand.state.schema, sumA.name)
      viewMass <- massOf(cand.state.currentFiles, sumFid)
      baseSt = SnapshotStore.stateOf(cand.factKey)
      baseFid <- fidOf(baseSt.schema, mCol)
      baseMass <- massOf(baseSt.currentFiles, baseFid)
      rangeMass <- topUp match {
        case None => Some(0.0)
        case Some((b, c)) =>
          // The top-up re-adds change rows of (b, c]; every such row
          // lives in a file of snapshots [b, c] (deletes diff against
          // the predecessor), so their union bounds the folded mass.
          val files = baseSt.snapshots
            .filter(s => s.version >= b && s.version <= c)
            .flatMap(_.files).groupBy(_.path).map(_._2.head).toSeq
          massOf(files, baseFid)
      }
    } yield viewMass + baseMass + rangeMass
    bound.exists(_ < Exact)
  }

  /** Lazily-built substituted relation: plan construction (especially the
    * top-up's nested analysis) only happens for a candidate that reaches
    * output matching. */
  private type RelPlan = () => LogicalPlan

  /** Whether the base's snapshot list still covers `(b, c]` contiguously
    * — the range the top-up's `.changes` read replays — AND the
    * PREDECESSOR snapshot `b` when the first missed commit needs it:
    * every non-append commit's change rows diff against the snapshot
    * before it ([[ChangeLog.changePartitions]] fails loudly on an
    * expired predecessor), and only commit `b+1`'s predecessor lies
    * outside the range. An unreadable range simply never offers the
    * top-up (the base serves) — never a query that errors at execution. */
  private def changesRangeLive(baseKey: String, b: Long, c: Long): Boolean = {
    val sns = SnapshotStore.stateOf(baseKey).snapshots
    val inRange = sns.filter(s => s.version > b && s.version <= c)
    inRange.size == (c - b) &&
      inRange.headOption.exists(_.version == b + 1) &&
      inRange.lastOption.exists(_.version == c) &&
      (b == 0L || inRange.head.operation == "append" ||
        sns.exists(_.version == b))
  }

  /** Split a conjunction into its conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Order-insensitive canonical key of a join conjunct: equality
    * operands commute, so both sides sort. */
  private def condKey(e: Expression): String = e match {
    case EqualTo(l, r) => Seq(l.sql, r.sql).sorted.mkString(" = ")
    case EqualNullSafe(l, r) => Seq(l.sql, r.sql).sorted.mkString(" <=> ")
    case other => other.sql
  }

  private def matchOne(spark: SparkSession, agg: Aggregate,
      shape: Shape, cand: Cand, topUp: Option[(Long, Long)],
      relPlan: RelPlan): Option[LogicalPlan] = {
    val filterOpt = shape.filter

    /** Canonical SQL under the spec's stored aliases: single-table specs
      * store qualifier-STRIPPED expressions; star specs store `f`/`d0`/…
      * qualified ones (fact and dims routinely share column names). A
      * query attribute owned by none of the matched scans (correlation,
      * metadata column) canonicalizes to None — every lookup below just
      * fails and the base serves. */
    val canon: Expression => Option[String] =
      if (cand.dimKeys.isEmpty) e => Some(unq(e))
      else {
        val aliasOfKey: Map[String, String] =
          ((cand.factKey -> FactAlias) +:
            cand.dimKeys.zipWithIndex.map { case (k, i) => k -> dimAlias(i) }).toMap
        val owner: Map[ExprId, String] = shape.rels.flatMap { case (k, r) =>
          val a = aliasOfKey(k)
          r.output.map(_.exprId -> a)
        }.toMap
        e => {
          var ok = true
          val t = e.transform {
            case a: AttributeReference => owner.get(a.exprId) match {
              case Some(q) => a.withQualifier(Seq(q))
              case None => ok = false; a
            }
          }
          if (ok) Some(t.sql) else None
        }
      }

    // JOIN accounting (star specs): the query's ON conjuncts must equal
    // the spec's as a MULTISET — an extra condition means the query sees
    // fewer join rows than the MV materialized, a missing one means more;
    // both are silently-wrong answers, so both veto.
    if (cand.dimKeys.isEmpty) {
      if (shape.conds.nonEmpty) return None
    } else {
      val parser = spark.sessionState.sqlParser
      val specCs = cand.joinConds
        .flatMap(s => conjuncts(parser.parseExpression(s))).map(condKey)
      // Query side: canonicalize each conjunct's operand SQL under the
      // stored aliases (the same rendering [[condKey]] applies to the
      // re-parsed spec side), commuting equality operands.
      val queryCs = shape.conds.flatMap(conjuncts).map { e =>
        if (!e.deterministic) return None
        val key = e match {
          case EqualTo(l, r) =>
            for { a <- canon(l); b <- canon(r) }
              yield Seq(a, b).sorted.mkString(" = ")
          case EqualNullSafe(l, r) =>
            for { a <- canon(l); b <- canon(r) }
              yield Seq(a, b).sorted.mkString(" <=> ")
          case other => canon(other)
        }
        key.getOrElse(return None)
      }
      if (queryCs.sorted != specCs.sorted) return None
    }

    // WHERE accounting: residual = query conjuncts not consumed by the
    // MV's stored predicate; None = unaccountable, no rewrite.
    val mvWhere = cand.state.properties.get(PropWhere)
    val residual: Seq[Expression] = (filterOpt, mvWhere) match {
      case (None, None) => Nil
      case (None, Some(_)) => return None // MV sees fewer rows than the query
      case (Some(cond), None) => conjuncts(cond)
      case (Some(cond), Some(w)) =>
        if (canon(cond).contains(w)) Nil
        else {
          val (consumed, rest) = conjuncts(cond).partition(c =>
            canon(c).contains(w))
          if (consumed.isEmpty) return None
          rest
        }
    }

    // The substituted relation: the MV pinned at its validated snapshot,
    // or the stale candidate's inline top-up plan (same output schema).
    val rel = relPlan()
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
    val minBySql: Map[String, Attribute] = cand.cols.collect {
      case c if c.kind == "min" => attr(c.out).map(c.expr -> _)
    }.flatten.toMap
    val maxBySql: Map[String, Attribute] = cand.cols.collect {
      case c if c.kind == "max" => attr(c.out).map(c.expr -> _)
    }.flatten.toMap
    // avg serves from (stored value, hidden sum, hidden count): exact
    // shapes read the value; coarser shapes re-derive Σsum/Σcount.
    val avgBySql: Map[String, (Attribute, Attribute, Attribute)] =
      cand.cols.collect {
        case c if c.kind == "avg" =>
          for {
            a <- attr(c.out)
            s <- attr(MaterializedViews.avgSumCol(c.out))
            n <- attr(MaterializedViews.avgCntCol(c.out))
          } yield c.expr -> ((a, s, n))
      }.flatten.toMap
    // approx_count_distinct serves from (stored estimate, hidden HLL
    // sketch): exact shapes read the value; coarser shapes union the
    // group sketches and re-estimate — the re-aggregable distinct count
    // min/max/sum never give you.
    val approxBySql: Map[String, (Attribute, Attribute)] =
      cand.cols.collect {
        case c if c.kind == "approx_distinct" =>
          for {
            a <- attr(c.out)
            s <- attr(MaterializedViews.hllCol(c.out))
          } yield c.expr -> ((a, s))
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
      else canon(e).flatMap(groupBySql.get) match {
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
        def serveWith(reAgg: Attribute => AggregateFunction)(
            a: Attribute): Expression = {
          val v: Expression =
            if (exact) a else reAgg(a).toAggregateExpression()
          castTo(v, ae.dataType)
        }
        def serve(a: Attribute): Expression = serveWith(Sum(_))(a)
        ae.aggregateFunction match {
          case c: Count if c.children.sizeIs == 1 =>
            c.children.head match {
              case l: Literal if l.value != null => countStar.map(serve)
              case _: Literal => None // count(NULL): constant 0, not stored
              case arg => canon(arg).flatMap(countBySql.get).map(serve)
            }
          case s: Sum => canon(s.child).flatMap(sumBySql.get).map(serve)
          // min/max are distributive over a partition of the groups:
          // the minimum of stored group minima IS the coarser minimum
          // (NULL minima — all-null groups — skip, like min itself).
          case m: Min => canon(m.child).flatMap(minBySql.get)
            .map(serveWith(Min(_)))
          case m: Max => canon(m.child).flatMap(maxBySql.get)
            .map(serveWith(Max(_)))
          case h: HyperLogLogPlusPlus if h.relativeSD == 0.05 =>
            // The stored estimator is the datasketches sketch's (an
            // approximate aggregate has no defined exact value — the MV
            // contract, documented at CREATE). Coarser shapes union the
            // per-group sketches: distinct counts are NOT summable, but
            // sketches are union-mergeable — the whole point of storing
            // them. A custom relativeSD falls through to the base (the
            // stored sketch has one precision).
            canon(h.child).flatMap(approxBySql.get).map {
              case (valueA, sketchA) =>
                if (exact) castTo(valueA, ae.dataType)
                else castTo(Coalesce(Seq(
                  HllSketchEstimate(
                    new HllUnionAgg(sketchA).toAggregateExpression()),
                  Literal(0L))), ae.dataType)
            }
          case a: Average =>
            canon(a.child).flatMap { mSql =>
              avgBySql.get(mSql).flatMap { case (avgA, sumA, cntA) =>
                if (exact) Some(castTo(avgA, ae.dataType))
                else if (ae.dataType == DoubleType &&
                    doubleAvgServable(spark, cand, sumA, mSql, topUp))
                  // Σsum/Σcount in double — the exact long sums cast
                  // late, PROVEN exact (and hence equal to the base
                  // plan's own double accumulation) by the manifest
                  // mass bound in [[doubleAvgServable]]. A group with
                  // count 0 contributes a NULL stored sum (the nn
                  // witness), so all-null rollups stay NULL.
                  Some(Divide(
                    castTo(Sum(sumA).toAggregateExpression(), DoubleType),
                    castTo(Sum(cntA).toAggregateExpression(), DoubleType)))
                else None // decimal avg: replicating Average's decimal
                // division/rounding bitwise is not worth a wrong hash —
                // the exact shape serves, coarser shapes take the base.
                // Unprovable double mass: same fallback.
              }
            }
          case _ => None // first/UDAF/… : not in the stored rollup
        }
      case other =>
        canon(other).flatMap(groupBySql.get) match {
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

    // ROLLUP/CUBE/GROUPING SETS (`Aggregate → Expand`): keep the Expand —
    // its projections replicate INPUT rows once per grouping set with the
    // non-grouped slots nulled — but feed it |groups| STORED rows instead
    // of the base: every grouping set's aggregate is then the same
    // distributive re-aggregation of partials the flat subsumption path
    // serves (the MV holds EVERY group, so each set's re-add is exact),
    // and the grouping-id column keeps telling an Expand-null from a real
    // NULL group value exactly as it does over the base.
    shape.expand.foreach { ex =>
      // The canonical analyzer shape: the original child columns pass
      // through first, then one slot per GROUP EXPRESSION (nulled in the
      // sets that exclude it), then the grouping-id literal. The group
      // count comes from the Aggregate (its keys are the group attrs +
      // the id); the slot values reference the alias-Project's COPIES,
      // substituted back to base expressions before matching.
      val nGroups = agg.groupingExpressions.size - 1
      val passN = ex.output.size - 1 - nGroups
      if (nGroups < 0 || passN < 0) return None
      val gidAttr = ex.output.last
      val groupAttrs = ex.output.slice(passN, ex.output.size - 1)
      if (ex.child.output.size < passN ||
          ex.output.take(passN).map(_.exprId) !=
            ex.child.output.take(passN).map(_.exprId)) return None
      if (!ex.projections.forall(_.size == ex.output.size)) return None
      val keepIds = (groupAttrs :+ gidAttr).map(_.exprId).toSet
      if (!agg.groupingExpressions.forall {
        case a: Attribute => keepIds(a.exprId)
        case _ => false
      }) return None
      def subst(e: Expression): Expression = e.transform {
        case a: AttributeReference =>
          shape.substs.get(a.exprId).getOrElse(a)
      }
      // One SOURCE expression per group slot (its un-nulled value,
      // identical across every set that includes it) — each must map
      // onto the stored group columns.
      val sources: Seq[Expression] = groupAttrs.indices.map { j =>
        val vals = ex.projections.map(_(passN + j)).filter {
          case l: Literal => l.value != null
          case _ => true
        }.distinct
        if (vals.size != 1) return None
        vals.head
      }
      val mappedSources = sources.map(s => mapScalar(subst(s)))
      if (!mappedSources.forall(_.isDefined)) return None
      val mappedResidualR = residual.map(mapScalar)
      if (!mappedResidualR.forall(_.isDefined)) return None
      val child = mappedResidualR.flatten
        .reduceOption(And).map(Filter(_, rel)).getOrElse(rel: LogicalPlan)
      val newProjections = ex.projections.map { p =>
        val groupSlots = groupAttrs.indices.map { j =>
          p(passN + j) match {
            case l: Literal if l.value == null => l: Expression
            case v if v.semanticEquals(sources(j)) => mappedSources(j).get
            case _ => return None
          }
        }
        (rel.output: Seq[Expression]) ++ groupSlots :+ p.last
      }
      val newExpand = Expand(newProjections,
        rel.output ++ groupAttrs :+ gidAttr, child)
      // Outputs: group/gid attrs pass (same exprIds through the new
      // Expand); aggregates re-aggregate the stored partials (always the
      // subsumption form — Expand means re-grouping); grouping()/
      // grouping_id() resolved to bit-ops over the gid attr pass with it.
      def mapOut(e: Expression): Option[Expression] =
        if (!e.deterministic) None
        else e match {
          case a: Attribute =>
            if (keepIds(a.exprId)) Some(a) else None
          case ae: AggregateExpression => mapValue(ae, exact = false)
          case l: Literal => Some(l)
          case o if o.children.isEmpty => Some(o)
          case o =>
            val kids = o.children.map(mapOut)
            if (kids.forall(_.isDefined))
              Some(o.withNewChildren(kids.map(_.get)))
            else None
        }
      val mappedOuts = agg.aggregateExpressions.map { out =>
        val (inner, name, id) = out match {
          case al @ Alias(e, n) => (e, n, al.exprId)
          case e: NamedExpression => (e: Expression, e.name, e.exprId)
        }
        mapOut(inner).map {
          case a: Attribute if a.exprId == id => a: NamedExpression
          case m => Alias(m, name)(exprId = id)
        }
      }
      if (!mappedOuts.forall(_.isDefined)) return None
      return Some(agg.copy(aggregateExpressions = mappedOuts.flatten,
        child = newExpand))
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
