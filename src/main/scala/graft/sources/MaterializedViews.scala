package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, HllSketchAgg, HyperLogLogPlusPlus, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, DecimalType, IntegerType, LongType, ShortType, StringType, StructField, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** DECLARATIVE MATERIALIZED VIEWS over the snapshot catalog — the derived-
  * data surface a warehouse serves dashboards from. An MV is a CATALOG
  * TABLE (so reads get scan pushdown, manifest statistics, time travel of
  * every refresh, and zero per-query recomputation — the point of
  * materializing) whose definition and freshness ride in its table
  * properties, durable across sessions like every other table property:
  *
  *   - `CREATE MATERIALIZED VIEW cat.ns.v AS <group-by body>` validates
  *     the body is INCREMENTALLY MAINTAINABLE (below), creates the
  *     backing table, materializes the body once, and records the base
  *     snapshot version the contents reflect;
  *   - `CALL cat.system.refresh_mv(table => 'ns.v')` (or `REFRESH
  *     MATERIALIZED VIEW`) folds the base table's `.changes` rows between
  *     the recorded version and the current one into the stored view with
  *     ONE `MERGE INTO` — O(changed rows) work, never an O(base) rescan;
  *   - `DROP MATERIALIZED VIEW` drops the backing table.
  *
  * MAINTAINABILITY CONTRACT (checked loudly at CREATE): the body is one
  * `SELECT <group exprs + aggregates> FROM <this-catalog table>
  * [INNER JOIN <dim tables> ON …] [WHERE deterministic-predicate] GROUP
  * BY <exprs>` where every GROUP BY expression is selected (the stored
  * view must hold the whole key), the
  * aggregates are `count(*)` / `count(col)` / `sum(col)` (the
  * distributive set a signed change feed maintains EXACTLY — see
  * [[graft.operators.IncrementalMaintenance]] for the algebra), one
  * `count(*)` is present (group death is undecidable without the stored
  * row count), `sum` inputs are integral or decimal (double addition is
  * order-dependent: the MV could not stay hash-exact against a
  * recompute), and a NULLABLE sum input also selects `count(<same
  * expr>)` (the stored sum must return to NULL when the last non-null
  * row leaves the group, which only its non-null count can witness).
  * min/max/avg/DISTINCT are rejected with guidance: they are not
  * incrementally maintainable from deltas alone (min/max need the full
  * group to survive a delete; avg = stored sum/count in a plain view).
  *
  * EXACTNESS: every delta the feed serves is folded by type-widened
  * addition of the same values a from-scratch recompute would aggregate,
  * and decimal/integer addition is associative + commutative — so after
  * any refresh the MV is HASH-IDENTICAL to re-running the body (the r03
  * gate). Copy-on-write rewrites surface file-grain DELETE+INSERT pairs
  * whose contributions cancel; group-moving updates split into
  * −old/+new rows naturally (m17's argument, generalized to arbitrary
  * key/measure lists).
  *
  * CRASH SAFETY: a refresh is two commits (the MERGE on the MV table,
  * then the watermark property update), so the watermark protocol is
  * write-ahead: the target base version is CLAIMED in `mv.pending-base`
  * (atomic metadata commit) before the MERGE, and finalized after. A
  * crash between leaves the claim behind; the next refresh refuses
  * loudly, and `recover => true` resolves it by VERSION MATH — the MV's
  * snapshot version advanced past `mv.self-version` iff the MERGE
  * landed, so recovery either finalizes (no re-apply: deltas are NOT
  * idempotent) or clears the claim and re-runs. Concurrent refreshes of
  * one MV are excluded by the atomic claim.
  *
  * STAR BODIES (fact ⋈ dims): the LEFT-MOST table is the FACT — the one
  * whose `.changes` refresh folds; every other INNER-joined table is a
  * DIMENSION, recorded with its own snapshot watermark. Refresh joins
  * the bounded fact changes to the dimensions PINNED `AS OF` those
  * watermarks (a dim commit landing mid-refresh cannot corrupt the
  * fold). A dimension that ADVANCED folds incrementally too (round 18):
  * an inner join is MULTILINEAR in its inputs, so the joined delta
  * telescopes into one signed term per advanced input —
  * `Δ(f ⋈ d0 ⋈ …) = Δf ⋈ d@old + Σᵢ f@new ⋈ d₍<ᵢ₎@new ⋈ Δdᵢ ⋈ d₍>ᵢ₎@old`
  * — and every star aggregate (count/sum/avg; extrema are rejected at
  * CREATE) is linear in signed multiplicities, so attribute-only dim
  * updates, join-key-moving dim updates, and dim deletes all fold
  * EXACTLY with no affected-group recompute. Each dim term reduces the
  * dim's changes to net multiplicities over the columns the view reads
  * (an update touching only unread columns cancels → no work at all)
  * and joins them to the fact pruned by the affected join keys — never
  * an O(fact) rebuild. Star expressions are canonicalized under the
  * refresh aliases `f`/`d0`/… (fact and dims routinely share column
  * names). Outer joins, cross joins, and pinned (`AS OF`) body
  * relations are rejected at CREATE with the reason.
  *
  * Scale: refresh work is O(changed rows) aggregation (shuffled once on
  * the group key) + one key-equi MERGE join of |view| + |changed groups|
  * — the 100 TB fact table is touched only through its change feed's
  * pruned file diffs; a star's dimension joins broadcast dimension-sized
  * sides against those bounded changes. Reads are plain catalog scans of
  * a table that is |groups| rows.
  */
private[graft] object MaterializedViews {

  /** The ORIGINAL body SQL — presence marks a table as an MV. */
  val PropSql = "mv.sql"
  /** Base table's catalog-local identifier parts as a JSON array (a
    * dot-joined string would corrupt dotted part names). */
  val PropBase = "mv.base"
  /** Optional WHERE predicate (qualifier-stripped SQL). */
  val PropWhere = "mv.where"
  /** JSON column plan: `[{out, kind, expr, nn?}]` in output order. */
  val PropCols = "mv.cols"
  /** Base snapshot version the stored contents reflect (the staleness
    * surface: compare with the base's current version). */
  val PropBaseVersion = "mv.base-version"
  /** MV snapshot version right after the last refresh's MERGE — the
    * crash-recovery witness (see protocol above). */
  val PropSelfVersion = "mv.self-version"
  /** Write-ahead claim of an in-flight refresh's target base version. A
    * FULL rebuild's claim is prefixed [[FullClaim]] — its crash
    * resolution differs (rebuild, never version-math finalize). */
  val PropPending = "mv.pending-base"

  /** Claim prefix marking a full rebuild (see [[refreshFull]]). */
  val FullClaim = "full:"

  /** Incremental-refresh claim codec: `<baseV>` when only the fact
    * advanced (the legacy form), `<baseV>:<dimV0>,<dimV1>,…` when the
    * refresh also folds dimension deltas — recovery's version-math
    * finalize must then stamp the SAME dim watermarks the crashed MERGE
    * folded toward, or the next refresh would re-fold the dim range. */
  private[sources] def claimOf(c: Long, dimTargets: Option[Seq[Long]]): String =
    dimTargets.fold(c.toString)(ds => s"$c:${ds.mkString(",")}")

  private[sources] def parseClaim(p: String): (Long, Option[Seq[Long]]) = {
    val i = p.indexOf(':')
    if (i < 0) (p.toLong, None)
    else (p.substring(0, i).toLong, Some(
      p.substring(i + 1).split(',').toSeq.filter(_.nonEmpty).map(_.toLong)))
  }

  /** Instrumentation (test-read, like
    * [[DeletionVectors.driverFoldFiles]]): planned fact-scan partitions
    * of the last [[refresh]]'s DIM-delta folds. -1 = the refresh folded
    * no dim delta; 0 = every advanced dim's projected delta CANCELLED
    * (an update touching only columns the view never reads), so the
    * fact was not scanned at all; otherwise the post-pushdown partition
    * count of the key-pruned fact scans — the r09 gate pins this stays
    * at the files holding the affected join keys, not the table. */
  val lastDimFoldFactPartitions = new java.util.concurrent.atomic.AtomicLong(-1L)

  /** Net-multiplicity column of a reduced dimension delta (reserved like
    * the avg-constituent namespace; collision with a real dim column is
    * rejected at CREATE by the `__` guard only for outputs — the name is
    * obscure enough to document rather than gate). */
  private val DimNetCol = "__graft_dnet"

  /** IN-list pruning cap: past this many affected join keys the fact
    * filter is dropped (the join still bounds the semantics; only file
    * pruning is lost, and a huge IN list would bloat the plan). */
  private val MaxPruneKeys = 1000

  /** STAR-schema MV properties: the dimension tables + join conditions
    * (`{"bases": [[parts…]…], "conds": [sql…]}`) and the dimension
    * snapshot versions the stored contents reflect (JSON long array,
    * parallel to `bases`). Present only on join bodies. */
  val PropDims = "mv.dims"
  val PropDimVersions = "mv.dim-versions"

  /** Refresh-time aliases the stored star expressions are qualified by:
    * the fact's change feed is `f`, dimensions are `d0`, `d1`, … in body
    * join order. */
  val FactAlias = "f"
  def dimAlias(i: Int): String = s"d$i"

  /** Derived-constituent column names for an `avg` output: the backing
    * table stores the avg VALUE (the body's visible schema) plus these
    * two hidden columns the fold maintains (avg itself is not
    * incrementally foldable; its sum/count are) — the same extra-
    * aggregate requirement Oracle's fast-refreshable MVs impose, here
    * synthesized automatically. */
  def avgSumCol(out: String): String = s"__${out}_sum"
  def avgCntCol(out: String): String = s"__${out}_cnt"

  /** Hidden HLL-sketch constituent of an `approx_count_distinct` output
    * (kind `approx_distinct`): the backing table stores the visible
    * ESTIMATE plus this mergeable datasketches-HLL binary the fold
    * unions — the BigQuery/Snowflake pattern (sketch partials per group,
    * re-unionable on coarser re-aggregation). The stored estimator is
    * the SKETCH's, not HyperLogLog++: an approximate aggregate has no
    * defined exact value, and one canonical estimator is what keeps
    * CREATE, refresh, and rewrite bit-identical to each other. */
  def hllCol(out: String): String = s"__${out}_hll"

  /** One output column of the MV. `kind`: `group` | `count_star` |
    * `count` | `sum` | `avg` | `min` | `max`. `expr` is the defining
    * expression's canonical SQL —
    * qualifier-stripped for single-table bodies, qualified by the
    * refresh aliases (`f`/`d0`/…) for star bodies — re-parsed against
    * the changes frame at every refresh (a dropped base column fails
    * loudly, never serves stale deltas). `nn` (sums over nullable inputs
    * only) names the sibling `count(<expr>)` output that witnesses the
    * all-null-group case. */
  final case class MvCol(out: String, kind: String, expr: String,
      nn: Option[String] = None)

  /** `base` is the FACT — the table whose `.changes` refresh folds. A
    * STAR body additionally carries `dims` (the other joined tables, in
    * join order) and `joinConds` (every ON condition, conjoined at
    * refresh); expressions of a star spec are canonicalized with the
    * refresh-time aliases `f`/`d0`/`d1`/… as qualifiers (fact and dims
    * routinely share column names — a qualifier-stripped form would be
    * ambiguous or silently wrong). */
  final case class Spec(base: Seq[String], where: Option[String],
      cols: Seq[MvCol], dims: Seq[Seq[String]] = Nil,
      joinConds: Seq[String] = Nil,
      /** CREATE-time materialization of avg constituents: the RESOLVED
        * hidden aggregate expressions (appended to the body's Aggregate
        * when first materializing) and the backing-table fields they
        * land in, parallel to the trailing `avg`-constituent entries of
        * `cols`. Never serialized — refresh re-derives from `cols`. */
      hidden: Seq[(NamedExpression, StructField)] = Nil)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"CREATE MATERIALIZED VIEW: $msg")

  private[sources] def unq(e: Expression): String =
    e.transform {
      case a: AttributeReference => a.withQualifier(Nil)
    }.sql

  /** REFRESH STABILITY: every stored expression re-evaluates at each
    * refresh over the change feed, so beyond determinism-per-row it must
    * evaluate the SAME on the same row FOREVER. Subqueries re-read their
    * (possibly changed) inner table, and current_date/current_timestamp
    * move between refreshes — both are `deterministic` by Catalyst's
    * definition and both would silently diverge the MV from a recompute. */
  private def requireRefreshStable(e: Expression, what: String): Unit = {
    if (!e.deterministic) fail(s"$what ${unq(e)} must be deterministic")
    // (Messages render `what` only: a subquery expression's .sql can
    // itself throw on unresolved-plan fragments.)
    e.foreach {
      case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        fail(s"$what contains a subquery: refresh would re-read the " +
          "inner table's CURRENT contents against rows materialized " +
          "under its OLD contents — join the table in a plain VIEW over " +
          "the MV instead")
      case t if t.nodeName == "CurrentDate" || t.nodeName == "CurrentTimestamp" ||
          t.nodeName == "Now" || t.nodeName == "LocalTimestamp" ||
          t.nodeName == "CurrentTimeZone" =>
        fail(s"$what depends on evaluation time (${t.nodeName}): each " +
          "refresh would gate change rows by a DIFFERENT instant than " +
          "the stored rows were gated by — bake a literal timestamp " +
          "into the body instead")
      case _ => ()
    }
  }

  /** Validate an ANALYZED body plan against the maintainability contract
    * and extract the refresh plan. Every rejection names what to change. */
  def extract(catalogName: String, body: LogicalPlan): Spec = {
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => strip(c)
      case other => other
    }
    val shapeMsg = "a materialized view body must be SELECT <group " +
      "expressions and count(*)/count(col)/sum(col) aggregates> FROM " +
      "<one table of the same snapshot catalog, optionally INNER-joined " +
      "to dimension tables of that catalog> [WHERE <deterministic " +
      "predicate>] GROUP BY <expressions> — for anything richer, CREATE " +
      "VIEW (recomputed per query) over one or more MVs"
    strip(body) match {
      case Aggregate(groupExprs, aggExprs, child, _) =>
        val (whereOpt, rel) = strip(child) match {
          case Filter(cond, c) => (Some(cond), strip(c))
          case other => (None, other)
        }
        // FROM: one relation, or a tree of INNER joins (a STAR body). The
        // LEFT-MOST table is the FACT — the one whose `.changes` refresh
        // folds; every other leaf is a DIMENSION, held FIXED between
        // refreshes (a dim that advanced forces a loud full rebuild).
        def flatten(p: LogicalPlan):
            (Seq[DataSourceV2Relation], Seq[Expression]) = strip(p) match {
          case j: Join =>
            if (j.joinType != Inner) fail(
              s"${j.joinType.sql} JOIN in the body: only INNER joins are " +
                "incrementally maintainable (an outer side's NULL-padded " +
                "rows depend on the whole other side, not on a row delta)")
            val cond = j.condition.getOrElse(fail(
              "JOIN without an ON condition: a cross join's delta is the " +
                "whole other table — join on keys, or CREATE VIEW instead"))
            val (lr, lc) = flatten(j.left)
            val (rr, rc) = flatten(j.right)
            (lr ++ rr, (lc ++ rc) :+ cond)
          case d: DataSourceV2Relation => (Seq(d), Nil)
          case other => fail(s"$shapeMsg (the FROM resolved to " +
            s"${other.nodeName}, not a single catalog table)")
        }
        val (rels, joinCondExprs) = flatten(rel)
        val idents = rels.map { r =>
          r.catalog match {
            case Some(c: SnapshotCatalog) if c.name() == catalogName => ()
            case _ => fail("every table in the body must live in the SAME " +
              s"snapshot catalog as the materialized view ($catalogName) — " +
              "the fact's change feed is what refresh folds, joined to " +
              "the catalog's dimension snapshots")
          }
          r.table match {
            case m: MemTable if m.isLiveHead => ()
            case _ => fail("the body must read LIVE table heads — a " +
              "VERSION/TIMESTAMP AS OF or branch read is pinned to " +
              "history, so the recorded watermark could never describe " +
              "what was materialized and every refresh would be wrong")
          }
          val id = r.identifier.getOrElse(fail(
            "internal: a base relation carries no identifier"))
          id.namespace().toSeq :+ id.name()
        }
        val base = idents.head
        val dims = idents.tail
        // Canonical SQL for stored expressions: single-table bodies strip
        // qualifiers (the legacy form round-15 specs are stored in); star
        // bodies RE-QUALIFY every attribute with its refresh-time alias
        // (`f`, `d0`, `d1`, …) — fact and dims routinely share column
        // names, so a stripped form would be ambiguous or silently wrong.
        val canon: Expression => String =
          if (dims.isEmpty) unq
          else {
            val owner: Map[ExprId, String] = rels.zipWithIndex.flatMap {
              case (r, i) =>
                val a = if (i == 0) FactAlias else dimAlias(i - 1)
                r.output.map(_.exprId -> a)
            }.toMap
            e => e.transform {
              case a: AttributeReference =>
                a.withQualifier(Seq(owner.getOrElse(a.exprId, fail(
                  s"internal: column ${a.name} resolves to none of the " +
                    "joined tables"))))
            }.sql
          }
        joinCondExprs.foreach(requireRefreshStable(_, "the JOIN condition"))
        whereOpt.foreach(requireRefreshStable(_, "the WHERE predicate"))
        if (groupExprs.isEmpty) fail(
          "global aggregates (no GROUP BY) are not supported as " +
            "materialized views — add a GROUP BY (a constant key works)")
        groupExprs.foreach(requireRefreshStable(_, "GROUP BY expression"))

        // avg constituents synthesized per avg output (hidden backing
        // columns + the resolved expressions that first materialize them).
        val hiddenCols = Seq.newBuilder[MvCol]
        val hiddenExprs = Seq.newBuilder[(NamedExpression, StructField)]
        def sumWidened(dt: DataType): DataType = dt match {
          case d: DecimalType =>
            DecimalType(math.min(DecimalType.MAX_PRECISION, d.precision + 10),
              d.scale)
          case _ => LongType
        }
        def requireExactSummable(e: Expression, name: String, what: String): Unit =
          e.dataType match {
            case ByteType | ShortType | IntegerType | LongType |
                _: DecimalType => ()
            case other => fail(
              s"$what over ${other.simpleString} in $name: floating " +
                "addition is order-dependent, so the view could " +
                "not stay exact under incremental folds — CAST " +
                "the measure to DECIMAL in the body")
          }
        val cols = aggExprs.map { out =>
          val (inner, name) = out match {
            case Alias(e, n) => (e, n)
            case e => (e, out.name)
          }
          if (name.startsWith("__") &&
              (name.endsWith("_sum") || name.endsWith("_cnt"))) fail(
            s"output name $name collides with the reserved avg-constituent " +
              "namespace (__<col>_sum/__<col>_cnt) — rename it")
          inner match {
            case ae: AggregateExpression =>
              if (ae.isDistinct) fail(
                s"DISTINCT aggregate in $name: not incrementally " +
                  "maintainable (a delete's effect depends on the full " +
                  "remaining group) — use approx_count_distinct(col), " +
                  "which the view maintains via mergeable HLL sketches")
              if (ae.filter.isDefined) fail(
                s"FILTER clause on aggregate $name: move the predicate " +
                  "into WHERE (refresh applies WHERE to the change feed)")
              ae.aggregateFunction match {
                case c: Count if c.children.sizeIs == 1 =>
                  c.children.head match {
                    case l: Literal if l.value != null =>
                      MvCol(name, "count_star", "")
                    case l: Literal => fail(
                      s"count(NULL) in $name counts nothing — drop it")
                    case e =>
                      requireRefreshStable(e, "count argument")
                      MvCol(name, "count", canon(e))
                  }
                case s: Sum =>
                  val e = s.child
                  requireRefreshStable(e, "sum argument")
                  requireExactSummable(e, name, "sum")
                  MvCol(name, "sum", canon(e))
                case a: Average =>
                  // avg = derived sum/count: the backing table stores the
                  // avg VALUE (the body's schema) plus hidden sum + count
                  // constituents the fold maintains; every refresh
                  // re-derives the value from the folded constituents.
                  val e = a.child
                  requireRefreshStable(e, "avg argument")
                  requireExactSummable(e, name, "avg")
                  val sumName = avgSumCol(name)
                  val cntName = avgCntCol(name)
                  val sumT = sumWidened(e.dataType)
                  hiddenCols += MvCol(sumName, "sum", canon(e),
                    nn = if (e.nullable) Some(cntName) else None)
                  hiddenCols += MvCol(cntName, "count", canon(e))
                  // Sum(e)'s RESULT already lands in sumT (long for
                  // integrals, p+10 for decimals) — the outer Cast is a
                  // no-op type assertion, never a second widen (casting
                  // the INPUT would widen twice: Sum(decimal(22,2)) is
                  // decimal(32,2), failing STRICT store assignment).
                  hiddenExprs += ((Alias(org.apache.spark.sql.catalyst
                    .expressions.Cast(Sum(e).toAggregateExpression(), sumT),
                    sumName)(), StructField(sumName, sumT, nullable = true)))
                  hiddenExprs += ((Alias(
                    Count(Seq(e)).toAggregateExpression(), cntName)(),
                    StructField(cntName, LongType, nullable = false)))
                  MvCol(name, "avg", canon(e))
                case h: HyperLogLogPlusPlus =>
                  // approx_count_distinct = derived estimate over a
                  // hidden mergeable HLL sketch ([[hllCol]]). Inserts
                  // union a partial sketch; a DELETE of a non-null value
                  // triggers the affected-group recompute (a sketch is
                  // not invertible) — the same shape as min/max, so the
                  // same single-table-only restriction.
                  if (dims.nonEmpty) fail(
                    s"approx_count_distinct in $name: not supported in a " +
                      "STAR body — a delete forces recomputing affected " +
                      "groups from the joined row set; keep it in a " +
                      "single-table MV of the fact (or a plain VIEW)")
                  if (h.relativeSD != 0.05) fail(
                    s"approx_count_distinct in $name passes a custom " +
                      "relativeSD: the view stores ONE sketch per group " +
                      "at the engine's precision — drop the argument")
                  val e = h.child
                  requireRefreshStable(e, "approx_count_distinct argument")
                  e.dataType match {
                    case IntegerType | LongType | StringType | BinaryType => ()
                    case other => fail(
                      s"approx_count_distinct over ${other.simpleString} " +
                        s"in $name: the mergeable sketch hashes " +
                        "int/bigint/string/binary — CAST the column in " +
                        "the body")
                  }
                  val sketchName = hllCol(name)
                  hiddenCols += MvCol(sketchName, "hll", canon(e))
                  hiddenExprs += ((Alias(
                    new HllSketchAgg(e).toAggregateExpression(), sketchName)(),
                    StructField(sketchName, BinaryType, nullable = true)))
                  MvCol(name, "approx_distinct", canon(e))
                case mm @ (_: Min | _: Max) =>
                  // min/max: fold least/greatest on inserts; a DELETE that
                  // could have removed a group's extremum triggers a
                  // recompute of ONLY the affected groups (refresh joins
                  // the delta's deleted extrema against the stored value).
                  // Star bodies refuse: the affected-group recompute
                  // rescans the fact joined to pinned dims — split the MV.
                  if (dims.nonEmpty) fail(
                    s"min/max in $name: not supported in a STAR body — " +
                      "a delete forces recomputing affected groups from " +
                      "the joined row set; keep extrema in a single-table " +
                      "MV of the fact (or a plain VIEW)")
                  val e = mm.children.head
                  requireRefreshStable(e,
                    s"${mm.prettyName} argument")
                  val orderStable = e.dataType match {
                    case _: org.apache.spark.sql.types.NumericType |
                        org.apache.spark.sql.types.StringType |
                        org.apache.spark.sql.types.DateType |
                        org.apache.spark.sql.types.TimestampType |
                        org.apache.spark.sql.types.TimestampNTZType |
                        org.apache.spark.sql.types.BooleanType => true
                    case _ => false
                  }
                  if (!orderStable) fail(
                    s"${mm.prettyName} over ${e.dataType.simpleString} in " +
                      s"$name is not orderable-stable — use a primitive " +
                      "orderable type")
                  MvCol(name, if (mm.isInstanceOf[Min]) "min" else "max",
                    canon(e))
                case other => fail(
                  s"aggregate ${other.prettyName} in $name is not " +
                    "incrementally maintainable from a change feed " +
                    "(supported: count(*), count(col), sum(col), avg(col), " +
                    "min(col), max(col), approx_count_distinct(col))")
              }
            case e =>
              if (!groupExprs.exists(_.semanticEquals(e))) fail(
                s"output column $name is neither a GROUP BY expression " +
                  "nor a supported aggregate")
              MvCol(name, "group", canon(e))
          }
        }

        groupExprs.foreach { g =>
          val selected = aggExprs.exists {
            case Alias(e, _) => e.semanticEquals(g)
            case e => e.semanticEquals(g)
          }
          if (!selected) fail(
            s"GROUP BY expression ${g.sql} is not selected — the stored " +
              "view must hold its full group key to be maintainable")
        }
        if (!cols.exists(_.kind == "count_star")) fail(
          "the body must select count(*) — without the stored row count, " +
            "a group emptying out is undecidable from deltas and the view " +
            "would keep dead groups")

        // A nullable sum input needs its count(<same expr>) sibling: pair
        // them by canonicalized expression.
        val countByExpr = aggExprs.collect {
          case Alias(ae: AggregateExpression, n)
              if !ae.isDistinct && ae.filter.isEmpty =>
            ae.aggregateFunction match {
              case c: Count if c.children.sizeIs == 1 &&
                  !c.children.head.isInstanceOf[Literal] =>
                Some(c.children.head.canonicalized -> n)
              case _ => None
            }
          case _ => None
        }.flatten.toMap
        val sumsNullable = aggExprs.collect {
          case Alias(ae: AggregateExpression, n) =>
            ae.aggregateFunction match {
              case s: Sum if s.child.nullable => Some(n -> s.child)
              case _ => None
            }
          case _ => None
        }.flatten.toMap
        val withNn = cols.map { c =>
          sumsNullable.get(c.out) match {
            case Some(e) =>
              val twin = countByExpr.get(e.canonicalized).getOrElse(fail(
                s"sum(${unq(e)}) in ${c.out} has a NULLABLE input: also " +
                  s"select count(${unq(e)}) — when the last non-null row " +
                  "leaves a group the stored sum must return to NULL, " +
                  "which only the non-null count can witness — or sum " +
                  s"coalesce(${unq(e)}, 0) if NULLs should count as zero"))
              c.copy(nn = Some(twin))
            case None => c
          }
        }
        Spec(base, whereOpt.map(canon), withNn ++ hiddenCols.result(),
          dims, joinCondExprs.map(canon), hiddenExprs.result())
      case other => fail(s"$shapeMsg (got ${other.nodeName})")
    }
  }

  // -- property (de)serialization -------------------------------------------

  private def colsToJson(cols: Seq[MvCol]): String =
    JsonMethods.compact(JsonMethods.render(JArray(cols.toList.map(c =>
      JObject(List("out" -> JString(c.out), "kind" -> JString(c.kind),
        "expr" -> JString(c.expr)) ++
        c.nn.map(n => "nn" -> (JString(n): JValue)).toList)))))

  private[sources] def colsFromJson(s: String): Seq[MvCol] =
    JsonMethods.parse(s) match {
      case JArray(vs) => vs.map { v =>
        def str(n: String): String = (v \ n) match {
          case JString(x) => x
          case other => sys.error(s"mv.cols field '$n' malformed: $other")
        }
        MvCol(str("out"), str("kind"), str("expr"),
          (v \ "nn") match { case JString(x) => Some(x); case _ => None })
      }
      case other => sys.error(s"mv.cols malformed: $other")
    }

  /** The base identifier rides as a JSON array — a dot-joined string
    * would corrupt namespace/table names that themselves contain dots. */
  private def basePartsToJson(parts: Seq[String]): String =
    JsonMethods.compact(JsonMethods.render(
      JArray(parts.toList.map(JString(_)))))

  private[sources] def baseParts(props: Map[String, String]): Seq[String] = {
    val raw = props(PropBase)
    // Legacy dot-joined format (pre-JSON MVs keep refreshing; only names
    // that themselves contain dots needed the array form).
    if (!raw.startsWith("[")) return raw.split('.').toSeq
    JsonMethods.parse(raw) match {
      case JArray(vs) => vs.map {
        case JString(p) => p
        case other => sys.error(s"$PropBase part malformed: $other")
      }
      case other => sys.error(s"$PropBase malformed: $other")
    }
  }

  // Star-schema spec (de)serialization ---------------------------------------

  private def dimsToJson(dims: Seq[Seq[String]], conds: Seq[String]): String =
    JsonMethods.compact(JsonMethods.render(JObject(List(
      "bases" -> JArray(dims.toList.map(d =>
        JArray(d.toList.map(JString(_))))),
      "conds" -> JArray(conds.toList.map(JString(_)))))))

  /** (dimension ident parts, join condition SQLs); ([], []) for a
    * single-table MV. */
  private[sources] def dimsOf(props: Map[String, String]):
      (Seq[Seq[String]], Seq[String]) =
    props.get(PropDims).fold((Seq.empty[Seq[String]], Seq.empty[String])) { raw =>
      val v = JsonMethods.parse(raw)
      def strs(j: JValue): Seq[String] = j match {
        case JArray(xs) => xs.map {
          case JString(s) => s
          case other => sys.error(s"$PropDims malformed: $other")
        }
        case other => sys.error(s"$PropDims malformed: $other")
      }
      val bases = (v \ "bases") match {
        case JArray(bs) => bs.map(strs)
        case other => sys.error(s"$PropDims bases malformed: $other")
      }
      (bases, strs(v \ "conds"))
    }

  private def dimVersionsToJson(vs: Seq[Long]): String =
    JsonMethods.compact(JsonMethods.render(
      JArray(vs.toList.map(v => JLong(v): JValue))))

  private[sources] def dimVersionsOf(props: Map[String, String]): Seq[Long] =
    props.get(PropDimVersions).fold(Seq.empty[Long]) { raw =>
      JsonMethods.parse(raw) match {
        case JArray(vs) => vs.map {
          case JLong(v) => v
          case JInt(v) => v.toLong
          case other => sys.error(s"$PropDimVersions malformed: $other")
        }
        case other => sys.error(s"$PropDimVersions malformed: $other")
      }
    }

  private def currentVersion(k: String): Long = {
    val st = SnapshotStore.stateOf(k)
    if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
  }

  /** The operations of the MV table's snapshots in (selfV, now] — the
    * crash-recovery witness REFINED from bare version math: "the MERGE
    * landed iff the version advanced" is falsified by any OTHER writer
    * of the table, and each kind resolves differently:
    *
    *   - `replace` (compaction) rewrites files, never rows —
    *     content-neutral, adoptable into the stamp;
    *   - `delta`/`overwrite` is a ROW-LEVEL commit — the refresh's own
    *     MERGE lands as exactly one of these, so its presence finalizes;
    *   - `append` can ONLY be foreign DML (no engine path appends to an
    *     MV) — recovery must refuse loudly, never finalize over it.
    *
    * None = undecidable (some intervening snapshot was expired; sound
    * because versions are dense — nextVersion = last + 1). */
  private[sources] def opsBetween(st: SnapshotStore.TableState,
      selfV: Long, now: Long): Option[Set[String]] = {
    if (now <= selfV) return Some(Set.empty)
    val between = st.snapshots.filter(s => s.version > selfV && s.version <= now)
    if (between.size != (now - selfV)) None
    else Some(between.map(_.operation).toSet)
  }

  /** Replace-only (or empty) drift — the content-neutral case. */
  private def maintenanceOnly(ops: Set[String]): Boolean =
    ops.subsetOf(Set("replace"))

  private def bq(n: String): String = graft.catalog.DdlGenerator.quoteIdent(n)

  def isMv(props: Map[String, String]): Boolean = props.contains(PropSql)

  // -- CREATE ---------------------------------------------------------------

  /** Create + initially materialize. Exactness of the recorded watermark:
    * the base version is read BEFORE the body executes and re-read after;
    * versions only grow, so equality proves every scan the body planned
    * saw exactly that version (scans capture state atomically at build).
    * On inequality the backing table is dropped and the CREATE fails with
    * a retry message — never a silently-wrong watermark. */
  /** Materialize the body into `full` — `INSERT INTO` for plain bodies;
    * avg bodies append the RESOLVED hidden-constituent aggregates to the
    * body's Aggregate and write the widened frame by name (the SQL text
    * alone cannot name them), then RE-DERIVE each visible DERIVED output
    * (`derived`: the avg and approx_distinct cols, with visible types)
    * from those very constituents: Catalyst's Average accumulates
    * integral measures in DOUBLE, whose last-ulp result can differ from
    * the exact-sum/count division every LATER surface uses
    * ([[mergeSql]]'s avgOf, [[topUpFrame]], the rewrite's subsumption)
    * once a group sum passes 2^53; HyperLogLog++'s estimate is a
    * DIFFERENT estimator than the stored datasketches sketch. Deriving
    * at first materialization makes CREATE, refresh, top-up, and
    * rewrite agree bit-for-bit. */
  private def materialize(spark: SparkSession, full: String, bodySql: String,
      body: Option[LogicalPlan], hidden: Seq[NamedExpression],
      derived: Seq[(MvCol, DataType)], overwrite: Boolean): Unit = {
    if (body.isEmpty && hidden.isEmpty) {
      spark.sql(s"${if (overwrite) "INSERT OVERWRITE" else "INSERT INTO"} " +
        s"$full $bodySql")
      ()
    } else {
      def appendHidden(p: LogicalPlan): LogicalPlan = p match {
        case _ if hidden.isEmpty => p
        case SubqueryAlias(_, c) => appendHidden(c)
        case a: Aggregate =>
          a.copy(aggregateExpressions = a.aggregateExpressions ++ hidden)
        case other => sys.error(
          s"internal: avg-MV body is not an Aggregate (${other.nodeName})")
      }
      val analyzed = body.getOrElse(
        spark.sql(bodySql).queryExecution.analyzed)
      val df0 = org.apache.spark.sql.graftbridge.GraftPlanBridge
        .ofRows(spark, appendHidden(analyzed))
      // Same Column algebra as the fold's SQL (avgOf's `CASE WHEN cnt =
      // 0 THEN NULL ELSE CAST(sum / cnt AS t) END`; the sketch's
      // `coalesce(hll_sketch_estimate(s), 0)`) — the analyzer coerces
      // identically, so the stored value is the one every refresh would
      // re-derive. withColumn replaces IN PLACE, keeping the backing
      // table's column order.
      val df = derived.foldLeft(df0) { case (acc, (mc, t)) =>
        mc.kind match {
          case "avg" => acc.withColumn(mc.out,
            when(col(bq(avgCntCol(mc.out))) === 0L, lit(null).cast(t))
              .otherwise((col(bq(avgSumCol(mc.out))) / col(bq(avgCntCol(mc.out))))
                .cast(t)))
          case "approx_distinct" => acc.withColumn(mc.out,
            coalesce(hll_sketch_estimate(col(bq(hllCol(mc.out)))), lit(0L)))
          case other => sys.error(s"internal: underivable MV kind $other")
        }
      }
      if (overwrite) df.writeTo(full).overwrite(lit(true))
      else df.writeTo(full).append()
    }
  }

  /** Pin every LIVE body relation to the version recorded for it — the
    * AS-OF rebuild shape: fact at the claimed `c0`, each dim at its
    * `dv0` entry. Relation `output` attrs are kept by `copy`, so the
    * body's resolved expressions (and any appended hidden aggregates)
    * stay valid over the pinned scans. */
  private def pinBodyRelations(plan: LogicalPlan, catalogName: String,
      factParts: Seq[String], c0: Long, dims: Seq[Seq[String]],
      dv0: Seq[Long]): LogicalPlan = {
    val vOf: Map[String, Long] =
      ((SnapshotStore.keyOf(catalogName, factParts) -> c0) +:
        dims.zip(dv0).map { case (d, v) =>
          SnapshotStore.keyOf(catalogName, d) -> v }).toMap
    plan.transform {
      case r: DataSourceV2Relation => r.table match {
        case m: MemTable if m.isLiveHead && vOf.contains(m.storeKey) =>
          r.catalog match {
            case Some(c: SnapshotCatalog) => r.copy(table = c.loadTable(
              r.identifier.getOrElse(sys.error(
                "internal: a body relation carries no identifier")),
              vOf(m.storeKey).toString))
            case _ => r
          }
        case _ => r
      }
    }
  }

  def create(spark: SparkSession, cat: SnapshotCatalog, ident: Identifier,
      bodySql: String, spec: Spec, bodySchema: StructType, ifNotExists: Boolean,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      userProps: Map[String, String], body: Option[LogicalPlan] = None): Unit = {
    val full = (cat.name() +: ident.namespace().toSeq :+ ident.name())
      .map(bq).mkString(".")
    if (cat.tableExists(ident)) {
      val existingMv = isMv(SnapshotStore.stateOf(
        SnapshotStore.keyOf(cat.name(),
          ident.namespace().toSeq :+ ident.name())).properties)
      if (ifNotExists && existingMv) return
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException((ident.namespace() :+ ident.name()).toSeq)
    }
    if (cat.viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    val baseKey = SnapshotStore.keyOf(cat.name(), spec.base)
    val mvKey = SnapshotStore.keyOf(cat.name(),
      ident.namespace().toSeq :+ ident.name())
    val props: Map[String, String] = userProps ++ Map(
      PropSql -> bodySql,
      PropBase -> basePartsToJson(spec.base),
      PropCols -> colsToJson(spec.cols)) ++
      spec.where.map(PropWhere -> _) ++
      (if (spec.dims.isEmpty) Map.empty[String, String]
       else Map(PropDims -> dimsToJson(spec.dims, spec.joinConds)))
    val jProps = new java.util.HashMap[String, String]()
    props.foreach { case (k, v) => jProps.put(k, v) }
    val dimKeys = spec.dims.map(SnapshotStore.keyOf(cat.name(), _))
    val dv0 = dimKeys.map(currentVersion)
    val c0 = currentVersion(baseKey)
    // avg bodies widen the backing schema with the hidden constituents.
    val fullSchema =
      if (spec.hidden.isEmpty) bodySchema
      else StructType(bodySchema.fields ++ spec.hidden.map(_._2))
    cat.createTable(ident, fullSchema, partitioning, jProps)
    try {
      val derived = spec.cols
        .filter(c => c.kind == "avg" || c.kind == "approx_distinct").map(c =>
          c -> bodySchema.fields.find(_.name == c.out).getOrElse(sys.error(
            s"internal: output ${c.out} missing from the body schema"))
            .dataType)
      materialize(spark, full, bodySql, body, spec.hidden.map(_._1),
        derived, overwrite = false)
      val c1 = currentVersion(baseKey)
      if (c1 != c0) throw new IllegalStateException(
        s"base table ${spec.base.mkString(".")} advanced (v$c0 -> v$c1) " +
          "while CREATE MATERIALIZED VIEW materialized the body — the " +
          "watermark would be ambiguous; retry the CREATE")
      val dv1 = dimKeys.map(currentVersion)
      if (dv1 != dv0) throw new IllegalStateException(
        s"a dimension table of ${spec.base.mkString(".")}'s star advanced " +
          "while CREATE MATERIALIZED VIEW materialized the body — the " +
          "dimension watermark would be ambiguous; retry the CREATE")
      val selfV = currentVersion(mvKey)
      SnapshotStore.update(mvKey)(st => st.copy(properties = st.properties +
        (PropBaseVersion -> c0.toString) + (PropSelfVersion -> selfV.toString) ++
        (if (spec.dims.isEmpty) Map.empty[String, String]
         else Map(PropDimVersions -> dimVersionsToJson(dv0)))))
    } catch {
      case e: Throwable =>
        // Never leave a half-created MV behind: refresh would reject it
        // (no watermark), but the name would be taken.
        try cat.dropTable(ident) catch { case _: Exception => () }
        throw e
    }
    // The rewrite rule's discovery index is membership-keyed — a local
    // CREATE must be servable immediately.
    MvQueryRewrite.invalidate(cat.name())
    ()
  }

  // -- REFRESH --------------------------------------------------------------

  /** FULL rebuild: one atomic INSERT OVERWRITE of the body at the base's
    * current version — the escape hatch when the base's history was
    * EXPIRED past the watermark (the bounded `.changes` range no longer
    * exists, so incremental folding is unknowable; Delta/Iceberg CDC
    * consumers hit the same wall). Also useful after a base
    * drop-and-recreate.
    *
    * Claim-protected like the incremental path — WITHOUT it, a crash
    * between the landed OVERWRITE and the watermark stamp would leave a
    * stale watermark over already-rebuilt rows, and the next incremental
    * refresh would double-apply every delta silently. A full claim is
    * marked `full:<c>` so incremental recovery can NEVER "finalize" it
    * with version math (the safe resolution of a crashed rebuild is to
    * rebuild — OVERWRITE is idempotent), and refreshFull itself resumes
    * over any leftover full claim.
    *
    * AS-OF REBUILD (round 17, closing the round-15 caveat): the body's
    * relations are PINNED to the versions read up front (fact at the
    * claimed `c0`, dims at `dv0`) via plan surgery over the re-analyzed
    * body — a base or dim commit landing mid-rebuild no longer forces a
    * retry loop (a base committing faster than the rebuild completes
    * could previously starve it forever). The stored rows are exactly
    * the body at the stamped watermarks; anything newer is ordinary
    * staleness the incremental path folds next. Only the unpinnable
    * never-written (version-0) shape keeps the loud advance-and-retry. */
  def refreshFull(spark: SparkSession, catalogName: String,
      identParts: Seq[String]): (Long, Long, Boolean) = {
    val mvKey = SnapshotStore.keyOf(catalogName, identParts)
    val shown = (catalogName +: identParts).mkString(".")
    val st = SnapshotStore.stateOf(mvKey)
    if (!isMv(st.properties)) throw new IllegalArgumentException(
      s"$shown is not a materialized view (no $PropSql property)")
    st.properties.get(PropPending).foreach { p =>
      if (!p.startsWith(FullClaim)) throw new IllegalStateException(
        s"an incremental refresh of $shown is pending (claimed base v$p) " +
          "— resolve it first (refresh_mv with recover => true)")
      // A crashed full rebuild: the OVERWRITE is idempotent — resume.
    }
    val base = baseParts(st.properties)
    val baseKey = SnapshotStore.keyOf(catalogName, base)
    val b = st.properties.get(PropBaseVersion).fold(-1L)(_.toLong)
    val mvFull = (catalogName +: identParts).map(bq).mkString(".")
    val c0 = currentVersion(baseKey)
    // Write-ahead claim BEFORE the overwrite (supersedes a leftover full
    // claim; refuses to stomp an incremental one — checked above, and the
    // recheck inside the atomic update closes the race).
    SnapshotStore.update(mvKey) { s0 =>
      s0.properties.get(PropPending).foreach(p =>
        if (!p.startsWith(FullClaim)) throw new IllegalStateException(
          s"a concurrent incremental refresh of $shown claimed base v$p"))
      s0.copy(properties =
        s0.properties + (PropPending -> (FullClaim + c0)))
    }
    val (dimsL, _) = dimsOf(st.properties)
    val dimKeys = dimsL.map(SnapshotStore.keyOf(catalogName, _))
    val dv0 = dimKeys.map(currentVersion)
    val selfV0 = currentVersion(mvKey)
    // A never-written relation (version 0) has no snapshot to pin.
    val canPin = c0 > 0 && dv0.forall(_ > 0)
    try {
      // REBUILD AS OF the claimed versions: every live body relation
      // pins to the snapshot read up front (fact at c0, dims at dv0), so
      // a base or dim commit landing MID-REBUILD no longer forces a
      // retry — the stored rows are exactly the body at the stamped
      // watermarks, and the normal staleness machinery covers everything
      // newer. (Closes the round-15 caveat: a base committing faster
      // than the rebuild completes could starve full rebuilds forever.)
      // A never-written relation (version 0) has no snapshot to pin —
      // read live and keep the post-overwrite advance checks below for
      // that rare shape. avg MVs also re-derive their hidden
      // constituents from the SAME analyzed instance (the stored SQL
      // alone cannot name them; extract must see the UNPINNED plan —
      // it rejects AS-OF relations by contract).
      val specCols = colsFromJson(st.properties(PropCols))
      val hasDerived = specCols.exists(c =>
        c.kind == "avg" || c.kind == "approx_distinct")
      val bodySql = st.properties(PropSql)
      val analyzed = spark.sql(bodySql).queryExecution.analyzed
      val hidden =
        if (!hasDerived) Nil
        else extract(catalogName, analyzed).hidden.map(_._1)
      val derived = specCols
        .filter(c => c.kind == "avg" || c.kind == "approx_distinct").map(c =>
          c -> st.schema.fields.find(_.name == c.out).getOrElse(sys.error(
            s"internal: output ${c.out} missing from the MV schema"))
            .dataType)
      // The ANALYSIS itself ran against the live head: re-check that the
      // head still equals the pinned versions — equality proves analysis
      // saw exactly the c0/dv0 state (a schema-changing commit in that
      // window would type the plan for the NEW schema over OLD pinned
      // data). This shrinks the retry window from the whole rebuild
      // (round-15's starvation) to the milliseconds of planning.
      if (canPin && (currentVersion(baseKey) != c0 ||
          dimKeys.map(currentVersion) != dv0))
        throw new IllegalStateException(
          s"the base (or a dimension) of $shown advanced while the full " +
            "rebuild analyzed its body — nothing was written and the " +
            "claim is released; rerun refresh_mv(full => true)")
      val toWrite =
        if (canPin) pinBodyRelations(analyzed, catalogName, base, c0, dimsL, dv0)
        else analyzed
      materialize(spark, mvFull, bodySql, Some(toWrite), hidden, derived,
        overwrite = true)
    } catch {
      case e: Throwable =>
        // A transient overwrite failure that COMMITTED NOTHING releases
        // the claim (version math proves nothing landed) — otherwise one
        // hiccup forces a full rebuild of a possibly huge MV before any
        // incremental refresh can run again.
        if (currentVersion(mvKey) == selfV0)
          SnapshotStore.update(mvKey)(s0 =>
            if (s0.properties.get(PropPending).contains(FullClaim + c0))
              s0.copy(properties = s0.properties - PropPending)
            else s0)
        throw e
    }
    // Pinned rebuilds need no advance check: the stored rows are exactly
    // the body AS OF (c0, dv0) whatever landed meanwhile, and those are
    // the watermarks stamped below. Only the unpinnable version-0 shape
    // keeps the loud retry.
    if (!canPin) {
      val c1 = currentVersion(baseKey)
      if (c1 != c0) throw new IllegalStateException(
        s"base table ${base.mkString(".")} advanced (v$c0 -> v$c1) during " +
          "the full refresh — the watermark would be ambiguous; the claim " +
          "stays pending, rerun refresh_mv(full => true) to rebuild and " +
          "re-stamp")
      if (dimKeys.map(currentVersion) != dv0) throw new IllegalStateException(
        s"a dimension table of $shown's star advanced during the full " +
          "refresh — the dimension watermark would be ambiguous; the claim " +
          "stays pending, rerun refresh_mv(full => true)")
    }
    val vAfter = currentVersion(mvKey)
    SnapshotStore.update(mvKey) { s0 =>
      // The stamp must still own the claim — a concurrent resume/recover
      // replacing it mid-rebuild means two writers interleaved, and an
      // unconditional stamp would bless contents of unknown provenance.
      if (s0.properties.get(PropPending) != Some(FullClaim + c0))
        throw new IllegalStateException(
          s"full-rebuild claim on $shown was replaced mid-rebuild " +
            s"(now ${s0.properties.get(PropPending)}) — concurrent " +
            "refreshes interleaved; verify the view against its base and " +
            "rerun refresh_mv(full => true)")
      s0.copy(properties = s0.properties +
        (PropBaseVersion -> c0.toString) +
        (PropSelfVersion -> vAfter.toString) ++
        (if (dimsL.isEmpty) Map.empty[String, String]
         else Map(PropDimVersions -> dimVersionsToJson(dv0))) - PropPending)
    }
    (b, c0, true)
  }

  /** Fold the base's changes since the watermark into the stored view.
    * Returns (fromVersion, toVersion, refreshed) — `refreshed = false`
    * means the view was already current. */
  def refresh(spark: SparkSession, catalogName: String,
      identParts: Seq[String], recover: Boolean): (Long, Long, Boolean) = {
    val mvKey = SnapshotStore.keyOf(catalogName, identParts)
    val shown = (catalogName +: identParts).mkString(".")
    var st = SnapshotStore.stateOf(mvKey)
    if (!isMv(st.properties)) throw new IllegalArgumentException(
      s"$shown is not a materialized view (no $PropSql property) — " +
        "refresh_mv maintains tables created by CREATE MATERIALIZED VIEW")
    if (!st.properties.contains(PropBaseVersion))
      throw new IllegalStateException(
        s"$shown's creation never completed (no $PropBaseVersion " +
          "watermark) — DROP MATERIALIZED VIEW and re-CREATE")

    // Crash recovery / concurrency gate (see protocol in the class doc).
    st.properties.get(PropPending).foreach { p =>
      // A FULL rebuild's claim is never version-math-recoverable here:
      // whether its OVERWRITE landed or not, the safe resolution is to
      // rebuild (idempotent) — finalizing a half-known rebuild would
      // hand incremental folding a wrong watermark.
      if (p.startsWith(FullClaim)) throw new IllegalStateException(
        s"a FULL rebuild of $shown is pending (claimed base " +
          s"v${p.stripPrefix(FullClaim)}) — rerun refresh_mv(table, " +
          "full => true) to complete it")
      if (!recover) throw new IllegalStateException(
        s"a refresh of $shown is pending (claimed base v$p): either it " +
          "is still running — wait — or it crashed; once you have " +
          "verified none is running, rerun with recover => true")
      val (pv, pDims) = parseClaim(p)
      val selfV = st.properties.get(PropSelfVersion).fold(0L)(_.toLong)
      // `now` from the SAME captured state as the snapshot list — a
      // fresh store read could see a commit the list does not, making
      // the drift spuriously "undecidable".
      val now = if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
      opsBetween(st, selfV, now) match {
        case Some(ops) if ops.exists(o => o == "delta" || o == "overwrite") =>
          // A ROW-LEVEL commit landed past the stamp — the refresh's own
          // MERGE lands as exactly one of these; finalize. (Bare version
          // drift cannot prove this: compactions and foreign appends
          // also advance the version.) A dim-folding claim finalizes the
          // dim watermarks it folded toward, or the next refresh would
          // double-apply the dim delta.
          SnapshotStore.update(mvKey)(s0 => s0.copy(properties =
            s0.properties + (PropBaseVersion -> pv.toString) +
              (PropSelfVersion -> now.toString) ++
              pDims.map(ds => PropDimVersions -> dimVersionsToJson(ds))
              - PropPending))
        case Some(ops) if maintenanceOnly(ops) =>
          // At most compactions re-encoded the same rows: the MERGE never
          // landed — clear the claim, adopt the maintenance drift into
          // the stamp, and fold normally.
          SnapshotStore.update(mvKey)(s0 => s0.copy(properties =
            s0.properties + (PropSelfVersion -> now.toString) - PropPending))
        case Some(ops) => throw new IllegalStateException(
          s"cannot recover $shown: its history since the recovery witness " +
            s"v$selfV contains ${ops.mkString("/")} commits no refresh " +
            "produces — someone wrote the backing table directly; its " +
            "rows no longer equal the body, rebuild with CALL " +
            "refresh_mv(table, full => true)")
        case None => throw new IllegalStateException(
          s"cannot recover $shown: its own history between the recovery " +
            s"witness v$selfV and the current v$now was expired, so " +
            "whether the crashed MERGE landed is undecidable — rebuild " +
            "with CALL refresh_mv(table, full => true)")
      }
      st = SnapshotStore.stateOf(mvKey)
    }

    val props = st.properties
    val cols = colsFromJson(props(PropCols))
    val base = baseParts(props)
    val baseKey = SnapshotStore.keyOf(catalogName, base)
    // STAR dimensions: a dimension that ADVANCED no longer refuses — its
    // bounded `.changes` range folds exactly like the fact's (see the
    // DIM-DELTA fold below). Only a REGRESSED dimension (dropped and
    // recreated under the watermark) is irreparable.
    val (dimsL, joinConds) = dimsOf(props)
    val dimVs = dimVersionsOf(props)
    val dimKeys = dimsL.map(SnapshotStore.keyOf(catalogName, _))
    val dimCur = dimKeys.map(currentVersion)
    dimsL.zip(dimVs).zip(dimCur).foreach { case ((d, vr), cur) =>
      if (cur < vr) throw new IllegalStateException(
        s"dimension ${d.mkString(".")} is at v$cur but $shown recorded " +
          s"v$vr — the dimension was dropped and recreated; DROP and " +
          "re-CREATE the materialized view")
    }
    val advanced: Seq[Int] = dimVs.indices.filter(i => dimCur(i) != dimVs(i))
    val b = props(PropBaseVersion).toLong
    val c = currentVersion(baseKey)
    if (c == b && advanced.isEmpty) {
      // Already current — but MAINTENANCE of the MV table itself
      // (compaction) may have advanced its version past the
      // PropSelfVersion stamp, which the rewrite rule's tamper gate
      // reads as foreign DML. Adopt replace-only drift into the stamp
      // (compaction is content-neutral) so the next refresh — maintain
      // runs one before every compact — re-arms automatic rewrite;
      // genuine content drift stays unstamped, keeping the veto. The
      // whole decision re-validates INSIDE the CAS closure: deciding
      // outside would let this stamp overwrite a concurrent refresh's
      // fresher self-version with a stale one (and a later recovery
      // would then mis-finalize).
      SnapshotStore.update(mvKey) { s0 =>
        val sv = s0.properties.get(PropSelfVersion).fold(0L)(_.toLong)
        val n0 = if (s0.snapshots.isEmpty) 0L else s0.snapshots.last.version
        if (n0 != sv && !s0.properties.contains(PropPending) &&
            opsBetween(s0, sv, n0).exists(maintenanceOnly))
          s0.copy(properties = s0.properties + (PropSelfVersion -> n0.toString))
        else s0 // returning the input commits nothing
      }
      return (b, c, false)
    }
    if (c < b) throw new IllegalStateException(
      s"base table ${base.mkString(".")} is at v$c but $shown's watermark " +
        s"is v$b — the base was dropped and recreated; DROP and " +
        "re-CREATE the materialized view")

    // Write-ahead claim: atomic (the update retries on CAS conflicts and
    // re-checks, so two concurrent refreshes cannot both claim). A
    // dim-folding refresh claims the dim target versions too — recovery
    // must know what the crashed MERGE folded toward.
    val claim = claimOf(c, if (advanced.isEmpty) None else Some(dimCur))
    SnapshotStore.update(mvKey) { s0 =>
      if (s0.properties.contains(PropPending))
        throw new IllegalStateException(
          s"a concurrent refresh of $shown claimed base " +
            s"v${s0.properties(PropPending)} first")
      s0.copy(properties = s0.properties + (PropPending -> claim))
    }

    val mvFull = (catalogName +: identParts).map(bq).mkString(".")
    val baseFull = (catalogName +: base).map(bq).mkString(".")
    if (advanced.isEmpty) lastDimFoldFactPartitions.set(-1L)
    try {
      val frames = Seq.newBuilder[DataFrame]
      val pinned = Seq.newBuilder[DataFrame]
      try {
        if (c > b) {
          // FACT fold: the bounded fact changes joined to every dimension
          // AS OF its RECORDED (old) watermark — the first term of the
          // telescoping Δ(f ⋈ d0 ⋈ …) = Δf ⋈ d@old + Σᵢ f@new ⋈ d₍<ᵢ₎@new
          // ⋈ Δdᵢ ⋈ d₍>ᵢ₎@old (an inner join is multilinear in each input,
          // so the signed per-input deltas sum exactly to the join's).
          val changes = spark.read
            .option("startingVersion", (b + 1).toString)
            .option("endingVersion", c.toString)
            .table(s"$baseFull.changes")
            .alias(FactAlias)
          val withConds = joinPinnedDims(spark, catalogName, changes,
            dimsL, dimVs, joinConds)
          frames += deltaFrame(withConds, cols, props.get(PropWhere), st.schema)
        }
        if (advanced.nonEmpty) {
          // DIM-DELTA folds — the remaining telescoping terms, one per
          // advanced dimension, in join order. Exact for every star body
          // by construction: star aggregates are count/sum/avg (extrema
          // are rejected at CREATE), all linear in signed multiplicities,
          // so attribute-only updates, join-key-moving updates, and dim
          // row deletes all fold without any affected-group recompute.
          var factParts = 0L
          advanced.foreach { i =>
            dimDeltaFrame(spark, catalogName, base, baseFull, c, dimsL,
              dimVs, dimCur, joinConds, i, cols, props.get(PropWhere),
              st.schema) match {
              case Some((frame, reduced, parts)) =>
                frames += frame; pinned += reduced; factParts += parts
              case None => () // projected delta cancelled: the dim commit
              // touched only columns the view never reads — no work, the
              // stamp below just adopts the new dim watermark.
            }
          }
          lastDimFoldFactPartitions.set(factParts)
        }
        val all = frames.result()
        if (all.nonEmpty) {
          val deltas0 =
            if (all.sizeIs == 1) all.head
            else refoldUnion(all, cols)
          // Extrema refreshes read the fold TWICE (the broadcast suspect
          // keys and the MERGE source share its lineage) — persist the
          // bounded changed-groups frame so the `.changes` scan + fold
          // run once. The unpersist finally covers everything from here
          // (a plan-building failure must not leak the cache entry).
          val cached =
            if (cols.exists(c => c.kind == "min" || c.kind == "max" ||
                c.kind == "hll"))
              Some(deltas0.persist(
                org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
            else None
          try {
            val deltas = withExtremaRecompute(spark, catalogName, base, props,
              cols, cached.getOrElse(deltas0), c)
            val src = "graft_mv_deltas_" + (catalogName +: identParts)
              .mkString("_").replaceAll("[^A-Za-z0-9_]", "_")
            deltas.createOrReplaceTempView(src)
            try spark.sql(mergeSql(mvFull, src, cols, st.schema))
            finally spark.catalog.dropTempView(src)
          } finally cached.foreach(_.unpersist(false))
        }
      } finally pinned.result().foreach(_.unpersist(false))
    } catch {
      case e: Exception if {
        val msgs = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        msgs.exists(m => m.contains("not a live snapshot") ||
          m.contains("were expired") ||
          // ChangeLog's diff-predecessor error ("predecessor snapshot vN
          // was expired"): the first missed commit is row-level and
          // snapshot b is gone — the same unknowable-forever shape.
          m.contains("was expired") ||
          m.contains("expired or future"))
      } =>
        // History the fold needs was EXPIRED: the bounded changes range,
        // or a pinned dimension snapshot. Unknowable forever — release
        // the claim (the MERGE never landed) and point at the rebuild.
        SnapshotStore.update(mvKey)(s0 =>
          s0.copy(properties = s0.properties - PropPending))
        throw new IllegalStateException(
          s"history needed by $shown's incremental fold was expired " +
            s"(the ${base.mkString(".")} changes range v${b + 1}..v$c, " +
            s"its diff predecessor v$b, a dimension's changes range past " +
            "its recorded watermark, or a dimension snapshot at that " +
            "watermark); rebuild with CALL " +
            "refresh_mv(table, full => true)", e)
    }

    val vAfter = currentVersion(mvKey)
    SnapshotStore.update(mvKey) { s0 =>
      if (s0.properties.get(PropPending) != Some(claim))
        throw new IllegalStateException(
          s"refresh claim on $shown was replaced mid-refresh " +
            "(concurrent recover => true?) — the view may be " +
            "double-applied; roll it back to its last good snapshot")
      s0.copy(properties = s0.properties +
        (PropBaseVersion -> c.toString) +
        (PropSelfVersion -> vAfter.toString) ++
        (if (advanced.isEmpty) Map.empty[String, String]
         else Map(PropDimVersions -> dimVersionsToJson(dimCur))) - PropPending)
    }
    (b, c, true)
  }

  /** STALE-MV DELTA TOP-UP — the read-only form of [[refresh]]'s fold,
    * executed INLINE by the query rewrite ([[MvQueryRewrite]]) when the
    * only failed gate is the watermark: the stored view at its pinned
    * snapshot, UNION'd with the signed per-group fold of the base's
    * `.changes` in `(b, c]`, re-aggregated back to the view's schema.
    * Dashboards stay on the |groups| + |changed rows| path BETWEEN
    * refreshes instead of falling back to the 100 TB base scan.
    *
    * EXACTNESS mirrors [[mergeSql]] clause for clause: totals add the
    * same [[deltaFrame]] values a refresh would MERGE (decimal/integral
    * addition, associative); a group whose folded count(*) is <= 0 is
    * dead and filtered (MERGE's DELETE clause); a nullable sum returns
    * to NULL exactly when its count(expr) witness hits zero (plain SQL
    * SUM cannot see that case: stored 10/delta −10 sums to 0, not NULL).
    * GROUP BY null-key semantics match the MERGE's `<=>` join.
    *
    * STAR bodies serve too: the fold joins the bounded fact changes to
    * the dimensions PINNED `AS OF` their recorded watermarks — exactly
    * refresh's join — which is sound precisely because the caller's
    * freshness gate proved every dimension still SITS at its watermark
    * (only the fact advanced; a moved dim never reaches here). */
  private[sources] def topUpFrame(spark: SparkSession, catalogName: String,
      identParts: Seq[String], st: SnapshotStore.TableState,
      b: Long, c: Long): DataFrame = {
    val props = st.properties
    val cols = colsFromJson(props(PropCols))
    // Defensive mirror of the caller-side gate (MvQueryRewrite excludes
    // extrema and sketch candidates before offering a top-up): the
    // generic viewSel/deltaSel branches below would silently SUM-fold a
    // min/max or sketch column — a second caller, or drift in that gate,
    // must fail loudly instead.
    cols.find(c => c.kind == "min" || c.kind == "max" || c.kind == "hll" ||
        c.kind == "approx_distinct").foreach(c =>
      sys.error(s"internal: topUpFrame over ${c.kind} column ${c.out} — " +
        "a delete in the missed range needs the refresh's affected-group " +
        "recompute, which a read-only top-up cannot run"))
    val base = baseParts(props)
    val mvFull = (catalogName +: identParts).map(bq).mkString(".")
    val baseFull = (catalogName +: base).map(bq).mkString(".")
    // Pin the validated snapshot — a refresh landing between plan and
    // execution must not double-apply (an empty never-written MV has no
    // snapshot to pin; both read empty).
    val view =
      if (st.snapshots.isEmpty) spark.table(mvFull)
      else spark.sql(
        s"SELECT * FROM $mvFull VERSION AS OF ${st.snapshots.last.version}")
    val changes = spark.read
      .option("startingVersion", (b + 1).toString)
      .option("endingVersion", c.toString)
      .table(s"$baseFull.changes")
      .alias(FactAlias)
    val (dimsL, joinConds) = dimsOf(props)
    val dimVs = dimVersionsOf(props)
    val withConds = joinPinnedDims(spark, catalogName, changes,
      dimsL, dimVs, joinConds)
    val deltas = deltaFrame(withConds, cols, props.get(PropWhere), st.schema)
    val typeOf: Map[String, DataType] =
      st.schema.fields.map(f => f.name -> f.dataType).toMap
    // Both sides in delta algebra (g<i> keys, d<i> signed measures): the
    // stored rows are "deltas" of weight +1; measure columns cast to the
    // stored (sum-widened) type so the union's addition happens in it.
    // avg columns are DERIVED from their (foldable) hidden constituents —
    // they carry no delta of their own; min/max never reach here (the
    // rewrite refuses to offer a top-up for extrema MVs: deletes in the
    // missed range would need the affected-group recompute).
    val viewSel = cols.zipWithIndex.flatMap { case (mc, i) =>
      mc.kind match {
        case "group" => Seq(col(bq(mc.out)).as(s"g$i"))
        case "avg" => Nil
        case _ => Seq(col(bq(mc.out)).as(s"d$i"))
      }
    }
    val deltaSel = cols.zipWithIndex.flatMap { case (mc, i) =>
      mc.kind match {
        case "group" => Seq(col(s"g$i"))
        case "avg" => Nil
        case _ => Seq(col(s"d$i").cast(typeOf(mc.out)).as(s"d$i"))
      }
    }
    val unioned = view.select(viewSel: _*).unionAll(deltas.select(deltaSel: _*))
    val keys = cols.zipWithIndex.collect {
      case (mc, i) if mc.kind == "group" => s"g$i" }
    val aggs = cols.zipWithIndex.collect {
      case (mc, i) if mc.kind != "group" && mc.kind != "avg" =>
        sum(s"d$i").as(s"d$i") }
    val tot = unioned.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val cntIdx = cols.indexWhere(_.kind == "count_star")
    val alive = tot.filter(col(s"d$cntIdx") > 0L)
    val outCols = cols.zipWithIndex.map { case (mc, i) =>
      mc.kind match {
        case "group" => col(s"g$i").as(mc.out)
        case "count_star" => col(s"d$cntIdx").as(mc.out)
        case "count" => coalesce(col(s"d$i"), lit(0L)).as(mc.out)
        case "sum" =>
          val t = typeOf(mc.out)
          val v = col(s"d$i").cast(t)
          mc.nn match {
            case Some(nnOut) =>
              val nnIdx = cols.indexWhere(_.out == nnOut)
              when(coalesce(col(s"d$nnIdx"), lit(0L)) === 0L,
                lit(null).cast(t)).otherwise(v).as(mc.out)
            case None => v.as(mc.out)
          }
        case "avg" =>
          // Derive from the folded constituents, mirroring mergeSql's
          // avgOf: NULL when the post-fold count witness hits zero.
          val sumIdx = cols.indexWhere(_.out == avgSumCol(mc.out))
          val cIdx = cols.indexWhere(_.out == avgCntCol(mc.out))
          val t = typeOf(mc.out)
          val sumT = typeOf(cols(sumIdx).out)
          when(coalesce(col(s"d$cIdx"), lit(0L)) === 0L, lit(null).cast(t))
            .otherwise((col(s"d$sumIdx").cast(sumT) /
              coalesce(col(s"d$cIdx"), lit(0L))).cast(t))
            .as(mc.out)
        case other => sys.error(s"mv.cols kind malformed: $other")
      }
    }
    alive.select(outCols: _*)
  }

  /** STAR fold join — shared by [[refresh]] and [[topUpFrame]] (the
    * top-up's soundness argument is "exactly refresh's join", so the two
    * must stay in lockstep): the bounded fact changes cross-joined to
    * each dimension PINNED at its recorded watermark (immune to a dim
    * commit landing mid-statement), under the refresh-time aliases the
    * stored expressions carry, then filtered by the stored ON
    * conditions. The joins enter as cross+filter; Catalyst re-plans them
    * as the equi joins the conditions describe and broadcasts
    * dimension-sized sides — the work stays O(changed rows). A
    * single-table spec (no dims) passes the frame through. */
  private def joinPinnedDims(spark: SparkSession, catalogName: String,
      changes: DataFrame, dimsL: Seq[Seq[String]], dimVs: Seq[Long],
      joinConds: Seq[String]): DataFrame = {
    val joined = dimsL.zip(dimVs).zipWithIndex.foldLeft(changes) {
      case (acc, ((d, vr), i)) =>
        val dimFull = (catalogName +: d).map(bq).mkString(".")
        acc.crossJoin(
          spark.sql(s"SELECT * FROM $dimFull VERSION AS OF $vr")
            .alias(dimAlias(i)))
    }
    joinConds.foldLeft(joined)((df, cs) => df.filter(expr(cs)))
  }

  /** The dim-`i` columns the stored spec READS — attributes qualified by
    * `d<i>` anywhere in the group/measure expressions, the WHERE, or the
    * join conditions. The reduced dim delta projects onto exactly these:
    * an update touching only other columns cancels (zero net rows), so
    * the view provably needs no work for it. */
  private def referencedDimCols(spark: SparkSession, cols: Seq[MvCol],
      where: Option[String], joinConds: Seq[String], i: Int): Seq[String] = {
    val parser = spark.sessionState.sqlParser
    val alias = dimAlias(i)
    val sqls = cols.collect { case c if c.expr.nonEmpty => c.expr } ++
      where.toSeq ++ joinConds
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    sqls.foreach { s =>
      parser.parseExpression(s).foreach {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if u.nameParts.sizeIs >= 2 && u.nameParts.head == alias =>
          seen += u.nameParts(1)
        case _ => ()
      }
    }
    seen.toSeq
  }

  /** Equi pairs `(fact column, dim-i column)` among the stored ON
    * conjuncts — the join keys the dim fold's fact scan can PRUNE by.
    * Only bare attribute = attribute conjuncts qualify (an expression
    * side has no single pruning column); extraction failure just means
    * no pruning, never wrong results (the join itself bounds the rows). */
  private def factDimEquiPairs(spark: SparkSession, joinConds: Seq[String],
      i: Int): Seq[(String, String)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo}
    val parser = spark.sessionState.sqlParser
    val alias = dimAlias(i)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def attrOf(e: Expression, q: String): Option[String] = e match {
      case u: UnresolvedAttribute
          if u.nameParts.sizeIs == 2 && u.nameParts.head == q =>
        Some(u.nameParts(1))
      case _ => None
    }
    joinConds.flatMap(s => conjuncts(parser.parseExpression(s))).flatMap {
      case EqualTo(l, r) =>
        (for { f <- attrOf(l, FactAlias); d <- attrOf(r, alias) } yield (f, d))
          .orElse(
            for { f <- attrOf(r, FactAlias); d <- attrOf(l, alias) } yield (f, d))
      case _ => None
    }
  }

  /** One DIM-delta fold term: `fact@c ⋈ d₍<ᵢ₎@new ⋈ Δdᵢ ⋈ d₍>ᵢ₎@old`,
    * folded through [[deltaFrame]] with the reduced delta's net signed
    * multiplicities. Returns None when the projected delta CANCELS (the
    * dim commit is invisible to the view — no fact scan at all);
    * otherwise (frame, the persisted reduced delta for the caller to
    * unpersist after the MERGE, planned fact-scan partitions).
    *
    * Scale: the reduced delta is O(changed dim rows) and bucketless; the
    * fact scan is key-pruned — the affected join keys push down as an IN
    * filter (semantically redundant next to the join, but it reaches the
    * manifest min/max, so a key-clustered 100 TB fact opens only the
    * files holding the affected keys); the dim-side joins broadcast. */
  private def dimDeltaFrame(spark: SparkSession, catalogName: String,
      base: Seq[String], baseFull: String, c: Long, dimsL: Seq[Seq[String]],
      dimVs: Seq[Long], dimCur: Seq[Long], joinConds: Seq[String], i: Int,
      cols: Seq[MvCol], where: Option[String], mvSchema: StructType):
      Option[(DataFrame, DataFrame, Long)] = {
    val alias = dimAlias(i)
    def fullOf(j: Int): String = (catalogName +: dimsL(j)).map(bq).mkString(".")
    val refCols = referencedDimCols(spark, cols, where, joinConds, i)
    val changes = spark.read
      .option("startingVersion", (dimVs(i) + 1).toString)
      .option("endingVersion", dimCur(i).toString)
      .table(s"${fullOf(i)}.changes")
    val sign = when(col("_change_type") === "INSERT", lit(1L))
      .when(col("_change_type") === "DELETE", lit(-1L))
      .otherwise(raise_error(concat(
        lit("refresh_mv: unexpected _change_type "), col("_change_type"))))
    // Net multiplicity per distinct referenced-column projection — an
    // UPDATE pairs into a −old/+new that cancels iff every column the
    // view reads is unchanged. Persisted: read up to three times
    // (cancellation probe, key collection, the MERGE's fold).
    val reduced = changes
      .groupBy(refCols.map(r => col(bq(r))): _*)
      .agg(sum(sign).as(DimNetCol))
      .filter(col(bq(DimNetCol)) =!= 0L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var keep = false
    try {
      // The cancellation probe doubles as the no-op short-circuit: a
      // fact that was never written (version 0) has no snapshot to pin
      // and nothing to join either way.
      if (reduced.isEmpty || c == 0L) return None
      val fact0 = spark.sql(s"SELECT * FROM $baseFull VERSION AS OF $c")
        .alias(FactAlias)
      val keyFilters = factDimEquiPairs(spark, joinConds, i).flatMap {
        case (fx, dy) =>
          val vals = reduced.select(col(bq(dy)))
            .where(col(bq(dy)).isNotNull).distinct()
            .limit(MaxPruneKeys + 1).collect().map(_.get(0)).toSeq
          if (vals.sizeIs > MaxPruneKeys) None
          else Some(fact0(fx).isin(vals: _*))
      }
      val factF = keyFilters.foldLeft(fact0: DataFrame)(_.filter(_))
      // Instrumentation: post-pushdown planned partitions of THIS fold's
      // fact scan (metadata-scale planning over resident manifests).
      val parts = factF.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r.scan match {
          case m: MemScan => m.planTimePartitionCount.toLong
          case _ => 0L
        }
      }.sum
      var joined: DataFrame = factF
      dimsL.indices.foreach { j =>
        if (j == i) joined = joined.crossJoin(reduced.alias(alias))
        else {
          // Telescoping versions: dims BEFORE i already folded (new),
          // dims AFTER i not yet (old recorded watermark).
          val v = if (j < i) dimCur(j) else dimVs(j)
          joined = joined.crossJoin(
            spark.sql(s"SELECT * FROM ${fullOf(j)} VERSION AS OF $v")
              .alias(dimAlias(j)))
        }
      }
      val withConds = joinConds.foldLeft(joined)((df, cs) => df.filter(expr(cs)))
      val frame = deltaFrame(withConds, cols, where, mvSchema,
        signed = Some(col(s"$alias.$DimNetCol")))
      keep = true
      Some((frame, reduced, parts))
    } finally if (!keep) reduced.unpersist(false)
  }

  /** Re-aggregate the UNION of several per-input delta frames (fact +
    * advanced dims) into one per-group delta set — plain signed addition
    * per measure, cast back to each frame's delta type (SUM re-widens
    * decimals). Extrema never reach here (single-table bodies have no
    * dims, star bodies have no extrema). */
  private def refoldUnion(frames: Seq[DataFrame], cols: Seq[MvCol]): DataFrame = {
    val u = frames.reduce(_ unionAll _)
    val typeOfDelta: Map[String, DataType] =
      frames.head.schema.fields.map(f => f.name -> f.dataType).toMap
    val keys = cols.zipWithIndex.collect {
      case (mc, i) if mc.kind == "group" => s"g$i" }
    val aggs = cols.zipWithIndex.collect {
      case (mc, i) if mc.kind != "group" && mc.kind != "avg" =>
        sum(s"d$i").cast(typeOfDelta(s"d$i")).as(s"d$i") }
    u.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group signed (count, measure) deltas of a bounded change-feed
    * frame — [[graft.operators.IncrementalMaintenance.aggDeltasFromChanges]]
    * generalized to arbitrary key/measure lists. Sum measures are signed
    * in the MV column's (already sum-widened) type, so folding adds in
    * exactly the type a recompute would.
    *
    * `signed = None` reads the FACT change feed's `_change_type` (±1 per
    * change row — the only form extrema support); `signed = Some(n)`
    * folds with NET MULTIPLICITIES instead — the DIM-delta form, where
    * each joined row carries the reduced dimension delta's signed net
    * count (a fact row joined to a dim row whose projection appeared
    * +2/−1 times contributes ×1). */
  private def deltaFrame(changes: DataFrame, cols: Seq[MvCol],
      where: Option[String], mvSchema: StructType,
      signed: Option[Column] = None): DataFrame = {
    val filtered = where.fold(changes)(w => changes.filter(expr(w)))
    // Qualified: the frame is the fact's change feed aliased [[FactAlias]]
    // (star bodies join dimensions in — an unqualified name could collide
    // with a dimension column of the same name).
    lazy val ct = col(s"$FactAlias._change_type")
    val signedN = signed.getOrElse(
      when(ct === "INSERT", lit(1L))
        .when(ct === "DELETE", lit(-1L))
        .otherwise(raise_error(concat(
          lit("refresh_mv: unexpected _change_type "), ct))))
    val typeOf: Map[String, DataType] =
      mvSchema.fields.map(f => f.name -> f.dataType).toMap
    val projected = cols.zipWithIndex.flatMap { case (mc, i) =>
      mc.kind match {
        case "group" => Seq(expr(mc.expr).as(s"g$i"))
        case "count_star" => Seq(signedN.as(s"d$i"))
        case "count" =>
          Seq((when(expr(mc.expr).isNull, lit(0L)).otherwise(lit(1L)) * signedN)
            .as(s"d$i"))
        case "sum" =>
          val t = typeOf(mc.out)
          val x = expr(mc.expr).cast(t)
          signed match {
            case None => Seq(when(ct === "INSERT", x).otherwise(-x).as(s"d$i"))
            // Multiply in the widened type, land back in it (decimal ×
            // long re-widens; the per-row product is |net| ≤ the bounded
            // dim delta's row count times a row value — the same overflow
            // exposure the post-union SUM already carries).
            case Some(n) => Seq((x * n).cast(t).as(s"d$i"))
          }
        // avg and approx_distinct are DERIVED: their hidden constituents
        // (regular cols entries) carry the fold; the MERGE recomputes
        // the visible value.
        case "avg" | "approx_distinct" => Nil
        // min/max: the INSERTED extremum folds via least/greatest; the
        // DELETED extremum drives the affected-group recompute decision.
        // Only the fact form reaches here: extrema are single-table-only
        // (no dims), so a dim fold can never carry them.
        case "min" | "max" =>
          if (signed.isDefined) sys.error(
            "internal: extrema columns in a dim-delta fold — star bodies " +
              "reject min/max at CREATE")
          Seq(when(ct === "INSERT", expr(mc.expr)).as(s"mi$i"),
            when(ct === "DELETE", expr(mc.expr)).as(s"md$i"))
        // HLL sketch constituent: inserts build a partial sketch the
        // MERGE unions; a delete of a NON-NULL value flags the group for
        // the affected-group recompute (a sketch is not invertible).
        case "hll" =>
          if (signed.isDefined) sys.error(
            "internal: sketch columns in a dim-delta fold — star bodies " +
              "reject approx_count_distinct at CREATE")
          Seq(when(ct === "INSERT", expr(mc.expr)).as(s"hi$i"),
            when(ct === "DELETE" && expr(mc.expr).isNotNull, lit(1))
              .otherwise(lit(0)).as(s"hd$i"))
        case other => sys.error(s"mv.cols kind malformed: $other")
      }
    }
    val keyNames = cols.zipWithIndex.collect {
      case (mc, i) if mc.kind == "group" => s"g$i"
    }
    val aggs = cols.zipWithIndex.flatMap { case (mc, i) =>
      mc.kind match {
        case "group" | "avg" | "approx_distinct" => Nil
        case "min" => Seq(min(s"mi$i").as(s"mi$i"), min(s"md$i").as(s"md$i"))
        case "max" => Seq(max(s"mi$i").as(s"mi$i"), max(s"md$i").as(s"md$i"))
        case "hll" => Seq(hll_sketch_agg(col(s"hi$i")).as(s"hi$i"),
          max(s"hd$i").as(s"hd$i"))
        case _ => Seq(sum(s"d$i").as(s"d$i"))
      }
    }
    filtered.select(projected: _*)
      .groupBy(keyNames.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** MIN/MAX delete handling: a deleted value AT OR PAST a group's stored
    * extremum means the extremum may not have survived — no delta can
    * decide, so refresh RECOMPUTES exactly the AFFECTED groups from the
    * current base (the delta frame's deleted-extrema name them) and the
    * MERGE picks recomputed vs folded per group against the stored value.
    * Groups touched only by inserts never rescan anything.
    *
    * Scale: the recompute is `base ⋈ (broadcast suspect keys)` semi-join
    * → grouped min/max — bounded by the files holding the suspect
    * groups' rows (group-key stats prune), and suspects are bounded by
    * the CHANGED groups with deletes, never the table. */
  private def withExtremaRecompute(spark: SparkSession, catalogName: String,
      base: Seq[String], props: Map[String, String], cols: Seq[MvCol],
      deltas: DataFrame, pinV: Long): DataFrame = {
    val mm = cols.zipWithIndex.filter { case (c, _) =>
      c.kind == "min" || c.kind == "max" || c.kind == "hll" }
    if (mm.isEmpty) return deltas
    val keyIdx = cols.zipWithIndex.collect {
      case (c, i) if c.kind == "group" => i }
    val delAny = mm.map {
      case (c, i) if c.kind == "hll" => col(s"hd$i") === 1
      case (_, i) => col(s"md$i").isNotNull
    }.reduce(_ or _)
    val suspects = deltas.filter(delAny)
      .select(keyIdx.map(i => col(s"g$i")): _*)
    val baseFull = (catalogName +: base).map(bq).mkString(".")
    // Pinned at the CLAIMED version — a base commit landing mid-refresh
    // must not leak rows past the watermark into the recomputed extrema.
    val base0 = spark.sql(s"SELECT * FROM $baseFull VERSION AS OF $pinV")
    val baseF = props.get(PropWhere).fold(base0)(w => base0.filter(expr(w)))
    val proj = keyIdx.map(i => expr(cols(i).expr).as(s"rg$i")) ++
      mm.map { case (c, i) => expr(c.expr).as(s"rv$i") }
    val semiCond = keyIdx.map(i => col(s"rg$i") <=> col(s"g$i"))
      .reduce(_ and _)
    val recAggs = mm.map { case (c, i) =>
      (c.kind match {
        case "min" => min(col(s"rv$i"))
        case "max" => max(col(s"rv$i"))
        // A suspect group's sketch rebuilds from its surviving rows —
        // bounded by the files holding those groups, like the extrema.
        case _ => hll_sketch_agg(col(s"rv$i"))
      }).as(s"r$i") }
    val rec = baseF.select(proj: _*)
      .join(broadcast(suspects), semiCond, "left_semi")
      .groupBy(keyIdx.map(i => col(s"rg$i")): _*)
      .agg(recAggs.head, recAggs.tail: _*)
    val joinCond = keyIdx.map(i => deltas(s"g$i") <=> rec(s"rg$i"))
      .reduce(_ and _)
    keyIdx.foldLeft(deltas.join(rec, joinCond, "left")) { (df, i) =>
      df.drop(rec(s"rg$i")) }
  }

  /** The one-statement fold. All UPDATE right-hand sides read the OLD row
    * (standard MERGE semantics), so the all-null witness compares the
    * UPDATED non-null count (old + delta), avg derives from the UPDATED
    * constituents, and the min/max recompute decision compares the
    * deleted extremum against the OLD stored value. */
  private def mergeSql(mvFull: String, src: String, cols: Seq[MvCol],
      mvSchema: StructType): String = {
    val idx = cols.zipWithIndex.toMap
    val cnt = cols.find(_.kind == "count_star").get
    val cntD = s"s.d${idx(cnt)}"
    val on = cols.filter(_.kind == "group")
      .map(g => s"t.${bq(g.out)} <=> s.g${idx(g)}").mkString(" AND ")
    val typeOf: Map[String, String] =
      mvSchema.fields.map(f => f.name -> f.dataType.sql).toMap
    // Post-fold value SQL per column, in BOTH clauses' vocabularies
    // (matched: old t + s deltas; not-matched: s deltas alone) — avg
    // reads its constituents' post-fold values, so they are factored.
    def updCount(c: MvCol): String =
      s"t.${bq(c.out)} + coalesce(s.d${idx(c)}, 0)"
    def insCount(c: MvCol): String = s"coalesce(s.d${idx(c)}, 0)"
    def updSum(c: MvCol): String = {
      val t = typeOf(c.out)
      val add = s"CAST(coalesce(t.${bq(c.out)}, 0) + " +
        s"coalesce(s.d${idx(c)}, 0) AS $t)"
      c.nn match {
        case Some(nnOut) =>
          val nnC = cols.find(_.out == nnOut).get
          s"CASE WHEN ${updCount(nnC)} = 0 THEN CAST(NULL AS $t) " +
            s"ELSE $add END"
        case None => add
      }
    }
    def insSum(c: MvCol): String = s"CAST(s.d${idx(c)} AS ${typeOf(c.out)})"
    def avgOf(c: MvCol, sumSql: String, cntSql: String): String = {
      val t = typeOf(c.out)
      s"CASE WHEN ($cntSql) = 0 THEN CAST(NULL AS $t) " +
        s"ELSE CAST(($sumSql) / ($cntSql) AS $t) END"
    }
    def constituents(c: MvCol): (MvCol, MvCol) = (
      cols.find(_.out == avgSumCol(c.out)).getOrElse(sys.error(
        s"mv.cols: avg ${c.out} lost its sum constituent")),
      cols.find(_.out == avgCntCol(c.out)).getOrElse(sys.error(
        s"mv.cols: avg ${c.out} lost its count constituent")))
    def hllConstituent(c: MvCol): MvCol =
      cols.find(_.out == hllCol(c.out)).getOrElse(sys.error(
        s"mv.cols: approx_distinct ${c.out} lost its sketch constituent"))
    // Post-fold sketch SQL for an hll constituent, per clause. Matched: a
    // flagged delete takes the affected-group recompute (s.r); otherwise
    // union the inserted partial into the stored sketch (NULL-guarded:
    // hll_union propagates NULL). Not-matched: a brand-new group that
    // ALSO saw deletes cannot trust its inserted partial — the recompute
    // covers it (insert-then-delete in range).
    def updHll(h: MvCol): String = {
      val i = idx(h)
      val t = s"t.${bq(h.out)}"
      s"CASE WHEN s.hd$i = 1 THEN s.r$i WHEN s.hi$i IS NULL THEN $t " +
        s"WHEN $t IS NULL THEN s.hi$i ELSE hll_union($t, s.hi$i) END"
    }
    def insHll(h: MvCol): String = {
      val i = idx(h)
      s"CASE WHEN s.hd$i = 1 THEN s.r$i ELSE s.hi$i END"
    }
    def estimateOf(sketchSql: String): String =
      s"coalesce(hll_sketch_estimate($sketchSql), 0)"
    val sets = cols.collect {
      case g if g.kind == "group" => None
      case c if c.kind == "count_star" =>
        Some(s"t.${bq(c.out)} = t.${bq(c.out)} + $cntD")
      case c if c.kind == "count" =>
        Some(s"t.${bq(c.out)} = ${updCount(c)}")
      case c if c.kind == "sum" =>
        Some(s"t.${bq(c.out)} = ${updSum(c)}")
      case c if c.kind == "avg" =>
        val (sumC, cntC) = constituents(c)
        Some(s"t.${bq(c.out)} = ${avgOf(c, updSum(sumC), updCount(cntC))}")
      case c if c.kind == "hll" =>
        Some(s"t.${bq(c.out)} = ${updHll(c)}")
      case c if c.kind == "approx_distinct" =>
        Some(s"t.${bq(c.out)} = ${estimateOf(updHll(hllConstituent(c)))}")
      case c if c.kind == "min" || c.kind == "max" =>
        val i = idx(c)
        val cmp = if (c.kind == "min") "<=" else ">="
        val fold = if (c.kind == "min") "least" else "greatest"
        // Deleted extremum could have been the stored one (or undercut it
        // — an in-range insert-then-delete can go past the stored value):
        // take the recompute; otherwise fold the inserted extremum
        // (least/greatest skip NULLs, so insert-free groups keep t as-is).
        Some(s"t.${bq(c.out)} = CASE WHEN s.md$i IS NOT NULL AND " +
          s"(t.${bq(c.out)} IS NULL OR s.md$i $cmp t.${bq(c.out)}) " +
          s"THEN s.r$i ELSE $fold(t.${bq(c.out)}, s.mi$i) END")
    }.flatten
    val insertCols = cols.map(c => bq(c.out)).mkString(", ")
    val insertVals = cols.map { c =>
      c.kind match {
        case "group" => s"s.g${idx(c)}"
        case "count_star" => cntD
        case "count" => insCount(c)
        case "sum" => insSum(c)
        case "avg" =>
          val (sumC, cntC) = constituents(c)
          avgOf(c, insSum(sumC), insCount(cntC))
        case "hll" => insHll(c)
        case "approx_distinct" => estimateOf(insHll(hllConstituent(c)))
        case "min" | "max" =>
          // A brand-new group that ALSO saw deletes in the range (insert
          // then delete of the same rows) cannot trust its inserted
          // extremum — the recompute covers it.
          val i = idx(c)
          s"CASE WHEN s.md$i IS NOT NULL THEN s.r$i ELSE s.mi$i END"
        case other => sys.error(s"mv.cols kind malformed: $other")
      }
    }.mkString(", ")
    s"""MERGE INTO $mvFull t USING $src s
      ON $on
      WHEN MATCHED AND t.${bq(cnt.out)} + $cntD <= 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET ${sets.mkString(", ")}
      WHEN NOT MATCHED AND $cntD > 0 THEN
        INSERT ($insertCols) VALUES ($insertVals)"""
  }

  // -- DROP -----------------------------------------------------------------

  /** Drop an MV (validates it IS one — plain tables refuse, so a typo
    * cannot silently drop data under the MV dialect). */
  def drop(cat: SnapshotCatalog, ident: Identifier, ifExists: Boolean): Unit = {
    val k = SnapshotStore.keyOf(cat.name(),
      ident.namespace().toSeq :+ ident.name())
    SnapshotStore.resolve(k) match {
      case None =>
        if (!ifExists) throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchTableException(ident)
      case Some(st) if !isMv(st.properties) =>
        throw new IllegalArgumentException(
          s"${SnapshotStore.dotted(k)} is a plain table, not a " +
            "materialized view — use DROP TABLE")
      case Some(_) =>
        cat.dropTable(ident)
        MvQueryRewrite.invalidate(cat.name())
        ()
    }
  }
}
