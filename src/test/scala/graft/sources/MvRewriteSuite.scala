package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** AUTOMATIC MV-BASED QUERY REWRITE ([[MvQueryRewrite]]): an aggregate
  * over the BASE table is served from a FRESH materialized view of that
  * base — transparently, and only when provably exact. The contract:
  *
  *   - rewritten answers are ROW-IDENTICAL to planning against the base
  *     (pinned here by running each query both ways — the rule's conf
  *     gate turns it off — and comparing collected rows);
  *   - the plan pin is physical: the BatchScan's table is the MV, and
  *     the base table is NOT scanned at all;
  *   - every freshness/shape guard falls back to the base LOUDLY-NOT:
  *     stale watermark, pending refresh claim, mismatched WHERE,
  *     unservable aggregates (max/DISTINCT), non-group base columns,
  *     time-traveled reads, and the conf gate;
  *   - subsumption re-aggregates the view: coarser GROUP BY re-adds the
  *     stored partials (count(*) → sum(n)), exact because the view holds
  *     EVERY group and count/sum are distributive.
  */
class MvRewriteSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mvr")
    spark.sql(s"DROP TABLE IF EXISTS $cat.mvr.$name")
    s"$cat.mvr.$name"
  }

  /** Base: two group columns, nullable decimal measure, bigint measure. */
  private def baseTable(name: String, n: Int = 300): String = {
    val t = fresh(name)
    spark.sql(s"""CREATE TABLE $t (
      k BIGINT, grp STRING, sub STRING, price DECIMAL(12,2), qty BIGINT)""")
    spark.sql(s"""INSERT INTO $t
      SELECT id, concat('g', id % 5), concat('s', id % 3),
        CASE WHEN id % 7 = 0 THEN CAST(NULL AS DECIMAL(12,2))
             ELSE CAST(id AS DECIMAL(12,2)) / 4 END,
        id % 13
      FROM range(0, $n)""")
    t
  }

  /** Scan tables of a query's physical plan, parsed from the rendered
    * tree ("BatchScan <table>") — an AQE-wrapped plan hides its inner
    * nodes from `collect` (AdaptiveSparkPlanExec is a leaf) but renders
    * them; rewrite happens at analysis, so the scan set is fixed before
    * any AQE re-planning. */
  private def scans(df: DataFrame): Seq[String] =
    "BatchScan ([^\\[ ]+)".r
      .findAllMatchIn(df.queryExecution.executedPlan.toString)
      .map(_.group(1)).toSeq

  /** Run `sql` with the rewrite ON and OFF; assert identical rows and
    * return the ON plan's scan tables. */
  private def bothWays(sql: String): (Seq[String], Seq[String]) = {
    val on = spark.sql(sql)
    val onRows = on.collect().map(_.toString).sorted.toSeq
    val onScans = scans(on)
    spark.conf.set(MvQueryRewrite.EnabledKey, "false")
    try {
      val off = spark.sql(sql)
      val offRows = off.collect().map(_.toString).sorted.toSeq
      assert(onRows === offRows,
        s"rewritten answer must be row-identical to the base plan for: $sql")
      (onScans, scans(off))
    } finally spark.conf.unset(MvQueryRewrite.EnabledKey)
  }

  private def hitsMv(scanTables: Seq[String], mvName: String,
      baseName: String): Unit = {
    assert(scanTables.exists(_.contains(mvName)),
      s"expected the MV scan in $scanTables")
    assert(!scanTables.exists(_.contains(baseName)),
      s"the base must NOT be scanned, got $scanTables")
  }

  test("exact-shape aggregate over the base is served by the fresh MV " +
      "(project, no re-aggregation), row-identical to the base plan") {
    val t = baseTable("exact_base")
    val v = fresh("exact_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(price) AS total, count(price) AS np
      FROM $t WHERE k % 11 <> 3 GROUP BY grp""")
    val q = s"""SELECT grp, count(*) AS n, sum(price) AS total,
      count(price) AS np FROM $t WHERE k % 11 <> 3 GROUP BY grp"""
    val (on, off) = bothWays(q)
    hitsMv(on, "exact_mv", "exact_base")
    assert(off.exists(_.contains("exact_base")),
      "sanity: with the rule off the base is scanned")
    // Different output order + aliases + a scalar over the group column
    // still map (matching is by canonical expression, not by name).
    val (on2, _) = bothWays(s"""SELECT upper(grp) AS g, sum(price) AS s,
      count(*) + 1 AS n1 FROM $t WHERE k % 11 <> 3 GROUP BY grp""")
    hitsMv(on2, "exact_mv", "exact_base")
  }

  test("a STALE MV serves via the delta TOP-UP (view + bounded changes, " +
      "never the base files); topup-off falls back; refresh restores the " +
      "direct view scan") {
    val t = baseTable("stale_base")
    val v = fresh("stale_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS tq FROM $t GROUP BY grp""")
    val q = s"SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS tq FROM $t GROUP BY grp"
    hitsMv(bothWays(q)._1, "stale_mv", "stale_base")
    spark.sql(s"INSERT INTO $t VALUES (9001, 'g9', 's0', 1.00, 5)")
    // Stale: the rewrite serves view ∪ fold(.changes) — the MV scan and
    // the base's CHANGES relation appear, the base's plain scan does not
    // (rows stay identical to the base plan; bothWays asserts it).
    val (onStale, _) = bothWays(q)
    assert(onStale.exists(_.contains("stale_mv")),
      s"a stale MV must serve via top-up, got $onStale")
    assert(onStale.exists(_.contains("stale_base.changes")),
      s"the top-up must read the bounded change range, got $onStale")
    assert(!onStale.exists(_.endsWith("stale_base")),
      s"the base's data files must NOT be scanned, got $onStale")
    // The conf gate restores the old fallback.
    spark.conf.set(MvQueryRewrite.TopUpKey, "false")
    try {
      val off = scans(spark.sql(q))
      assert(off.exists(_.endsWith("stale_base")) &&
        !off.exists(_.contains("stale_mv")),
        s"topup-off must plan against the base, got $off")
    } finally spark.conf.unset(MvQueryRewrite.TopUpKey)
    // After the refresh, the DIRECT view scan serves again — no changes
    // relation in the plan.
    spark.sql(s"CALL $cat.system.refresh_mv(table => 'mvr.stale_mv')")
    val (onFresh, _) = bothWays(q)
    hitsMv(onFresh, "stale_mv", "stale_base")
    assert(!onFresh.exists(_.contains(".changes")),
      s"a fresh MV serves directly, got $onFresh")
  }

  test("TOP-UP edge cases: a rollback inside the missed range folds its " +
      "inverse changes exactly; a pending claim falls back to the base; " +
      "an expired range never offers the top-up") {
    val t = baseTable("topup_base", n = 200)
    val v = fresh("topup_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(price) AS total, count(price) AS np
      FROM $t GROUP BY grp""")
    val q = s"""SELECT grp, count(*) AS n, sum(price) AS total,
      count(price) AS np FROM $t GROUP BY grp"""
    // Commits: insert, delete, then ROLLBACK past the delete — the feed
    // reports the rollback's resurrections; the fold must stay exact
    // (bothWays compares rows against the base plan).
    spark.sql(s"INSERT INTO $t VALUES (9001, 'g9', 's0', 1.00, 5)")
    spark.sql(s"DELETE FROM $t WHERE grp = 'g1'")
    spark.sql(s"CALL $cat.system.rollback_to_version(" +
      "table => 'mvr.topup_base', version => 2)").collect()
    val (on, _) = bothWays(q)
    assert(on.exists(_.contains("topup_mv")) &&
      on.exists(_.contains("topup_base.changes")) &&
      !on.exists(_.endsWith("topup_base")),
      s"rollback-in-range still tops up from the view + changes, got $on")
    // A pending refresh claim blocks the top-up like any serving shape.
    val mvKey = SnapshotStore.keyOf(cat, Seq("mvr", "topup_mv"))
    SnapshotStore.update(mvKey)(st => st.copy(properties =
      st.properties + (MaterializedViews.PropPending -> "4")))
    try {
      val claimed = scans(spark.sql(q))
      assert(claimed.exists(_.endsWith("topup_base")) &&
        !claimed.exists(_.contains("topup_mv")),
        s"a claimed MV must not top-up, got $claimed")
    } finally SnapshotStore.update(mvKey)(st => st.copy(properties =
      st.properties - MaterializedViews.PropPending))
    // Expire history past the watermark: the bounded range is unknowable
    // — the rewrite must fall back, not fail the query.
    spark.sql(s"CALL $cat.system.expire_snapshots(" +
      "table => 'mvr.topup_base', keep_last => 1)").collect()
    val expired = scans(spark.sql(q))
    assert(expired.exists(_.endsWith("topup_base")) &&
      !expired.exists(_.contains("topup_mv")),
      s"an expired change range must fall back to the base, got $expired")
    // And the SUBTLER expiry: the range (b, c] itself is live but the
    // PREDECESSOR snapshot b is gone while the first missed commit is a
    // row-level one — its change rows diff against b, so the top-up
    // must never be offered (a fallback, not an execution-time error).
    val t2 = baseTable("topup_pred", n = 100)
    val v2 = fresh("topup_pred_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v2 AS
      SELECT grp, count(*) AS n FROM $t2 GROUP BY grp""") // watermark b=1
    spark.sql(s"DELETE FROM $t2 WHERE grp = 'g1'")        // v2: overwrite
    spark.sql(s"INSERT INTO $t2 VALUES (901, 'g9', 's0', 1.00, 2)") // v3
    spark.sql(s"CALL $cat.system.expire_snapshots(" +
      "table => 'mvr.topup_pred', keep_last => 2)").collect() // v1 gone
    val q2 = s"SELECT grp, count(*) AS n FROM $t2 GROUP BY grp"
    val noPred = scans(spark.sql(q2))
    assert(noPred.exists(_.endsWith("topup_pred")) &&
      !noPred.exists(_.contains("topup_pred_mv")),
      s"an expired diff-predecessor must fall back to the base, got $noPred")
    assert(spark.sql(q2).collect().nonEmpty, "and the query must run")
  }

  test("a pending refresh claim blocks the rewrite (mid-refresh or " +
      "crashed view state must never serve)") {
    val t = baseTable("pend_base")
    val v = fresh("pend_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n FROM $t GROUP BY grp""")
    val q = s"SELECT grp, count(*) AS n FROM $t GROUP BY grp"
    hitsMv(bothWays(q)._1, "pend_mv", "pend_base")
    val mvKey = SnapshotStore.keyOf(cat, Seq("mvr", "pend_mv"))
    SnapshotStore.update(mvKey)(st => st.copy(properties =
      st.properties + (MaterializedViews.PropPending -> "1")))
    try {
      val on = scans(spark.sql(q))
      assert(on.exists(_.contains("pend_base")) &&
        !on.exists(_.contains("pend_mv")),
        s"a claimed MV must not serve, got $on")
    } finally SnapshotStore.update(mvKey)(st => st.copy(properties =
      st.properties - MaterializedViews.PropPending))
  }

  test("WHERE accounting: equal predicate consumed; extra group-column " +
      "conjunct becomes a residual filter; mismatched predicate vetoes") {
    val t = baseTable("where_base")
    val v = fresh("where_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS tq
      FROM $t WHERE k % 11 <> 3 GROUP BY grp""")
    // Consumed + residual on the group column.
    val (on, _) = bothWays(s"""SELECT grp, count(*) AS n FROM $t
      WHERE k % 11 <> 3 AND grp <> 'g2' GROUP BY grp""")
    hitsMv(on, "where_mv", "where_base")
    // A DIFFERENT predicate must fall back (the MV's rows are wrong for it).
    val (onMiss, _) = bothWays(s"""SELECT grp, count(*) AS n FROM $t
      WHERE k % 11 <> 4 GROUP BY grp""")
    assert(onMiss.exists(_.contains("where_base")),
      s"mismatched WHERE must plan against the base, got $onMiss")
    // Residual referencing a NON-group base column must fall back too.
    val (onRes, _) = bothWays(s"""SELECT grp, count(*) AS n FROM $t
      WHERE k % 11 <> 3 AND qty > 5 GROUP BY grp""")
    assert(onRes.exists(_.contains("where_base")),
      s"non-group residual must plan against the base, got $onRes")
    // And a filter-less MV accepts a pure group-column predicate.
    val v2 = fresh("where_mv2")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v2 AS
      SELECT grp, count(*) AS n FROM $t GROUP BY grp""")
    val (onG, _) = bothWays(
      s"SELECT grp, count(*) AS n FROM $t WHERE grp = 'g1' GROUP BY grp")
    hitsMv(onG, "where_mv2", "where_base")
  }

  test("SUBSUMPTION: coarser GROUP BY re-aggregates the stored partials " +
      "(count(*) -> sum(n)); grouping by a function of a group column maps") {
    val t = baseTable("sub_base")
    val v = fresh("sub_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, sub, count(*) AS n, sum(price) AS total, count(price) AS np
      FROM $t GROUP BY grp, sub""")
    // Coarser: group by grp only.
    val (on, _) = bothWays(s"""SELECT grp, count(*) AS n, sum(price) AS total,
      count(price) AS np FROM $t GROUP BY grp""")
    hitsMv(on, "sub_mv", "sub_base")
    // Coarser still: a FUNCTION of a group column.
    val (onF, _) = bothWays(s"""SELECT substring(sub, 1, 1) AS s1,
      count(*) AS n FROM $t GROUP BY substring(sub, 1, 1)""")
    hitsMv(onF, "sub_mv", "sub_base")
    // Global aggregate (no GROUP BY) stays on the base: its empty-input
    // semantics (one row) are not derivable from a keyed view.
    val (onGlob, _) = bothWays(s"SELECT count(*) AS n FROM $t")
    assert(onGlob.exists(_.contains("sub_base")),
      s"global aggregates must not rewrite, got $onGlob")
  }

  test("unservable shapes fall back: max(), DISTINCT, a non-group " +
      "column, FILTER clauses, time travel, and the conf gate") {
    val t = baseTable("veto_base")
    val v = fresh("veto_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS tq FROM $t GROUP BY grp""")
    def baseOnly(sql: String): Unit = {
      val (on, _) = bothWays(sql)
      assert(on.exists(_.contains("veto_base")) &&
        !on.exists(_.contains("veto_mv")),
        s"expected a base-only plan for: $sql, got $on")
    }
    baseOnly(s"SELECT grp, max(qty) AS m FROM $t GROUP BY grp")
    baseOnly(s"SELECT grp, count(DISTINCT qty) AS d FROM $t GROUP BY grp")
    baseOnly(s"SELECT grp, sum(price) AS p FROM $t GROUP BY grp") // not stored
    baseOnly(s"SELECT grp, count(*) FILTER (WHERE qty > 5) AS f FROM $t GROUP BY grp")
    baseOnly(s"SELECT sub, count(*) AS n FROM $t GROUP BY sub") // not a group col
    // Time travel pins history — the view's freshness is irrelevant.
    val (onTT, _) = bothWays(
      s"SELECT grp, count(*) AS n FROM $t VERSION AS OF 1 GROUP BY grp")
    assert(!onTT.exists(_.contains("veto_mv")),
      s"a time-traveled aggregate must not rewrite, got $onTT")
    // Conf gate.
    spark.conf.set(MvQueryRewrite.EnabledKey, "false")
    try {
      val on = scans(spark.sql(s"SELECT grp, count(*) AS n FROM $t GROUP BY grp"))
      assert(on.exists(_.contains("veto_base")))
    } finally spark.conf.unset(MvQueryRewrite.EnabledKey)
  }

  test("NON-DETERMINISTIC predicates veto the rewrite: WHERE rand() " +
      "samples base ROWS — re-evaluating it over groups would be wrong") {
    val t = baseTable("rand_base")
    val v = fresh("rand_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n FROM $t GROUP BY grp""")
    val on = scans(spark.sql(
      s"SELECT grp, count(*) AS n FROM $t WHERE rand() < 0.5 GROUP BY grp"))
    assert(on.exists(_.contains("rand_base")) &&
      !on.exists(_.contains("rand_mv")),
      s"a nondeterministic WHERE must plan against the base, got $on")
  }

  test("direct DML against the MV's backing table (self-version moved " +
      "past the stamp) vetoes the rewrite — tampered rows never serve") {
    val t = baseTable("tamper_base")
    val v = fresh("tamper_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n FROM $t GROUP BY grp""")
    val q = s"SELECT grp, count(*) AS n FROM $t GROUP BY grp"
    hitsMv(bothWays(q)._1, "tamper_mv", "tamper_base")
    // Nothing blocks INSERT INTO the backing table — it is a catalog
    // table; the rewrite must notice the snapshot moved past the stamp.
    spark.sql(s"INSERT INTO $v VALUES ('gX', 12345)")
    val (on, _) = bothWays(q)
    assert(on.exists(_.contains("tamper_base")) &&
      !on.exists(_.contains("tamper_mv")),
      s"a tampered backing table must never serve, got $on")
  }

  test("a `files`-restricted base read (the incremental hook) is NOT " +
      "rewritten — its rows are a subset the whole-table MV does not " +
      "describe") {
    val t = baseTable("restr_base")
    val v = fresh("restr_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n FROM $t GROUP BY grp""")
    hitsMv(bothWays(s"SELECT grp, count(*) AS n FROM $t GROUP BY grp")._1,
      "restr_mv", "restr_base")
    val files = SnapshotStore.stateOf(
      SnapshotStore.keyOf(cat, Seq("mvr", "restr_base"))).currentFiles
    val one = files.head.path
    val restricted = spark.read.option("files", one).table(t)
      .groupBy("grp").count()
    val on = scans(restricted)
    assert(on.exists(_.contains("restr_base")) &&
      !on.exists(_.contains("restr_mv")),
      s"an option-carrying read must never rewrite, got $on")
    if (files.size > 1)
      assert(restricted.agg(org.apache.spark.sql.functions.sum("count"))
        .head().getLong(0) < 300L, "sanity: the restriction is real")
  }

  test("MV-table compaction vetoes the rewrite (conservative tamper " +
      "gate); the next refresh — even a no-op — re-arms it") {
    val t = baseTable("comp_base")
    val v = fresh("comp_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n FROM $t GROUP BY grp""")
    val q = s"SELECT grp, count(*) AS n FROM $t GROUP BY grp"
    hitsMv(bothWays(q)._1, "comp_mv", "comp_base")
    spark.sql(s"CALL $cat.system.rewrite_data_files('mvr.comp_mv')")
    val vetoed = scans(spark.sql(q))
    assert(vetoed.exists(_.contains("comp_base")) &&
      !vetoed.exists(_.contains("comp_mv")),
      s"post-compaction version drift must veto until re-stamped, got $vetoed")
    spark.sql(s"REFRESH MATERIALIZED VIEW $v") // no-op; adopts the drift
    hitsMv(bothWays(q)._1, "comp_mv", "comp_base")
  }

  // -- STAR (join) MV rewrite -----------------------------------------------

  /** Fact (300 rows, nullable decimal measure) ⋈ dim (20 rows, two
    * attributes — one for the MV key, one for subsumption tests). */
  private def starTables(factName: String, dimName: String): (String, String) = {
    val f = fresh(factName)
    val d = fresh(dimName)
    spark.sql(s"CREATE TABLE $f (k BIGINT, ck BIGINT, price DECIMAL(12,2))")
    spark.sql(s"""INSERT INTO $f
      SELECT id, id % 20,
        CASE WHEN id % 7 = 0 THEN CAST(NULL AS DECIMAL(12,2))
             ELSE CAST(id AS DECIMAL(12,2)) / 4 END
      FROM range(0, 300)""")
    spark.sql(s"CREATE TABLE $d (ck BIGINT, seg STRING, region STRING)")
    spark.sql(s"""INSERT INTO $d
      SELECT id, concat('s', id % 4), concat('r', id % 2) FROM range(0, 20)""")
    (f, d)
  }

  private def hitsOnlyMv(scanTables: Seq[String], mvName: String,
      baseNames: Seq[String]): Unit = {
    assert(scanTables.exists(_.contains(mvName)),
      s"expected the MV scan in $scanTables")
    baseNames.foreach(b => assert(!scanTables.exists(_.contains(b)),
      s"table $b must NOT be scanned, got $scanTables"))
  }

  test("STAR rewrite: fact JOIN dim GROUP BY dim.attr serves from the " +
      "star MV — neither the fact nor the dim is scanned; table order " +
      "and commuted ON operands don't matter") {
    val (f, d) = starTables("star_fact", "star_dim")
    val v = fresh("star_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT d.seg AS seg, count(*) AS n, sum(f.price) AS total,
        count(f.price) AS np
      FROM $f f JOIN $d d ON f.ck = d.ck GROUP BY d.seg""")
    val q = s"""SELECT d.seg AS seg, count(*) AS n, sum(f.price) AS total,
      count(f.price) AS np FROM $f f JOIN $d d ON f.ck = d.ck GROUP BY d.seg"""
    val (on, off) = bothWays(q)
    hitsOnlyMv(on, "star_mv", Seq("star_fact", "star_dim"))
    assert(off.exists(_.contains("star_fact")),
      "sanity: with the rule off the fact is scanned")
    // Reversed table order, different user aliases, commuted equality.
    val (on2, _) = bothWays(s"""SELECT x.seg AS seg, count(*) AS n
      FROM $d x JOIN $f y ON x.ck = y.ck GROUP BY x.seg""")
    hitsOnlyMv(on2, "star_mv", Seq("star_fact", "star_dim"))
  }

  test("STAR subsumption + WHERE accounting: coarser grouping " +
      "re-aggregates stored partials; the stored fact predicate is " +
      "consumed and a dim-group residual filters the view") {
    val (f, d) = starTables("starw_fact", "starw_dim")
    val v = fresh("starw_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT d.seg AS seg, d.region AS region, count(*) AS n,
        sum(f.price) AS total, count(f.price) AS np
      FROM $f f JOIN $d d ON f.ck = d.ck
      WHERE f.k % 11 <> 3
      GROUP BY d.seg, d.region""")
    // Coarser (region only) + the MV's own WHERE + a residual on seg.
    val (on, _) = bothWays(s"""SELECT d.region AS region, count(*) AS n,
      sum(f.price) AS total
      FROM $f f JOIN $d d ON f.ck = d.ck
      WHERE f.k % 11 <> 3 AND d.seg <> 's2'
      GROUP BY d.region""")
    hitsOnlyMv(on, "starw_mv", Seq("starw_fact", "starw_dim"))
    // A mismatched fact predicate falls back.
    val (onMiss, _) = bothWays(s"""SELECT d.seg AS seg, count(*) AS n
      FROM $f f JOIN $d d ON f.ck = d.ck
      WHERE f.k % 11 <> 4 GROUP BY d.seg""")
    assert(onMiss.exists(_.contains("starw_fact")),
      s"mismatched WHERE must plan against the base tables, got $onMiss")
  }

  test("STAR vetoes: stale dim, extra/changed join condition, extra " +
      "table, fact-only aggregate, self-join — all fall back to the base") {
    val (f, d) = starTables("starv_fact", "starv_dim")
    val v = fresh("starv_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT d.seg AS seg, count(*) AS n, sum(f.price) AS total,
        count(f.price) AS np
      FROM $f f JOIN $d d ON f.ck = d.ck GROUP BY d.seg""")
    val q = s"""SELECT d.seg AS seg, count(*) AS n
      FROM $f f JOIN $d d ON f.ck = d.ck GROUP BY d.seg"""
    hitsOnlyMv(bothWays(q)._1, "starv_mv", Seq("starv_fact", "starv_dim"))
    def baseOnly(sql: String, why: String): Unit = {
      val (on, _) = bothWays(sql)
      assert(!on.exists(_.contains("starv_mv")),
        s"$why must veto the star rewrite, got $on")
    }
    // An EXTRA join conjunct: the query joins fewer rows than the MV holds.
    baseOnly(s"""SELECT d.seg AS seg, count(*) AS n
      FROM $f f JOIN $d d ON f.ck = d.ck AND f.k = d.ck GROUP BY d.seg""",
      "an extra join condition")
    // A CHANGED join condition: different row multiset entirely.
    baseOnly(s"""SELECT d.seg AS seg, count(*) AS n
      FROM $f f JOIN $d d ON f.k = d.ck GROUP BY d.seg""",
      "a changed join condition")
    // A fact-only aggregate: star rows are post-join (dim fan-out).
    baseOnly(s"SELECT ck, count(*) AS n FROM $f GROUP BY ck",
      "a single-table aggregate over the fact")
    // A self-join: alias assignment is ambiguous.
    baseOnly(s"""SELECT a.ck, count(*) AS n
      FROM $f a JOIN $f b ON a.ck = b.ck GROUP BY a.ck""",
      "a self-join")
    // An extra table in the query's join tree.
    val d2 = fresh("starv_dim2")
    spark.sql(s"CREATE TABLE $d2 (ck BIGINT, extra STRING)")
    spark.sql(s"INSERT INTO $d2 SELECT id, concat('e', id) FROM range(0, 20)")
    baseOnly(s"""SELECT d.seg AS seg, count(*) AS n
      FROM $f f JOIN $d d ON f.ck = d.ck JOIN $d2 e ON f.ck = e.ck
      GROUP BY d.seg""",
      "an extra joined table")
    // A DIM commit: stored rows joined the OLD dim snapshot — veto until
    // the demanded full rebuild re-stamps the watermarks.
    spark.sql(s"INSERT INTO $d VALUES (999, 'sX', 'rX')")
    val (onStale, _) = bothWays(q)
    assert(!onStale.exists(_.contains("starv_mv")),
      s"a moved dimension must veto the star rewrite, got $onStale")
    spark.sql(s"CALL $cat.system.refresh_mv(table => 'mvr.starv_mv', " +
      "full => true)").collect()
    hitsOnlyMv(bothWays(q)._1, "starv_mv", Seq("starv_fact", "starv_dim"))
  }

  test("STAR top-up: a fact-only commit leaves the star MV stale — the " +
      "rewrite serves view ∪ fold(changes ⋈ pinned dims); a dim commit " +
      "still vetoes everything") {
    val (f, d) = starTables("stt_fact", "stt_dim")
    val v = fresh("stt_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT d.seg AS seg, count(*) AS n, sum(f.price) AS total,
        count(f.price) AS np
      FROM $f f JOIN $d d ON f.ck = d.ck GROUP BY d.seg""")
    val q = s"""SELECT d.seg AS seg, count(*) AS n, sum(f.price) AS total,
      count(f.price) AS np FROM $f f JOIN $d d ON f.ck = d.ck GROUP BY d.seg"""
    hitsOnlyMv(bothWays(q)._1, "stt_mv", Seq("stt_fact", "stt_dim"))
    // Fact-only commit: the star MV is stale but every dim watermark
    // still holds — the top-up folds the bounded fact changes joined to
    // the PINNED dims. The fact's data files stay unread; the
    // dimension-sized pinned scan is the fold's join side.
    spark.sql(s"INSERT INTO $f VALUES (9001, 3, 12.34), (9002, 7, NULL)")
    val (on, _) = bothWays(q)
    assert(on.exists(_.contains("stt_mv")),
      s"a stale star MV must serve via top-up, got $on")
    assert(on.exists(_.contains("stt_fact.changes")),
      s"the top-up must read the bounded fact change range, got $on")
    assert(!on.exists(_.endsWith("stt_fact")),
      s"the fact's data files must NOT be scanned, got $on")
    // A DIM commit invalidates every stored group — no serving shape.
    spark.sql(s"INSERT INTO $d VALUES (999, 'sX', 'rX')")
    val (onDim, _) = bothWays(q)
    assert(!onDim.exists(_.contains("stt_mv")) &&
      onDim.exists(_.endsWith("stt_fact")),
      s"a moved dimension must veto the top-up too, got $onDim")
  }

  test("ROLLUP/CUBE/GROUPING SETS over the base serve from the MV: the " +
      "Expand re-groups |groups| stored rows, grouping-id vs real-NULL " +
      "group values stay exact, unservable aggregates veto") {
    val t = fresh("roll_base")
    // REAL NULLs in a group column: the grouping-id must keep telling an
    // Expand-null (subtotal row) from a genuine NULL group.
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, sub STRING, qty BIGINT)")
    spark.sql(s"""INSERT INTO $t
      SELECT id, CASE WHEN id % 7 = 0 THEN NULL ELSE concat('g', id % 3) END,
        concat('s', id % 2), id % 11
      FROM range(0, 300)""")
    val v = fresh("roll_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, sub, count(*) AS n, sum(coalesce(qty, 0)) AS q
      FROM $t GROUP BY grp, sub""")
    val rollup = s"""SELECT grp, sub, count(*) AS n,
      sum(coalesce(qty, 0)) AS q, grouping(grp) AS gg, grouping(sub) AS gs
      FROM $t GROUP BY ROLLUP(grp, sub)"""
    val (onR, offR) = bothWays(rollup)
    hitsMv(onR, "roll_mv", "roll_base")
    assert(offR.exists(_.contains("roll_base")), "sanity: off plans the base")
    val (onC, _) = bothWays(s"""SELECT grp, sub, count(*) AS n
      FROM $t GROUP BY CUBE(grp, sub)""")
    hitsMv(onC, "roll_mv", "roll_base")
    val (onG, _) = bothWays(s"""SELECT grp, sub, count(*) AS n
      FROM $t GROUP BY GROUPING SETS ((grp), (sub), ())""")
    hitsMv(onG, "roll_mv", "roll_base")
    // Unservable aggregate under a rollup vetoes like the flat shape.
    val (onMax, _) = bothWays(
      s"SELECT grp, max(qty) AS m FROM $t GROUP BY ROLLUP(grp)")
    assert(!onMax.exists(_.contains("roll_mv")),
      s"max() under ROLLUP must veto (not stored), got $onMax")
    // A grouping column outside the MV's key vetoes.
    val (onK, _) = bothWays(
      s"SELECT k, count(*) AS n FROM $t GROUP BY ROLLUP(k)")
    assert(!onK.exists(_.contains("roll_mv")),
      s"a non-MV grouping column must veto, got $onK")
  }

  test("approx_count_distinct serves from the MV: the exact shape reads " +
      "the stored estimate, a coarser shape UNIONS the stored sketches; " +
      "count(DISTINCT), custom rsd, and a stale sketch MV all veto") {
    val t = fresh("ad_base")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, sub STRING, u BIGINT)")
    spark.sql(s"""INSERT INTO $t
      SELECT id, concat('g', id % 4), concat('s', id % 3), id % 700
      FROM range(0, 4000)""")
    val v = fresh("ad_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, sub, count(*) AS n, approx_count_distinct(u) AS du
      FROM $t GROUP BY grp, sub""")
    // EXACT shape: served straight off the stored estimates. (No
    // bothWays: the stored estimator is the datasketches sketch's, a
    // DIFFERENT approximation than HyperLogLog++ — the MV contract.)
    val exactQ = spark.sql(s"""SELECT grp, sub, approx_count_distinct(u) AS du
      FROM $t GROUP BY grp, sub""")
    assert(scans(exactQ).exists(_.contains("ad_mv")) &&
      !scans(exactQ).exists(_.contains("ad_base")),
      s"exact shape must serve from the MV, got ${scans(exactQ)}")
    val stored = spark.sql(s"SELECT grp, sub, du FROM $v").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    exactQ.collect().foreach { r =>
      assert(r.getLong(2) === stored((r.getString(0), r.getString(1)))) }
    // COARSER shape: sketches UNION across subgroups — the re-aggregable
    // distinct count (sums of per-group distincts would overcount).
    val coarse = spark.sql(
      s"SELECT grp, approx_count_distinct(u) AS du FROM $t GROUP BY grp")
    assert(scans(coarse).exists(_.contains("ad_mv")) &&
      !scans(coarse).exists(_.contains("ad_base")),
      s"coarser shape must union stored sketches, got ${scans(coarse)}")
    val exactDistinct = {
      spark.conf.set(MvQueryRewrite.EnabledKey, "false")
      try spark.sql(s"SELECT grp, count(DISTINCT u) FROM $t GROUP BY grp")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      finally spark.conf.unset(MvQueryRewrite.EnabledKey)
    }
    coarse.collect().foreach { r =>
      val e = exactDistinct(r.getString(0))
      assert(math.abs(r.getLong(1) - e) <= math.max(1L, (e * 0.05).toLong),
        s"coarse ${r.getString(0)}: served ${r.getLong(1)} vs exact $e")
    }
    // Vetoes: exact DISTINCT, a custom rsd, and a non-stored column.
    for (q <- Seq(
        s"SELECT grp, count(DISTINCT u) AS du FROM $t GROUP BY grp",
        s"SELECT grp, approx_count_distinct(u, 0.01) AS du FROM $t GROUP BY grp",
        s"SELECT grp, approx_count_distinct(k) AS dk FROM $t GROUP BY grp")) {
      val s = scans(spark.sql(q))
      assert(s.exists(_.contains("ad_base")) && !s.exists(_.contains("ad_mv")),
        s"$q must plan against the base, got $s")
    }
    // STALE sketch MV: the delta top-up is never offered (a delete in
    // the missed range would need the recompute) — the base serves.
    spark.sql(s"INSERT INTO $t VALUES (90000, 'g0', 's0', 699)")
    val stale = scans(spark.sql(
      s"SELECT grp, sub, approx_count_distinct(u) AS du FROM $t GROUP BY grp, sub"))
    assert(stale.exists(_.contains("ad_base")) &&
      !stale.exists(_.contains("ad_mv")),
      s"a stale sketch MV must not top-up, got $stale")
    // A refresh re-arms the direct serve.
    spark.sql(s"REFRESH MATERIALIZED VIEW $v")
    val rearmed = scans(spark.sql(
      s"SELECT grp, sub, approx_count_distinct(u) AS du FROM $t GROUP BY grp, sub"))
    assert(rearmed.exists(_.contains("ad_mv")), s"got $rearmed")
  }

  test("the substituted scan is PINNED to the validated MV snapshot " +
      "(a refresh landing between plan and execution cannot shift rows)") {
    val t = baseTable("pin_base")
    val v = fresh("pin_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n FROM $t GROUP BY grp""")
    val df = spark.sql(s"SELECT grp, count(*) AS n FROM $t GROUP BY grp")
    val pinned = scans(df).filter(_.contains("pin_mv"))
    assert(pinned.nonEmpty && pinned.forall(_.contains("@v")),
      s"the MV scan must be version-pinned, got ${scans(df)}")
  }
}
