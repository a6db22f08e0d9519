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

  test("a STALE MV never serves; refresh_mv restores the rewrite") {
    val t = baseTable("stale_base")
    val v = fresh("stale_mv")
    spark.sql(s"""CREATE MATERIALIZED VIEW $v AS
      SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS tq FROM $t GROUP BY grp""")
    val q = s"SELECT grp, count(*) AS n, sum(coalesce(qty, 0)) AS tq FROM $t GROUP BY grp"
    hitsMv(bothWays(q)._1, "stale_mv", "stale_base")
    spark.sql(s"INSERT INTO $t VALUES (9001, 'g9', 's0', 1.00, 5)")
    val (onStale, _) = bothWays(q)
    assert(onStale.exists(_.contains("stale_base")) &&
      !onStale.exists(_.contains("stale_mv")),
      s"a stale MV must not serve, got $onStale")
    spark.sql(s"CALL $cat.system.refresh_mv(table => 'mvr.stale_mv')")
    hitsMv(bothWays(q)._1, "stale_mv", "stale_base")
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
