package graft.sources

import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** EQUI-HEIGHT HISTOGRAMS ([[StatsHistograms]]): per-column bins —
  * collected at compaction or by `CALL collect_stats` (no rewrite) —
  * fix CBO selectivity on SKEWED columns, where the min/max-uniform
  * assumption is wrong by an order of magnitude. The contract:
  *
  *   - on a 95/5 skewed column, a tail predicate's estimated rows land
  *     within 2× of actual while the uniform estimate is >10× off;
  *   - the better estimate FLIPS a broadcast decision (the plan pin);
  *   - collection is TWO scans total regardless of column count;
  *   - APPEND-only drift keeps serving the (conservative) bins; any
  *     row-changing commit retires them (stale bins must not estimate
  *     rows they no longer describe) until the next collection.
  */
class HistogramStatsSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.hist")
    spark.sql(s"DROP TABLE IF EXISTS $cat.hist.$name")
    s"$cat.hist.$name"
  }

  /** 95% of rows in [0, 9], 5% spread uniformly over [10, 100009] — the
    * Zipf-ish shape where uniform selectivity fails. */
  private def skewed(name: String, histogram: Boolean): String = {
    val t = fresh(name)
    val props = if (histogram)
      "TBLPROPERTIES ('stats.histogram-columns' = 'v')" else ""
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) $props")
    spark.sql(s"""INSERT INTO $t
      SELECT id, CASE WHEN id % 20 < 19 THEN id % 10
                      ELSE 10 + (id * 7919) % 100000 END
      FROM range(0, 40000)""")
    spark.sql(s"CALL $cat.system.rewrite_data_files('hist.$name')")
    t
  }

  private def estimate(t: String, pred: String): BigInt = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try spark.table(t).where(pred)
      .queryExecution.optimizedPlan.stats.rowCount.getOrElse(BigInt(-1))
    finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("a skewed tail predicate estimates within 2x of actual with the " +
      "histogram, while the uniform estimate is >10x off") {
    val withH = skewed("sk_h", histogram = true)
    val without = skewed("sk_u", histogram = false)
    val pred = "v > 50000"
    val actual = BigInt(spark.table(withH).where(pred).count())
    assert(actual > 500 && actual < 1500, s"fixture sanity, got $actual")
    val uniform = estimate(without, pred)
    assert(uniform > actual * 10,
      s"the uniform estimate should be wildly off (got $uniform vs $actual) " +
        "— otherwise this fixture proves nothing")
    val hist = estimate(withH, pred)
    assert(hist <= actual * 2 && hist * 2 >= actual,
      s"histogram estimate $hist should land within 2x of actual $actual")
  }

  test("DATE and TIMESTAMP columns histogram in catalyst's INTERNAL " +
      "double space (days/micros); non-finite doubles skip the column " +
      "instead of failing the compaction") {
    val t = fresh("dts")
    spark.sql(s"""CREATE TABLE $t (d DATE, ts TIMESTAMP, x DOUBLE)
      TBLPROPERTIES ('stats.histogram-columns' = 'd, ts, x')""")
    // x carries Infinity — collection must skip it, loudly, not throw.
    spark.sql(s"""INSERT INTO $t
      SELECT date_add(DATE '2024-01-01', CAST(id % 365 AS INT)),
        timestamp_micros(1700000000000000 + id * 1000000),
        CASE WHEN id = 7 THEN double('Infinity') ELSE CAST(id AS DOUBLE) END
      FROM range(0, 2000)""")
    spark.sql(s"CALL $cat.system.rewrite_data_files('hist.dts')")
    val props = SnapshotStore.stateOf(
      SnapshotStore.keyOf(cat, Seq("hist", "dts"))).properties
    val stored = props(StatsHistograms.StoreProp)
    // Bins are FIELD-ID-keyed: d and ts stored, the Infinity column (x)
    // skipped — two column entries, not three.
    assert("\"\\d+\":\\{\"h\"".r.findAllIn(stored).size === 2,
      s"expected exactly d and ts histogrammed, got: ${stored.take(120)}")
    // A date-range predicate estimates from the bins — sane, not 1 row,
    // not the whole table (the internal-days space must line up with the
    // literal catalyst compares in).
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val est = spark.table(t).where("d >= DATE '2024-12-01'")
        .queryExecution.optimizedPlan.stats.rowCount.getOrElse(BigInt(-1))
      val actual = BigInt(spark.table(t).where("d >= DATE '2024-12-01'").count())
      assert(est > 0 && est <= actual * 2 && est * 2 >= actual,
        s"date-histogram estimate $est should track actual $actual")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("bins are FIELD-ID-keyed: a renamed column keeps its own bins, " +
      "a new column reusing the name gets none; malformed bins fail " +
      "BEFORE the rewrite commits") {
    val t = fresh("ren")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('stats.histogram-columns' = 'v')""")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 1000)")
    spark.sql(s"CALL $cat.system.rewrite_data_files('hist.ren')")
    val key = SnapshotStore.keyOf(cat, Seq("hist", "ren"))
    val stored = SnapshotStore.stateOf(key).properties(StatsHistograms.StoreProp)
    // RENAME bumps no snapshot version: the SAME column (same id, same
    // data) keeps serving its bins under the new name; a NEW column
    // reusing the old name must not inherit them (id keys, not names).
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO w")
    spark.sql(s"ALTER TABLE $t ADD COLUMN v DOUBLE")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val estW = spark.table(t).where("w >= 900")
        .queryExecution.optimizedPlan.stats.rowCount.getOrElse(BigInt(-1))
      assert(estW >= 50 && estW <= 200,
        s"renamed column keeps its (id-keyed) bins, got $estW for ~100 rows")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    // Malformed bins property: the procedure must fail BEFORE the
    // rewrite lands — the snapshot version must not move.
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('stats.histogram-bins' = 'abc')")
    val vBefore = SnapshotStore.stateOf(key).snapshots.last.version
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.rewrite_data_files('hist.ren')").collect()
    }
    assert(e.getMessage.contains("histogram-bins"), s"got: ${e.getMessage}")
    assert(SnapshotStore.stateOf(key).snapshots.last.version === vBefore,
      "validation must precede the rewrite commit")
    assert(stored.nonEmpty) // (fixture sanity)
    // A VACUOUS columns value collects nothing — so it must not fail
    // over the (still malformed) bins property either (validate gates
    // exactly like collect's column parse).
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('stats.histogram-columns' = ',')")
    spark.sql(s"CALL $cat.system.rewrite_data_files('hist.ren')").collect()
  }

  test("the better estimate flips a broadcast decision; answers are " +
      "identical either way; a post-collection commit retires the bins") {
    val withH = skewed("fl_h", histogram = true)
    val without = skewed("fl_u", histogram = false)
    val probe = fresh("fl_probe")
    spark.range(0, 40000).selectExpr("id AS k", "id AS w").writeTo(probe).create()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    // ~1000 true tail rows estimate to ~16 KB with the histogram (under
    // the threshold); the uniform ~20k-row estimate lands far over it.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
    try {
      def bhjOf(fact: String) = spark.sql(
        s"""SELECT count(*) AS n FROM $probe p
           |JOIN (SELECT k FROM $fact WHERE v > 50000) f ON p.k = f.k""".stripMargin)
        .queryExecution.sparkPlan.collect { case b: BroadcastHashJoinExec => b }
      assert(bhjOf(withH).nonEmpty,
        "the histogram-informed selective side should broadcast statically")
      assert(bhjOf(without).isEmpty,
        "the uniform estimate must NOT broadcast — the flip is the histogram's")
      val n = spark.sql(s"SELECT count(*) FROM $probe p JOIN " +
        s"(SELECT k FROM $withH WHERE v > 50000) f ON p.k = f.k").head().getLong(0)
      assert(n === spark.table(withH).where("v > 50000").count(),
        "statistics must be invisible in the answer")
      // An APPEND after collection keeps serving (appends only dilute a
      // conservative histogram — production tables append constantly and
      // would otherwise almost never have selectivity)…
      spark.sql(s"INSERT INTO $withH VALUES (999999, 0)")
      assert(bhjOf(withH).nonEmpty,
        "append-only drift must keep serving the (conservative) bins")
      // …but a ROW-CHANGING commit retires them: the bins describe rows
      // that may no longer exist.
      spark.sql(s"DELETE FROM $withH WHERE k = 999999")
      assert(bhjOf(withH).isEmpty,
        "stale bins must not serve after a row-changing commit")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("CALL collect_stats histogramms a NEVER-compacted hot table " +
      "(no rewrite), reporting the collected columns") {
    val t = fresh("cs")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('stats.histogram-columns' = 'v')""")
    spark.sql(s"""INSERT INTO $t
      SELECT id, CASE WHEN id % 20 < 19 THEN id % 10
                      ELSE 10 + (id * 7919) % 100000 END
      FROM range(0, 40000)""")
    // No rewrite_data_files — the uncompacted table gets selectivity
    // from the procedure alone.
    val reported = spark.sql(s"CALL $cat.system.collect_stats('hist.cs')")
      .collect().map(_.getString(0)).toSeq
    assert(reported === Seq("v"))
    val pred = "v > 50000"
    val actual = BigInt(spark.table(t).where(pred).count())
    val est = estimate(t, pred)
    assert(est <= actual * 2 && est * 2 >= actual,
      s"collect_stats estimate $est should land within 2x of actual $actual")
    // And the snapshot version did NOT move — no rewrite happened.
    val key = SnapshotStore.keyOf(cat, Seq("hist", "cs"))
    assert(SnapshotStore.stateOf(key).snapshots.last.version === 1L,
      "collect_stats must not commit a rewrite")
  }

  test("collection is TWO scans total regardless of column count " +
      "(job-counted): 3 opted-in columns run exactly as many jobs as 1") {
    def mkTable(name: String, colsProp: String): Unit = {
      val t = fresh(name)
      spark.sql(s"""CREATE TABLE $t (a BIGINT, b BIGINT, c DOUBLE)
        TBLPROPERTIES ('stats.histogram-columns' = '$colsProp')""")
      spark.sql(s"""INSERT INTO $t
        SELECT id, id % 97, CAST(id AS DOUBLE) / 3 FROM range(0, 20000)""")
    }
    mkTable("jobs1", "a")
    mkTable("jobs3", "a, b, c")
    val sc = spark.sparkContext
    def jobsOf(table: String): Int = {
      val group = s"hist-jobcount-$table-${System.nanoTime()}"
      sc.setJobGroup(group, "histogram job-count pin")
      try spark.sql(s"CALL $cat.system.collect_stats('hist.$table')").collect()
      finally sc.clearJobGroup()
      // Status-tracker data arrives via the async listener bus — poll
      // until the count is stable.
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 10e9.toLong
      while (stable < 5 && System.nanoTime() < deadline) {
        val c = sc.statusTracker.getJobIdsForGroup(group).length
        if (c == last) stable += 1 else { stable = 0; last = c }
        Thread.sleep(50)
      }
      last
    }
    val one = jobsOf("jobs1")
    val three = jobsOf("jobs3")
    assert(one >= 2, s"sanity: collection runs at least its two scans, got $one")
    assert(three === one,
      s"column count must not change the job count (two scans total) — " +
        s"1 column ran $one jobs, 3 columns ran $three; a per-column " +
        "loop would add 2 per column")
    // The batched pass produced real bins for every column.
    val stored = SnapshotStore.stateOf(SnapshotStore.keyOf(
      cat, Seq("hist", "jobs3"))).properties(StatsHistograms.StoreProp)
    assert("\"\\d+\":\\{\"h\"".r.findAllIn(stored).size === 3,
      s"all three columns histogrammed, got: ${stored.take(160)}")
  }
}
