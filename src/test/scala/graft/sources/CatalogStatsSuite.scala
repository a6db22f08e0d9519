package graft.sources

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.queries.{Governance, Tables}

/** Catalog scans report PLANNER STATISTICS (`SupportsReportStatistics`):
  * row counts and sizes come from the manifest entries the scan build
  * already filtered, so (a) a dimension-sized catalog table STATICALLY
  * plans as the broadcast side of a join — without stats every V2
  * relation costs `spark.sql.defaultSizeInBytes` ≈ infinite and can
  * never broadcast — and (b) the estimate TIGHTENS with pushed
  * predicates because pushdown pruned the file set before the scan was
  * built. The m21 gate pins the DPP consequence end-to-end. */
class CatalogStatsSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.stats")
    spark.sql(s"DROP TABLE IF EXISTS $cat.stats.$name")
    s"$cat.stats.$name"
  }

  test("scan reports exact manifest row count and a finite size") {
    val t = fresh("rows")
    spark.range(0, 1234).selectExpr("id", "id * 2 AS v").writeTo(t).create()
    val stats = spark.table(t).queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(1234)))
    // Finite and row-proportional — nowhere near the 8 EiB default.
    assert(stats.sizeInBytes > 0 &&
      stats.sizeInBytes < 1234L * 1024)
  }

  test("estimate tightens with pushed partition predicates") {
    val t = fresh("pruned")
    spark.sql(s"CREATE TABLE $t (id BIGINT, p INT) PARTITIONED BY (p)")
    spark.range(0, 1000).selectExpr("id", "CAST(id % 10 AS INT) AS p")
      .writeTo(t).append()
    val full = spark.table(t).queryExecution.optimizedPlan.stats
    // The Filter node keeps its child's size under the size-only visitor;
    // the claim is about the SCAN LEAF, which pushdown built over the
    // pruned file set.
    val prunedLeaf = spark.table(t).filter(col("p") === 3)
      .queryExecution.optimizedPlan.collectLeaves().head.stats
    assert(full.rowCount.contains(BigInt(1000)))
    assert(prunedLeaf.rowCount.contains(BigInt(100)),
      s"partition pushdown should prune the estimate, got ${prunedLeaf.rowCount}")
    assert(prunedLeaf.sizeInBytes * 5 < full.sizeInBytes)
  }

  test("column pruning shrinks the size estimate") {
    val t = fresh("narrow")
    spark.range(0, 500)
      .selectExpr("id", "repeat('x', 10) AS a", "repeat('y', 10) AS b",
        "id * 2 AS c", "id * 3 AS d")
      .writeTo(t).create()
    val wide = spark.table(t).queryExecution.optimizedPlan.stats.sizeInBytes
    val narrow = spark.table(t).select("id")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(narrow < wide,
      s"projecting 1 of 5 columns should shrink the estimate: $narrow vs $wide")
  }

  test("dimension-sized catalog table statically plans BroadcastHashJoin") {
    val dim = fresh("dim")
    spark.sql(s"CREATE TABLE $dim (k BIGINT, name STRING)")
    spark.range(0, 25).selectExpr("id AS k", "concat('n', id) AS name")
      .writeTo(dim).append()
    Tables.orders(spark, SparkTestSession.sfDir)
      .createOrReplaceTempView("stats_fact_src")
    // AQE off: the pin is on STATIC planning from reported stats alone
    // (AQE could rescue a bad default post-shuffle; that is not the claim).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.sql(
        s"""SELECT d.name, count(*) AS n FROM stats_fact_src f
           |JOIN $dim d ON f.o_custkey % 25 = d.k GROUP BY d.name""".stripMargin)
      val bhj = q.queryExecution.sparkPlan.collect {
        case b: BroadcastHashJoinExec => b
      }
      assert(bhj.nonEmpty,
        s"expected a static BroadcastHashJoin, got:\n${q.queryExecution.sparkPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("m21 gate: catalog-dim star join broadcasts and engages DPP") {
    val df = Governance.m21CatalogDimStar.run(spark, SparkTestSession.sfDir)
    assert(df.collect().nonEmpty) // in-query requires pin the plan shape
  }

  test("string width stats: avgLen/maxLen merge from manifests, survive " +
      "restart AND the long-string min/max invalidation") {
    val t = fresh("widths")
    spark.range(0, 2000)
      .selectExpr("id", "repeat('w', 100) AS wide",
        "concat(repeat('x', 300), id) AS huge",
        "CASE WHEN id % 4 = 0 THEN NULL ELSE 'ab' END AS short")
      .writeTo(t).create()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      SnapshotStore.tables.clear() // prove the manifest round-trip
      val stats = spark.table(t).queryExecution.optimizedPlan
        .collectLeaves().head.stats.attributeStats
      def of(c: String) = stats.find(_._1.name == c).map(_._2)
        .getOrElse(fail(s"no stats for $c: ${stats.keys}"))
      assert(of("wide").avgLen.contains(100L) &&
        of("wide").maxLen.contains(100L))
      // >256-char strings invalidate min/max (unbounded manifests) but
      // width tracking keeps going — the wide-value case IS the one
      // row-width estimation exists for.
      assert(of("huge").avgLen.exists(l => l >= 300L && l <= 305L),
        s"huge avgLen: ${of("huge").avgLen}")
      assert(of("huge").distinctCount.isEmpty && of("huge").min.isEmpty,
        "invalidated bounds must not be claimed")
      // avgLen averages over NON-NULL rows only; nulls counted exactly.
      assert(of("short").avgLen.contains(2L))
      assert(of("short").nullCount.contains(500L))
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("manifest min/max feed CBO filter selectivity: a selective range " +
      "predicate flips the broadcast decision distinctCount alone cannot") {
    val fact = fresh("mm_fact")
    val probe = fresh("mm_probe")
    // v is SCATTERED across files (id * 7919 mod N) so every file's
    // [min, max] spans ~the whole domain and FILE-LEVEL stats pruning
    // cannot shrink the scan — the flip below is attributable to the
    // reported column ranges, not to pushdown having already pruned.
    spark.range(0, 40000)
      .selectExpr("id AS k", "(id * 7919) % 40000 AS v",
        "concat('u', (id * 7919) % 40000) AS s")
      .writeTo(fact).create()
    spark.range(0, 40000).selectExpr("id AS k", "id AS w")
      .writeTo(probe).create()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
    try {
      def bhjOf(pred: String) = spark.sql(
        s"""SELECT count(*) AS n FROM $probe p
           |JOIN (SELECT k FROM $fact WHERE $pred) f ON p.k = f.k""".stripMargin)
        .queryExecution.sparkPlan.collect { case b: BroadcastHashJoinExec => b }
      // Long column: ndv ~40k AND range [0, 39999] → `v >= 39990` is
      // estimable at ~10 rows → far under the threshold → broadcast.
      assert(bhjOf("v >= 39990").nonEmpty,
        "a range-estimable selective predicate should broadcast the " +
          "filtered side statically")
      // String column: ndv is tracked but ranges are deliberately not
      // reported (ValueInterval cannot estimate string ranges) — the
      // same shape stays un-broadcast. This is the "distinctCount alone
      // cannot" half of the claim.
      assert(bhjOf("s >= 'u9999'").isEmpty,
        "a string range predicate has no usable interval and must not " +
          "pretend selectivity")
      // Statistics must be invisible in the answer.
      assert(spark.sql(s"SELECT count(*) AS n FROM $probe p JOIN " +
        s"(SELECT k FROM $fact WHERE v >= 39990) f ON p.k = f.k")
        .head().getLong(0) === 10L)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
