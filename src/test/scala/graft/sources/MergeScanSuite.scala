package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** K-WAY MERGE over sorted-overlapping scans ([[MemScan.mergeGroups]],
  * [[SortedMergeExec]]): the steady-state compacted-plus-sorted-appends
  * shape — big range-disjoint compacted files plus small sorted appends
  * straddling them — serves a global ORDER BY by MERGING each
  * range-connected component's sorted streams and concatenating the
  * disjoint components, no Exchange, no Sort, one head row per stream.
  * Gates: fan-in bound (a component wider than
  * `read.merge-scan.max-fan-in` keeps the parallel Sort),
  * `read.merge-scan=false` A/B lever, full-row merge ordering under
  * multi-column sort keys, and AQE-ON end-to-end coverage (production
  * runs adaptive; the plan pins must not only hold under
  * `spark.sql.adaptive.enabled=false`). */
class MergeScanSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mrg")
    spark.sql(s"DROP TABLE IF EXISTS $cat.mrg.$name")
    s"$cat.mrg.$name"
  }

  /** The truly-executed plan — unwraps AQE's adaptive root (materialize
    * first: the final plan exists only after execution). */
  private def finalPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  /** Every node, descending INTO adaptive query stages (QueryStageExec
    * is a leaf — a plain collect would stop at the stage boundary). */
  private def nodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: nodes(q.plan)
      case n => Seq(n)
    }
  private def sorts(p: SparkPlan): Int =
    nodes(p).count(_.isInstanceOf[SortExec])
  private def shuffles(p: SparkPlan): Int =
    nodes(p).count(_.isInstanceOf[ShuffleExchangeExec])
  private def merges(p: SparkPlan): Seq[SortedMergeExec] =
    nodes(p).collect { case m: SortedMergeExec => m }

  /** Compacted range-disjoint files + one sorted straddling append. */
  private def buildSteadyState(t: String, short: String): Unit = {
    spark.sql(s"""CREATE TABLE $t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('write.sort-order' = 'k',
                     'write.distribution-mode' = 'range')""")
    spark.range(0, 40000).selectExpr("pmod(id * 7919, 40000) AS k", "id AS v")
      .repartition(4).writeTo(t).append()
    // Compact with AQE OFF (its shuffle coalescing would fold the small
    // range partitions back into one file).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try spark.sql(s"CALL $cat.system.rewrite_data_files('mrg.$short', 4000)")
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // The sorted append straddles the first compacted files.
    spark.sql(s"INSERT INTO $t SELECT id AS k, id AS v FROM range(0, 5000)")
  }

  test("steady-state shape: straddling append merges with exactly its " +
      "component; strict component boundaries claim RangePartitioning") {
    val t = fresh("steady")
    buildSteadyState(t, "steady")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.sql(s"SELECT k, v FROM $t ORDER BY k")
      val plan = q.queryExecution.executedPlan
      assert(sorts(plan) === 0 && shuffles(plan) === 0,
        s"sorted-overlapping files must merge, not re-sort:\n$plan")
      val m = merges(plan)
      assert(m.nonEmpty, s"expected the SortedMerge node:\n$plan")
      // All inter-component boundaries are strictly disjoint here (the
      // domain is a permutation; the append ends inside a compacted
      // file's range) — the exec may claim RangePartitioning.
      assert(m.head.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RangePartitioning],
        s"strict boundaries must claim RangePartitioning, got " +
          s"${m.head.outputPartitioning}")
      val ks = q.collect().map(_.getLong(0)).toSeq
      assert(ks === ks.sorted && ks.length === 45000,
        "the merged order must actually hold over all rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("multi-column sort key: boundary-touching files MERGE on full row " +
      "order (concatenation would interleave the secondary column wrong)") {
    val t = fresh("multi")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('write.sort-order' = 'k, v')""")
    // Two sorted files TOUCHING at k = 100 — and the boundary rows'
    // SECONDARY values interleave across the files: file A holds
    // (100, 111), file B holds (100, 2). Concat would emit 111 before 2.
    spark.sql(s"INSERT INTO $t SELECT id AS k, id + 11 AS v FROM range(0, 101)")
    spark.sql(s"INSERT INTO $t SELECT id AS k, id - 98 AS v FROM range(100, 200)")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.sql(s"SELECT k, v FROM $t ORDER BY k, v")
      val plan = q.queryExecution.executedPlan
      assert(sorts(plan) === 0 && merges(plan).nonEmpty,
        s"touching files under a multi-column order must merge:\n$plan")
      val rows = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows === rows.sorted, "full-row merge order must hold")
      assert(rows.contains((100L, 2L)) && rows.contains((100L, 111L)))
      assert(rows.indexOf((100L, 2L)) < rows.indexOf((100L, 111L)),
        "the boundary tie must order by the secondary column ACROSS files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("fan-in bound: a component wider than read.merge-scan.max-fan-in " +
      "keeps the parallel Sort") {
    val t = fresh("fanin")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('write.sort-order' = 'k',
                     'read.merge-scan.max-fan-in' = '2')""")
    // Three sorted files, each spanning the whole domain → ONE component
    // of three streams > the bound of 2.
    for (j <- 0 until 3)
      spark.sql(s"INSERT INTO $t SELECT id * 3 + $j AS k, id AS v " +
        "FROM range(0, 1000, 1, 1)")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.sql(s"SELECT k FROM $t ORDER BY k")
      assert(sorts(q.queryExecution.executedPlan) === 1,
        s"fan-in past the bound must keep the Sort:\n" +
          q.queryExecution.executedPlan)
      val ks = q.collect().map(_.getLong(0)).toSeq
      assert(ks === ks.sorted)
      // Raising the bound flips the SAME table to the merge plan.
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
        "('read.merge-scan.max-fan-in' = '8')")
      val q2 = spark.sql(s"SELECT k FROM $t ORDER BY k")
      assert(sorts(q2.queryExecution.executedPlan) === 0 &&
        merges(q2.queryExecution.executedPlan).nonEmpty,
        s"within the bound the merge must plan:\n" +
          q2.queryExecution.executedPlan)
      assert(q2.collect().map(_.getLong(0)).toSeq === ks)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("AQE ON end-to-end: range-disjoint concat AND sorted-overlap merge " +
      "both execute adaptively — final plan has the node, no Sort, " +
      "order holds") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true",
      "fixture: this test runs under AQE")
    // Force the adaptive wrapper even though the elided plan has no
    // Exchange (AQE normally skips exchange-free plans — which would
    // quietly test the non-adaptive path again): the pin is that AQE's
    // re-planning PRESERVES the custom node and its order.
    spark.conf.set("spark.sql.adaptive.forceApply", "true")
    try {
    // Concat (pure disjoint) half.
    val tc = fresh("aqec")
    spark.sql(s"""CREATE TABLE $tc (k BIGINT, v BIGINT)
      TBLPROPERTIES ('write.sort-order' = 'k',
                     'write.distribution-mode' = 'range')""")
    spark.range(0, 20000).selectExpr("pmod(id * 7919, 20000) AS k", "id AS v")
      .repartition(4).writeTo(tc).append()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try spark.sql(s"CALL $cat.system.rewrite_data_files('mrg.aqec', 4000)")
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val qc = spark.sql(s"SELECT k, v FROM $tc ORDER BY k")
    val kc = qc.collect().map(_.getLong(0)).toSeq // materialize first
    val pc = finalPlan(qc)
    assert(sorts(pc) === 0 && shuffles(pc) === 0,
      s"AQE must not reintroduce the Sort over a concat plan:\n$pc")
    assert(nodes(pc).exists(_.isInstanceOf[RangeConcatExec]),
      s"expected RangeConcat in the adaptive final plan:\n$pc")
    assert(kc === (0L until 20000L))

    // Merge (straddling append) half.
    val tm = fresh("aqem")
    buildSteadyState(tm, "aqem")
    val qm = spark.sql(s"SELECT k, v FROM $tm ORDER BY k")
    val km = qm.collect().map(_.getLong(0)).toSeq
    val pm = finalPlan(qm)
    assert(sorts(pm) === 0 && shuffles(pm) === 0,
      s"AQE must not reintroduce the Sort over a merge plan:\n$pm")
    assert(merges(pm).nonEmpty,
      s"expected SortedMerge in the adaptive final plan:\n$pm")
    assert(km === km.sorted && km.length === 45000)
    // Prove the adaptive wrapper actually engaged for at least one half
    // (otherwise this test would quietly re-run the non-adaptive path).
    assert(qc.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec]
      || qm.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
      "fixture: forceApply should wrap the plan adaptively")
    } finally spark.conf.unset("spark.sql.adaptive.forceApply")
  }

  test("merge + merge-on-read deletes: the direct component readers " +
      "apply delete structures exactly like the planned scan") {
    val t = fresh("mor")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('write.sort-order' = 'k',
                     'write.delete.mode' = 'merge-on-read')""")
    // Two sorted files with fully overlapping ranges → one merged
    // component of two streams.
    spark.sql(s"INSERT INTO $t SELECT id * 2 AS k, id AS v FROM range(0, 500, 1, 1)")
    spark.sql(s"INSERT INTO $t SELECT id * 2 + 1 AS k, id AS v FROM range(0, 500, 1, 1)")
    spark.sql(s"DELETE FROM $t WHERE k % 10 = 3") // MOR: position deletes
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.sql(s"SELECT k FROM $t ORDER BY k")
      assert(merges(q.queryExecution.executedPlan).nonEmpty,
        s"plan:\n${q.queryExecution.executedPlan}")
      val ks = q.collect().map(_.getLong(0)).toSeq
      assert(ks === (0L until 1000L).filter(_ % 10 != 3),
        "the merged streams must apply the position deletes")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("merge + ADD COLUMN: pre-evolution files pad NULL through the " +
      "direct component readers") {
    val t = fresh("evo")
    spark.sql(s"""CREATE TABLE $t (k BIGINT)
      TBLPROPERTIES ('write.sort-order' = 'k')""")
    spark.sql(s"INSERT INTO $t SELECT id * 2 AS k FROM range(0, 100, 1, 1)")
    spark.sql(s"ALTER TABLE $t ADD COLUMN extra STRING")
    spark.sql(s"INSERT INTO $t SELECT id * 2 + 1 AS k, concat('x', id) AS extra " +
      "FROM range(0, 100, 1, 1)")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.sql(s"SELECT k, extra FROM $t ORDER BY k")
      assert(merges(q.queryExecution.executedPlan).nonEmpty,
        s"plan:\n${q.queryExecution.executedPlan}")
      val rows = q.collect()
      assert(rows.map(_.getLong(0)).toSeq === (0L until 200L))
      assert(rows.filter(_.getLong(0) % 2 == 0).forall(_.isNullAt(1)),
        "pre-ALTER files must pad NULL")
      assert(rows.find(_.getLong(0) == 3L).get.getString(1) === "x1")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ORDER BY + LIMIT over the merge reads the leading component only " +
      "— and the answer matches the Sort twin") {
    val t = fresh("limit")
    buildSteadyState(t, "limit")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.sql(s"SELECT k FROM $t ORDER BY k LIMIT 10")
      assert(sorts(q.queryExecution.executedPlan) === 0,
        s"the limit must ride the merged order:\n" +
          q.queryExecution.executedPlan)
      val top = q.collect().map(_.getLong(0)).toSeq
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
        "('read.merge-scan' = 'false')")
      val twin = spark.sql(s"SELECT k FROM $t ORDER BY k LIMIT 10")
        .collect().map(_.getLong(0)).toSeq
      assert(top === twin, "merge and Sort twins must agree")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
