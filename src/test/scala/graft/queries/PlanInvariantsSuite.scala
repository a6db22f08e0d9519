package graft.queries

import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** The flagship plan invariants PLANS.md documents, promoted into
  * assertions so a plan regression fails CI instead of silently drifting
  * from the doc (round-9 verdict item 7). Each test plans the REGISTERED
  * query — the exact pipeline the oracle gate runs — and checks the
  * property that makes it hold at 100 TB, not a timing.
  */
class PlanInvariantsSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  /** Fully-prepared physical plan with AQE off: `sparkPlan` predates
    * EnsureRequirements (no exchanges to assert against), and with AQE on
    * `executedPlan` is an opaque AdaptiveSparkPlanExec wrapper — the
    * documented plan shapes are the pre-AQE prepared tree. */
  private def plan(name: String): SparkPlan = {
    val q = SparkEntry.registry.find(_.name == name)
      .getOrElse(fail(s"query $name not registered"))
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try q.run(spark, dir).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case f: FileSourceScanExec => f }

  test("q01: the date predicate reaches the lineitem parquet scan, and " +
    "the scan reads only referenced columns") {
    val sc = scans(plan("q01_pricing_summary"))
    assert(sc.nonEmpty)
    val line = sc.head
    assert(line.dataFilters.nonEmpty || line.metadata.get("PushedFilters").exists(_ != "[]"),
      s"no pushed filters on the lineitem scan: ${line.metadata.get("PushedFilters")}")
    assert(line.metadata("PushedFilters").contains("l_shipdate"),
      s"l_shipdate not pushed: ${line.metadata("PushedFilters")}")
    assert(line.requiredSchema.fieldNames.length <= 8,
      s"scan reads ${line.requiredSchema.fieldNames.mkString(",")} — not pruned")
  }

  test("q03: dimension joins broadcast and the orders date range is pushed") {
    val p = plan("q03_revenue_by_nation")
    val bhj = p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.length >= 3, s"expected >=3 broadcast joins, got ${bhj.length}:\n$p")
    val ordersScan = scans(p).find(_.metadata.get("Location").exists(_.contains("orders")))
    assert(ordersScan.exists(_.metadata("PushedFilters").contains("o_orderdate")),
      s"o_orderdate range not pushed to the orders scan:\n$p")
  }

  test("q06 and e02: WindowGroupLimit prunes to top-k BELOW the shuffle") {
    Seq("q06_top_orders_per_customer", "e02_knn_brute").foreach { name =>
      val p = plan(name)
      val belowExchange = p.collect {
        case e: ShuffleExchangeLike
            if e.collectFirst { case w: WindowGroupLimitExec => w }.isDefined => e
      }
      assert(belowExchange.nonEmpty,
        s"$name: no WindowGroupLimit below an exchange — per-partition " +
          s"top-k pruning lost, the full fact table would shuffle:\n$p")
    }
  }

  test("q10: global top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q10_top_customers")
    assert(p.collectFirst { case t: TakeOrderedAndProjectExec => t }.isDefined,
      s"TakeOrderedAndProject missing:\n$p")
    assert(p.collectFirst {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }.isEmpty, s"global sort materialized for a top-k:\n$p")
  }

  test("q33 and q44: correlated subqueries are decorrelated away (no " +
    "subquery expression survives optimization)") {
    Seq("q33_small_qty_revenue", "q44_idle_customers").foreach { name =>
      val q = SparkEntry.registry.find(_.name == name).get
      val opt = q.run(spark, dir).queryExecution.optimizedPlan
      val residual = opt.collect { case node =>
        node.expressions.flatMap(_.collect { case s: SubqueryExpression => s })
      }.flatten
      assert(residual.isEmpty,
        s"$name: ${residual.length} subquery expression(s) survived " +
          s"optimization — per-row re-execution at scale:\n$opt")
    }
  }

  test("m08/m09 building blocks: the CDF diff is one full-outer equi-join " +
    "(no nested loop), and the delta fold never shuffles the fact side") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, dir)
    val cur = orders.filter(col("o_custkey") % 10 =!= 7)
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val diffPlan = graft.operators.ChangeDataFeed
        .diff(orders, cur, Seq("o_orderkey"), 1L)
        .queryExecution.executedPlan
      assert(diffPlan.collectFirst {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }.isEmpty, s"cartesian product in the CDF diff:\n$diffPlan")
      assert(diffPlan.collectFirst {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }.isEmpty, s"nested-loop join in the CDF diff:\n$diffPlan")
      val fullOuterEqui = diffPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.joinType.sql == "FULL OUTER" => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
            if j.joinType.sql == "FULL OUTER" => j
      }
      assert(fullOuterEqui.length === 1,
        s"expected exactly one full-outer equi-join, got ${fullOuterEqui.length}:\n$diffPlan")

      // The delta aggregation is |changes|-keyed with a map-side partial:
      // two HashAggregates (partial below, final above the exchange).
      val feed = graft.operators.ChangeDataFeed.diff(orders, cur, Seq("o_orderkey"), 1L)
      val deltaPlan = graft.operators.IncrementalMaintenance.aggDeltas(feed,
          col("old_o_orderpriority"), col("old_o_totalprice"),
          col("new_o_orderpriority"), col("new_o_totalprice"))
        .queryExecution.executedPlan
      val aggs = deltaPlan.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }
      assert(aggs.exists(_.aggregateExpressions.exists(_.mode ==
          org.apache.spark.sql.catalyst.expressions.aggregate.Partial)),
        s"no map-side partial aggregation in the delta fold:\n$deltaPlan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  test("n08 and e14: no cartesian product, and no N-proportional store " +
    "table under a nested-loop join") {
    // Model-sized nested-loop joins (broadcast centroid panels, one-row
    // totals) are the adjudicated bounded pattern; the invariant that
    // matters at 100 TB is that the BIG store tables only ever join
    // hash-partitioned.
    val bigStores = Set("pq_codes", "corpus_bands", "corpus_shingles")
    Seq("n08_neardup_store_probe", "e14_knn_ivfpq_store").foreach { name =>
      val p = plan(name)
      assert(p.collectFirst {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }.isEmpty, s"$name: cartesian product in probe plan:\n$p")
      val bnljOverStore = p.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
            if b.collectFirst {
              case f: FileSourceScanExec
                  if f.tableIdentifier.exists(t => bigStores(t.table)) => f
            }.isDefined => b
      }
      assert(bnljOverStore.isEmpty,
        s"$name: an N-proportional store table sits under a nested-loop join:\n$p")
    }
  }
}
