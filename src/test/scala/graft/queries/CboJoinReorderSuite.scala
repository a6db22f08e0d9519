package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Cost-based join reorder: with table + column statistics (`ANALYZE TABLE
  * … FOR ALL COLUMNS`) and CBO enabled, a multi-way join written in a
  * deliberately bad order (fact ⋈ fact first, tiny dim last) must be
  * re-associated by the optimizer so the selective dimension constrains the
  * plan early. At 100 TB this is the difference between shuffling two fact
  * tables' full width and probing them with a broadcast dim — stats are what
  * let Catalyst see it, which is why `CatalogAutomation`-provisioned tables
  * are ANALYZE-able (CatalogPipelineSuite pins stats propagation; this suite
  * pins what the optimizer DOES with them).
  */
class CboJoinReorderSuite extends AnyFunSuite {
  private lazy val base = SparkTestSession.spark

  /** Leaf relation names in join-tree order (left-deep traversal). */
  private def joinLeafOrder(plan: LogicalPlan): Seq[String] = plan match {
    case j: Join => joinLeafOrder(j.left) ++ joinLeafOrder(j.right)
    case other =>
      val leaves = other.collectLeaves()
      if (leaves.isEmpty) Seq.empty
      else leaves.flatMap(l => l.toString.linesIterator.take(1)).map(_.trim)
  }

  private def firstJoin(plan: LogicalPlan): Option[Join] =
    plan.collectFirst { case j: Join => j }

  test("column stats flip a fact-fact-first join into a dim-first order") {
    // Isolated session: CBO confs + a fresh database, leaving the shared
    // session's planner behavior untouched for other suites.
    val spark = base.newSession()
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cbo")
    spark.sql("USE graft_cbo")
    try {
      spark.sql("DROP TABLE IF EXISTS fact_a")
      spark.sql("DROP TABLE IF EXISTS fact_b")
      spark.sql("DROP TABLE IF EXISTS dim")
      spark.range(0, 20000)
        .selectExpr("id AS k", "id % 97 AS ka", "CAST(id AS DOUBLE) AS xa")
        .write.saveAsTable("fact_a")
      spark.range(0, 20000)
        .selectExpr("id AS k", "id % 89 AS kb", "CAST(id AS DOUBLE) AS xb")
        .write.saveAsTable("fact_b")
      spark.range(0, 8)
        .selectExpr("id AS k", "CAST(id AS STRING) AS name")
        .write.saveAsTable("dim")
      Seq("fact_a", "fact_b", "dim").foreach(t =>
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))

      // Written order: fact_a ⋈ fact_b first (the expensive pair), the
      // 8-row dim last. Star-schema detection + cost-based reorder should
      // re-associate so dim joins before the second fact.
      val sql = """SELECT count(*) AS n
        FROM fact_a a JOIN fact_b b ON a.k = b.k JOIN dim d ON a.k = d.k"""

      def leafOrder(cbo: Boolean): Seq[String] = {
        spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
        val order = joinLeafOrder(
          firstJoin(spark.sql(sql).queryExecution.optimizedPlan)
            .getOrElse(fail("no join in optimized plan")))
        order.map {
          case s if s.contains("fact_a") => "fact_a"
          case s if s.contains("fact_b") => "fact_b"
          case s if s.contains("dim") => "dim"
          case s => s
        }
      }

      val without = leafOrder(cbo = false)
      val withCbo = leafOrder(cbo = true)
      assert(without === Seq("fact_a", "fact_b", "dim"),
        s"baseline should keep the written (bad) order, got $without")
      assert(withCbo.take(2).contains("dim"),
        s"CBO should pull the 8-row dim before the second fact table, got $withCbo")

      // And the reorder is not cosmetic: the dim side of the first join is
      // small enough that the physical plan broadcasts it.
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val physical = spark.sql(sql).queryExecution.executedPlan.toString
      assert(physical.contains("BroadcastHashJoin"), physical)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
    }
  }
}
