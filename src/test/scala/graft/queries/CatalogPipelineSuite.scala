package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CatalogPipelineSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  import spark.implicits._

  test("catalog round-trip equals the direct aggregate and reruns idempotently") {
    val direct = Tables.orders(spark, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), Q.dsum(col("o_totalprice")).as("t"))
      .orderBy("o_orderpriority")
      .as[(String, Long, Double)].collect().toSeq
    assert(direct.nonEmpty)
    // Two runs in a row: CREATE IF NOT EXISTS converges, INSERT OVERWRITE
    // replaces — the second result must be identical, not doubled.
    val r1 = CatalogPipeline.r01CatalogRoundtrip.run(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    val r2 = CatalogPipeline.r01CatalogRoundtrip.run(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    assert(r1 === direct)
    assert(r2 === direct)
  }

  test("ANALYZE TABLE feeds catalog stats into the optimizer's size estimate") {
    CatalogPipeline.r01CatalogRoundtrip.run(spark, dir) // ensure provisioned
    val t = "graft_e2e.orders_curated"
    spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        "orders_curated", Some("graft_e2e")))
    val stats = cat.stats
    assert(stats.isDefined, "ANALYZE must persist table-level stats")
    assert(stats.get.rowCount.exists(_ > 0), s"row count missing: $stats")
    // The optimizer must see the measured size, not a default guess —
    // this is what lets CBO pick broadcast sides on catalog tables.
    val planned = spark.table(t).queryExecution.optimizedPlan.stats
    assert(planned.sizeInBytes === stats.get.sizeInBytes,
      s"optimizer size ${planned.sizeInBytes} != catalog ${stats.get.sizeInBytes}")
  }

  test("the filtered aggregate prunes partitions of the catalog table") {
    CatalogPipeline.r01CatalogRoundtrip.run(spark, dir) // ensure provisioned
    val plan = spark.table("graft_e2e.orders_curated")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .queryExecution.executedPlan.toString
    // DSv1 partitioned scan: the priority filter must land in PartitionFilters
    // (directory pruning), not in the data filters.
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("o_orderpriority"), plan)
  }
}
