package graft.queries

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bucketing for co-located joins (the prompt's §scale checklist): two
  * tables bucketed on the same key join without any shuffle exchange —
  * at 100 TB this removes the dominant cost of repeated fact-fact joins.
  */
class BucketedJoinSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("join of two tables bucketed on the key plans without a shuffle") {
    Tables.orders(spark, dir)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bkt_orders")
    Tables.lineitem(spark, dir)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bkt_lineitem")

    val joined = spark.table("bkt_lineitem")
      .join(spark.table("bkt_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))

    // Force final plan (AQE), then assert the join stage had no shuffle
    // upstream of it: bucketed scans satisfy the join's distribution.
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    val shuffles = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeLike => s
    }
    // Exactly one exchange is legitimate: the single-key groupBy after the
    // join. The join itself must not shuffle either side.
    assert(shuffles.length <= 1, s"expected at most the aggregate exchange:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"))
  }
}
