package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Runtime bloom-filter join pruning — the engine-level mechanism that
  * pre-filters the fact side of a selective shuffle join BEFORE the
  * exchange: Spark builds a bloom filter over the (filtered) build side's
  * join keys and injects `might_contain` into the probe side's scan stage.
  * At 100 TB this is the difference between shuffling the whole fact table
  * and shuffling the ~matching slice.
  *
  * The defaults only arm the rewrite at real scale (application side >
  * 10 GB), so the suite lowers the thresholds to demonstrate the plan
  * shape at fixture scale — production inherits the defaults.
  */
class RuntimeFilterSuite extends AnyFunSuite {
  // Own session (shared SparkContext, isolated SessionState): these tests
  // flip autoBroadcastJoinThreshold, which would flake concurrently-running
  // suites' plan assertions if set on the shared session's conf.
  private lazy val spark = {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // Force a shuffle join: a broadcast join already ships the keys, so
    // Spark (correctly) skips the bloom filter there.
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }
  private val dir = SparkTestSession.sfDir

  test("selective dim join injects a bloom filter on the fact side, same results") {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).filter(col("p_size") === 1)
    val j = li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_size").count()
    val optimized = j.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
      s"no runtime bloom filter injected:\n$optimized")
    val withFilter = j.collect().toSeq
    // Rewrite must be result-invisible: same join with the filter off.
    val s2 = SparkTestSession.spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plain = Tables.lineitem(s2, dir)
      .join(Tables.part(s2, dir).filter(col("p_size") === 1),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_size").count().collect().toSeq
    assert(withFilter === plain)
  }

  test("broadcast joins skip the bloom filter (keys already ship with the build side)") {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).filter(col("p_size") === 1)
    val plan = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("might_contain"), plan)
  }
}
