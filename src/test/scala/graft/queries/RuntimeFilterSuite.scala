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
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private val confs = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    // Force a shuffle join: a broadcast join already ships the keys, so
    // Spark (correctly) skips the bloom filter there.
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[A](f: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim join injects a bloom filter on the fact side, same results") {
    withConfs {
      val li = Tables.lineitem(spark, dir)
      val p = Tables.part(spark, dir).filter(col("p_size") === 1)
      val j = li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_size").count()
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$optimized")
      val withFilter = j.collect().toSeq
      // Rewrite must be result-invisible.
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_size").count().collect().toSeq
      assert(withFilter === plain)
    }
  }

  test("broadcast joins skip the bloom filter (keys already ship with the build side)") {
    withConfs {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val li = Tables.lineitem(spark, dir)
      val p = Tables.part(spark, dir).filter(col("p_size") === 1)
      val plan = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("might_contain"), plan)
    }
  }
}
