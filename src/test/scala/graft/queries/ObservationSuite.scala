package graft.queries

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `Dataset.observe` — pipeline observability without a second pass: data-
  * quality counters ride the same job as the transform they audit. At
  * 100 TB a separate metrics scan costs as much as the query; observation
  * metrics are free (accumulator-backed, computed inline). */
class ObservationSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("observation metrics ride the main job: row counts and null audit in one pass") {
    val obs = Observation("docs_quality")
    val out = Tables.documents(spark, dir)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1).otherwise(0)).as("n_empty"),
        min(length(col("text"))).as("min_len"))
      .filter(col("lang") === "en")
      .count()
    val m = obs.get
    // The observation sees the PRE-filter stream (it's attached below the
    // filter), so its row count is the full table even though the action
    // returned only the English slice.
    assert(m("n_rows").asInstanceOf[Long] === 500L)
    assert(out < 500L && out > 0L)
    assert(m("n_empty").asInstanceOf[Long] === 0L)
    assert(m("min_len").asInstanceOf[Int] > 0)
  }

  test("observed aggregate matches the same aggregate computed as a query") {
    val obs = Observation("li_sum")
    Tables.lineitem(spark, dir)
      .observe(obs, Q.dsum(col("l_quantity")).as("sum_qty"))
      .write.format("noop").mode("overwrite").save()
    val direct = Tables.lineitem(spark, dir)
      .agg(Q.dsum(col("l_quantity")).as("s")).head.getDouble(0)
    assert(obs.get("sum_qty").asInstanceOf[Double] === direct)
  }
}
