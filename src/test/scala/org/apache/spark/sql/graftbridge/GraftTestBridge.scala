package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.execution.SparkStrategy

/** Test-only access to `private[sql]` extension internals, so suites can
  * verify what [[graft.functions.GraftExtensions]] injects without building
  * (and worse, closing) a second SparkSession on the shared context —
  * `getOrCreate` returns the existing session (ignoring the extensions
  * config) and closing it kills every concurrently-running suite.
  */
object GraftTestBridge {
  /** The planner strategies a fresh session would receive from `ext`. */
  def plannerStrategies(ext: SparkSessionExtensions, spark: SparkSession): Seq[SparkStrategy] =
    ext.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])
}
