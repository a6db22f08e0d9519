package graft

import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plan of each registered query (or the named
  * ones) for scale audits: pushed filters, broadcast joins,
  * TakeOrderedAndProject, whole-stage codegen coverage.
  * Usage: `runMain graft.PlanAudit <sfDir> [queryName...]`
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = SessionFactory
      .configure(SparkSession.builder().master("local[4]"), "graft-plan-audit")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.registry
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        println(s"\n===== ${q.name} =====")
        try println(q.run(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
