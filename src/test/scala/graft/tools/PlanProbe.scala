package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one registered query at a given SF and dump its physical
  * plan. `Test/runMain graft.tools.PlanProbe <query> <sfDir> [cpus]` */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2) else "8"
    val spark = graft.SessionFactory
      .configure(SparkSession.builder().master(s"local[$cpus]"), "plan-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val df = q(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println(f"[probe] $name cold ${(System.nanoTime() - t0) / 1e9}%.2f s")
    // Min-of-3 warm: ambient host load distorts single passes (BASELINE.md).
    val warms = (1 to 3).map { _ =>
      val t1 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t1) / 1e9
    }
    println(f"[probe] $name warm ${warms.min}%.2f s (3 passes)")
    df.explain("formatted")
    spark.stop()
  }
}
