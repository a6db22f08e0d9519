package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM (Test / fork := true). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SessionFactory.local("graft-test", cores = "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }
  /** Smallest fixture dir — tests should stay fast. */
  val sfDir = "/root/testdata/sf0.001"
}
