package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM (Test / fork := true). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    // Fresh temp warehouse per JVM: the in-memory catalog starts empty, so a
    // stale ./spark-warehouse from an earlier run would collide on CREATE.
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val s = SessionFactory
      .configure(SparkSession.builder().master("local[4]"), "graft-test")
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  /** Smallest fixture dir — tests should stay fast. Resolved via
    * [[Fixtures]] so CI (no driver-generated testdata) falls back to the
    * committed `ci/fixtures/sf0.001` copy. */
  val sfDir: String = Fixtures.sf0001
}
