package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** JDBC source/sink coverage (SURVEY §2.2) against embedded Derby — the
  * same `format("jdbc")` path a warehouse would use, minus the network.
  */
class JdbcSourceSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("JDBC write → read round-trip with predicate pushdown") {
    val src = Tables.nation(spark, dir)
    src.write.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "nation").mode("overwrite").save()

    val back = spark.read.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "nation").load()
    assert(back.count() === src.count())

    val filtered = back.filter(col("n_regionkey") === 0)
    assert(filtered.count() ===
      src.filter(col("n_regionkey") === 0).count())
    // The filter reaches the JDBC scan as a pushed predicate.
    val scan = filtered.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters") && scan.toLowerCase.contains("n_regionkey"),
      s"expected pushed JDBC filter:\n$scan")
  }

  test("JDBC partitioned parallel read returns identical data") {
    val back = spark.read.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "nation")
      .option("partitionColumn", "n_nationkey")
      .option("lowerBound", "0").option("upperBound", "25")
      .option("numPartitions", "4")
      .load()
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === Tables.nation(spark, dir).count())
  }
}
