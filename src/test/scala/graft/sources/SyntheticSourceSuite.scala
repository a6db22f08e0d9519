package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SyntheticSourceSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def table(rows: Long = 1000, partitions: Int = 4) =
    spark.read.format("graft.sources.SyntheticSource")
      .option("rows", rows.toString).option("partitions", partitions.toString)
      .load()

  test("reads the declared row count deterministically") {
    val df = table()
    assert(df.count() === 1000L)
    // Deterministic content: same ids → same derived values, twice.
    val a = df.filter($"event_id" < 10).collect().map(_.toString).sorted
    val b = table().filter($"event_id" < 10).collect().map(_.toString).sorted
    assert(a === b)
    assert(df.select("event_type").distinct().count() === 3)
  }

  test("id-range filters are pushed down and narrow partition planning") {
    val df = table(rows = 1000, partitions = 4)
      .filter($"event_id" >= 900 && $"event_id" < 950)
    assert(df.count() === 50)
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    // Both bounds reached the source...
    assert(scan.scan.description().contains("[900, 950)"),
      s"range not narrowed: ${scan.scan.description()}")
    // ...and partition planning covers only the 50-id slice, not the table.
    val planned = scan.inputPartitions.map(_.asInstanceOf[SyntheticPartition])
    assert(planned.map(p => p.end - p.start).sum === 50)
    assert(planned.forall(p => p.start >= 900 && p.end <= 950))
  }

  test("residual filters stay post-scan while id filters are consumed") {
    val df = table().filter($"event_id" < 100 && $"event_type" === "click")
    val expected = (0L until 100L).count(SyntheticSource.typeOf(_) == "click")
    assert(df.count() === expected)
    val plan = df.queryExecution.executedPlan.toString
    // The event_type predicate must still be applied above the scan.
    assert(plan.contains("Filter"), plan)
  }

  test("column pruning reaches the reader schema") {
    val df = table().select("user_id")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b }.get
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("user_id"))
    assert(df.distinct().count() <= 100)
  }

  test("scan parallelism matches the requested partition count") {
    val parts = table(rows = 1000, partitions = 7)
      .select(spark_partition_id().as("p")).distinct().count()
    assert(parts === 7)
  }

  test("empty result range plans zero partitions instead of failing") {
    val df = table().filter($"event_id" > 5000)
    assert(df.count() === 0)
  }

  test("Long.MaxValue boundary filters don't wrap the consumed range") {
    // v+1 overflow on the consumed (non-residual) filter would silently
    // return ALL rows for > MaxValue and ZERO rows for <= MaxValue.
    assert(table().filter($"event_id" > Long.MaxValue).count() === 0)
    assert(table().filter($"event_id" <= Long.MaxValue).count() === 1000)
    assert(table().filter($"event_id" === Long.MaxValue).count() === 0)
  }
}
