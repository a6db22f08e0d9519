package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SkylinePlanSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def randomPts(n: Int, seed: Int) = {
    val r = new scala.util.Random(seed)
    (1L to n.toLong).map(i => (i, r.nextDouble(), r.nextDouble()))
  }

  test("plan-integrated skyline matches the composed operator across partitionings") {
    val data = randomPts(300, 11)
    Seq(1, 4, 13).foreach { parts =>
      val df = data.toDF("id", "d1", "d2").repartition(parts)
      val viaPlan = SkylinePlan.skyline(df, Seq("d1", "d2"))
        .select("id").as[Long].collect().toSet
      val viaOp = graft.operators.Skyline.skyline(df, Seq("d1", "d2"))
        .select("id").as[Long].collect().toSet
      assert(viaPlan === viaOp, s"partitions=$parts")
    }
  }

  test("rows with NULL or NaN dimensions are excluded, not propagated") {
    val pts = Seq(
      (1L, Some(5.0), Some(1.0)),
      (2L, None, Some(9.0)),          // NULL dim → dropped
      (3L, Some(Double.NaN), Some(9.0)), // NaN dim → dropped
      (4L, Some(1.0), Some(5.0)))
      .toDF("id", "d1", "d2")
    val got = SkylinePlan.skyline(pts, Seq("d1", "d2"))
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 4L))
  }

  test("explain shows the GraftSkyline node and pruning narrows the scan") {
    val dir = SparkTestSession.sfDir
    val p = spark.read.parquet(s"$dir/part.parquet")
      .select(
        $"p_partkey", $"p_size", $"p_retailprice", $"p_name", $"p_type",
        $"p_size".cast("double").as("_d1"), (-$"p_retailprice").as("_d2"))
    // Project only 1 payload column above the skyline: because the node
    // declares its dims as expressions, Catalyst's stock ColumnPruning must
    // push the narrowing below it so the parquet scan skips p_name/p_type.
    val df = SkylinePlan.skyline(p, Seq("_d1", "_d2")).select("p_partkey")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("GraftSkyline"), s"no GraftSkyline node in:\n$physical")
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!scans.contains("p_name"), s"scan not pruned:\n$scans")
    assert(scans.contains("p_partkey"))
    // Dim columns survived pruning (they feed the dominance filter).
    assert(scans.contains("p_size") && scans.contains("p_retailprice"), s"dims pruned away:\n$scans")
  }

  test("wide skyline (anti-correlated dims) survives the tree merge across many partitions") {
    // d2 = -d1 makes EVERY point non-dominated: the skyline is O(N), the
    // case the old single coalesce(1) merge was weakest at. 5000 points
    // over 32 partitions exercises the √P middle level (32 → 5 → 1).
    val pts = (1L to 5000L).map(i => (i, i.toDouble, -i.toDouble))
      .toDF("id", "d1", "d2").repartition(32)
    val got = SkylinePlan.skyline(pts, Seq("d1", "d2")).select("id").as[Long].collect()
    assert(got.length === 5000)
    assert(got.toSet === (1L to 5000L).toSet)
  }

  test("declared outputPartitioning matches the single-partition result RDD") {
    // sparkPlan is the planner output before AQE wraps it — SkylineExec is
    // findable there; the runtime partition count comes from the DataFrame.
    val pts = randomPts(100, 7).toDF("id", "d1", "d2").repartition(8)
    val df = SkylinePlan.skyline(pts, Seq("d1", "d2"))
    val exec = df.queryExecution.sparkPlan
      .collectFirst { case e: SkylinePlan.SkylineExec => e }
    assert(exec.nonEmpty, df.queryExecution.sparkPlan.toString)
    assert(exec.get.outputPartitioning ===
      org.apache.spark.sql.catalyst.plans.physical.SinglePartition)
    assert(df.rdd.getNumPartitions === 1)
  }

  test("GraftExtensions injects the skyline strategy, and it plans SkylineNode") {
    // Verified against a fresh SparkSessionExtensions rather than a second
    // SparkSession: getOrCreate() on an existing context returns the shared
    // session (extensions config silently ignored), so a session-based test
    // is vacuous — and closing that session kills every other suite.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val strategies =
      org.apache.spark.sql.graftbridge.GraftTestBridge.plannerStrategies(ext, spark)
    assert(strategies.contains(SkylinePlan.SkylineStrategy), s"injected: $strategies")
    val pts = Seq((1L, 5.0, 1.0)).toDF("id", "d1", "d2")
    val node = SkylinePlan.node(pts.queryExecution.analyzed, Seq("d1", "d2"))
    val planned = SkylinePlan.SkylineStrategy(node)
    assert(planned.nonEmpty && planned.head.isInstanceOf[SkylinePlan.SkylineExec])
    // and it declines everything else
    assert(SkylinePlan.SkylineStrategy(pts.queryExecution.analyzed).isEmpty)
  }
}
