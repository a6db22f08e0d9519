package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Union
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The optimizer-rule form of the ghost rewrite: eligible trailing-range
  * windows are rewritten transparently (plan gains the Union + ghost
  * filter, results identical); ineligible shapes — ROWS frames, ranking
  * functions, mixed ranges — are left byte-identical.
  */
class GhostedRangeWindowRewriteSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ GhostedRangeWindowRewrite
    spark.conf.set(GhostedRangeWindowRewrite.EnabledKey, "true")
    try f finally {
      spark.conf.unset(GhostedRangeWindowRewrite.EnabledKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq GhostedRangeWindowRewrite)
    }
  }

  private val hr = 3600000000L

  private def sample: DataFrame = Seq(
      (1L, "a", 0L, 1.0), (2L, "a", hr, 2.0), (3L, "a", 2 * hr + 1L, 4.0),
      (4L, "a", 2 * hr + hr / 2, 8.0), (5L, "b", hr, 16.0))
    .toDF("id", "k", "ts_us", "v")

  private def trailing(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("k").orderBy("ts_us").rangeBetween(-hr, 0)
    df.select($"id", count(lit(1)).over(w).as("n"), sum($"v").over(w).as("s"))
  }

  test("eligible window is rewritten to the ghost form and results are identical") {
    val baseline = trailing(sample).collect().toSet
    withRule {
      val q = trailing(sample)
      val opt = q.queryExecution.optimizedPlan
      assert(opt.collectFirst { case u: Union => u }.isDefined,
        s"rewrite did not fire:\n$opt")
      assert(opt.toString.contains("_graft_owner"), opt.toString)
      assert(q.collect().toSet === baseline)
    }
  }

  test("null sort keys keep their own peer group (not doubled by ghosts)") {
    val withNulls = sample.unionAll(
      Seq((9L, "a", 0L, 32.0)).toDF("id", "k", "ts_us", "v")
        .withColumn("ts_us", lit(null).cast("long")))
    val baseline = trailing(withNulls).collect().toSet
    withRule {
      val got = trailing(withNulls).collect().toSet
      assert(got === baseline)
    }
  }

  test("ROWS frames, ranking functions, and mixed ranges are not rewritten") {
    withRule {
      val rows = sample.select(sum($"v").over(
        Window.partitionBy("k").orderBy("ts_us").rowsBetween(-2, 0)).as("s"))
      assert(rows.queryExecution.optimizedPlan
        .collectFirst { case u: Union => u }.isEmpty, "ROWS frame rewritten")

      val rank = sample.select(row_number().over(
        Window.partitionBy("k").orderBy("ts_us")).as("rn"))
      assert(rank.queryExecution.optimizedPlan
        .collectFirst { case u: Union => u }.isEmpty, "ranking fn rewritten")

      val wA = Window.partitionBy("k").orderBy("ts_us").rangeBetween(-hr, 0)
      val wB = Window.partitionBy("k").orderBy("ts_us").rangeBetween(-2 * hr, 0)
      val mixed = sample.select(
        sum($"v").over(wA).as("a"), sum($"v").over(wB).as("b"))
      assert(mixed.queryExecution.optimizedPlan
        .collectFirst { case u: Union => u }.isEmpty, "mixed ranges rewritten")
      // ...and all three still compute correctly with the rule active.
      assert(rank.count() === 5L && rows.count() === 5L && mixed.count() === 5L)
    }
  }

  test("bucketing is exact beyond 2^53 (nanosecond epochs) and for negative keys") {
    // Sort keys ~1.15e18 sit where double has 256-unit ulps: floor(ts/r) in
    // double misbuckets rows near bucket boundaries, so ghosts land in the
    // wrong partition and trailing counts silently diverge. Integer
    // floor-division must reproduce the single-task window exactly. The
    // negative block additionally exercises the truncate-vs-floor adjustment.
    val r = 1000L
    val base = 1L << 60
    val rows = (0 until 80).map(i => (i.toLong, "a", base + i * 333L - 13000L, 1.0)) ++
      (0 until 40).map(i => (100L + i, "b", -base + i * 777L, 2.0)) ++
      Seq((999L, "b", -base + 5L * r, 4.0))
    val df = rows.toDF("id", "k", "ts_us", "v")
    val w = Window.partitionBy("k").orderBy("ts_us").rangeBetween(-r, 0)
    val q = df.select($"id", count(lit(1)).over(w).as("n"), sum($"v").over(w).as("s"))
    val baseline = q.collect().toSet
    withRule {
      val got = df.select($"id", count(lit(1)).over(w).as("n"),
        sum($"v").over(w).as("s"))
      assert(got.queryExecution.optimizedPlan
        .collectFirst { case u: Union => u }.isDefined, "rule did not fire")
      assert(got.collect().toSet === baseline)
    }
    // Operator form shares the arithmetic contract.
    val op = graft.operators.BoundedRangeWindow.trailingCountSum(
      df, Seq("k"), $"ts_us", r, $"v".cast("decimal(20,2)"), "n", "s")
      .select($"id", $"n", $"s".cast("double").as("s")).collect().toSet
    val oracle = df.select($"id", count(lit(1)).over(w).as("n"),
      sum($"v".cast("decimal(20,2)")).over(w).cast("double").as("s"))
      .collect().toSet
    assert(op === oracle)
  }

  test("rewrite matches the registered t04 semantics on fixture data") {
    val events = graft.queries.Tables.events(spark, SparkTestSession.sfDir)
    val baseline = graft.queries.TimeSeries.rollingHourWindowPlan(events)
      .collect().toSeq
    withRule {
      val q = graft.queries.TimeSeries.rollingHourWindowPlan(events)
      assert(q.queryExecution.optimizedPlan
        .collectFirst { case u: Union => u }.isDefined, "rule did not fire on t04")
      assert(q.collect().toSeq === baseline)
    }
  }
}
