package graft.queries

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Plan-shape assertions for the wave-2 relational queries — the oracle
  * pins their values; these pin the physical plans that make them viable at
  * scale. */
class AnalyticsSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("q33 correlated subquery is decorrelated into an aggregate+join") {
    val plan = Analytics.q33SmallQtyRevenue.run(spark, dir)
      .queryExecution.executedPlan.toString
    // After decorrelation no subquery survives in the physical plan — the
    // per-part average shows up as a plain aggregate joined back in.
    assert(!plan.contains("Subquery"), s"subquery not decorrelated:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q35 binned range join plans as an equi-join, not a nested loop") {
    val plan = Analytics.q35RangeJoinBinned.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a nested loop:\n$plan")
  }

  test("q34 global total is a broadcast, and the share filter keeps exact ties out") {
    val plan = Analytics.q34RevenueShare.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin")
      || plan.contains("BroadcastNestedLoopJoin"), plan)
    // one-row frame ⨯ per-nation frame: the nested loop here is fine (1×25),
    // what matters is the total never round-trips through the driver.
    assert(!plan.contains("CollectLimit"), plan)
  }

  test("q39 approx quantiles stay within rank-error distance of q27's exact ones") {
    import spark.implicits._
    // With accuracy 10000 and n≈200/group at sf0.001 the sketch is near
    // exact, but the honest bound is on RANK error (≤ n/accuracy + 1 rank),
    // which we translate into: the approx value must lie between the exact
    // neighboring order statistics a few ranks either side of the target.
    val vals = graft.queries.Tables.events(spark, dir)
      .select(col("event_type"), col("value")).as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val approx = Analytics.q39ApproxQuantiles.run(spark, dir)
      .as[(String, Double, Double, Double)].collect()
    approx.foreach { case (et, p50, p95, p99) =>
      val xs = vals(et)
      def bounds(q: Double): (Double, Double) = {
        val n = xs.length
        val lo = math.max(0, (q * (n - 1)).toInt - 2)
        val hi = math.min(n - 1, (q * (n - 1)).toInt + 2)
        (xs(lo), xs(hi))
      }
      Seq(0.5 -> p50, 0.95 -> p95, 0.99 -> p99).foreach { case (q, v) =>
        val (lo, hi) = bounds(q)
        assert(v >= lo && v <= hi, s"$et q=$q: $v outside [$lo, $hi]")
      }
    }
  }

  test("map functions handle missing keys (fixture props always contain 'k')") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{element_at, from_json, map_contains_key, map_keys, size => asize}
    // Every fixture event's props is exactly {"k": n}, so q45's oracle run
    // can't distinguish map_contains_key/element_at from constants — this
    // pins the missing-key and multi-key semantics the oracle can't reach.
    val df = Seq(
      """{"k": 3}""", """{"x": 1, "y": 2}""", """{}""")
      .toDF("props")
      .select(from_json($"props", org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.IntegerType)).as("pm"))
      .select(
        asize(map_keys($"pm")).as("n_keys"),
        element_at($"pm", "k").as("k_val"),
        map_contains_key($"pm", "k").as("has_k"))
    val rows = df.as[(Int, Option[Int], Boolean)].collect().toSet
    assert(rows === Set((1, Some(3), true), (2, None, false), (0, None, false)))
  }

  test("q36 grouping sets emits exactly the three declared groupings") {
    import spark.implicits._
    val gids = Analytics.q36GroupingSets.run(spark, dir)
      .select("gid").distinct().as[Int].collect().toSet
    // (flag,status)=0, (flag)=1, ()=3 under Spark's bitmask (MSB = first col)
    assert(gids === Set(0, 1, 3))
  }

  test("u01 funnel steps are ordered, deadline-bounded, and monotone in counts") {
    import java.sql.Timestamp
    val rows = Analytics.u01ConversionFunnel.run(spark, dir)
      .select("t_view", "t_click", "t_purchase").collect()
    def ts(r: org.apache.spark.sql.Row, i: Int): Option[Timestamp] =
      if (r.isNullAt(i)) None else Some(r.getTimestamp(i))
    val sixHoursMs = 6L * 3600 * 1000
    val triples = rows.map(r => (ts(r, 0), ts(r, 1), ts(r, 2))).toSeq
    triples.foreach { case (v, c, p) =>
      // a later step requires the earlier one, within its deadline
      c.foreach { t =>
        assert(v.isDefined && !t.before(v.get) &&
          t.getTime - v.get.getTime <= sixHoursMs)
      }
      p.foreach { t =>
        assert(c.isDefined && !t.before(c.get) &&
          t.getTime - c.get.getTime <= sixHoursMs)
      }
    }
    val nV = triples.count(_._1.isDefined)
    val nC = triples.count(_._2.isDefined)
    val nP = triples.count(_._3.isDefined)
    assert(nV >= nC && nC >= nP, s"funnel must narrow: $nV/$nC/$nP")
  }

  test("u02 cohort matrix: offset 0 counts the whole cohort, later offsets never exceed it") {
    val m = Analytics.u02CohortRetention.run(spark, dir)
      .select("cohort_week", "week_offset", "n_active_users")
      .collect()
      .map(r => (r.getDate(0), r.getInt(1), r.getLong(2))).toSeq
      .groupBy(_._1)
    m.values.foreach { rows =>
      val byOff = rows.map(r => r._2 -> r._3).toMap
      assert(byOff.contains(0), "every cohort is active in its own first week")
      byOff.foreach { case (off, n) =>
        assert(off >= 0 && n <= byOff(0),
          s"offset $off count $n exceeds cohort size ${byOff(0)}")
      }
    }
  }
}
