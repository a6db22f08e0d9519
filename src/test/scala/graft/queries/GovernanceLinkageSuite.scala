package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Invariants for the governance + linkage queries beyond the oracle gate. */
class GovernanceLinkageSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("f01 plans as an equi-join on the blocking key, never a cross product") {
    val plan = Linkage.f01FuzzyMatch.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.linesIterator.take(12).mkString("\n"))
  }

  test("f01 length-band prefilter is lossless for the edit-distance bound") {
    // lev(a,b) >= |len(a)-len(b)|, so the band can't drop a true pair:
    // recompute without the band and compare.
    val p = Tables.part(spark, dir).select("p_partkey", "p_name")
    val a = p.toDF("a_key", "a_name")
    val b = p.toDF("b_key", "b_name")
    val unbanded = a.join(b, col("a_key") < col("b_key") &&
        levenshtein(col("a_name"), col("b_name")) <= 2)
      .select("a_key", "b_key")
    val banded = a.join(b, col("a_key") < col("b_key") &&
        abs(length(col("a_name")) - length(col("b_name"))) <= 2 &&
        levenshtein(col("a_name"), col("b_name")) <= 2)
      .select("a_key", "b_key")
    assert(banded.count() === unbanded.count())
  }

  test("m01 merge output = |customers| + |supplier-sourced inserts|") {
    val out = Governance.m01MergeUpsert.run(spark, dir)
    val nCust = Tables.customer(spark, dir).count()
    val nSupp = Tables.supplier(spark, dir).count()
    assert(out.count() === nCust + nSupp)
    assert(out.filter(col("c_mktsegment") === "NEW").count() === nSupp)
    // Updates only increase balances (revenue deltas are positive).
    val joined = out.alias("m")
      .join(Tables.customer(spark, dir).alias("c"), expr("m.c_custkey = c.c_custkey"))
    assert(joined.filter(expr("m.c_acctbal < c.c_acctbal")).count() === 0)
  }

  test("a01 audit flags the fixture's real defects and passes the rest") {
    val rows = Governance.a01QualityAudit.run(spark, dir)
      .select("check_name", "pass").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows.size === 8)
    // Genuine findings on this fixture: (l_orderkey, l_linenumber) is NOT
    // unique (the generator draws linenumbers independently), and urgent
    // orders are ~20% of 5 priorities, under the 25% floor.
    val expectedFailures = Set("dup_line_keys", "urgent_share_min_25pct")
    rows.foreach { case (c, pass) =>
      assert(pass === !expectedFailures(c), s"check $c: pass=$pass")
    }
  }

  test("g01 pagerank sums to 1 and favors high-inflow nations") {
    val rows = Linkage.g01Pagerank.run(spark, dir)
      .select("pagerank").collect().map(_.getDouble(0))
    assert(rows.length === 25)
    assert(math.abs(rows.sum - 1.0) < 1e-9)
    assert(rows.min > 0.0)
  }
}
