package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins for q49_hll_sketch_union (rows-only: DataSketches encoding has no
  * DuckDB twin). Two properties carry the operator's contract:
  *
  *   1. Mergeability is LOSSLESS: unioning the per-month sketches yields
  *      the exact same estimate as sketching the un-partitioned column —
  *      register-max merge over disjoint inserts reproduces the direct
  *      register state. This is what licenses the 100 TB pattern of
  *      materializing per-cell sketches once and answering any coarser
  *      rollup from them.
  *   2. The estimate tracks truth: within 5% of the exact distinct count
  *      per group (lgK=12 default ⇒ ~1.6% RSE; 5% is ≥3σ).
  */
class AnalyticsSketchSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  import spark.implicits._

  test("q49 union-of-monthly sketches equals the direct sketch estimate") {
    val viaUnion = Analytics.q49HllSketchUnion.run(spark, dir)
      .select($"o_orderpriority", $"approx_customers")
      .as[(String, Long)].collect().toMap
    val direct = Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey")))
        .as("approx_customers"))
      .as[(String, Long)].collect().toMap
    assert(viaUnion === direct)
  }

  test("q49 sketches are storable values: parquet round-trip then union matches") {
    // The 100 TB claim: per-cell sketches persist as a table and any
    // coarser rollup unions them later without re-scanning the fact
    // table. Binary sketch column → parquet → read back → union-agg.
    val monthly = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val out = java.nio.file.Files.createTempDirectory("graft-sk").toString
    monthly.write.mode("overwrite").parquet(out)
    val fromDisk = spark.read.parquet(out)
      .groupBy("o_orderpriority")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_customers"))
      .as[(String, Long)].collect().toMap
    val live = Analytics.q49HllSketchUnion.run(spark, dir)
      .select($"o_orderpriority", $"approx_customers")
      .as[(String, Long)].collect().toMap
    assert(fromDisk === live)
  }

  private def exactBucketCounts: Map[Long, Long] =
    Tables.lineitem(spark, dir)
      .select(floor(sqrt(col("l_partkey"))).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap

  test("h02 approx_top_k: error bounded by n/maxItemsTracked, true top-1 present") {
    val exact = exactBucketCounts
    val n = exact.values.sum
    val bound = n / 200 // maxItemsTracked = 200
    val top = Analytics.h02ApproxTopK.run(spark, dir)
      .select($"bucket", $"est").as[(Long, Long)].collect()
    assert(top.length === 10)
    top.foreach { case (b, est) =>
      assert(math.abs(est - exact(b)) <= bound, s"bucket $b: est $est vs ${exact(b)}")
    }
    val trueTop = exact.maxBy { case (b, c) => (c, b) }._1
    assert(top.map(_._1).contains(trueTop))
  }

  test("h03 count-min: every bucket overcounted by at most eps*n") {
    val exact = exactBucketCounts
    val n = exact.values.sum
    val rows = Analytics.h03CountMinFreq.run(spark, dir)
      .as[(Long, Long)].collect()
    assert(rows.length === exact.size)
    rows.foreach { case (b, est) =>
      val ex = exact(b)
      assert(est >= ex, s"CMS must never undercount: bucket $b est $est < $ex")
      assert(est <= ex + (0.001 * n).toLong + 1,
        s"bucket $b overcount beyond bound: est $est vs $ex (n=$n)")
    }
  }

  test("q49 estimates are within 5% of exact distinct counts") {
    val approx = Analytics.q49HllSketchUnion.run(spark, dir)
      .select($"o_orderpriority", $"approx_customers")
      .as[(String, Long)].collect().toMap
    val exact = Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.05,
        s"priority $k: approx $a vs exact $n")
    }
  }
}
