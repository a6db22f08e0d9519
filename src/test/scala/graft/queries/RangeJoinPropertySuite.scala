package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property test for q35's binned range join: on random 2-dp prices —
  * including values planted exactly one band-width apart — the binned
  * equi-join must count exactly what the O(n²) definition counts. Guards
  * the bin/band edge arithmetic (exact-cents bin key, decimal residual)
  * against future edits.
  */
class RangeJoinPropertySuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("binned counts equal the quadratic definition, band edges included") {
    val rnd = new scala.util.Random(31)
    // Random 2-dp prices in a narrow range (dense bins), plus planted
    // exact-edge pairs: (x, x+0.05) must match; (x, x+0.06) must not.
    val prices = Seq.fill(150)(math.round(rnd.nextDouble() * 500) / 100.0 + 900.0) ++
      Seq(950.00, 950.05, 960.00, 960.06)
    val rows = prices.zipWithIndex.map { case (p, i) => (i.toLong, p) }

    val brute = rows.map { case (k, p) =>
      k -> rows.count { case (k2, p2) =>
        k2 != k && math.abs(
          (BigDecimal(p) - BigDecimal(p2)).toDouble) <= 0.05 + 1e-12
      }.toLong
    }.toMap

    // Reuse q35's exact shape over a temp parquet dir so the same code
    // path (including the parquet scan) is exercised.
    val dir = java.nio.file.Files.createTempDirectory("graft-rjprop").toString
    rows.toDF("p_partkey", "p_retailprice")
      .withColumn("p_size", org.apache.spark.sql.functions.lit(1))
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Analytics.q35RangeJoinBinned.run(spark, dir)
      .as[(Long, Long)].collect().toMap

    assert(got === brute)
    // The planted edge pairs behaved as designed.
    val byKey = rows.toMap
    val edgeIn = rows.collectFirst { case (k, 950.00) => k }.get
    val edgeOut = rows.collectFirst { case (k, 960.00) => k }.get
    assert(got(edgeIn) >= 1, s"exact 0.05-apart pair not matched (${byKey(edgeIn)})")
    // 960.06 is outside the band of 960.00 — unless some random price landed close.
    val close960 = rows.count { case (k, p) =>
      k != edgeOut && math.abs(p - 960.00) <= 0.0500001 }
    assert(got(edgeOut) === close960.toLong)
  }
}
