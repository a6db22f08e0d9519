package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Regression pins for the rows-only queries (those without a DuckDB
  * oracle): their outputs are deterministic by construction — fixed seeds,
  * fixed hash families, order-independent aggregation — so concrete values
  * at sf0.001 are stable goldens. A change here means the operator's
  * function changed, not just its plan.
  */
class RowsOnlyGoldenSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  import spark.implicits._

  test("q13_approx_distinct golden") {
    val (parts, orders) = Relational.q13ApproxDistinct.run(spark, dir)
      .as[(Long, Long)].head()
    assert((parts, orders) === ((199L, 1480L)))
  }

  test("n01_minhash_signatures golden (doc 0)") {
    val row = NearDup.n01MinhashSignatures.run(spark, dir)
      .filter($"doc_id" === 0L)
      .as[(Long, Int, Long, Long, Long, Long)].head()
    assert(row === ((0L, 21, -9179741949462629643L, -9109473102658973603L,
      -8184048427491571593L, -9107829973785043605L)))
  }

  test("n04_simhash golden (doc 0, corpus size)") {
    val df = NearDup.n04Simhash.run(spark, dir)
    assert(df.count() === 500L)
    assert(df.filter($"doc_id" === 0L).as[(Long, Long)].head()._2 === 4301826246033185457L)
  }

  test("e03_knn_lsh golden (first neighbor of query 0)") {
    val rows = Similarity.e03KnnLsh.run(spark, dir)
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.length === 38)
    assert(rows.head === ((0L, 350L, 0.212477, 1)))
  }

  test("q39_approx_quantiles structure (exact values are partitioning-dependent)") {
    // The percentile_approx sketch is deterministic only for a fixed input
    // split, so exact values would flake under parallelism changes; the
    // rank-error bound vs q27's exact quantiles lives in AnalyticsSuite.
    // Here: the shape contract — all five event types, ordered quantiles.
    val got = Analytics.q39ApproxQuantiles.run(spark, dir)
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) === Seq("click", "error", "purchase", "signup", "view"))
    got.foreach { case (t, p25, p50, p95) =>
      assert(p25 <= p50 && p50 <= p95, s"$t quantiles out of order")
    }
  }

  test("k02_kmeans_clusters golden (all clusters)") {
    val rows = Pipeline.k02KmeansClusters.run(spark, dir)
      .as[(Int, Long, Double)].collect().toSeq
    assert(rows === Seq(
      (0, 72L, 67.554065), (1, 49L, 44.926542), (2, 64L, 59.624353),
      (3, 67L, 62.663327), (4, 66L, 61.580925), (5, 62L, 57.646564),
      (6, 62L, 58.2321), (7, 58L, 54.016705)))
  }

  test("e06_knn_ivf golden (first neighbor of query 0)") {
    val rows = Similarity.e06KnnIvf.run(spark, dir)
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.length === 40)
    assert(rows.head === ((0L, 17L, 0.334456, 1)))
  }
}
