package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SimilaritySuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  import spark.implicits._

  test("brute-force knn: 8 queries × 5 ranked neighbors, cosine in [-1,1]") {
    val rows = Similarity.e02KnnBrute.run(spark, dir)
      .select("query_id", "neighbor_id", "cosine", "rnk")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.length === 40)
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.keySet === (0L until 8L).toSet)
    byQuery.values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1 to 5))
      // ranks follow non-increasing cosine
      assert(sorted.map(_._3).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b
        case _ => true
      })
      g.foreach { case (q, n, c, _) =>
        assert(n !== q)
        assert(c >= -1.0000001 && c <= 1.0000001)
      }
    }
  }

  test("LSH knn is a subset of same-bucket exact cosine, consistent with brute force") {
    val brute = Similarity.e02KnnBrute.run(spark, dir)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    val lsh = Similarity.e03KnnLsh.run(spark, dir)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    // Any LSH pair also present in the brute-force top-5 must agree on cosine.
    lsh.foreach { case (q, n, c) =>
      brute.get((q, n)).foreach(bc => assert(math.abs(bc - c) < 1e-9))
    }
  }

  test("IVF knn returns k ranked candidates per query with exact cosines") {
    val brute = Similarity.e02KnnBrute.run(spark, dir)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    val ivf = Similarity.e06KnnIvf.run(spark, dir)
      .select("query_id", "neighbor_id", "cosine", "rnk")
      .as[(Long, Long, Double, Int)].collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq === (1 to g.length))
    }
    // Cosines agree with the brute-force values on shared pairs.
    ivf.foreach { case (q, n, c, _) =>
      brute.get((q, n)).foreach(bc => assert(math.abs(bc - c) < 1e-9))
    }
    // Recall sanity: probing 4/16 cells should still recover a decent share
    // of the true top-5 set.
    val bruteSet = brute.keySet
    val hit = ivf.count { case (q, n, _, _) => bruteSet.contains((q, n)) }
    assert(hit >= 10, s"IVF recall too low: $hit/40 of brute-force pairs")
  }

  test("two-level IVF (cells ∝ N, e10) keeps exact cosines and e06-grade recall") {
    val brute = Similarity.e02KnnBrute.run(spark, dir)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    val ivf2 = Similarity.e10KnnIvfScaled.run(spark, dir)
      .select("query_id", "neighbor_id", "cosine", "rnk")
      .as[(Long, Long, Double, Int)].collect()
    assert(ivf2.nonEmpty)
    // Ranks are dense 1..len per query and cosines are the exact values.
    ivf2.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq === (1 to g.length))
    }
    ivf2.foreach { case (q, n, c, _) =>
      brute.get((q, n)).foreach(bc => assert(math.abs(bc - c) < 1e-9))
    }
    // Recall floor: the double routing approximation (coarse groups, then
    // cells) must not collapse below the e06 bar on the fixture.
    val bruteSet = brute.keySet
    val hit = ivf2.count { case (q, n, _, _) => bruteSet.contains((q, n)) }
    assert(hit >= 10, s"two-level IVF recall too low: $hit/40 of brute-force pairs")
  }

  test("approx_count_distinct lands within 5% of exact") {
    val exact = Relational.q12DistinctCounts.run(spark, dir)
      .as[(Long, Long, Long)].head()
    val approx = Relational.q13ApproxDistinct.run(spark, dir)
      .as[(Long, Long)].head()
    assert(math.abs(approx._1 - exact._1).toDouble / exact._1 < 0.05)
    assert(math.abs(approx._2 - exact._3).toDouble / exact._3 < 0.05)
  }
}
