package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.PqAdc

/** e12: product-quantization ANN with ADC shortlist + exact refinement.
  * Pins the three contract points: survivors carry EXACT cosines
  * (bit-comparable to e02's brute-force values), recall against the
  * exact answer clears the floor the registration claims, and the
  * shortlist truly bounds the refinement (no more than `shortlist` exact
  * evaluations per query can influence the answer).
  */
class PqAdcSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  import org.apache.spark.sql.Row

  private def bruteMap(): Map[(Long, Long), Double] =
    Similarity.e02KnnBrute.run(spark, dir)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map { case Row(q: Long, n: Long, c: Double) => (q, n) -> c }.toMap

  test("e12 survivors carry exact cosines and dense ranks") {
    val pq = Similarity.e12KnnPqAdc.run(spark, dir)
      .select("query_id", "neighbor_id", "cosine", "rnk").collect()
      .map { case Row(q: Long, n: Long, c: Double, r: Int) => (q, n, c, r) }
    assert(pq.length === 40, s"8 queries x top-5 expected, got ${pq.length}")
    pq.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq === (1 to g.length))
    }
    // Wherever a survivor is also in the brute top-5, the refined cosine
    // must be the identical rounded value — the refinement is exact, not
    // a second approximation.
    val brute = bruteMap()
    pq.foreach { case (q, n, c, _) =>
      brute.get((q, n)).foreach(bc => assert(bc === c,
        s"refined cosine $c != brute $bc for ($q,$n)"))
    }
  }

  test("e12 recall vs brute force clears the floor") {
    val bruteSet = bruteMap().keySet
    val hits = Similarity.e12KnnPqAdc.run(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .count { case Row(q: Long, n: Long) => bruteSet.contains((q, n)) }
    // Measured 34/40 on the fixture (isotropic embeddings — hard mode for
    // PQ); gate at 24 to absorb fixture regeneration while still failing
    // on a real recall collapse (raw un-refined ADC measured 13/40).
    assert(hits >= 24, s"PQ+refine recall too low: $hits/40")
  }

  test("e13 IVFADC recall clears the floor and survivors carry exact cosines") {
    val brute = bruteMap()
    val ivfpq = Similarity.e13KnnIvfPq.run(spark, dir)
      .select("query_id", "neighbor_id", "cosine", "rnk").collect()
      .map { case Row(q: Long, n: Long, c: Double, r: Int) => (q, n, c, r) }
    assert(ivfpq.length === 40)
    ivfpq.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq === (1 to g.length))
    }
    ivfpq.foreach { case (q, n, c, _) =>
      brute.get((q, n)).foreach(bc => assert(bc === c,
        s"IVFADC refined cosine $c != brute $bc for ($q,$n)"))
    }
    // The cell prune stacks a second approximation on the PQ shortlist,
    // so the floor sits at e10's bar (the IVF routing recall), not e12's.
    val hits = ivfpq.count { case (q, n, _, _) => brute.contains((q, n)) }
    assert(hits >= 10, s"IVFADC recall too low: $hits/40")
  }

  test("shortlist bounds the refinement: shortlist = k degrades to pure ADC order") {
    val c = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("norm", sqrt(graft.functions.VectorOps.sumSquares(col("emb"))))
    val q = c.filter(col("vec_id") < 8)
    val tight = PqAdc.search(c, q, k = 5, shortlist = 5)
      .select("query_id", "neighbor_id").collect()
      .map { case Row(qq: Long, n: Long) => (qq, n) }.toSet
    val wide = PqAdc.search(c, q, k = 5, shortlist = 200)
      .select("query_id", "neighbor_id").collect()
      .map { case Row(qq: Long, n: Long) => (qq, n) }.toSet
    // With shortlist = k the exact re-rank cannot change membership, so
    // the answer is the raw ADC top-5; a wider shortlist lets refinement
    // recover pairs ADC misranked. On the fixture the two differ — which
    // is exactly the evidence the refinement stage reads the shortlist
    // and nothing more.
    assert(tight !== wide,
      "shortlist width had no effect — refinement not bounded by it?")
    assert(tight.size === 40 && wide.size === 40)
  }
}
