package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PageRankSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zero iterations returns the uniform teleport vector") {
    val nodes = (0L to 3L).toDF("id")
    val edges = Seq((0L, 1L, 1.0)).toDF("src", "dst", "w")
    val ranks = PageRank.run(nodes, edges, iterations = 0)
      .as[(Long, Double)].collect().toMap
    assert(ranks.size === 4)
    ranks.values.foreach(r => assert(r === 0.25))
  }

  test("rank mass is conserved on a dangling-free graph") {
    // Directed 4-cycle plus a chord; every node has out-degree ≥ 1.
    val nodes = (0L to 3L).toDF("id")
    val edges = Seq(
      (0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 0L, 1.0),
      (0L, 2L, 3.0)).toDF("src", "dst", "w")
    val ranks = PageRank.run(nodes, edges, iterations = 5)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    // Node 2 receives the heavy chord (w=3 of node 0's outflow) plus node
    // 1's full rank — it must outrank node 1, which gets only 1/4 of node
    // 0's outflow.
    assert(ranks(2L) > ranks(1L))
  }

  test("uniform complete graph stays uniform at any iteration count") {
    val n = 5
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (for {
      a <- 0L until n.toLong; b <- 0L until n.toLong
    } yield (a, b, 2.0)).toDF("src", "dst", "w")
    val ranks = PageRank.run(nodes, edges, iterations = 3)
      .as[(Long, Double)].collect().toMap
    ranks.values.foreach(r => assert(math.abs(r - 1.0 / n) < 1e-12))
  }

  test("isolated node keeps exactly the teleport rank") {
    val nodes = (0L to 2L).toDF("id")
    val edges = Seq((0L, 1L, 1.0), (1L, 0L, 1.0)).toDF("src", "dst", "w")
    val ranks = PageRank.run(nodes, edges, iterations = 2)
      .as[(Long, Double)].collect().toMap
    // Node 2 has no inbound edges: rank = (1-d)/N every iteration. The
    // expectation repeats the operator's own float steps — 1.0 - 0.85 is
    // NOT the double nearest 0.15, so a 0.15/3 literal would differ.
    assert(ranks(2L) === (1.0 - 0.85) / 3)
  }
}
