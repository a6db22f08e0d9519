package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ConnectedComponentsSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cc(pairs: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.clusters(pairs.toSeq.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("empty pair set yields an empty cluster frame (no NPE)") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(ConnectedComponents.clusters(empty).count() === 0)
  }

  test("disjoint pairs form separate clusters labeled by their minimum") {
    assert(cc((1L, 2L), (3L, 4L)) === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("a chain merges into one component across iterations") {
    // 5-4-3-2-1 chain: min label must propagate the full diameter.
    val got = cc((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("triangle plus pendant and an isolated pair") {
    val got = cc((10L, 11L), (11L, 12L), (10L, 12L), (12L, 13L), (20L, 21L))
    assert(got === Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
  }
}
