package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TriangleCensusSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]) =
    TriangleCensus.census(edges.toDF("u", "v"))
      .as[(Long, Long, Double, Long, Double)].head()

  test("K4: 4 triangles, 12 wedges, clustering 1.0") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val (nodes, e, wedges, tris, cc) = census(k4)
    assert((nodes, e, wedges, tris) === (4L, 6L, 12.0, 4L))
    assert(cc === 1.0)
  }

  test("path graph has zero triangles") {
    val path = (0L until 9L).map(i => (i, i + 1))
    val (nodes, e, wedges, tris, cc) = census(path)
    assert((nodes, e, tris) === (10L, 9L, 0L))
    assert(wedges === 8.0 && cc === 0.0)
  }

  test("triangle with a pendant edge: 1 triangle, clustering 3/5") {
    // nodes 0-1-2 form a triangle; 3 hangs off node 0.
    val g = Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L))
    val (nodes, e, wedges, tris, cc) = census(g)
    assert((nodes, e, tris) === (4L, 4L, 1L))
    // wedges: deg(0)=3 → 3, deg(1)=deg(2)=2 → 1 each, deg(3)=1 → 0
    assert(wedges === 5.0)
    assert(cc === 3.0 / 5.0)
  }

  test("wedgeTasks resizes the wedge-join stage without changing the answer") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val dflt = TriangleCensus.census(k4.toDF("u", "v"))
      .as[(Long, Long, Double, Long, Double)].head()
    val sizedDf = TriangleCensus.census(k4.toDF("u", "v"), wedgeTasks = Some(64))
    val sized = sizedDf.as[(Long, Long, Double, Long, Double)].head()
    assert(sized === dflt)
    // The wedge sides really run at the requested width.
    assert(sizedDf.queryExecution.executedPlan.toString
      .contains("hashpartitioning(src"), "wedge sides not hash-repartitioned")
    intercept[IllegalArgumentException](
      TriangleCensus.census(k4.toDF("u", "v"), wedgeTasks = Some(0)))
  }

  test("two disjoint triangles sharing no node") {
    val g = Seq((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L), (10L, 12L), (11L, 12L))
    val (_, _, _, tris, cc) = census(g)
    assert(tris === 2L && cc === 1.0)
  }

  test("counts match brute force on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (for {
      i <- 0L until n; j <- (i + 1) until n if rnd.nextDouble() < 0.15
    } yield (i, j)).toSeq
    val adj = edges.toSet
    val brute = (for {
      a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
      if adj((a, b)) && adj((b, c)) && adj((a, c))
    } yield 1).size
    val (_, e, _, tris, _) = census(edges)
    assert(e === edges.size.toLong)
    assert(tris === brute.toLong)
  }
}
