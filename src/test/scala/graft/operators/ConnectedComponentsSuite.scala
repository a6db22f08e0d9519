package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ConnectedComponentsSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Both execution paths must agree: the driver-local union-find fast
    * path (default at this size) and the distributed star alternation
    * (forced with localMaxEdges = 0). */
  private def cc(pairs: (Long, Long)*): Map[Long, Long] = {
    val df = pairs.toSeq.toDF("id_a", "id_b")
    val local = ConnectedComponents.clusters(df)
      .as[(Long, Long)].collect().toMap
    val dist = ConnectedComponents.clusters(df, localMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local === dist, "local fast path diverged from star alternation")
    local
  }

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

  test("self-pairs label their endpoint: singleton alone, absorbed when connected") {
    assert(cc((3L, 3L)) === Map(3L -> 3L))
    assert(cc((5L, 5L), (1L, 2L), (2L, 5L)) === Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
  }

  /** Reference labels by union-find (path-halving). */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) {
        parent(r) = parent.getOrElse(parent(r), parent(r))
        r = parent(r)
      }
      r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("adversarial 200-node chain converges within the star round bound") {
    // Diameter 200: one-hop min-label propagation would need ~200 rounds;
    // large/small-star must finish inside the default maxIters = 25.
    val chain = (1L until 200L).map(i => (i, i + 1))
    assert(cc(chain: _*) === chain.flatMap(p => Seq(p._1, p._2)).distinct
      .map(_ -> 1L).toMap)
  }

  test("property: random graphs match union-find labels") {
    val r = new scala.util.Random(99)
    for (trial <- 0 until 5) {
      // 120+ nodes, sparse enough to leave many components; ids are spread
      // out so component minima are non-trivial.
      val n = 120 + trial * 40
      val nodes = r.shuffle((0L until 10000L).toVector).take(n)
      val edges = Seq.fill(n)((nodes(r.nextInt(n)), nodes(r.nextInt(n))))
        .filter { case (a, b) => a != b }
      val expected = unionFind(edges)
      assert(cc(edges: _*) === expected, s"trial $trial")
    }
  }
}
