package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Q

/** Distributed triangle census over an undirected edge list.
  *
  * Input: distinct undirected edges as (u, v) with u < v, one row each.
  * Output: one row — n_nodes, n_edges, n_wedges (open+closed paths of
  * length 2), n_triangles, and the global clustering coefficient
  * 3·triangles / wedges.
  *
  * Algorithm: degree orientation. Every edge is directed from its
  * (degree, key)-smaller endpoint to its larger; out-degrees are then
  * O(√m)-bounded, so the wedge self-join generates O(m^{3/2}) candidate
  * rows instead of Σ deg² (the arboricity argument behind every
  * distributed triangle counter — cf. Suri & Vassilvitskii, WWW'11).
  * Each triangle is counted exactly once: its nodes are totally ordered
  * by (degree, key), and only the wedge rooted at the smallest node whose
  * closing edge is correctly oriented survives the semi-join. All three
  * steps are equi-joins (wedge join on the shared root, closing probe on
  * the (src, dst) pair); nothing driver-side, no adjacency lists.
  */
object TriangleCensus {

  /** `wedgeTasks`: task count for the wedge join stage — the census's
    * memory-sensitive stage, whose per-task working set is the sorted run
    * of O(m^{3/2} / tasks) candidate rows. Defaults to the session's
    * `spark.sql.shuffle.partitions`; raise it ∝ m^{3/2} / (per-task
    * memory) as the graph grows. Both wedge sides are hash-repartitioned
    * on the shared root so the join itself adds no further exchange.
    * Measured effect at sf0.1×30 (BASELINE.md round-11 graph row): tasks
    * ∝ factor cuts the g02 pipeline's wall 52.1 → 32.0 s. Note the
    * pipeline's 0.7 GB spill at that scale is NOT this stage — it is the
    * caller's pair-aggregate contention spill
    * ([[graft.queries.Linkage.coPurchasePairs]] documents the mechanism
    * and its own knob); round 10 attributed it here, one stage off. */
  def census(edges: DataFrame, wedgeTasks: Option[Int] = None): DataFrame = {
    // The edge list is consumed by the degree aggregate AND the orientation
    // join, and the oriented list three more times (both wedge sides + the
    // closing probe). Without persists every reuse replays the caller's
    // edge-construction pipeline — for g02 that is the quadratic co-purchase
    // fan-out, by far the dominant cost (measured 4.3 s → 1.6 s at sf0.1).
    val e = edges.persist()
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val oriented = e
      .join(deg.toDF("node_u", "du"), col("u") === col("node_u"))
      .join(deg.toDF("node_v", "dv"), col("v") === col("node_v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("u")).otherwise(col("v")).as("src"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("v")).otherwise(col("u")).as("dst"))
      .persist()
    wedgeTasks.foreach(n => require(n >= 1, s"wedgeTasks must be >= 1, got $n"))
    def sized(df: DataFrame): DataFrame =
      wedgeTasks.fold(df)(n => df.repartition(n, col("src")))
    val e1 = sized(oriented.toDF("src", "y"))
    val e2 = sized(oriented.toDF("src", "z"))
    val closing = oriented.toDF("y", "z")
    val triangles = e1.join(e2, "src").filter(col("y") =!= col("z"))
      .join(closing, Seq("y", "z"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(
      count(lit(1)).as("n_nodes"),
      (sum(col("d")) / 2).cast("long").as("n_edges"),
      Q.dsum(col("d") * (col("d") - 1) / 2).as("n_wedges"))
    stats.crossJoin(triangles)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        (lit(3.0) * col("n_triangles") / col("n_wedges")).as("clustering"))
  }
}
