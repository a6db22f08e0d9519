package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixed-iteration weighted PageRank as relational algebra.
  *
  * Classic damped PageRank (Brin & Page 1998) over a weighted edge list:
  *
  *   r₀(v)    = 1/N
  *   rₖ₊₁(v)  = (1-d)/N + d · Σ_{(u,v,w)∈E} rₖ(u) · w / outW(u)
  *
  * where outW(u) is u's total outgoing edge weight. Dangling mass is not
  * redistributed (the simple link-absorbing variant); callers with dangling
  * nodes should add a sink edge per node if total mass must be conserved.
  *
  * Exactness across engines: per-edge contributions `r · w / outW` are
  * deterministic double ops, but their per-node SUM is order-dependent in
  * doubles. Each contribution is therefore cast to DECIMAL(28,14) and summed
  * exactly (order-independent), then cast back to double — the same
  * dsum trick as `Q.dsum`, so a SQL oracle unrolling the identical
  * iterations is bit-exact.
  *
  * Scale posture: each iteration is one equi-join of the rank vector to the
  * edge list plus one groupBy(dst) aggregate. The rank vector is |V| rows —
  * tiny next to |E| — so Catalyst broadcasts it and only the edge list
  * shuffles (once, on dst, reused across iterations under AQE). Iterations
  * are unrolled into a single plan; for large k, checkpoint per round as in
  * `ConnectedComponents`.
  */
object PageRank {

  /** Ranks after `iterations` rounds.
    *
    * @param nodes  one column `id` — the full vertex set (isolated vertices
    *               keep the teleport rank)
    * @param edges  columns `src`, `dst`, `w` (numeric weight > 0)
    * @return columns `id`, `rank` (double)
    */
  def run(nodes: DataFrame, edges: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    val spark = nodes.sparkSession
    val n = nodes.count() // |V|: one scalar to the driver, same as listTables
    val teleport = (1.0 - damping) / n

    val outW = edges.groupBy("src")
      .agg(sum(col("w").cast(DecimalType(18, 4))).cast("double").as("out_w"))
    // src → (dst, share): share is the fixed fraction of u's rank that flows
    // along this edge; computed once, reused every iteration. Persisted
    // because every unrolled iteration references it — without this, round
    // k's plan recomputes the upstream edge build k times (measured 3.2 s →
    // 2.5 s at sf0.1 for the 4-table trade graph). Callers release it via
    // `spark.catalog.clearCache()` (Verify/Bench already do).
    val shares = edges.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("out_w")).as("share"))
      .persist()

    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
    for (_ <- 0 until iterations) {
      val contrib = shares
        .join(broadcast(ranks), col("src") === col("id"))
        .select(col("dst"), (col("rank") * col("share")).as("contrib"))
      val summed = contrib.groupBy("dst")
        .agg(sum(col("contrib").cast(DecimalType(28, 14))).cast("double").as("inflow"))
      ranks = nodes
        .join(summed, col("id") === col("dst"), "left_outer")
        .select(col("id"),
          (lit(teleport) + lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
    }
    ranks
  }
}
