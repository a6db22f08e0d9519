package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-diameter connected components by iterative min-label propagation —
  * the clustering step after near-dup pair generation (SURVEY §2.12:
  * "connected components within bands"), assigning every document of a
  * duplicate group one canonical id (the group's minimum).
  *
  * Each iteration is one join + one aggregate (label := min over self and
  * neighbours); convergence needs O(component diameter) rounds. Near-dup
  * graphs are almost all tiny cliques, so 2–3 rounds suffice; `maxIters`
  * bounds the pathological chain. The driver-side loop only reads a scalar
  * `changed` count per round — the data never leaves the executors. At
  * web scale with adversarial diameters the standard upgrade is
  * large/small-star (alternating optimization), same join shape.
  */
object ConnectedComponents {

  /** @param pairs two columns `id_a`, `id_b` (undirected edges)
    * @return `id`, `cluster_id` (min reachable id) for every endpoint
    */
  def clusters(pairs: DataFrame, maxIters: Int = 10): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .persist()
    // coalesce guards the empty-graph case: sum over zero rows is NULL,
    // and an empty pair set is a legitimate input (no near-dups found).
    // Summed in DECIMAL(38,0): a Long sum can overflow on large/hashed id
    // domains, which ANSI mode turns into a mid-iteration error.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO)))
        .head.getDecimal(0)
    // Labels only ever decrease, so Σlbl is a strictly decreasing monotone
    // until the fixpoint — an equal sum IS convergence. One aggregate per
    // round instead of a join+count halves the driver round-trips.
    var prevSum = labelSum(labels)
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val viaNeighbors = edges
        .join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.select(col("id"), col("lbl"))
        .union(viaNeighbors)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .persist()
      val newSum = labelSum(next)
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      labels.unpersist()
      labels = next
      iters += 1
    }
    require(converged, s"connected components did not converge in $maxIters iterations")
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }
}
