package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-flat approximate nearest neighbour — the coarse-quantizer scale path
  * alongside sign-LSH (SURVEY §2.12 "IVF or LSH-bucketed variant").
  *
  * Cells are seeded from sampled corpus vectors (no k-means iterations —
  * IVF-flat with sampled centroids, the standard cheap variant). Every
  * stage is relational:
  *
  *   1. assign: corpus ⨯ broadcast(centroids) → argmax cosine per vector
  *      (max-of-struct, no collect, linear in |corpus|·|cells|);
  *   2. probe: each query keeps its nProbe best cells;
  *   3. search: candidates = corpus rows in probed cells (bucket join),
  *      exact cosine + per-query top-k on that pruned set.
  *
  * At 100 TB the pairwise work drops from O(Q·N) to O(Q·nProbe·N/cells);
  * the corpus is never collected or broadcast — only the centroid table is.
  */
object IvfAnn {

  // Shared fold: must stay bit-identical to Similarity's cosines (the sbt
  // suite cross-checks e06 against e02 at 1e-9) — single definition.
  private def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  /** Argmax-cosine cell assignment. `vectors`: (vec_id, emb, norm);
    * `centroids`: (cell_id, cemb, cnorm). Ties break to the higher cell_id
    * (max of struct), deterministically. */
  def assignCells(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(centroids))
      .withColumn("cos", dot(col("emb"), col("cemb")) / (col("norm") * col("cnorm")))
      .groupBy("vec_id")
      .agg(
        first("emb").as("emb"),
        first("norm").as("norm"),
        max(struct(col("cos"), col("cell_id"))).getField("cell_id").as("cell_id"))

  /** Per-query nProbe best cells (same scoring as assignment). */
  def probeCells(queries: DataFrame, centroids: DataFrame, nProbe: Int): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cell_id"))
    queries.crossJoin(broadcast(centroids))
      .withColumn("cos", dot(col("emb"), col("cemb")) / (col("norm") * col("cnorm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nProbe)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"),
        col("norm").as("qnorm"), col("cell_id"))
  }

  /** Full IVF search: top-k per query over the probed cells.
    * `corpus`: (vec_id, emb, norm); centroids seeded from
    * `vec_id < nCells`; queries are `queryFilter` rows of the corpus.
    */
  def search(corpus: DataFrame, queryFilter: Column, nCells: Int, nProbe: Int,
      k: Int): DataFrame = {
    val centroids = corpus.filter(col("vec_id") < nCells)
      .select(col("vec_id").cast("int").as("cell_id"),
        col("emb").as("cemb"), col("norm").as("cnorm"))
    search(corpus, corpus.filter(queryFilter), centroids, nProbe, k)
  }

  /** Same pipeline with caller-supplied centroids `(cell_id, cemb, cnorm)`
    * and query frame — the seeding above assumes dense low ids, which a
    * caller over re-keyed data (e.g. ScaleProbe's replicated ids) can't
    * satisfy; this overload is the single definition both run. */
  def search(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      nProbe: Int, k: Int): DataFrame = {
    val assigned = assignCells(corpus, centroids)
    val probes = probeCells(queries, centroids, nProbe)
    val pairs = assigned.join(probes,
        assigned("cell_id") === probes("cell_id") &&
          col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qemb"), col("emb")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    pairs
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cosine"), col("rnk"))
  }
}
