package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space, then drop every vector
  * that has a semantically near-identical, lower-id neighbor *within its
  * cluster*. Complements the lexical near-dup stack (MinHash/SimHash finds
  * copies of the same TEXT; this finds restatements of the same CONTENT).
  *
  * Scale design — the whole point of the clustering step:
  *
  *   - Pairwise cosine work is confined to cells: O(Σ_c |c|²) instead of
  *     O(N²). Production sizes k ∝ N so expected cell size stays constant
  *     and total pairwise cost stays ~linear (the paper uses k ≈ 50k for
  *     N ≈ 5B). Cells shard the corpus by embedding region exactly like
  *     [[IvfAnn]]'s coarse quantizer shards queries.
  *   - The assignment pass is corpus ⨯ broadcast(centroids) — the fact
  *     table never shuffles to be assigned; the only shuffle is the
  *     within-cluster self-join, keyed on the cluster id.
  *   - The drop rule is row-local per pair and needs no iteration: keep a
  *     vector iff no lower-id same-cluster vector is within the cosine
  *     ball. Greedy keep-first — identical semantics to the paper's
  *     per-cluster dedup, with document id as the (deterministic) keep
  *     priority.
  *
  * Skew note: a pathological cluster (all mass in one cell) degrades to
  * all-pairs within that cell; the production knobs are more centroids or
  * recursive re-clustering of oversized cells — both preserve semantics
  * because every dropped pair stays within one cell.
  */
object SemanticDedup {

  /** Vectors dropped by greedy within-cluster semantic dedup.
    *
    * @param vecs      (idCol, embCol: array<double>) corpus
    * @param centroids (cluster: int, cvec: array<double>) cell centers;
    *                  small (broadcast) — k-means output or sampled seeds
    * @param tau       cosine threshold at/above which two vectors are
    *                  semantic duplicates
    * @return one row per DROPPED vector: (cluster, id, dup_of, cosine)
    *         where dup_of is the lowest-id in-threshold neighbor and
    *         cosine (rounded, 6 dp) its similarity
    */
  def drops(
      vecs: DataFrame,
      idCol: String,
      embCol: String,
      centroids: DataFrame,
      tau: Double): DataFrame = {
    val spark = vecs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    // Nearest-centroid assignment on the ROUNDED distance with cluster-id
    // tiebreak — the k01 cross-engine determinism discipline (DuckDB's
    // list_distance and our fold can differ in the last ulp).
    // Materialized once: both sides of the within-cluster self-join consume
    // it, and without the persist Spark would plan the assignment pass —
    // a full corpus scan — twice.
    val assigned = vecs
      .crossJoin(broadcast(centroids))
      .withColumn("_dist", round(sqrt(KMeans.sqDist(col(embCol), col("cvec"))), 6))
      .groupBy(col(idCol))
      .agg(
        min(struct(col("_dist"), col("cluster"))).as("_m"),
        first(col(embCol)).as("_emb"))
      .select(col(idCol), col("_m.cluster").as("cluster"), col("_emb"))
      .persist()
    dropWithin(assigned, idCol, tau)
  }

  /** [[drops]] with the assignment pass routed through
    * [[KMeans.assignTwoLevel]] — the k ∝ N scale path. Flat assignment
    * costs N·k distance evaluations; two-level costs N·(√k + nprobe·√k̄).
    * The trade is assignment exactness at cell BOUNDARIES only (a vector
    * can land in its second-best cell, where it may miss a neighbor that
    * stayed behind — or meet one it never would have): within whatever
    * cells arrive, the greedy drop rule is exact. SemanticDedupSuite pins
    * drop validity and a ≥90% flat-agreement floor on the fixture (k=8,
    * nprobe=2) — the floor, not a point measurement, is the contract (a
    * quoted exact percentage here went stale the moment the routing's
    * final membership pass changed; round-7 ADVICE).
    */
  def dropsTwoLevel(
      vecs: DataFrame,
      idCol: String,
      embCol: String,
      centroids: DataFrame,
      tau: Double,
      nprobe: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val assigned = KMeans
      .assignTwoLevel(vecs, centroids, idCol, embCol, nprobe)
      .select(col(idCol), col("cluster"), col(embCol).as("_emb"))
      .persist()
    dropWithin(assigned, idCol, tau)
  }

  /** Cell-local greedy drop over an assigned frame (idCol, cluster, _emb):
    * self-join keyed on the cluster, keep-lowest-id within the cosine
    * ball. Shared by the flat and two-level assignment routes. */
  private def dropWithin(
      assigned: DataFrame, idCol: String, tau: Double): DataFrame = {
    val a = assigned.select(
      col("cluster"), col(idCol).as("_id_a"), col("_emb").as("_ea"))
    val b = assigned.select(
      col("cluster"), col(idCol).as("_id_b"), col("_emb").as("_eb"))
    a.join(b, Seq("cluster"))
      .filter(col("_id_a") < col("_id_b"))
      .withColumn("_cos",
        round(graft.functions.GraftFunctions.cosine(col("_ea"), col("_eb")), 6))
      // Thresholding on the ROUNDED cosine, same discipline as the
      // assignment distance above: the fused expression and a reference
      // implementation can differ in the last ulp, and a pair sitting one
      // ulp from tau must not flip the drop set between engines.
      .filter(col("_cos") >= tau)
      .groupBy(col("cluster"), col("_id_b").as(idCol))
      .agg(min(struct(col("_id_a").as("a"), col("_cos").as("c"))).as("_k"))
      .select(
        col("cluster"), col(idCol),
        col("_k.a").as("dup_of"),
        col("_k.c").as("cosine"))
  }
}
