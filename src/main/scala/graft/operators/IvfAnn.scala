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
      nProbe: Int, k: Int): DataFrame =
    rank(assignCells(corpus, centroids), probeCells(queries, centroids, nProbe), k)

  /** Candidate join + per-query exact-cosine top-k — the shared tail of
    * the flat and two-level routes. */
  private def rank(assigned: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
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

  /** Two-level (coarse-quantized) IVF search — the cells ∝ N regime.
    *
    * Flat [[search]] evaluates every vector against every centroid:
    * N·cells distance terms, which turns super-linear the moment cells
    * grows with the corpus (the right IVF discipline at scale is
    * cells ≈ √N, keeping per-cell candidate lists √N-bounded). Here the
    * centroid table is itself grouped driver-side into c = ⌈√cells⌉
    * coarse groups (the centroid table is model-sized — the same
    * boundedness argument as [[graft.operators.KMeans.assignTwoLevel]],
    * which measured this trade sub-linear where flat assignment was the
    * ×30 super-linear term): each vector scores the c coarse centers,
    * keeps its `coarseProbe` best groups, and scores only those groups'
    * fine centroids — N·(√cells + coarseProbe·√cells) evaluations.
    *
    * Routing is cosine throughout (coarse argmax, fine argmax), so corpus
    * assignment and query probing agree on geometry; the returned
    * neighbours are exact cosines on the candidate set, same contract as
    * [[search]]. APPROXIMATE twice, by design: a vector (or query) whose
    * best fine cell hides in an unprobed coarse group routes to its best
    * probed one — the standard IVF recall trade, gated in sbt against the
    * brute-force answer exactly like e06. Coarse groups are seeded from
    * the c lowest cell_ids with a single argmax-cosine membership pass —
    * sampled-centroid discipline at both levels; ties break to the lower
    * group id. */
  def searchTwoLevel(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      coarseProbe: Int, nProbe: Int, k: Int): DataFrame =
    routingTables(centroids) match {
      case None => emptyResult(queries)
      case Some((coarseDf, fineDf)) =>
        val assigned = routeCells(corpus, coarseDf, fineDf, coarseProbe, 1)
        rank(assigned, routeProbes(queries, coarseDf, fineDf, coarseProbe, nProbe), k)
    }

  /** Two-level cell assignment alone — `(vec_id, emb, norm, cell_id)`, the
    * frame a deployment PERSISTS as its IVF index (bucketed by cell_id;
    * see the e11 registration): the N-proportional half of the search is
    * built once here, and [[searchStored]] probes it without ever touching
    * the corpus again. */
  def assignTwoLevel(corpus: DataFrame, centroids: DataFrame,
      coarseProbe: Int): DataFrame =
    routingTables(centroids) match {
      case None => corpus.limit(0).withColumn("cell_id", lit(0))
        .select(col("vec_id"), col("emb"), col("norm"), col("cell_id"))
      case Some((coarseDf, fineDf)) =>
        routeCells(corpus, coarseDf, fineDf, coarseProbe, 1)
    }

  /** Probe a PERSISTED index: `assigned` is a stored
    * `(vec_id, emb, norm, cell_id)` assignment table (built once by
    * [[assignTwoLevel]]), `centroids` the stored model-sized centroid
    * table. Only the query rows are routed — O(|Q|·√cells) work — and the
    * candidate join against the stored assignment carries the whole
    * N-dependent cost as a READ of the cell_id-bucketed table; the corpus
    * is never re-scanned, re-normed or re-assigned. Identical answer to
    * [[searchTwoLevel]] over the same centroids (the e11 gate). */
  def searchStored(assigned: DataFrame, queries: DataFrame, centroids: DataFrame,
      coarseProbe: Int, nProbe: Int, k: Int): DataFrame =
    routingTables(centroids) match {
      case None => emptyResult(queries)
      case Some((coarseDf, fineDf)) =>
        rank(assigned, routeProbes(queries, coarseDf, fineDf, coarseProbe, nProbe), k)
    }

  private def emptyResult(queries: DataFrame): DataFrame =
    queries.limit(0)
      .select(col("vec_id").as("query_id"), col("vec_id").as("neighbor_id"),
        lit(0.0).as("cosine"), lit(0).as("rnk"))

  private def routeProbes(queries: DataFrame, coarseDf: DataFrame,
      fineDf: DataFrame, coarseProbe: Int, nProbe: Int): DataFrame =
    routeCells(queries, coarseDf, fineDf, coarseProbe, nProbe)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"),
        col("norm").as("qnorm"), col("cell_id"))

  /** Driver-side coarse structure over the (model-sized) centroid table:
    * `(coarseDf(gid, gemb, gnorm), fineDf(gid, cell_id, cemb, cnorm))`,
    * both broadcast. None when the centroid table is empty. Coarse groups
    * are seeded from the c = ⌈√cells⌉ lowest cell_ids with a single
    * argmax-cosine membership pass; ties break to the lower group id. */
  private def routingTables(centroids: DataFrame)
      : Option[(DataFrame, DataFrame)] = {
    val spark = centroids.sparkSession
    import spark.implicits._
    val cents: Seq[(Int, Array[Double], Double)] = centroids.collect()
      .map { r =>
        (r.getAs[Number](0).intValue, r.getSeq[Double](1).toArray,
          r.getAs[Double](2))
      }.toSeq.sortBy(_._1)
    if (cents.isEmpty) return None
    val c = math.max(1, math.ceil(math.sqrt(cents.length.toDouble)).toInt)
    val coarse = cents.take(c)
    def cos(a: (Int, Array[Double], Double), b: (Int, Array[Double], Double)): Double = {
      var s = 0.0; var i = 0
      while (i < a._2.length) { s += a._2(i) * b._2(i); i += 1 }
      s / (a._3 * b._3)
    }
    val coarseDf = broadcast(
      coarse.zipWithIndex
        .map { case (g, j) => (j, g._2.toSeq, g._3) }
        .toDF("gid", "gemb", "gnorm"))
    val fineDf = broadcast(
      cents.map { cent =>
        // Argmax cosine over coarse centers; ties to the lower group id.
        val gid = coarse.indices.maxBy(j => (cos(cent, coarse(j)), -j))
        (gid, cent._1, cent._2.toSeq, cent._3)
      }.toDF("gid", "cell_id", "cemb", "cnorm"))
    Some((coarseDf, fineDf))
  }

  /** Shared two-stage route: coarseProbe best groups, then the fineK best
    * cells among those groups' centroids. The probe list is skinny
    * (negated-cos, gid) structs; the vector rides once via first(). */
  private def routeCells(vs: DataFrame, coarseDf: DataFrame, fineDf: DataFrame,
      coarseProbe: Int, fineK: Int): DataFrame = {
    require(coarseProbe > 0 && fineK > 0, "coarseProbe and fineK must be positive")
    val probed = vs.crossJoin(coarseDf)
      .withColumn("_gcos", dot(col("emb"), col("gemb")) / (col("norm") * col("gnorm")))
      .groupBy("vec_id")
      .agg(
        slice(array_sort(collect_list(struct(-col("_gcos"), col("gid")))),
          1, coarseProbe).as("_groups"),
        first("emb").as("emb"), first("norm").as("norm"))
      .select(col("vec_id"), col("emb"), col("norm"),
        explode(col("_groups").getField("gid")).as("gid"))
    val w = Window.partitionBy("vec_id").orderBy(col("_ccos").desc, col("cell_id"))
    probed.join(fineDf, "gid")
      .withColumn("_ccos", dot(col("emb"), col("cemb")) / (col("norm") * col("cnorm")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= fineK)
      .select(col("vec_id"), col("emb"), col("norm"), col("cell_id"))
  }
}
