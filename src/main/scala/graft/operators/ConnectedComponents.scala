package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by large-star/small-star alternation (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * clustering step after near-dup pair generation (SURVEY §2.12:
  * "connected components within bands"), assigning every member of a
  * duplicate group the group's minimum id.
  *
  * Each round is two edge rewrites, each one groupBy-min + join + distinct:
  *
  *   - large-star: every node connects its LARGER neighbors to the minimum
  *     of its closed neighborhood;
  *   - small-star: every node connects its smaller neighbors (and itself)
  *     to the smallest of them.
  *
  * Both steps preserve the component partition, and the edge set converges
  * to stars centered at each component's minimum in O(log² n) rounds —
  * the scale upgrade over one-hop min-label propagation, whose round count
  * is the component DIAMETER (adversarial chains at 100 TB: thousands).
  * Each round's edge set is `localCheckpoint`ed: the logical plan stays one
  * round deep instead of nesting every previous join, so analysis/AQE cost
  * is constant per round. Only a convergence boolean reaches the driver
  * per round — the edges never leave the executors.
  */
object ConnectedComponents {

  /** Edge-count ceiling for the driver-local fast path: 100k canonical
    * edges is ~1.6 MB of longs — broadcast-join-sized, far under any
    * driver budget — while a union-find over it replaces ~4 distributed
    * star rounds (each 2 shuffles + a convergence probe). Same
    * scale-adaptive pattern as the engine's IN-list-vs-semi-join caps:
    * the distributed alternation below stays the unbounded-scale path. */
  val LocalMaxEdges = 100000L

  /** @param pairs two columns `id_a`, `id_b` (undirected edges)
    * @param localMaxEdges fast-path ceiling (tests pass 0 to force the
    *   distributed alternation on small graphs)
    * @return `id`, `cluster_id` (min reachable id) for every endpoint
    */
  def clusters(pairs: DataFrame, maxIters: Int = 25,
      localMaxEdges: Long = LocalMaxEdges): DataFrame = {
    // ONE pass over the (possibly expensive) caller plan: canonicalize,
    // dedup, checkpoint — then split self-pairs from real edges off the
    // materialized frame. Deriving selfNodes lazily from `pairs` would
    // re-execute the whole upstream pair generation at action time.
    val canon = pairs
      .select(
        least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"))
      .distinct()
      .localCheckpoint()
    // Small-graph fast path: counting the checkpointed frame is one cheap
    // cached-block pass; under the ceiling (and for the orderable id types
    // a local min-label is trivially exact on), collect + union-find and
    // skip the iterative rounds entirely. Output rows are IDENTICAL to the
    // distributed fixpoint's: one (id, min reachable id) row per endpoint
    // (ConnectedComponentsSuite runs both paths over the same graphs).
    val idType = canon.schema.fields.head.dataType
    val localizable =
      idType == org.apache.spark.sql.types.LongType ||
        idType == org.apache.spark.sql.types.IntegerType
    if (localizable && localMaxEdges > 0L && canon.count() <= localMaxEdges)
      // Null-keyed rows fall silently out of the distributed alternation's
      // self-pair/edge filters (null comparisons are never true); drop them
      // here too so both paths treat nulls identically — localClusters'
      // row.getLong would NPE on them instead.
      return localClusters(canon.filter(col("lo").isNotNull && col("hi").isNotNull))
    // Self-pairs (id_a = id_b) carry no connectivity but their endpoint is
    // still "every endpoint" under the contract: remember them and emit
    // singleton labels for any that end up in no real component.
    val selfNodes = canon.filter(col("lo") === col("hi")).select(col("lo").as("id"))
    // Canonical edge form throughout: (lo, hi), lo < hi, distinct — the
    // shape both star steps and the convergence check operate on.
    var edges = canon.filter(col("lo") =!= col("hi"))

    // Convergence = the edge set IS a star forest, checked structurally
    // (no node is both a root and a leaf; every leaf has exactly one root)
    // rather than via a fingerprint-stability heuristic: star-ness is the
    // exact postcondition the label extraction below relies on. One
    // groupBy + emptiness probe per round; only a boolean reaches the
    // driver.
    def isStarForest(e: DataFrame): Boolean = {
      val flags = e.select(col("lo").as("n"), lit(0L).as("h"))
        .unionAll(e.select(col("hi").as("n"), lit(1L).as("h")))
      flags.groupBy("n")
        .agg(min(col("h")).as("mn"), max(col("h")).as("mx"), sum(col("h")).as("nh"))
        .filter((col("mn") === 0 && col("mx") === 1) || col("nh") > 1)
        .isEmpty
    }

    /** Large-star: for each node a with closed-neighborhood min m, rewire
      * every neighbor b > a to m. Larger-side edges are re-attached low;
      * smaller-side edges survive via the opposite endpoint's emission.
      * Output rows are already (lo, hi)-ordered (b > a ≥ m) and bounded by
      * |E| (one row per undirected edge), so no dedup shuffle here — the
      * small-star step's distinct cleans the round. */
    def largeStar(e: DataFrame): DataFrame = {
      val adj = e.select(col("lo").as("a"), col("hi").as("b"))
        .union(e.select(col("hi").as("a"), col("lo").as("b")))
      val mins = adj.groupBy("a").agg(min(col("b")).as("mn"))
      adj.join(mins, "a")
        .filter(col("b") > col("a"))
        .select(least(col("mn"), col("a")).as("lo"), col("b").as("hi"))
    }

    /** Small-star: orient edges large→small; each node links its smaller
      * neighbors and itself to the smallest of those neighbors. Emissions
      * are already (lo, hi)-ordered (mn ≤ every lo < hi). */
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("hi").agg(min(col("lo")).as("mn"))
      val withMin = e.join(mins, "hi")
      withMin.select(col("mn").as("lo"), col("lo").as("hi"))
        .filter(col("lo") =!= col("hi"))
        .union(withMin.select(col("mn").as("lo"), col("hi")))
        .distinct()
    }

    var iters = 0
    var converged = isStarForest(edges)
    while (!converged && iters < maxIters) {
      // Lazy checkpoint: the convergence check's action materializes it,
      // saving one job per round over an eager checkpoint. Superseded
      // rounds' checkpoint caches are RDD-level (not CacheManager
      // entries), so the ContextCleaner reclaims them as the old Dataset
      // references go out of scope — no explicit unpersist needed.
      edges = smallStar(largeStar(edges)).localCheckpoint(false)
      converged = isStarForest(edges)
      iters += 1
    }
    require(converged, s"connected components did not converge in $maxIters rounds")
    // Fixpoint edges are stars (lo = component min): leaves label lo, roots
    // label themselves; self-pair-only nodes are their own singletons.
    val labeled = edges.select(col("hi").as("id"), col("lo").as("cluster_id"))
      .union(edges.select(col("lo").as("id"), col("lo").as("cluster_id")))
      .distinct()
    labeled.union(
      selfNodes.join(labeled, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("cluster_id")))
  }

  /** Driver-local labeling of a SMALL canonical edge frame (`lo`, `hi`,
    * distinct, lo ≤ hi, ≤ [[LocalMaxEdges]] rows): path-compressing
    * union-find keyed on the numeric id, component label = min member —
    * the same function the star alternation converges to. Self-pairs
    * label themselves unless a real edge reaches them, exactly like the
    * distributed path's singleton handling. */
  private def localClusters(canon: DataFrame): DataFrame = {
    val spark = canon.sparkSession
    val longIds = canon.schema.fields.head.dataType ==
      org.apache.spark.sql.types.LongType
    val edges = canon.collect().map { r =>
      if (longIds) (r.getLong(0), r.getLong(1))
      else (r.getInt(0).toLong, r.getInt(1).toLong)
    }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent(root)
      var cur = x
      while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
      root
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      // Union by MIN id: the root is always the component minimum, so the
      // final find() IS the cluster label.
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val rows = parent.keysIterator
      .map(id => (id, find(id))).toSeq.sortBy(_._1)
    import spark.implicits._
    val out = spark.createDataset(rows).toDF("id", "cluster_id")
    if (longIds) out
    else out.select(col("id").cast("int").as("id"),
      col("cluster_id").cast("int").as("cluster_id"))
  }
}
