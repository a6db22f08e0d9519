package graft.queries

/** Generates the DuckDB oracle for the iterative k-means query (k02) by
  * unrolling Lloyd's iterations into CTE layers — the round-4 verdict's
  * "3 fixed iterations are SQL-expressible" item.
  *
  * Layer map (mirrors [[graft.operators.KMeans.fit]] exactly):
  *
  *   c0     seeds: the k lowest-id vectors, cluster = rank - 1
  *   a_i    assignment: argmin of the left-to-right (x−y)² fold, ties to
  *          the lower cluster id — `list_reduce(…, (a,b) -> a+b)` matches
  *          Spark's `aggregate(…, 0.0, (acc,x) -> acc+x)` bitwise because
  *          the 0.0 seed adds exactly
  *   m_i    per-dimension means as DECIMAL(38,15) sums (order-free) cast
  *          to DOUBLE over the count; an emptied cluster keeps its
  *          previous centroid (LEFT JOIN + coalesce)
  *
  * After `iters` mean layers, one final assignment feeds the cluster-size
  * and exact-decimal inertia aggregate.
  */
object KMeansOracle {

  private def assign(i: Int, cents: String): String = s"""
a$i AS (SELECT vec_id, v, cluster, d2 FROM (
  SELECT vec_id, v, cluster, d2,
    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
  FROM (SELECT e.vec_id, e.v, c.cluster,
      list_reduce(list_transform(list_zip(e.v, c.cv),
        s -> (s[1]-s[2])*(s[1]-s[2])), (a,b) -> a+b) AS d2
    FROM e CROSS JOIN $cents c)) WHERE rn = 1)"""

  private def means(i: Int): String = s"""
m$i AS (SELECT cluster, dim, CAST(sum(CAST(val AS DECIMAL(38,15))) AS DOUBLE) / count(*) AS mv
  FROM (SELECT cluster, unnest(v) AS val, generate_subscripts(v, 1) AS dim FROM a$i)
  GROUP BY cluster, dim),
cl$i AS (SELECT cluster, list(mv ORDER BY dim) AS cv FROM m$i GROUP BY cluster),
c$i AS (SELECT p.cluster, coalesce(n.cv, p.cv) AS cv FROM c${i - 1} p LEFT JOIN cl$i n USING (cluster))"""

  /** DuckDB oracle for [[graft.operators.KMeans.assignTwoLevel]]-routed
    * SemDeDup (sd02): the two-level route is deterministic given the
    * seeded centroids, so the whole pipeline unrolls into CTE layers —
    * the same move that upgraded k02 from rows-only to hash-exact.
    *
    * Layer map (mirrors `assignTwoLevel` + `SemanticDedup.dropWithin`):
    *
    *   cents   the k fine centroids (cluster = vec_id < k, the fixture
    *           seeding discipline)
    *   g0      coarse seeds: the c = ⌈√k⌉ lowest cluster ids
    *   mb_r    centroid→group membership, argmin of the (x−y)² fold with
    *           ties to the lower group index
    *   g_r     per-group per-dim means — `list_reduce(list(val ORDER BY
    *           cluster))` forces the SAME sequential fold order as the
    *           driver loop's `m(i) += v(i)` over id-sorted centroids (a
    *           plain SUM would be partition-order-free in DuckDB but the
    *           driver's fold is sequential, and the two can differ in the
    *           last ulp); emptied groups keep the previous center
    *   mbF     FINAL membership against the post-loop centers (the same
    *           pass `assignTwoLevel` runs after its Lloyd's loop)
    *   pr      coarse probe: per corpus vector the `nprobe` nearest
    *           OCCUPIED groups by (6-dp-rounded distance, group index)
    *   asg     fine argmin within probed groups by (rounded dist, cluster)
    *   p/r     within-cell greedy drop, exactly sd01's oracle shape
    */
  def twoLevelSemDedupSql(k: Int, rounds: Int, nprobe: Int, tau: Double): String = {
    require(k >= 1 && rounds >= 1 && nprobe >= 1)
    val c = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    def d2(a: String, b: String) =
      s"list_reduce(list_transform(list_zip($a, $b), s -> (s[1]-s[2])*(s[1]-s[2])), (a,b) -> a+b)"
    def memberLayer(i: Int, prev: String): String = s"""
mb$i AS (SELECT cluster, j FROM (
  SELECT cc.cluster, g.j,
    row_number() OVER (PARTITION BY cc.cluster
      ORDER BY ${d2("cc.cvec", "g.gvec")}, g.j) AS rn
  FROM cents cc CROSS JOIN $prev g) WHERE rn = 1)"""
    def meanLayer(i: Int, prev: String): String = s"""
gm$i AS (
  SELECT mb.j, t.dim,
    list_reduce(list(t.val ORDER BY t.cluster), (a,b) -> a+b) / count(*) AS mv
  FROM (SELECT cluster, unnest(cvec) AS val, generate_subscripts(cvec, 1) AS dim
        FROM cents) t
  JOIN mb$i mb USING (cluster)
  GROUP BY mb.j, t.dim),
g$i AS (
  SELECT p.j, coalesce(n.gvec, p.gvec) AS gvec
  FROM $prev p LEFT JOIN
    (SELECT j, list(mv ORDER BY dim) AS gvec FROM gm$i GROUP BY j) n USING (j))"""
    val layers = (1 to rounds)
      .map(i => s"${memberLayer(i, s"g${i - 1}")},${meanLayer(i, s"g${i - 1}")}")
      .mkString(",")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (
  SELECT CAST(vec_id AS INT) AS cluster, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings WHERE vec_id < $k),
g0 AS (
  SELECT CAST(row_number() OVER (ORDER BY cluster) - 1 AS INT) AS j, cvec AS gvec
  FROM (SELECT cluster, cvec FROM cents ORDER BY cluster LIMIT $c)),
$layers,
${memberLayer(rounds + 1, s"g$rounds").stripPrefix("\n").replaceFirst(s"mb${rounds + 1}", "mbF")},
occ AS (
  SELECT g.j, g.gvec FROM g$rounds g
  WHERE g.j IN (SELECT j FROM mbF)),
pr AS (
  SELECT vec_id, j FROM (
    SELECT e.vec_id, g.j,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY round(sqrt(${d2("e.v", "g.gvec")}), 6), g.j) AS rn
    FROM e CROSS JOIN occ g) WHERE rn <= $nprobe),
fine AS (
  SELECT mb.j, cc.cluster, cc.cvec FROM cents cc JOIN mbF mb USING (cluster)),
asg AS (
  SELECT vec_id, cluster FROM (
    SELECT p.vec_id, f.cluster,
      row_number() OVER (PARTITION BY p.vec_id
        ORDER BY round(sqrt(${d2("e.v", "f.cvec")}), 6), f.cluster) AS rn
    FROM pr p JOIN e ON e.vec_id = p.vec_id JOIN fine f ON f.j = p.j)
  WHERE rn = 1),
p AS (
  SELECT x.cluster, x.vec_id AS id_a, y.vec_id AS id_b,
    round(list_cosine_similarity(ea.v, eb.v), 6) AS cos
  FROM asg x JOIN asg y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
  JOIN e ea ON ea.vec_id = x.vec_id
  JOIN e eb ON eb.vec_id = y.vec_id
  WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= $tau),
r AS (
  SELECT cluster, id_b AS vec_id, id_a AS dup_of, cos AS cosine,
    row_number() OVER (PARTITION BY id_b ORDER BY id_a) AS rn
  FROM p)
SELECT cluster, vec_id, dup_of, cosine FROM r WHERE rn = 1 ORDER BY vec_id"""
  }

  def sql(k: Int, iters: Int): String = {
    // iters = 0 (KMeans.fit allows it) would leave a dangling comma after
    // c0 — the zero-iteration case is plain nearest-centroid assignment
    // (k01's oracle shape), not worth a degenerate branch here.
    require(k >= 1 && iters >= 1, s"need k >= 1 and iters >= 1, got k=$k iters=$iters")
    val layers = (1 to iters).map(i => s"${assign(i, s"c${i - 1}")},${means(i)}").mkString(",")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, v AS cv
       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $k)),
$layers,
${assign(iters + 1, s"c$iters")}
SELECT cluster, count(*) AS n_points,
  round(CAST(sum(CAST(d2 AS DECIMAL(28,10))) AS DOUBLE), 6) AS inertia
FROM a${iters + 1} GROUP BY cluster ORDER BY cluster"""
  }
}
