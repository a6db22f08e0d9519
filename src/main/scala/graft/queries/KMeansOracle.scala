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
