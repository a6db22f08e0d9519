package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Distributed skyline (Pareto-dominance) operator — a query form Spark
  * lacks natively; pattern after the skyline-on-Spark literature
  * (e.g. "Integration of Skyline Queries into Spark SQL", EDBT 2023 —
  * referenced in PAPERS.md).
  *
  * A row is on the skyline iff no other row is ≥ on every dimension and
  * > on at least one (all dimensions maximized; negate a column to
  * minimize it).
  *
  * Two-phase execution, the canonical distributed scheme:
  *   1. local skyline per partition (`mapPartitions`, dominance filter) —
  *      embarrassingly parallel, removes the vast majority of rows;
  *   2. global skyline over the union of local candidates.
  * Phase 2 runs on a single partition: the candidate set is the union of
  * local skylines, which for d-dimensional data is tiny relative to N
  * (≈ O((ln N)^(d-1)) for independent dims). A pathological distribution
  * (everything on the front) degrades to the true skyline size — in that
  * case the result itself is that large and a tree-reduce of phase 2
  * would be the upgrade.
  */
object Skyline {

  /** Dominance: a ≥ b everywhere and > somewhere (shared-prefix dims). */
  private def dominates(a: Array[Double], b: Array[Double]): Boolean = {
    var i = 0
    var strict = false
    while (i < a.length) {
      if (a(i) < b(i)) return false
      if (a(i) > b(i)) strict = true
      i += 1
    }
    strict
  }

  private def localSkyline(rows: Iterator[Row], dimIdx: Array[Int]): Iterator[Row] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Row, Array[Double])]
    rows.foreach { r =>
      val v = dimIdx.map(i => r.getDouble(i))
      var dominated = false
      var i = 0
      while (i < kept.length && !dominated) {
        if (dominates(kept(i)._2, v)) dominated = true
        i += 1
      }
      if (!dominated) {
        val survivors = kept.filterNot { case (_, kv) => dominates(v, kv) }
        kept.clear()
        kept ++= survivors
        kept += ((r, v))
      }
    }
    kept.iterator.map(_._1)
  }

  /** Skyline of `df` maximizing the given numeric columns (cast to double
    * before calling; negate a column to minimize).
    *
    * Rows with a NULL or NaN in any dimension are excluded up front:
    * dominance is undefined for them (NULL would NPE in the row accessor,
    * NaN compares false both ways and would silently survive every filter).
    */
  def skyline(df: DataFrame, dims: Seq[String]): DataFrame = {
    val schema = df.schema
    val dimIdx = dims.map(schema.fieldIndex).toArray
    require(dimIdx.nonEmpty, "at least one skyline dimension required")
    import org.apache.spark.sql.functions.{col, isnan, not}
    val clean = df.na.drop(dims).filter(dims.map(c => not(isnan(col(c)))).reduce(_ && _))
    val enc = Encoders.row(schema)
    val local = clean.mapPartitions(it => localSkyline(it, dimIdx))(enc)
    local.coalesce(1).mapPartitions(it => localSkyline(it, dimIdx))(enc)
  }
}
