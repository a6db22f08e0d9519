package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared vector expressions. Both ANN paths (brute/LSH in Similarity, IVF
  * in IvfAnn) and their parity tests depend on the SAME summation order —
  * a left-to-right fold — so the fold lives here once: cosines produced by
  * different operators must stay bit-comparable (SimilaritySuite compares
  * them at 1e-9).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ as a left-to-right fold — deterministic summation order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Σ cᵢ² with the same fold discipline. */
  def sumSquares(c: Column): Column =
    aggregate(transform(c, x => x * x), lit(0.0), (acc, x) => acc + x)
}
