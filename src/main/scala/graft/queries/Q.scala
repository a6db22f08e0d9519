package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A registered engine query: the Spark-native implementation plus (when
  * SQL-expressible) the ANSI SQL the DuckDB oracle runs over the same parquet
  * tables. `oracle = None` ⇒ the driver records a weaker rows-only check.
  *
  * Column names MUST match between `run`'s output and `oracle` — the driver
  * sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {

  /** Exact, order-independent money-column sum.
    *
    * `sum` over DOUBLE is non-associative: Spark's partition-parallel
    * summation and DuckDB's sequential one can land on different low bits,
    * which a value-hash compare would flag. Casting each (deterministic,
    * per-row) double to DECIMAL(18,4) first makes the aggregation exact and
    * order-independent; the final cast back to DOUBLE converts the same exact
    * decimal in both engines, so results are bit-identical. The oracle-side
    * twin is `CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
    */
  def dsum(e: Column): Column = sum(e.cast(DecimalType(18, 4))).cast("double")

  /** Exact average: exact decimal sum → double, divided by the group count.
    * Both engines perform the identical double division, so no rounding or
    * tolerance is needed. Oracle twin: `dsum(x) / count(*)`.
    */
  def davg(e: Column): Column = dsum(e) / count(lit(1))

  /** Exact 2-dp decimal view of a money column. Fixture money values sit on
    * the 2-decimal grid (verified ≤1e-9 off at sf0.1), so the nearest-value
    * cast recovers the intended decimal identically in Spark and DuckDB.
    *
    * Needed for *products*: casting a double product like
    * `price * (1 - disc)` to decimal lands on arbitrary reals whose 4th-
    * decimal rounding can tie-break differently between engines. Doing the
    * multiplication in decimal keeps every intermediate exact. Keep operand
    * precision small (12,2) so chained products stay within DECIMAL(38,_)
    * without precision loss in either engine.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact decimal literal 1.00 for `1 - disc` / `1 + tax` style factors. */
  val one2: Column = lit(1).cast(DecimalType(4, 2))
}
