package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-out trailing-range window: exact `RANGE BETWEEN range PRECEDING AND
  * CURRENT ROW` count/sum with parallelism ∝ (keys × time buckets) instead
  * of Spark's one-task-per-partition-key window execution.
  *
  * THE 100 TB PROBLEM: `Window.partitionBy(lowCardKey).orderBy(ts)
  * .rangeBetween(-r, 0)` puts each key's ENTIRE history in one task — a
  * trailing-hour metric per event_type (5 types) runs 5 tasks no matter how
  * many executors exist, and a year of one type must fit one task's sort.
  * The two-pointer frame evaluation is linear, but it is SERIAL per key.
  *
  * THE REWRITE (ghost replication): bucket time into widths of exactly
  * `range`. Each row is emitted once as itself in its own bucket and once
  * as a read-only "ghost" in the NEXT bucket. A trailing frame of width
  * `range` anchored at a row in bucket b can only reach rows in buckets
  * b-1 and b — and partition (key, b) contains exactly bucket b's real rows
  * plus bucket b-1's ghosts, each underlying event exactly once. So the
  * same RANGE window run inside (key, bucket) partitions produces
  * IDENTICAL frames for the real rows; ghosts are dropped after. Cost: 2×
  * row volume, in exchange for keys × buckets -way parallelism and a
  * per-task working set bounded by two buckets of one key. The t05 gate
  * hash-checks this rewrite against the single-task SQL window oracle.
  */
object BoundedRangeWindow {

  /** Trailing count + exact-decimal sum over `(partition keys) ORDER BY
    * tsMicros RANGE BETWEEN rangeMicros PRECEDING AND CURRENT ROW`.
    * Output = input columns + `ts_us` + `<outPrefix>n` / `<outPrefix>sum`.
    * `value` must be the already-decimal-cast measure (exactness contract
    * as in `Q.dec2`). */
  def trailingCountSum(df: DataFrame, partCols: Seq[String], tsMicros: Column,
      rangeMicros: Long, value: Column,
      outCount: String, outSum: String): DataFrame = {
    require(rangeMicros > 0, s"rangeMicros must be positive, got $rangeMicros")
    // Exact integer floor(ts_us / range): `div` truncates toward zero, so
    // adjust by one when the remainder is negative. A double-precision
    // FLOOR(ts/r) would misbucket sort keys above 2^53 (nanosecond epochs),
    // corrupting neighboring frames; integer arithmetic is exact for every
    // Long value.
    val withTs = df.withColumn("ts_us", tsMicros)
      .withColumn("_val", value)
      .withColumn("_bucket",
        expr(s"ts_us DIV ${rangeMicros}L - " +
          s"CASE WHEN ts_us % ${rangeMicros}L < 0 THEN 1L ELSE 0L END"))
    val real = withTs.withColumn("_owner", col("_bucket"))
      .withColumn("_ghost", lit(false))
    // Null order values form their own peer group (RANGE-frame null
    // semantics); their ghost copy would land in the SAME null-owner
    // partition and double every null frame — so ghosts carry only
    // non-null timestamps.
    val ghost = withTs.filter(col("ts_us").isNotNull)
      .withColumn("_owner", col("_bucket") + 1)
      .withColumn("_ghost", lit(true))
    val w = Window.partitionBy((partCols :+ "_owner").map(col): _*)
      .orderBy("ts_us")
      .rangeBetween(-rangeMicros, 0)
    real.unionAll(ghost)
      .withColumn(outCount, count(lit(1)).over(w))
      .withColumn(outSum, sum(col("_val")).over(w))
      .filter(!col("_ghost"))
      .drop("_bucket", "_owner", "_ghost", "_val")
  }
}
