package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — an operator Spark lacks natively
  * (SURVEY.md §2.4 lists it as a composable extension).
  *
  * For every left row, attach the right row with the greatest
  * `rightTime <= leftTime` within the same key (a left outer as-of join).
  *
  * Implemented with the union trick rather than a range join:
  * tag both sides, union them, and run one
  * `last(right_payload, ignoreNulls) OVER (PARTITION BY key ORDER BY time,
  * side)` window. Right rows sort before left rows at equal timestamps, so
  * the match is inclusive.
  *
  * Scale posture: exactly ONE shuffle (by key) and one per-partition sort —
  * the same cost as a single sort-merge join — versus a naive
  * `leftTime >= rightTime` theta-join that explodes to O(|L|·|R|) pairs per
  * key before picking the max. Window state is O(1) per key (running last).
  * Known caveat: a heavily skewed key concentrates its whole timeline in one
  * task; pre-splitting such keys by coarse time buckets (with boundary
  * carry-over) is the standard mitigation at extreme skew.
  */
object AsOfJoin {

  /** @param right       must be unique per (rightKey, rightTime) — pre-aggregate
    *                    otherwise (which match of a tie wins would be undefined)
    * @param rightCols   right columns to attach (null when no match)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val overlap = leftCols.toSet.intersect(rightCols.toSet)
    require(overlap.isEmpty,
      s"rightCols ${overlap.mkString(", ")} collide with left column names; " +
        "alias the right columns before joining")
    val rightSchema = right.select(rightCols.map(col): _*).schema
    val l = left.select(
      leftKey.as("_k"), leftTime.as("_t"), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(rightSchema).as("_r"))
    val r = right.select(
      rightKey.as("_k"), rightTime.as("_t"), lit(0).as("_side"),
      lit(null).cast(left.select(leftCols.map(col): _*).schema).as("_l"),
      struct(rightCols.map(col): _*).as("_r"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        leftCols.map(c => col(s"_l.$c").as(c)) ++
          rightCols.map(c => col(s"_match.$c").as(c)): _*)
  }
}
