package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (schemas in FIXTURES.md).
  *
  * Plain parquet directory scans: Catalyst's DataSource V1 parquet relation
  * gives vectorized reads, filter pushdown, and column pruning for free, so
  * every query built on these starts from a prunable scan. At cluster scale
  * the same call sites would read a catalog table (`spark.table`) — the
  * downstream plans are identical.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped in two fixture vintages: parquet TIMESTAMP(NANOS)
    * (which the nanosAsLong pin in SessionFactory surfaces as a raw ns Long)
    * and plain timestamp[us] (which Spark reads as native TIMESTAMP). Branch
    * on the scanned type so both vintages load: a ns Long is truncated to
    * microseconds with integer division — `div` keeps the arithmetic in Long
    * (a double round trip would lose precision above 2^53 ns) and floors
    * exactly like DuckDB's ns→µs parquet read, so oracle comparisons stay
    * bit-exact — while a native TIMESTAMP passes through untouched.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
