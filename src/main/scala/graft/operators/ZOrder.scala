package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve keys for multi-dimensional data layout.
  *
  * Interleaves the low `bits` bits of two non-negative integer dimensions
  * into a single key: bit i of x lands at position 2i, bit i of y at 2i+1.
  * Sorting (or range-partitioning) a table by the z-key clusters rows so
  * that any contiguous z-range bounds BOTH dimensions — parquet row-group
  * and file min/max stats then prune scans on either column, which is the
  * layout trick behind Delta/Iceberg OPTIMIZE ZORDER BY.
  *
  * At 100 TB the write path is `repartitionByRange(zKey).sortWithinPartitions
  * (zKey)` — one range shuffle, after which a predicate on either dimension
  * touches O(selectivity) files instead of all of them.
  *
  * Everything here is integer shift/mask arithmetic — codegen'd built-in
  * expressions, no UDF — and `zSql` emits the identical formula as ANSI SQL
  * so a DuckDB oracle computes bit-equal keys.
  */
object ZOrder {

  /** Morton key of `(x, y)` using the low `bits` bits of each (bits ≤ 31).
    * Caller masks/scales dimensions into range first; values are taken
    * modulo 2^bits (`& mask`) so the key is total on any input.
    */
  def zKey(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31]: $bits")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The same Morton key as an ANSI SQL expression string (DuckDB-runnable),
    * for oracle twins: `zSql("l_partkey", "l_suppkey", 12)`.
    */
  def zSql(x: String, y: String, bits: Int): String = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31]: $bits")
    val mask = (1L << bits) - 1
    // Every term is fully parenthesized: DuckDB (PostgreSQL-grammar) gives
    // ALL bitwise operators equal precedence, left-associative, so an
    // unparenthesized `a << 2 | b << 3` parses as `((a << 2) | b) << 3`.
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"(((($x & $mask) >> $i) & 1) << ${2 * i})",
        s"(((($y & $mask) >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }
}
