package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ZOrderSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Bit-by-bit reference interleave, independent of the Column fold. */
  private def refZ(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val (xm, ym) = (x & mask, y & mask)
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((xm >> i) & 1L) << (2 * i)) | (((ym >> i) & 1L) << (2 * i + 1))
    }
  }

  test("zKey matches the reference interleave on exhaustive 6-bit space") {
    val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = rows.toDF("x", "y")
      .select($"x", $"y", ZOrder.zKey(col("x"), col("y"), 6).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === refZ(x, y, 6), s"($x,$y)") }
  }

  test("known interleavings") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(ZOrder.zKey(col("x"), col("y"), 4).as("z"))
    // (5,3): x=0101, y=0011 → z bits (z5..z0) = y2 x2 y1 x1 y0 x0 = 011011
    assert(df.as[Long].collect().toSeq === Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("values beyond `bits` wrap via the mask instead of corrupting the key") {
    val df = Seq((16L + 5L, 3L)).toDF("x", "y")
      .select(ZOrder.zKey(col("x"), col("y"), 4).as("z"))
    assert(df.as[Long].collect().head === refZ(5L, 3L, 4))
  }

  test("a shared z-prefix bounds BOTH dimensions (the pruning property)") {
    // Top 2k bits of a 2·bits key fix the top k bits of each dimension:
    // every bucket spans ≤ 2^(bits-k) per dim. bits=8, prefix=top 8 → k=4,
    // so each 256-key bucket covers an x-range and y-range of width ≤ 16.
    val rows = for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)
    val spans = rows.toDF("x", "y")
      .select($"x", $"y", ZOrder.zKey(col("x"), col("y"), 8).as("z"))
      .groupBy(shiftright(col("z"), 8).as("bucket"))
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .as[(Long, Long, Long)].collect()
    assert(spans.length === 256)
    spans.foreach { case (b, xs, ys) =>
      assert(xs <= 15 && ys <= 15, s"bucket $b spans x=$xs y=$ys")
    }
  }

  test("zSql emits one fully-parenthesized term per bit per dimension") {
    val sql = ZOrder.zSql("a", "b", 3)
    // 6 interleave terms OR-ed: each parenthesized so equal-precedence
    // left-associative parsers (DuckDB/Postgres) can't misgroup them.
    assert(sql.count(_ == '|') === 5)
    assert(Seq(0, 1, 2).forall(i => sql.contains(s">> $i)")))
    assert(sql.contains("<< 5)") && !sql.contains("<< 6"))
  }
}
