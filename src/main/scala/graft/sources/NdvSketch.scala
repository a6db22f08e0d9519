package graft.sources

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Per-file DISTINCT-COUNT sketch for manifest column stats — a dense
  * HyperLogLog with 2^9 = 512 byte registers (~4.6% standard error),
  * small enough to ride in every manifest entry next to min/max/nulls and
  * MERGEABLE at plan time by a slot-wise max, so a scan over any file
  * subset estimates each column's NDV without touching data. This is what
  * feeds `estimateStatistics().columnStats()` distinct counts and lets
  * cost-based join reordering see catalog-table cardinalities (Iceberg
  * records Theta/NDV sketches in puffin files for the same purpose).
  *
  * Values hash through XXH64 over the same CANONICAL form the bucket
  * transform uses — integral/temporal types as their widened long, so a
  * later `int → long` type widening never changes a value's hash and
  * pre-widen sketches stay valid; float widens to double exactly, so
  * doubles hash their bit pattern; strings/binary hash their bytes.
  */
private[graft] final class NdvSketch(val registers: Array[Byte]) {
  import NdvSketch._
  require(registers.length == M, s"expected $M registers, got ${registers.length}")

  def add(hash: Long): Unit = {
    val idx = (hash >>> (64 - P)).toInt
    // Rank of the remaining (64 - P)-bit suffix: leading zeros + 1,
    // counted within the suffix width (shift left so clz is exact).
    val suffix = hash << P
    val rank = (if (suffix == 0L) (64 - P) + 1
      else java.lang.Long.numberOfLeadingZeros(suffix) + 1).toByte
    if (rank > registers(idx)) registers(idx) = rank
  }

  /** Slot-wise max — HLL union is exact over unions of value sets. */
  def mergeInPlace(other: NdvSketch): this.type = {
    var i = 0
    while (i < M) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
    this
  }

  /** Standard HLL estimate with the small-range (linear counting)
    * correction; 64-bit hashes need no large-range correction. */
  def estimate: Long = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += 1.0 / (1L << registers(i))
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M * M / invSum
    val e =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.max(1L, math.round(e))
  }

  def isEmpty: Boolean = registers.forall(_ == 0)
}

private[graft] object NdvSketch {
  val P = 9
  val M: Int = 1 << P
  private val Alpha = 0.7213 / (1 + 1.079 / M)
  private val Seed = 42L

  def empty: NdvSketch = new NdvSketch(new Array[Byte](M))

  def apply(registers: Array[Byte]): Option[NdvSketch] =
    if (registers != null && registers.length == M)
      Some(new NdvSketch(registers))
    else None

  /** Canonical 64-bit hash of a NON-NULL catalyst value (see class doc
    * for the widening-stability argument); None = untrackable type. */
  def hash(v: Any, dt: DataType): Option[Long] = dt match {
    case ByteType => Some(XXH64.hashLong(v.asInstanceOf[Byte].toLong, Seed))
    case ShortType => Some(XXH64.hashLong(v.asInstanceOf[Short].toLong, Seed))
    case IntegerType | DateType =>
      Some(XXH64.hashLong(v.asInstanceOf[Int].toLong, Seed))
    case LongType | TimestampType | TimestampNTZType =>
      Some(XXH64.hashLong(v.asInstanceOf[Long], Seed))
    case BooleanType =>
      Some(XXH64.hashLong(if (v.asInstanceOf[Boolean]) 1L else 0L, Seed))
    case FloatType => Some(XXH64.hashLong(
      java.lang.Double.doubleToLongBits(v.asInstanceOf[Float].toDouble), Seed))
    case DoubleType => Some(XXH64.hashLong(
      java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), Seed))
    case StringType =>
      val s = v.asInstanceOf[UTF8String]
      Some(XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes(), Seed))
    case _: DecimalType =>
      // Scale-free canonical text: DECIMAL(10,2) 5.00 and a later
      // precision-widened 5.000 hash identically.
      val d = v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.stripTrailingZeros().toPlainString
      val b = d.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      Some(XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, Seed))
    case _ => None
  }

  /** Merged estimate over many per-file register arrays; None when no
    * file carries a sketch for the column. */
  def mergedEstimate(sketches: Iterator[Array[Byte]]): Option[Long] = {
    var acc: NdvSketch = null
    sketches.foreach { r =>
      apply(r).foreach { s =>
        if (acc == null) acc = new NdvSketch(s.registers.clone())
        else acc.mergeInPlace(s)
      }
    }
    Option(acc).map(_.estimate)
  }
}
