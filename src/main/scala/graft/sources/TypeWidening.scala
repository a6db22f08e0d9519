package graft.sources

import org.apache.spark.sql.types._

/** SAFE TYPE PROMOTION (Iceberg schema evolution's widening rules, cf.
  * iceberg spec "Schema Evolution": int→long, float→double, decimal
  * precision-up — promotions where every old value is exactly
  * representable in the new type, so widening is METADATA-ONLY: no file
  * is rewritten; readers up-cast each old file's values at decode time
  * (write-time type resolved per file through
  * [[SnapshotStore.TableState.writeTypeAt]]).
  *
  * The integral ladder includes Spark's byte/short tiers (Iceberg has no
  * 8/16-bit ints; the same exact-representability argument covers them).
  *
  * Reference anchor: the reference's Iceberg tables are format-version=2
  * (`/root/reference/iceberg_tables/customers.yml`), whose spec defines
  * exactly these promotions.
  */
private[graft] object TypeWidening {

  private def intTier(dt: DataType): Int = dt match {
    case ByteType => 1
    case ShortType => 2
    case IntegerType => 3
    case LongType => 4
    case _ => 0
  }

  /** Is `from` → `to` a safe (lossless, metadata-only) promotion? */
  def safePromotion(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if intTier(f) > 0 && intTier(t) > 0 => intTier(f) < intTier(t)
    case (FloatType, DoubleType) => true
    case (f: DecimalType, t: DecimalType) =>
      t.scale == f.scale && t.precision > f.precision
    case _ => false
  }

  /** Value converter `from` → `to` over Catalyst-internal values, or null
    * when the types are identical (callers use null as the no-op marker —
    * the hot path never pays a lambda for an unwidened column). */
  def caster(from: DataType, to: DataType): Any => Any =
    if (from == to) null
    else {
      require(safePromotion(from, to), s"not a safe promotion: $from -> $to")
      (from, to) match {
        case (ByteType, ShortType) => v => v.asInstanceOf[Byte].toShort
        case (ByteType, IntegerType) => v => v.asInstanceOf[Byte].toInt
        case (ByteType, LongType) => v => v.asInstanceOf[Byte].toLong
        case (ShortType, IntegerType) => v => v.asInstanceOf[Short].toInt
        case (ShortType, LongType) => v => v.asInstanceOf[Short].toLong
        case (IntegerType, LongType) => v => v.asInstanceOf[Int].toLong
        case (FloatType, DoubleType) => v => v.asInstanceOf[Float].toDouble
        case (_: DecimalType, t: DecimalType) =>
          v => Decimal(v.asInstanceOf[Decimal].toJavaBigDecimal,
            t.precision, t.scale)
        case other => sys.error(s"unreachable: $other")
      }
    }

  /** Coerce a STATS/metadata value that may predate a widen (it was
    * collected in the write-time type) into `dt` — numeric promotions by
    * runtime class, identity otherwise. The planning comparators and the
    * manifest codec expect values of the schema's CURRENT type; a
    * pre-widen file's in-memory descriptor still holds the narrow boxes. */
  def coerce(dt: DataType, v: Any): Any =
    if (v == null) null
    else dt match {
      case LongType => v match {
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short => s.longValue()
        case b: java.lang.Byte => b.longValue()
        case _ => v
      }
      case IntegerType => v match {
        case s: java.lang.Short => s.intValue()
        case b: java.lang.Byte => b.intValue()
        case _ => v
      }
      case ShortType => v match {
        case b: java.lang.Byte => b.shortValue()
        case _ => v
      }
      case DoubleType => v match {
        case f: java.lang.Float => f.doubleValue()
        case _ => v
      }
      case t: DecimalType => v match {
        case d: Decimal if d.precision != t.precision || d.scale != t.scale =>
          Decimal(d.toJavaBigDecimal, t.precision, t.scale)
        case _ => v
      }
      case _ => v
    }
}
