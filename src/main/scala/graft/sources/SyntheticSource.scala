package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 table of deterministic synthetic events — the custom
  * connector rung (SURVEY §2.2 beyond file formats): shows the full V2 read
  * path with REAL pushdown, not just a row generator.
  *
  *   - `SupportsPushDownRequiredColumns`: the reader materializes only the
  *     pruned schema — a projection above the scan narrows what each row
  *     builds (visible as the Scan's `ReadSchema`).
  *   - `SupportsPushDownFilters`: range/equality predicates on `event_id`
  *     narrow the generated id interval BEFORE partition planning, so
  *     filtered scans plan fewer/smaller partitions — the V2 analogue of
  *     parquet row-group pruning (visible as `PushedFilters`).
  *   - Partition planning slices the id range evenly; each
  *     `PartitionReader` streams its slice without buffering it.
  *
  * Rows derive from the id by hashing (no RNG state), so any slice of the
  * table is reproducible on any executor — the property a restartable
  * 100 TB backfill source needs.
  *
  * Usage: `spark.read.format("graft.sources.SyntheticSource")
  *   .option("rows", n).option("partitions", p).load()`.
  */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // Fail fast on the driver: a user-supplied `.schema(...)` that differs
    // from the source's fixed schema would otherwise be silently dropped
    // (or surface as an executor-time unknown-column error).
    require(schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      SyntheticSource.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"synthetic source has a fixed schema ${SyntheticSource.schema.simpleString}; " +
        s"user-specified schema ${schema.simpleString} is not supported")
    new SyntheticTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
  }
}

object SyntheticSource {
  val schema: StructType = new StructType()
    .add("event_id", LongType, nullable = false)
    .add("user_id", LongType, nullable = false)
    .add("event_type", StringType, nullable = false)
    .add("value", DoubleType, nullable = false)

  private val types = Array("click", "view", "purchase")

  /** Deterministic row content from the id (splitmix64 finalizer). */
  def mix(id: Long): Long = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def userOf(id: Long): Long = math.floorMod(mix(id), 100L)
  def typeOf(id: Long): String = types(math.floorMod(mix(id) >>> 8, types.length.toLong).toInt)
  def valueOf(id: Long): Double = math.floorMod(mix(id) >>> 16, 100000L) / 100.0
}

final class SyntheticTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"synthetic($rows)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, partitions)
}

final class SyntheticScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = SyntheticSource.schema
  private var lo: Long = 0L          // inclusive
  private var hi: Long = rows        // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept id-range predicates by narrowing [lo, hi); everything else
    * stays post-scan. Pushed filters are also fully evaluated by the
    * narrowed range, so they are NOT returned as residuals. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("event_id", _: Long) => true
      case GreaterThan("event_id", _: Long) => true
      case GreaterThanOrEqual("event_id", _: Long) => true
      case LessThan("event_id", _: Long) => true
      case LessThanOrEqual("event_id", _: Long) => true
      case _ => false
    }
    // Saturating successor: v+1 on Long.MaxValue wraps negative, which
    // would silently widen (GT) or empty (LTE) the consumed range.
    def succ(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    accepted.foreach {
      case EqualTo("event_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, succ(v))
      case GreaterThan("event_id", v: Long) => lo = math.max(lo, succ(v))
      case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v)
      case LessThan("event_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("event_id", v: Long) => hi = math.min(hi, succ(v))
      case _ => ()
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SyntheticScan(required, math.max(lo, 0L),
    math.max(hi, math.max(lo, 0L)), partitions)
}

final case class SyntheticPartition(start: Long, end: Long) extends InputPartition

final class SyntheticScan(readSchema: StructType, lo: Long, hi: Long, partitions: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = readSchema
  override def toBatch: Batch = this
  override def description(): String = s"graft-synthetic [$lo, $hi)"

  /** Even id slices; filtered scans plan over the NARROWED range. */
  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array.empty
    else {
      val parts = math.min(partitions.toLong, n).toInt
      (0 until parts).map { i =>
        val s = lo + i * n / parts
        val e = lo + (i + 1) * n / parts
        SyntheticPartition(s, e)
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(readSchema)
}

final class SyntheticReaderFactory(readSchema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticPartition]
    // Bind column generators once per partition, to the PRUNED schema only.
    val gens: Array[Long => Any] = readSchema.fieldNames.map {
      case "event_id" => (id: Long) => id
      case "user_id" => (id: Long) => SyntheticSource.userOf(id)
      case "event_type" => (id: Long) => UTF8String.fromString(SyntheticSource.typeOf(id))
      case "value" => (id: Long) => SyntheticSource.valueOf(id)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(id)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
