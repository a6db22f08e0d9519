package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetReader, ParquetWriter}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeRow}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
import org.apache.spark.sql.connector.expressions.{NamedReference, Expression => VExpression, Literal => VLiteral}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => VPredicate}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Data-file formats behind the snapshot catalog's [[SnapshotStore.DataFile]]
  * seam — the swap the `DataFile` abstraction was designed for:
  *
  *   - `parquet` (the default): COLUMNAR files written task-side through
  *     Spark's own [[ParquetWriteSupport]] and read back through
  *     [[ParquetReadSupport]], so a column-pruned scan DECODES only the
  *     requested columns (the `.grf` row stream always paid every byte of
  *     every row) and the bytes ride parquet's encodings + snappy. This is
  *     the Iceberg scan stack's shape: manifests for pruning, parquet for
  *     the data plane.
  *   - `grf` (`write.format=grf` table property): the Spark-native
  *     length-prefixed UnsafeRow stream ([[RowFiles]]) — kept as the
  *     zero-decode baseline the BASELINE.md scan row measures against.
  *
  * Readers pick per FILE (by extension), so a table whose property changed
  * mid-history — or a compaction that rewrote history into the new format —
  * reads mixed files transparently.
  *
  * Every writer also collects PER-FILE COLUMN STATS (min / max / null count
  * of supported atomic columns) into the file's manifest entry; scans skip
  * whole files on pushed DATA predicates through [[StatsPredicates]] —
  * Iceberg's manifest-stats file skipping, the difference between "open
  * every file of an unpartitioned 100 TB table" and "open the files whose
  * range can match".
  */
private[sources] object DataFiles {
  val Grf = "grf"
  val Parquet = "parquet"

  /** Everything a closed writer reports into the manifest entry: column
    * stats, the file's byte size, and its SPLIT POINTS — (rowOffset,
    * byteOffset) starts of independently readable chunks (parquet row
    * groups; grf byte-interval checkpoints). Iceberg records the same
    * `split_offsets` so scan planning can cut one big file into several
    * tasks WITHOUT opening it — the difference between a compacted
    * one-file-per-partition table scanning with 1 task and with N. */
  final case class FileMeta(stats: Map[String, SnapshotStore.ColStats],
      sizeBytes: Long, splitPoints: Vector[(Long, Long)])

  /** One scan task's slice of a data file. `rowStart` is the slice's first
    * PHYSICAL row index (the `_pos` identity keeps counting file-globally,
    * so position deletes and row-level rewrites are split-agnostic);
    * `byteEnd == Long.MaxValue` with `byteStart == 0` means the whole
    * file (the only shape legacy descriptors without split points get). */
  final case class Split(rowStart: Long, rowCount: Long,
      byteStart: Long, byteEnd: Long)
  def wholeFile(rowCount: Long): Split = Split(0L, rowCount, 0L, Long.MaxValue)

  /** The table's write format (property `write.format`, default parquet). */
  def formatOf(properties: Map[String, String]): String =
    properties.getOrElse("write.format", Parquet) match {
      case f @ (Grf | Parquet) => f
      case other => throw new IllegalArgumentException(
        s"write.format must be '$Grf' or '$Parquet', got '$other'")
    }

  def extensionOf(format: String): String = format match {
    case Grf => ".grf"
    case Parquet => ".parquet"
  }

  private def isParquet(path: String): Boolean = path.endsWith(".parquet")

  // -- writing -----------------------------------------------------------------

  /** A task-side data-file writer: streams UnsafeRows, tracks row count +
    * column stats + split points, and never buffers rows. */
  trait RowFileWriter {
    def write(u: UnsafeRow): Unit
    def rowCount: Long
    /** Close and return the manifest metadata (stats, size, splits). */
    def close(): FileMeta
    def abort(): Unit
  }

  /** Grf chunk granularity: a split point is recorded whenever this many
    * bytes accrued since the last one. Scan planning GROUPS chunks up to
    * its (larger) target split size, so a fine grain costs only manifest
    * bytes, never tiny tasks. Table property `write.grf.chunk-bytes`. */
  private val DefaultGrfChunkBytes = 32L << 20

  /** Writer for `path` — format chosen by the extension the caller minted
    * from [[extensionOf]]; `props` are the table properties carrying
    * format tuning (grf chunk size, parquet row-group size). */
  def writer(path: String, schema: StructType, conf: Configuration,
      props: Map[String, String] = Map.empty): RowFileWriter =
    if (isParquet(path)) new ParquetRowFileWriter(path, schema, conf, props)
    else new GrfRowFileWriter(path, schema, conf, props)

  private final class GrfRowFileWriter(path: String, schema: StructType,
      conf: Configuration, props: Map[String, String]) extends RowFileWriter {
    private val w = new RowFiles.Writer(path, schema.length, conf)
    private val stats = new StatsCollector(schema, props)
    private val chunkBytes = props.get("write.grf.chunk-bytes")
      .map(_.toLong).getOrElse(DefaultGrfChunkBytes)
    private val points = Vector.newBuilder[(Long, Long)]
    points += ((0L, RowFiles.HeaderBytes))
    private var chunkStart = RowFiles.HeaderBytes
    override def write(u: UnsafeRow): Unit = {
      // Chunk boundaries land BEFORE a row, so every recorded point starts
      // a non-empty, row-aligned slice a ranged reader can seek to.
      if (w.bytesWritten - chunkStart >= chunkBytes) {
        points += ((w.rowCount, w.bytesWritten))
        chunkStart = w.bytesWritten
      }
      w.write(u); stats.update(u)
    }
    override def rowCount: Long = w.rowCount
    override def close(): FileMeta = {
      w.close()
      FileMeta(stats.result(w.rowCount), w.bytesWritten, points.result())
    }
    override def abort(): Unit = w.abort()
  }

  /** Parquet via Spark's own WriteSupport — InternalRow in, Spark-standard
    * parquet (logical types, TIMESTAMP_MICROS, snappy) out, so any parquet
    * reader (DuckDB, Spark's native scan) can read the warehouse. */
  private final class ParquetRowFileWriter(path: String, schema: StructType,
      conf: Configuration, props: Map[String, String]) extends RowFileWriter {
    private val hp = new Path(path)
    private val writer = {
      val c = new Configuration(conf)
      ParquetWriteSupport.setSchema(schema, c)
      // The session Hadoop conf carries only EXPLICITLY-SET SQL entries;
      // ParquetWriteSupport.init asserts these keys exist — pin the Spark
      // defaults for any the session left implicit.
      c.setIfUnset("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      c.setIfUnset("spark.sql.parquet.writeLegacyFormat", "false")
      c.setIfUnset("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      c.setIfUnset("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
      c.setIfUnset("spark.sql.parquet.fieldId.write.enabled", "true")
      c.setIfUnset("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
      val b = new SupportBuilder(hp)
        .withConf(c)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
      // Row-group size bounds split granularity (a file is never split
      // finer than its groups). Table property `write.parquet.row-group-bytes`.
      props.get("write.parquet.row-group-bytes").map(_.toLong)
        .foreach(b.withRowGroupSize)
      b.build()
    }
    private val stats = new StatsCollector(schema, props)
    private var count = 0L
    override def write(u: UnsafeRow): Unit = {
      writer.write(u); stats.update(u); count += 1
    }
    override def rowCount: Long = count
    override def close(): FileMeta = {
      writer.close()
      // One footer read reports the row-group layout as split points —
      // task-side and O(footer), the price of planning N tasks per file
      // later without opening it (Iceberg's split_offsets, same trade).
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf)
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        var rows = 0L
        val pts = Vector.newBuilder[(Long, Long)]
        rd.getFooter.getBlocks.forEach { blk =>
          pts += ((rows, blk.getStartingPos))
          rows += blk.getRowCount
        }
        FileMeta(stats.result(count), in.getLength, pts.result())
      } finally rd.close()
    }
    override def abort(): Unit = {
      try writer.close() catch { case _: Exception => () }
      try hp.getFileSystem(conf).delete(hp, false) catch { case _: Exception => () }
    }
  }

  private final class SupportBuilder(path: Path)
      extends ParquetWriter.Builder[InternalRow, SupportBuilder](path) {
    override def self(): SupportBuilder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  // -- reading -----------------------------------------------------------------

  /** A stream of rows in the REQUESTED data-column shape (missing columns —
    * files written before an ALTER TABLE ADD COLUMN — read as NULL). The
    * returned row is reused; callers copy what they keep. */
  trait DataStream {
    /** Next row, or null at end of stream. */
    def next(): InternalRow
    def close(): Unit
  }

  /** How a scan task projects its requested data columns out of ONE file —
    * computed per file from the scan schema and the file's write-time
    * (field id, name) column list: for each requested column, the
    * FILE-relative name (parquet reads by name) and the FILE-relative
    * ordinal (grf positional decode; -1 = the file holds no such field →
    * NULL). This indirection is what makes RENAME/DROP (and a dropped
    * name's reuse) read correctly against files of every vintage. */
  final case class Projection(names: Array[String], ords: Array[Int],
      types: Array[DataType],
      /** Per requested column: the FILE's write-time type (differs from
        * `types` only for columns widened after the file was written —
        * [[TypeWidening]]); readers decode in this type and up-cast. */
      fileTypes: Array[DataType]) {
    def length: Int = names.length
    /** null = no widened column (the hot path pays nothing); else one
      * converter or null per column. */
    val casts: Array[Any => Any] =
      if (java.util.Arrays.equals(fileTypes.asInstanceOf[Array[AnyRef]],
        types.asInstanceOf[Array[AnyRef]])) null
      else fileTypes.indices.map(i =>
        TypeWidening.caster(fileTypes(i), types(i))).toArray
    def parquetSchema: StructType = StructType(
      names.zip(fileTypes).map { case (n, t) => StructField(n, t, nullable = true) })
  }

  object Projection {
    def apply(names: Array[String], ords: Array[Int],
        types: Array[DataType]): Projection =
      Projection(names, ords, types, types)
  }

  def projectionFor(fullSchema: StructType, dataSchema: StructType,
      writeCols: Seq[(Int, String)],
      /** field id → WRITE-TIME type, for ids widened since this file was
        * written (empty for every file of a never-widened table). */
      widen: Map[Int, DataType] = Map.empty): Projection =
    if (writeCols.isEmpty)
      // Legacy file (pre-field-id): physical columns are a positional
      // prefix of the scan schema — valid because rename/drop/widen REQUIRE
      // write-time mappings on every current file before they commit.
      Projection(dataSchema.fieldNames,
        dataSchema.fieldNames.map(fullSchema.fieldIndex),
        dataSchema.fields.map(_.dataType))
    else {
      val n = dataSchema.length
      val names = new Array[String](n)
      val ords = new Array[Int](n)
      val types = new Array[DataType](n)
      val fileTypes = new Array[DataType](n)
      var i = 0
      while (i < n) {
        val f = dataSchema.fields(i)
        val id = FieldIds.requireId(fullSchema, f.name)
        val ord = writeCols.indexWhere(_._1 == id)
        // A missing id must request a name NO file column can bear — the
        // current name could collide with a dropped column's reused name
        // and silently read the WRONG bytes.
        names(i) = if (ord >= 0) writeCols(ord)._2 else s"_graft_absent_$id"
        ords(i) = ord
        types(i) = f.dataType
        fileTypes(i) = widen.getOrElse(id, f.dataType)
        i += 1
      }
      Projection(names, ords, types, fileTypes)
    }

  /** Open `split` of `path` emitting `projection`'s columns. The grf
    * reader seeks to the split's byte offset and replays exactly its row
    * count; the parquet reader hands the byte range to the row-group
    * filter (groups whose start falls inside the range are read — the
    * planner cuts ranges exactly on recorded group boundaries, so the two
    * views agree). */
  def stream(path: String, split: Split, projection: Projection,
      conf: Configuration): DataStream =
    if (isParquet(path)) new ParquetStream(path, split, projection, conf)
    else new GrfStream(path, split, projection, conf)

  private final class GrfStream(path: String, split: Split,
      projection: Projection, conf: Configuration) extends DataStream {
    private val reader = new RowFiles.Reader(path, conf, split.byteStart)
    private val fileFields = reader.numFields
    private val ords = projection.ords
    // Decode each slot in the type the file WROTE (positional UnsafeRow
    // layout — reading a widened type over a narrow slot would misread
    // bytes), then up-cast widened columns ([[TypeWidening]]).
    private val types = projection.fileTypes
    private val casts = projection.casts
    private val row = new UnsafeRow(fileFields)
    private var buf = new Array[Byte](1 << 10)
    private var remaining = split.rowCount
    private val out = new GenericInternalRow(projection.length)
    override def next(): InternalRow = {
      if (remaining <= 0) return null
      val size = reader.stream.readInt()
      if (buf.length < size) buf = new Array[Byte](Integer.highestOneBit(size) << 1)
      reader.stream.readFully(buf, 0, size)
      row.pointTo(buf, size)
      remaining -= 1
      var j = 0
      while (j < ords.length) {
        val v =
          if (ords(j) < 0 || ords(j) >= fileFields) null
          else row.get(ords(j), types(j))
        out.update(j,
          if (v == null || casts == null || casts(j) == null) v else casts(j)(v))
        j += 1
      }
      out
    }
    override def close(): Unit = reader.close()
  }

  /** Read-side parquet conf: request the columns under their FILE-relative
    * names (write-time names, or a sentinel no column bears for fields the
    * file predates → NULL-padded by the clipped-schema read path), and pin
    * the Spark-SQL keys the read-side schema converter asserts on — the
    * session Hadoop conf carries only EXPLICITLY-SET SQL entries, so any
    * the session left implicit must get their Spark defaults here. */
  private def readConf(conf: Configuration, requested: StructType): Configuration = {
    val c = new Configuration(conf)
    c.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, requested.json)
    c.setIfUnset("spark.sql.parquet.binaryAsString", "false")
    c.setIfUnset("spark.sql.parquet.int96AsTimestamp", "true")
    c.setIfUnset("spark.sql.caseSensitive", "false")
    c.setIfUnset("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    c.setIfUnset("spark.sql.legacy.parquet.nanosAsLong", "false")
    c.setIfUnset("spark.sql.parquet.fieldId.read.enabled", "false")
    c.setIfUnset("spark.sql.parquet.ignoreVariantAnnotation", "false")
    c.setIfUnset(
      "spark.sql.parquet.reader.respectUnknownTypeAnnotation.enabled", "false")
    c
  }

  /** Parquet through Spark's ReadSupport: the requested catalyst schema is
    * pushed into the parquet layer, so only those columns are DECODED —
    * the columnar win the `.grf` stream could never give. */
  private final class ParquetStream(path: String, split: Split,
      projection: Projection, conf: Configuration) extends DataStream {
    private val reader = {
      val c = readConf(conf, projection.parquetSchema)
      val b = ParquetReader.builder(new ParquetReadSupport, new Path(path))
        .withConf(c)
      if (split.byteStart > 0L || split.byteEnd != Long.MaxValue)
        b.withFileRange(split.byteStart, split.byteEnd)
      b.build()
    }
    // Widened columns: the parquet layer decoded the file's NATIVE types
    // (the requested schema above is fileTypes); up-cast into a fresh
    // output row. Never-widened files skip this branch entirely.
    private val casts = projection.casts
    private val out =
      if (casts == null) null else new GenericInternalRow(projection.length)
    override def next(): InternalRow = {
      val r = reader.read()
      if (r == null || casts == null) return r
      var j = 0
      while (j < casts.length) {
        val v = if (r.isNullAt(j)) null else r.get(j, projection.fileTypes(j))
        out.update(j, if (v == null || casts(j) == null) v else casts(j)(v))
        j += 1
      }
      out
    }
    override def close(): Unit = reader.close()
  }

  /** Is `dt` decodable by Spark's vectorized parquet reader? (The batch
    * path below; everything else stays on the row stream.) */
  def vectorizable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | BinaryType | DateType |
         TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case a: ArrayType => vectorizable(a.elementType)
    case m: MapType => vectorizable(m.keyType) && vectorizable(m.valueType)
    case s: StructType => s.fields.forall(f => vectorizable(f.dataType))
    case _ => false
  }

  /** VECTORIZED parquet read of one split: Spark's own
    * [[VectorizedParquetRecordReader]] decodes the requested columns
    * straight into [[org.apache.spark.sql.vectorized.ColumnarBatch]]es —
    * column-at-a-time decode with dictionary/RLE fast paths, several times
    * faster than the row-at-a-time [[ParquetStream]] loop, and the batch
    * hands whole-stage codegen its columnar input (`ColumnarToRow` spans).
    * At 100 TB every catalog-table query is decode-bound; this is the
    * inner loop that pays for it.
    *
    * Planned whenever the scan decodes batch-wise (see
    * `MemScan.columnarEligible`): no `_file`/`_pos` metadata columns, no
    * type-widening up-casts, every requested type [[vectorizable]].
    * Merge-on-read position/equality deletes do NOT demote the scan —
    * the catalog's batch reader filters each emitted batch through a
    * selection remap (`MemReaders.SelectedColumnVector`). Requested
    * columns missing from the file (written before an ADD COLUMN, or the
    * `_graft_absent_` sentinel after a DROP/RENAME) come back as
    * all-NULL vectors — the same clipped-schema semantics as the row
    * path.
    *
    * Rebase modes are pinned CORRECTED/UTC: every catalog data file is
    * written by [[ParquetRowFileWriter]] (Spark's write support,
    * `datetimeRebaseModeInWrite=CORRECTED`), so there are no legacy-hybrid
    * calendars to rebase — this reader never sees foreign files.
    *
    * Row-group selection: `initialize` hands the byte range to parquet's
    * midpoint filter, while the planner cut ranges exactly on recorded
    * group boundaries — a group's midpoint falls inside a range iff the
    * group starts inside it, so the two views agree split-for-split with
    * the row path. */
  final class ParquetBatchStream(path: String, split: Split,
      projection: Projection, conf: Configuration, capacity: Int) {
    // A widened projection decodes in the file's WRITE-TIME types
    // (`parquetSchema` is fileTypes-based); the CALLER up-casts the
    // emitted vectors (MemReaders.WidenedColumnVector).
    private val reader = {
      val c = readConf(conf, projection.parquetSchema)
      // initialize(split, ctx) instantiates the ReadSupport from conf
      // (the row path hands an instance to the builder instead).
      c.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
        classOf[ParquetReadSupport].getName)
      val r = new org.apache.spark.sql.execution.datasources.parquet
        .VectorizedParquetRecordReader(
          null, "CORRECTED", "UTC", "CORRECTED", "UTC",
          /* useOffHeap = */ false, capacity)
      var ok = false
      try {
        // byteEnd == MaxValue marks a whole-file read: clamp the length so
        // start + length cannot overflow past MaxValue inside parquet.
        val len =
          if (split.byteEnd == Long.MaxValue) Long.MaxValue - split.byteStart
          else split.byteEnd - split.byteStart
        r.initialize(
          // the reader casts to the OLD-API split class internally
          new org.apache.hadoop.mapred.FileSplit(
            new Path(path), split.byteStart, len, Array.empty[String]),
          new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
            c, new org.apache.hadoop.mapreduce.TaskAttemptID()))
        r.initBatch(new StructType(), InternalRow.empty)
        r.enableReturningBatches()
        ok = true
        r
      } finally if (!ok) r.close()
    }
    def next(): Boolean = reader.nextKeyValue()
    def get(): org.apache.spark.sql.vectorized.ColumnarBatch =
      reader.getCurrentValue.asInstanceOf[org.apache.spark.sql.vectorized.ColumnarBatch]
    def close(): Unit = reader.close()
  }

  // -- per-file column stats -----------------------------------------------------

  def statsSupported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType | ByteType | BooleanType |
         DoubleType | FloatType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Stats stay useful only if bounded: a string longer than this many
    * chars invalidates its column's stats for the file (Iceberg truncates
    * bounds instead; a sound truncation of MAX needs successor logic —
    * dropping the column is the simple sound choice). */
  private val MaxStatsStringLen = 256

  /** Streaming min/max/null-count per supported column. Values read from
    * the reused row buffer are deep-copied only when they become the new
    * bound. `props` opts columns into per-file [[FileBloom]] membership
    * filters (`stats.bloom-columns`); non-stats-supported names are
    * simply never collected (they have no canonical hash to probe). */
  final class StatsCollector(schema: StructType,
      props: Map[String, String] = Map.empty) {
    private val cols = schema.fields.zipWithIndex
      .filter { case (f, _) => statsSupported(f.dataType) }
    private val n = cols.length
    private val ordinals = cols.map(_._2)
    private val types = cols.map(_._1.dataType)
    private val orderings: Array[Ordering[Any]] =
      types.map(t => TypeUtils.getInterpretedOrdering(t))
    private val mins = new Array[Any](n)
    private val maxs = new Array[Any](n)
    private val nulls = new Array[Long](n)
    private val valid = Array.fill(n)(true)
    // Per-column distinct-count sketch ([[NdvSketch]]) — merged at plan
    // time into the scan's reported column statistics.
    private val sketches: Array[NdvSketch] = types.map(_ => NdvSketch.empty)
    // STRING value-byte totals/max for CBO row-width estimation
    // ([[SnapshotStore.ColStats.lenSum]]). Independent of `valid`: a
    // 1 KB string invalidates min/max (unbounded manifests) but is
    // exactly where width tracking earns its keep — so lengths AND null
    // counts keep accumulating past invalidation.
    private val isString = types.map(_ == StringType)
    private val lenSums = new Array[Long](n)
    private val lenMaxs = new Array[Long](n)
    // Opt-in per-column bloom bit arrays (null = not opted in). Flat
    // memory per column (the max collection size); values stream in via
    // the SAME canonical hash the NDV sketch consumes, and [[result]]
    // folds each array down to its density-fit size. Collection follows
    // `valid` like the sketch: a column whose tracking invalidated
    // (unbounded strings) drops its bloom with its min/max.
    private val blooms: Array[Array[Long]] = {
      val opted = FileBloom.columnsOf(props)
      if (opted.isEmpty) new Array[Array[Long]](n)
      else {
        val m = FileBloom.maxBits(props)
        cols.map { case (f, _) =>
          if (opted.contains(f.name.toLowerCase)) FileBloom.emptyBits(m)
          else null
        }
      }
    }

    def update(u: UnsafeRow): Unit = {
      var i = 0
      while (i < n) {
        if (valid(i) || isString(i)) {
          val v = u.get(ordinals(i), types(i))
          if (v == null) nulls(i) += 1
          else {
            v match {
              case s: UTF8String =>
                val nb = s.numBytes().toLong
                lenSums(i) += nb
                if (nb > lenMaxs(i)) lenMaxs(i) = nb
                if (s.numChars() > MaxStatsStringLen) valid(i) = false
              case _ => ()
            }
            if (valid(i)) {
              if (mins(i) == null || orderings(i).lt(v, mins(i)))
                mins(i) = InternalRow.copyValue(v)
              if (maxs(i) == null || orderings(i).gt(v, maxs(i)))
                maxs(i) = InternalRow.copyValue(v)
              NdvSketch.hash(v, types(i)).foreach { h =>
                sketches(i).add(h)
                if (blooms(i) != null) FileBloom.add(blooms(i), h)
              }
            }
          }
        }
        i += 1
      }
    }

    def result(rowCount: Long): Map[String, SnapshotStore.ColStats] = {
      val b = Map.newBuilder[String, SnapshotStore.ColStats]
      var i = 0
      while (i < n) {
        // An invalidated column reports no min/max/ndv; an all-null column
        // reports (null, null, nulls == rowCount) — the marker every
        // comparison predicate excludes. STRING columns keep their length
        // stats (and exact null counts) through invalidation: a no-bounds
        // entry with nulls < rowCount is sound for every pruning rule
        // (null bounds always read as "cannot decide").
        if (valid(i))
          b += cols(i)._1.name -> SnapshotStore.ColStats(mins(i), maxs(i),
            nulls(i),
            if (sketches(i).isEmpty) null
            else SnapshotStore.Ndv(sketches(i).registers),
            lenSum = if (isString(i)) lenSums(i) else -1L,
            lenMax = if (isString(i)) lenMaxs(i) else -1L,
            bloom =
              if (blooms(i) == null) null
              else Option(FileBloom.finish(blooms(i)))
                .map(SnapshotStore.Bloom).orNull)
        else if (isString(i))
          b += cols(i)._1.name -> SnapshotStore.ColStats(null, null,
            nulls(i), null, lenSum = lenSums(i), lenMax = lenMaxs(i))
        i += 1
      }
      b.result()
    }
  }
}

/** Sound file skipping from per-file column stats: `definitelyExcludes`
  * returns true only when NO row of the file can satisfy the predicate —
  * the same soundness contract as partition pruning, extended to DATA
  * columns via each file's (min, max, nullCount). Anything unrecognized
  * (unsupported operator, missing stats, type mismatch) conservatively
  * keeps the file; predicates stay residual, so skipping never changes
  * results — only how many files open. */
private[sources] object StatsPredicates {
  import SnapshotStore.ColStats

  /** lowercased column name → (field id, type) for stats-tracked columns
    * of the SCAN schema (predicate matching is case-insensitive like the
    * rest of the engine; stats are stored by field id so renames never
    * detach them from their data). */
  type StatCols = Map[String, (Int, DataType)]

  def statCols(schema: StructType): StatCols =
    schema.fields.iterator
      .filter(f => DataFiles.statsSupported(f.dataType))
      .flatMap(f => FieldIds.idOf(f).map(id =>
        f.name.toLowerCase -> (id, f.dataType))).toMap

  /** Can `p` EVER skip a file from stats? (The structural gate for
    * reporting a predicate as pushed.) */
  def usable(p: VPredicate, cols: StatCols): Boolean = p.name() match {
    case "AND" | "OR" =>
      p.children().length == 2 && p.children().forall {
        case c: VPredicate => usable(c, cols)
        case _ => false
      }
    case "=" | "<=>" | "<" | "<=" | ">" | ">=" =>
      p.children().length == 2 && colLit(p, cols).isDefined
    case "IS_NULL" | "IS_NOT_NULL" =>
      p.children().length == 1 && colOf(p.children()(0), cols).isDefined
    case "IN" => p.children().length >= 2 && inShape(p, cols).isDefined
    case _ => false
  }

  private def colOf(e: VExpression,
      cols: StatCols): Option[(Int, DataType)] = e match {
    case r: NamedReference if r.fieldNames().length == 1 =>
      cols.get(r.fieldNames()(0).toLowerCase)
    case _ => None
  }

  /** `col <op> literal` in either child order (reversed ops normalize). */
  private def colLit(p: VPredicate,
      cols: StatCols): Option[(Int, DataType, Any, Boolean)] = {
    def lit(e: VExpression): Option[VLiteral[_]] = e match {
      case l: VLiteral[_] => Some(l)
      case _ => None
    }
    (colOf(p.children()(0), cols), lit(p.children()(1))) match {
      case (Some((c, dt)), Some(l)) if l.dataType == dt => Some((c, dt, l.value, false))
      case _ =>
        (lit(p.children()(0)), colOf(p.children()(1), cols)) match {
          case (Some(l), Some((c, dt))) if l.dataType == dt =>
            Some((c, dt, l.value, true)) // reversed: literal <op> col
          case _ => None
        }
    }
  }

  private def inShape(p: VPredicate,
      cols: StatCols): Option[(Int, DataType, Seq[Any])] =
    colOf(p.children()(0), cols).flatMap { case (c, dt) =>
      val lits = p.children().drop(1).toSeq.map {
        case l: VLiteral[_] if l.dataType == dt => Some(l.value)
        case _ => None
      }
      if (lits.forall(_.isDefined)) Some((c, dt, lits.map(_.get))) else None
    }

  /** True iff the file (stats + physical row count) cannot satisfy `p`. */
  def definitelyExcludes(p: VPredicate, cols: StatCols,
      stats: Map[Int, ColStats], rowCount: Long): Boolean = {
    def child(i: Int): Option[VPredicate] = p.children()(i) match {
      case c: VPredicate => Some(c)
      case _ => None
    }
    // Stats of files written before a type widen hold NARROW boxes (an
    // Int min under a now-Long column) — coerce into the live type before
    // comparing ([[TypeWidening.coerce]]; identity when never widened).
    def statOf(id: Int, dt: DataType): Option[ColStats] = stats.get(id).map(s =>
      ColStats(TypeWidening.coerce(dt, s.min), TypeWidening.coerce(dt, s.max),
        s.nulls))
    def lt(dt: DataType, a: Any, b: Any): Boolean =
      org.apache.spark.sql.catalyst.expressions.LessThan(
        org.apache.spark.sql.catalyst.expressions.Literal(a, dt),
        org.apache.spark.sql.catalyst.expressions.Literal(b, dt))
        .eval(null).asInstanceOf[Boolean]
    // Per-file [[FileBloom]] membership: definite ABSENCE of the hashed
    // literal excludes the file for equality shapes — the skip min/max
    // cannot make on a high-NDV column scattered across files. Hashing
    // in the LIVE type matches write-time hashes across type widening
    // (the canonical-hash contract NdvSketch documents).
    def bloomExcludes(id: Int, dt: DataType, litV: Any): Boolean =
      litV != null && stats.get(id).exists(cs => cs.bloom != null &&
        NdvSketch.hash(litV, dt).exists(h =>
          !FileBloom.mightContain(cs.bloom.bytes, h)))
    // A comparison can only be satisfied by a non-null value in [min, max].
    def rangeExcludes(op: String): Boolean = colLit(p, cols) match {
      case None => false
      case Some((c, dt, litV, reversed)) =>
        if (litV == null) {
          // `col <op> NULL` matches nothing; `col <=> NULL` matches exactly
          // the file's null rows.
          return if (op != "<=>") true
          else statOf(c, dt).exists(_.nulls == 0L)
        }
        if ((op == "=" || op == "<=>") && bloomExcludes(c, dt, litV))
          return true
        statOf(c, dt) match {
          case None => false
          case Some(s) =>
            if (s.nulls == rowCount) return true // all-null column
            if (s.min == null || s.max == null) return false
            val effOp =
              if (!reversed) op
              else op match { // lit <op> col  ≡  col <flipped> lit
                case "<" => ">"
                case "<=" => ">="
                case ">" => "<"
                case ">=" => "<="
                case other => other
              }
            effOp match {
              case "=" | "<=>" => lt(dt, litV, s.min) || lt(dt, s.max, litV)
              case "<" => !lt(dt, s.min, litV) // satisfiable iff min < lit
              case "<=" => lt(dt, litV, s.min) // satisfiable iff min <= lit
              case ">" => !lt(dt, litV, s.max) // satisfiable iff max > lit
              case ">=" => lt(dt, s.max, litV) // satisfiable iff max >= lit
              case _ => false
            }
        }
    }
    p.name() match {
      case "ALWAYS_FALSE" => true
      case "AND" =>
        (child(0), child(1)) match {
          case (Some(a), Some(b)) =>
            definitelyExcludes(a, cols, stats, rowCount) ||
              definitelyExcludes(b, cols, stats, rowCount)
          case _ => false
        }
      case "OR" =>
        (child(0), child(1)) match {
          case (Some(a), Some(b)) =>
            definitelyExcludes(a, cols, stats, rowCount) &&
              definitelyExcludes(b, cols, stats, rowCount)
          case _ => false
        }
      case op @ ("=" | "<=>" | "<" | "<=" | ">" | ">=") => rangeExcludes(op)
      case "IS_NULL" =>
        colOf(p.children()(0), cols).exists(c =>
          stats.get(c._1).exists(_.nulls == 0L))
      case "IS_NOT_NULL" =>
        colOf(p.children()(0), cols).exists(c =>
          stats.get(c._1).exists(_.nulls == rowCount))
      case "IN" => inShape(p, cols) match {
        case None => false
        case Some((c, dt, vals)) => statOf(c, dt) match {
          case None => false
          case Some(s) =>
            // Every value must be provably absent — by range OR by bloom
            // (a null IN-value matches nothing). The two compose per
            // value: range catches out-of-box values, the bloom catches
            // in-box values the file never held.
            if (s.nulls == rowCount) true
            else if (s.min == null || s.max == null)
              vals.forall(v => v == null || bloomExcludes(c, dt, v))
            else vals.forall(v =>
              v == null || lt(dt, v, s.min) || lt(dt, s.max, v) ||
                bloomExcludes(c, dt, v))
        }
      }
      case _ => false
    }
  }
}
