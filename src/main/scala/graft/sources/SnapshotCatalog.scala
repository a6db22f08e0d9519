package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A versioned DataSource V2 catalog with row-level-operation support — the
  * piece that makes statement-level `MERGE INTO` / `UPDATE` / `DELETE` and
  * Iceberg-style time travel (`VERSION AS OF` / `TIMESTAMP AS OF`) REAL
  * Spark SQL in this engine rather than operator-library calls.
  *
  * The reference provisions Iceberg `format_version: 2` tables precisely so
  * that engines can run row-level SQL against them
  * (`create_iceberg_tables.py:121-128` configures
  * `IcebergSparkSessionExtensions` + a Glue catalog; `customers.yml:4` pins
  * format v2). No Iceberg runtime jar exists in this offline environment, so
  * the engine carries its own catalog implementing the SAME public Spark
  * contracts those statements are planned through:
  *
  *   - [[SupportsRowLevelOperations]]: `MERGE INTO` / `UPDATE` / `DELETE`
  *     statements are rewritten by Catalyst's group-based row-level plans
  *     (`RewriteMergeIntoTable` → `ReplaceData`) against the operation's
  *     scan + write pair below — the exact planning path Iceberg's
  *     copy-on-write mode uses, with the whole table as one rewrite group.
  *   - `TableCatalog.loadTable(ident, version|timestamp)`: `VERSION AS OF n`
  *     and `TIMESTAMP AS OF t` resolve to immutable snapshots; every commit
  *     (append, truncate-overwrite, or row-level replace) creates a new
  *     numbered, timestamped snapshot, and [[SnapshotCatalog.expire]] is the
  *     retention operation (Iceberg's `expire_snapshots`).
  *
  * SCALE CONTRACT — what is modeled vs what is real: the *planning surface*
  * (statement → rewrite → replace-data write; version resolution) is the
  * production path bit-for-bit, and everything downstream of the scan is
  * ordinary distributed Spark (the MERGE join itself shuffles/broadcasts
  * like any join). The *storage* is deliberately a driver-held snapshot
  * vector — right-sized for the dimension/ledger tables these statements
  * target in the gate (≤ 15k rows at sf0.01), NOT for a 100 TB fact table.
  * At lake scale the same statements plan against a file-backed catalog
  * whose rewrite groups are files/partitions (Iceberg COW/MOR); swapping
  * the storage does not change a single query. Partitioned tables are
  * rejected at create time for that reason: one snapshot = one rewrite
  * group here, and accepting a partitioning we don't group by would
  * misrepresent the rewrite granularity.
  */
class SnapshotCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    (catalogName +: ident.namespace() :+ ident.name()).mkString("\u0000")
  private def nsKey(ns: Array[String]): String =
    (catalogName +: ns).mkString("\u0000")

  // -- namespaces ----------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    SnapshotStore.namespaces.keys.toArray
      .filter(_.startsWith(catalogName + "\u0000"))
      .map(_.split('\u0000').drop(1))
  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (ns.isEmpty) listNamespaces()
    else if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    else Array.empty
  }
  override def namespaceExists(ns: Array[String]): Boolean =
    SnapshotStore.namespaces.contains(nsKey(ns))
  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    util.Collections.emptyMap()
  }
  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit = {
    SnapshotStore.namespaces.putIfAbsent(nsKey(ns), ())
    ()
  }
  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")
  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val prefix = nsKey(ns) + "\u0000"
    val owned = SnapshotStore.tables.keys.filter(_.startsWith(prefix)).toSeq
    if (owned.nonEmpty && !cascade)
      throw new IllegalStateException(s"namespace ${ns.mkString(".")} is not empty")
    owned.foreach(SnapshotStore.tables.remove)
    SnapshotStore.namespaces.remove(nsKey(ns)).isDefined
  }

  // -- tables --------------------------------------------------------------

  override def listTables(ns: Array[String]): Array[Identifier] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    val prefix = nsKey(ns) + "\u0000"
    SnapshotStore.tables.keys.toArray.filter(_.startsWith(prefix))
      .map(k => Identifier.of(ns, k.split('\u0000').last))
  }

  override def loadTable(ident: Identifier): Table = {
    val k = key(ident)
    val st = SnapshotStore.tables.getOrElse(k, throw new NoSuchTableException(ident))
    new MemTable(ident.toString, k, st.schema, pinned = None)
  }

  /** `VERSION AS OF v` — a read-only pin of snapshot v (0 = the empty
    * just-created table), or of a named tag (`VERSION AS OF 'release_1'`,
    * Iceberg's tag surface). Expired/future versions and unknown tags fail
    * loudly. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val k = key(ident)
    val st = SnapshotStore.tables.getOrElse(k, throw new NoSuchTableException(ident))
    val v = version.toLongOption.getOrElse(
      st.tags.getOrElse(version,
        throw new IllegalArgumentException(
          s"'$version' is neither a snapshot version nor a tag of $ident; " +
            s"tags: ${st.tags.keys.toSeq.sorted.mkString("[", ", ", "]")}")))
    new MemTable(s"$ident@v$version", k, st.schema, pinned = Some(SnapshotStore.rowsAt(k, v)))
  }

  /** `TIMESTAMP AS OF t` — Spark hands micros-since-epoch; resolve to the
    * newest snapshot committed at or before it. Timestamps older than the
    * oldest LIVE snapshot of a table whose earlier history was expired fail
    * loudly (the state at that instant is unknowable, not empty) — the
    * timestamp twin of `rowsAt`'s expired-version failure. An instant
    * before a never-expired table's first commit is genuinely empty. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val k = key(ident)
    val st = SnapshotStore.tables.getOrElse(k, throw new NoSuchTableException(ident))
    val visible = st.snapshots.filter(_.commitMicros <= timestampMicros)
    def expired(detail: String): Nothing = throw new IllegalArgumentException(
      s"state of $ident at timestamp $timestampMicros is expired: $detail")
    visible.lastOption match {
      case None =>
        // Before every live snapshot: empty only if v1 is still live (the
        // table genuinely did not exist yet); otherwise the instant falls
        // in expired history.
        if (st.snapshots.headOption.exists(_.version > 1L))
          expired(s"history before v${st.snapshots.head.version} was removed by expire()")
      case Some(sn) =>
        // Tag retention can leave INTERIOR gaps (tagged v1 survives, v2..v5
        // expired, v6.. live). If versions right after the resolved snapshot
        // are gone AND the instant precedes the next live commit, the true
        // state is one of the expired versions — unknowable, so fail rather
        // than silently serve the older snapshot. (The newest snapshot is
        // always live — expire keeps the tail — so "no next" means no gap.)
        st.snapshots.find(_.version > sn.version).foreach { next =>
          if (next.version != sn.version + 1L && timestampMicros < next.commitMicros)
            expired(s"versions v${sn.version + 1}..v${next.version - 1} " +
              "were removed by expire() and the instant falls in that range")
        }
    }
    val rows = if (visible.isEmpty) Vector.empty[UnsafeRow] else visible.last.rows
    new MemTable(s"$ident@t$timestampMicros", k, st.schema, pinned = Some(rows))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "snapshot catalog tables are unpartitioned (one snapshot = one rewrite group); " +
        "partition-grouped rewrites are the file-catalog scale path")
    val k = key(ident)
    if (SnapshotStore.tables.putIfAbsent(k,
        SnapshotStore.TableState(schema, Vector.empty)).isDefined)
      throw new TableAlreadyExistsException(ident)
    new MemTable(ident.toString, k, schema, pinned = None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported; schema evolution is exercised through the file catalog (v01)")

  override def dropTable(ident: Identifier): Boolean =
    SnapshotStore.tables.remove(key(ident)).isDefined

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val st = SnapshotStore.tables.remove(key(oldIdent))
      .getOrElse(throw new NoSuchTableException(oldIdent))
    if (SnapshotStore.tables.putIfAbsent(key(newIdent), st).isDefined) {
      SnapshotStore.tables.put(key(oldIdent), st)
      throw new TableAlreadyExistsException(newIdent)
    }
  }
}

object SnapshotCatalog {
  /** Snapshot retention (Iceberg `expire_snapshots`): keep the newest
    * `keepLast` snapshots of `catalog.ns.table`; older versions stop being
    * time-travelable (load fails loudly) while the live table is untouched.
    * Returns the number of snapshots expired. */
  def expire(catalog: String, ident: Seq[String], keepLast: Int): Int = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val k = (catalog +: ident).mkString("\u0000")
    SnapshotStore.update(k) { st =>
      // Tagged snapshots are never expired (Iceberg's tag-retention rule).
      val keep = st.snapshots.takeRight(keepLast).map(_.version).toSet ++
        st.tags.values
      st.copy(snapshots = st.snapshots.filter(s => keep(s.version)))
    } match {
      case (before, after) => before.snapshots.size - after.snapshots.size
    }
  }

  /** Name snapshot `version` of `catalog.ns.table` (Iceberg `CREATE TAG`):
    * the tag resolves in `VERSION AS OF '<name>'` and shields its snapshot
    * from [[expire]]. Re-tagging an existing name moves it. */
  def tag(catalog: String, ident: Seq[String], name: String, version: Long): Unit = {
    require(name.toLongOption.isEmpty,
      s"tag name '$name' would be ambiguous with a numeric snapshot version")
    val k = (catalog +: ident).mkString("\u0000")
    SnapshotStore.update(k) { st =>
      // Existence validated inside the atomic update: a concurrent expire
      // cannot drop the snapshot between check and tag.
      require(st.snapshots.exists(_.version == version),
        s"cannot tag version $version: not a live snapshot " +
          s"(have ${st.snapshots.map(_.version).mkString("[", ", ", "]")})")
      st.copy(tags = st.tags + (name -> version))
    }
    ()
  }

  /** Drop a tag; its snapshot becomes expirable again. True if it existed. */
  def removeTag(catalog: String, ident: Seq[String], name: String): Boolean = {
    val k = (catalog +: ident).mkString("\u0000")
    SnapshotStore.update(k)(st => st.copy(tags = st.tags - name)) match {
      case (before, _) => before.tags.contains(name)
    }
  }

  /** Roll the live table back to `toVersion`'s state (Iceberg
    * `rollback_to_snapshot`) by COMMITTING A NEW SNAPSHOT with that state —
    * history stays monotonic and auditable (the bad commits remain
    * time-travelable until expired) and every concurrent reader keeps its
    * pinned view. Returns the new snapshot's version. */
  def rollback(catalog: String, ident: Seq[String], toVersion: Long): Long = {
    val k = (catalog +: ident).mkString("\u0000")
    SnapshotStore.update(k) { st =>
      val rows =
        if (toVersion == 0L) Vector.empty[UnsafeRow]
        else st.snapshots.find(_.version == toVersion).map(_.rows).getOrElse(
          throw new IllegalArgumentException(
            s"cannot roll back to version $toVersion: not a live snapshot " +
              s"(have ${st.snapshots.map(_.version).mkString("[", ", ", "]")})"))
      st.copy(snapshots = st.snapshots :+
        SnapshotStore.Snapshot(st.nextVersion, SnapshotStore.nowMicros(), rows))
    } match {
      case (_, after) => after.snapshots.last.version
    }
  }

  /** The snapshot history of a table: (version, commit micros, row count) —
    * the metadata surface `DESCRIBE HISTORY` exposes on lakehouse tables. */
  def history(catalog: String, ident: Seq[String]): Seq[(Long, Long, Long)] = {
    val k = (catalog +: ident).mkString("\u0000")
    SnapshotStore.tables.get(k).toSeq.flatMap(_.snapshots)
      .map(s => (s.version, s.commitMicros, s.rows.size.toLong))
  }

  /** Test/gate hygiene: drop every table and namespace this JVM has
    * registered under `catalog`, so re-runs converge from a clean slate. */
  def reset(catalog: String): Unit = {
    val prefix = catalog + "\u0000"
    SnapshotStore.tables.keys.filter(_.startsWith(prefix)).foreach(SnapshotStore.tables.remove)
    SnapshotStore.namespaces.keys.filter(_.startsWith(prefix))
      .foreach(SnapshotStore.namespaces.remove)
  }
}

/** JVM-wide backing store: snapshot vectors keyed by catalog-qualified table
  * name. Driver-held by design (see the scale contract in
  * [[SnapshotCatalog]]'s doc) and shared across sessions like a real
  * catalog's metastore. */
private[sources] object SnapshotStore {
  /** `appendedCount` >= 0 marks an APPEND commit that added exactly that
    * many rows (the streaming source's unit of progress); -1 marks a
    * rewrite (truncate-overwrite, row-level replace, rollback), which an
    * append-only stream must refuse. */
  final case class Snapshot(version: Long, commitMicros: Long,
      rows: Vector[UnsafeRow], appendedCount: Int = -1)
  /** `epochs` maps each streaming QUERY id to the newest epoch it committed
    * into this table: the replay guard that makes the streaming SINK
    * exactly-once-visible under at-least-once epoch retries. Keyed per
    * query — not per table — because a NEW query (fresh checkpoint)
    * restarts its epoch numbering at 0, and a table-wide watermark would
    * silently swallow its first batches. */
  final case class TableState(schema: StructType, snapshots: Vector[Snapshot],
      tags: Map[String, Long] = Map.empty,
      epochs: scala.collection.immutable.ListMap[String, Long] =
        scala.collection.immutable.ListMap.empty) {
    def currentRows: Vector[UnsafeRow] =
      if (snapshots.isEmpty) Vector.empty else snapshots.last.rows
    def nextVersion: Long =
      if (snapshots.isEmpty) 1L else snapshots.last.version + 1L
  }

  val tables = new TrieMap[String, TableState]
  val namespaces = new TrieMap[String, Unit]

  /** Monotonic commit clock: strictly increasing micros even for commits in
    * the same millisecond, so `TIMESTAMP AS OF` totally orders snapshots. */
  private val lastMicros = new AtomicLong(0L)
  def nowMicros(): Long = {
    val wall = System.currentTimeMillis() * 1000L
    lastMicros.updateAndGet(prev => math.max(prev + 1, wall))
  }

  /** Atomic read-modify-write of one table's state; returns (before, after). */
  def update(k: String)(f: TableState => TableState): (TableState, TableState) = {
    while (true) {
      val before = stateOf(k)
      val after = f(before)
      if (tables.replace(k, before, after)) return (before, after)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Internal keys join on NUL; messages render them dotted. */
  def dotted(k: String): String = k.split('\u0000').mkString(".")

  /** Table state or a clean failure (never a raw NoSuchElementException
    * with an unprintable key — a table can be dropped concurrently between
    * name resolution and scan/write build). */
  def stateOf(k: String): TableState =
    tables.getOrElse(k, throw new IllegalStateException(
      s"snapshot table ${dotted(k)} does not exist (dropped concurrently?)"))

  def rowsAt(k: String, version: Long): Vector[UnsafeRow] = {
    val st = stateOf(k)
    if (version == 0L) Vector.empty
    else st.snapshots.find(_.version == version).map(_.rows).getOrElse {
      val have = st.snapshots.map(_.version)
      throw new IllegalArgumentException(
        s"snapshot version $version of ${dotted(k)} does not exist (expired or future); " +
          s"available: ${have.mkString("[", ", ", "]")}")
    }
  }

  /** `expectedBase`: optimistic-concurrency guard for row-level rewrites —
    * the commit FAILS if the live version moved past the snapshot the
    * rewrite scanned (a silent last-writer-wins would erase the concurrent
    * commit's rows; Iceberg validates the base snapshot the same way).
    * Plain INSERT OVERWRITE passes None: truncate-replace is last-writer-
    * wins by SQL semantics. */
  def commit(k: String, newRows: Vector[UnsafeRow], replace: Boolean,
      expectedBase: Option[Long] = None): Unit = {
    update(k) { st =>
      val live = if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
      expectedBase.filter(_ != live).foreach { base =>
        throw new IllegalStateException(
          s"concurrent commit on ${dotted(k)}: the row-level rewrite read " +
            s"v$base but the table is now at v$live — rerun the statement")
      }
      val rows = if (replace) newRows else st.currentRows ++ newRows
      st.copy(snapshots = st.snapshots :+ Snapshot(st.nextVersion, nowMicros(), rows,
        appendedCount = if (replace) -1 else newRows.size))
    }
    ()
  }

  /** Epoch-stamped streaming append, replay-deduped PER QUERY: a retried
    * epoch of the same query no-ops (at-least-once → exactly-once-visible),
    * while a NEW query's epoch 0 over the same table commits normally. The
    * check and the append are one atomic state transition. */
  def commitEpoch(k: String, queryId: String, epochId: Long,
      newRows: Vector[UnsafeRow]): Unit = {
    update(k) { st =>
      if (st.epochs.get(queryId).exists(epochId <= _)) st // replayed epoch
      else {
        // Bound the watermark map: evict the LEAST-RECENTLY-ACTIVE query
        // once 128 distinct queries have written. Every commit removes and
        // re-inserts the committing query, so ListMap insertion order IS
        // recency order — a long-running busy writer is never evicted in
        // favor of queries that went idle long ago (plain FIFO would evict
        // the longest-running ACTIVE query first, re-opening its
        // replay/double-append window). An evicted-then-replaying idle
        // query would re-append — the same bounded guarantee real sinks
        // give by pruning txn app ids; unbounded growth in the driver-held
        // store is the worse failure.
        val pruned =
          if (st.epochs.size >= 128 && !st.epochs.contains(queryId))
            st.epochs - st.epochs.head._1
          else st.epochs
        st.copy(
          snapshots = st.snapshots :+ Snapshot(st.nextVersion, nowMicros(),
            st.currentRows ++ newRows, appendedCount = newRows.size),
          epochs = (pruned - queryId) + (queryId -> epochId))
      }
    }
    ()
  }
}

/** One table of the snapshot catalog. `pinned = Some(rows)` is a read-only
  * time-travel view; `None` reads the latest snapshot at scan build.
  *
  * The `_group` metadata column is the table's rewrite-group id (always 0:
  * the whole table is one copy-on-write group). Row-level operations REQUIRE
  * it — not because the write consumes it, but because Spark's
  * `ReplaceDataExec` only routes rows through the data/metadata
  * `ProjectingInternalRow`s when the operation demands metadata; with no
  * required metadata attributes it hands the writer the rewrite plan's RAW
  * output, operation column included (`RowDeltaUtils.OPERATION_COLUMN`),
  * which would corrupt the written rows. Iceberg's group-based operations
  * require `_file`/`_partition` for the same structural reason.
  */
private[sources] final class MemTable(fullName: String, k: String,
    tableSchema: StructType, pinned: Option[Vector[UnsafeRow]])
    extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations
    with SupportsMetadataColumns {

  override def name(): String = fullName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)

  override def metadataColumns(): Array[MetadataColumn] =
    Array(MemTable.GroupColumn)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(tableSchema,
      pinned.getOrElse(SnapshotStore.stateOf(k).currentRows),
      // Time-travel pins are batch-only; the LIVE table is streamable.
      streamKey = if (pinned.isEmpty) Some(k) else None,
      maxVersionsPerTrigger =
        Option(options.get("maxVersionsPerTrigger")).map(_.toLong))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinned.isEmpty, s"$fullName is a time-travel view and not writable")
    new MemWriteBuilder(k, info.schema(), queryId = info.queryId())
  }

  /** Group-based row-level operation: the scan pins the current snapshot as
    * the single rewrite group; the write REPLACES the table with the rows
    * Catalyst's rewrite produces (carry-over + merged/updated/surviving). */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(pinned.isEmpty, s"$fullName is a time-travel view and not writable")
    () => new MemRowLevelOperation(info.command(), k, tableSchema)
  }
}

private[sources] object MemTable {
  /** The rewrite-group id metadata column (see [[MemTable]]'s doc). */
  val GroupColumnName = "_group"
  val GroupColumn: MetadataColumn = new MetadataColumn {
    override def name(): String = GroupColumnName
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.IntegerType
    override def isNullable: Boolean = false
    override def comment(): String = "copy-on-write rewrite group (whole table = group 0)"
  }
}

private[sources] final class MemRowLevelOperation(
    cmd: RowLevelOperation.Command, k: String, tableSchema: StructType)
    extends RowLevelOperation {
  /** The version the rewrite's scan read — the optimistic-concurrency base
    * the replacing write validates at commit (lost-update guard). */
  @volatile private var baseVersion: Option[Long] = None

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft-snapshot $cmd [whole-table group]"
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val st = SnapshotStore.stateOf(k)
    baseVersion = Some(
      if (st.snapshots.isEmpty) 0L else st.snapshots.last.version)
    new MemScanBuilder(tableSchema, st.currentRows)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(k, info.schema(), forceReplace = true,
      queryId = info.queryId(), expectedBase = baseVersion)
  /** Forces the projecting write path — see [[MemTable]]'s doc. */
  override def requiredMetadataAttributes(): Array[
      org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(
      MemTable.GroupColumnName))
}

private[sources] final class MemWriteBuilder(k: String, writeSchema: StructType,
    forceReplace: Boolean = false, queryId: String = "",
    expectedBase: Option[Long] = None)
    extends WriteBuilder with SupportsTruncate {
  private var replace = forceReplace
  override def truncate(): WriteBuilder = { replace = true; this }
  override def build(): Write = new Write {
    override def description(): String =
      s"graft-snapshot ${if (replace) "replace" else "append"}"
    override def toBatch: BatchWrite =
      new MemBatchWrite(k, writeSchema, replace,
        // The base validation applies only to row-level rewrites (which
        // force replace at construction); a user truncate is last-writer-
        // wins by SQL semantics.
        if (forceReplace) expectedBase else None)
    override def toStreaming:
        org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      require(!replace,
        "streaming writes to the snapshot catalog are append-only " +
          "(complete/truncate modes would rewrite history per epoch)")
      new MemStreamingWrite(k, writeSchema, queryId)
    }
  }
}

/** Exactly-once streaming SINK: each epoch's rows buffer per task and land
  * as ONE epoch-stamped append commit at the driver-side commit point —
  * [[SnapshotStore.commitEpoch]] no-ops replayed epochs, so a restarted or
  * retried micro-batch never double-appends. The mirror of
  * [[MemMicroBatchStream]]: a table can be streamed INTO and OUT OF, each
  * epoch becoming one time-travelable snapshot version. */
private[sources] final class MemStreamingWrite(k: String, writeSchema: StructType,
    queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo):
      org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    MemStreamWriterFactory(writeSchema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.iterator
      .map(_.asInstanceOf[MemCommitMessage])
      .flatMap(_.rows)
      .toVector
    SnapshotStore.commitEpoch(k, queryId, epochId, rows)
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

/** Executors buffer normalized UnsafeRow copies per task; the driver-side
  * commit point assembles them in partition order and appends ONE snapshot —
  * all-or-nothing visibility, like any V2 batch write. */
private[sources] final class MemBatchWrite(k: String, writeSchema: StructType,
    replace: Boolean, expectedBase: Option[Long] = None) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory(writeSchema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.iterator
      .map(_.asInstanceOf[MemCommitMessage])
      .flatMap(_.rows)
      .toVector
    SnapshotStore.commit(k, rows, replace, expectedBase)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] final case class MemCommitMessage(rows: Array[UnsafeRow])
    extends WriterCommitMessage

/** Top-level case class (Serializable) — a lambda here would capture the
  * non-serializable StreamingWrite instance and fail task serialization. */
private[sources] final case class MemStreamWriterFactory(writeSchema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = MemWriters.writer(writeSchema)
}

private[sources] object MemWriters {
  /** Shared batch/streaming task writer: buffers normalized UnsafeRow
    * copies, emits them in one commit message. */
  def writer(writeSchema: StructType): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val proj = UnsafeProjection.create(writeSchema)
      private val buf = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
      override def write(row: InternalRow): Unit = buf += proj(row).copy()
      // Metadata-carrying writes (the projecting ReplaceData task): `_group`
      // is required to force the projection, not to route anything — every
      // row lands in the single whole-table group.
      override def write(metadata: InternalRow, row: InternalRow): Unit = write(row)
      override def commit(): WriterCommitMessage = MemCommitMessage(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

private[sources] final class MemWriterFactory(writeSchema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    MemWriters.writer(writeSchema)
}

private[sources] final class MemScanBuilder(fullSchema: StructType,
    rows: Vector[UnsafeRow], streamKey: Option[String] = None,
    maxVersionsPerTrigger: Option[Long] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan =
    new MemScan(fullSchema, required, rows, streamKey, maxVersionsPerTrigger)
}

private[sources] final case class MemPartition(rows: Array[UnsafeRow])
    extends InputPartition

private[sources] object MemReaders {
  /** Shared batch/streaming reader factory: `_group` is the constant
    * rewrite-group metadata column (ordinal -1); every data column resolves
    * by name against the stored row layout. */
  def factory(fullSchema: StructType, required: StructType): PartitionReaderFactory = {
    val ordinals = required.fieldNames.map {
      case MemTable.GroupColumnName => -1
      case f => fullSchema.fieldIndex(f)
    }
    val types = ordinals.map(i => if (i < 0) null else fullSchema.fields(i).dataType)
    (partition: InputPartition) => {
      val data = partition.asInstanceOf[MemPartition].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < data.length }
        override def get(): InternalRow = {
          val row = data(i)
          InternalRow.fromSeq(ordinals.indices.map { j =>
            if (ordinals(j) < 0) 0 else row.get(ordinals(j), types(j))
          })
        }
        override def close(): Unit = ()
      }
    }
  }
}

private[sources] final class MemScan(fullSchema: StructType,
    required: StructType, rows: Vector[UnsafeRow], streamKey: Option[String],
    maxVersionsPerTrigger: Option[Long] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft-snapshot scan (${rows.size} rows)"

  override def planInputPartitions(): Array[InputPartition] = {
    if (rows.isEmpty) return Array.empty
    val parts = math.min(4, rows.size)
    (0 until parts).map { i =>
      val s = i * rows.size / parts
      val e = (i + 1) * rows.size / parts
      MemPartition(rows.slice(s, e).toArray)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    MemReaders.factory(fullSchema, required)

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new MemMicroBatchStream(
      streamKey.getOrElse(sys.error("time-travel views are not streamable")),
      fullSchema, required, maxVersionsPerTrigger)
}

/** Streaming read of a snapshot-catalog table: SNAPSHOT VERSIONS are the
  * offsets, each micro-batch carries exactly the rows APPENDED by the
  * commits in `(start, end]` — the versioned catalog as an exactly-once
  * streaming source (Iceberg/Delta's streaming-read surface), including
  * replay of the full commit history on first start.
  *
  * Contract: append-only. A rewrite commit (truncate-overwrite, row-level
  * UPDATE/DELETE, rollback) inside the offset range fails the stream
  * loudly — its row delta is not representable as appends; the CDF
  * operator (m08) is the read for rewriting tables. Snapshots expired past
  * a restarting stream's offset also fail loudly rather than silently
  * skipping rows.
  */
private[sources] final class MemMicroBatchStream(k: String,
    fullSchema: StructType, required: StructType,
    maxVersionsPerTrigger: Option[Long] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  maxVersionsPerTrigger.foreach(m => require(m >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $m"))

  // Keys join on NUL; render dotted in messages so logs stay printable.
  private val shown = k.split('\u0000').mkString(".")

  private def versionNow(): Long = {
    val st = SnapshotStore.tables.getOrElse(k,
      throw new IllegalStateException(s"streamed table dropped: $shown"))
    if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
  }

  override def initialOffset(): Offset = VersionOffset(0L)
  override def latestOffset(): Offset = VersionOffset(versionNow())

  /** Admission control: `maxVersionsPerTrigger` caps how many COMMITS one
    * micro-batch may carry — without it the first start replays the whole
    * history in a single batch, the classic unbounded-first-batch failure
    * of table-streaming sources at scale (Delta/Kafka cap with
    * maxFilesPerTrigger / maxOffsetsPerTrigger; this is the versions
    * twin). The engine keeps triggering until caught up. */
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[VersionOffset].version
    val now = versionNow()
    VersionOffset(maxVersionsPerTrigger.fold(now)(m => math.min(now, start + m)))
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def deserializeOffset(json: String): Offset = VersionOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[VersionOffset].version,
      end.asInstanceOf[VersionOffset].version)
    if (s >= e) return Array.empty
    val st = SnapshotStore.tables.getOrElse(k,
      throw new IllegalStateException(s"streamed table dropped: $shown"))
    val inRange = st.snapshots.filter(sn => sn.version > s && sn.version <= e)
    // Expired snapshots inside the range would silently lose rows.
    require(inRange.size == (e - s),
      s"stream offset range ($s, $e] of $shown covers ${e - s} commits but only " +
        s"${inRange.size} snapshots are live — expired past the stream's offset")
    val appended = inRange.flatMap { sn =>
      require(sn.appendedCount >= 0,
        s"commit v${sn.version} of $shown is a rewrite (overwrite/row-level/rollback); " +
          "append-only streaming cannot represent it — read changes via " +
          "ChangeDataFeed (m08) instead")
      sn.rows.takeRight(sn.appendedCount)
    }
    if (appended.isEmpty) Array.empty else Array(MemPartition(appended.toArray))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    MemReaders.factory(fullSchema, required)
}

private[sources] final case class VersionOffset(version: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = version.toString
}
