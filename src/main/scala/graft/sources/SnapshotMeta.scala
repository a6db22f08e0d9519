package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, Procedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-parity METADATA TABLES for the snapshot catalog: appending a
  * reserved suffix to a table identifier reads its metadata as a relation —
  * `SELECT * FROM graft_snap.db.t.history` / `.files` / `.partitions` /
  * `.tags` — so lake maintenance queries (commit audit, small-file
  * detection, tag inventory) are plain SQL joins, not API calls (Iceberg's `db.table.history` surface;
  * the reference provisions exactly such a catalog,
  * `create_iceberg_tables.py:121-128`).
  *
  * Served as [[LocalScan]]s: snapshot metadata is driver-held by design
  * (SCALE CONTRACT in [[SnapshotCatalog]] — metadata only, never row data),
  * so a local scan is the honest plan: no executor round-trip for a frame
  * bounded by |snapshots| or |files|. A REAL table named like a metadata
  * suffix always wins — the fallback fires only when the full identifier
  * resolves to nothing.
  */
private[sources] object MetaTables {

  /** The complete metadata-suffix vocabulary — LOAD-BEARING: [[forSuffix]]
    * refuses any name outside it before matching, so this set and the match
    * below cannot drift apart silently (a suffix added to one but not the
    * other trips the exhaustiveness error in tests immediately). */
  val Suffixes: Set[String] =
    Set("history", "snapshots", "files", "tags", "partitions", "changes", "refs")

  /** The metadata table for `parentKey`'s `suffix`, or None if the suffix
    * is not a metadata name. */
  def forSuffix(display: String, parentKey: String, suffix: String): Option[Table] = {
    def ts(micros: Long): Any = micros // TimestampType carries micros
    if (!Suffixes(suffix)) return None
    suffix match {
      // The change feed is ROW data, not metadata: a distributed scan
      // (batch + micro-batch), never a LocalScan — see [[ChangesTable]].
      case "changes" => Some(new ChangesTable(s"$display.changes", parentKey))
      // `snapshots` is Iceberg's name for the same lineage relation as
      // `history` — one implementation, but each alias reports ITSELF as
      // the relation name (a `.snapshots` read must not surface as
      // `.history` in plans and error messages).
      case "history" | "snapshots" => Some(new MetaTable(s"$display.$suffix",
        // Per-commit accounting (Iceberg's snapshot summary as columns):
        // added/removed figures diff each snapshot against its LIVE
        // predecessor by file path — physical counts (a merge-on-read
        // commit removes rows via `delete_entries_added` instead of
        // removing files). `total_rows` is likewise physical.
        StructType(Seq(
          StructField("version", LongType, nullable = false),
          StructField("committed_at", TimestampType, nullable = false),
          StructField("operation", StringType, nullable = false),
          StructField("added_files", IntegerType, nullable = false),
          StructField("added_rows", LongType, nullable = false),
          StructField("removed_files", IntegerType, nullable = false),
          StructField("removed_rows", LongType, nullable = false),
          StructField("delete_entries_added", LongType, nullable = false),
          StructField("total_files", IntegerType, nullable = false),
          StructField("total_rows", LongType, nullable = false))),
        _ => {
          val sns = SnapshotStore.stateOf(parentKey).snapshots.toArray
          sns.indices.toArray.map { i =>
            val s = sns(i)
            val (prevFiles, prevDels) =
              if (i == 0) (Vector.empty[SnapshotStore.DataFile],
                Vector.empty[SnapshotStore.DeleteFile])
              else (sns(i - 1).files, sns(i - 1).deleteFiles)
            val prevPaths = prevFiles.map(_.path).toSet
            val curPaths = s.files.map(_.path).toSet
            val added = s.files.filterNot(f => prevPaths(f.path))
            val removed = prevFiles.filterNot(f => curPaths(f.path))
            val prevDel = prevDels.map(_.path).toSet
            val delAdded = s.deleteFiles.filterNot(d => prevDel(d.path))
            new GenericInternalRow(Array[Any](
              s.version, ts(s.commitMicros),
              UTF8String.fromString(s.operation),
              added.size, added.map(_.rowCount).sum,
              removed.size, removed.map(_.rowCount).sum,
              delAdded.map(_.entryCount).sum,
              s.files.size, s.files.map(_.rowCount).sum)): InternalRow
          }
        }))
      case "files" => Some(new FilesMetaTable(s"$display.files", parentKey))
      case "partitions" => Some(new MetaTable(s"$display.partitions",
        // The compaction diagnostic: per-partition file/row counts — a
        // partition whose file_count outgrows its row mass is the
        // rewrite_data_files trigger (small-file detection as SQL).
        // row_count is PHYSICAL (before merge-on-read position deletes),
        // like Iceberg's files-metadata record_count.
        FilesMetaTable.PartitionsSchema,
        spark => {
          val st = SnapshotStore.stateOf(parentKey)
          if (st.currentFiles.size > FilesMetaTable.localThreshold(st.properties))
            // Above the driver-safe bound: aggregate DISTRIBUTED over the
            // `.files` relation (itself a chunk-manifest BatchScan at this
            // size) — the driver holds only |partitions| result rows,
            // never the file inventory. The nested query runs in the
            // SESSION THAT BUILT THIS SCAN (threaded in, not
            // SparkSession.active at execution — a concurrent second
            // session must not hijack the read into its own conf/catalog).
            FilesMetaTable.distributedPartitionRows(parentKey, spark)
          else {
            // Group per (spec, partition tuple): after a spec evolution,
            // old- and new-spec files are distinct partitions (their
            // rendered labels differ), matching Iceberg's partitions
            // table unioning specs.
            val labels = st.specLabelsMap
            st.currentFiles.groupBy(f => (f.specId, f.partitionValues))
              .toArray
              .sortBy { case ((_, pv), _) => pv.map(String.valueOf).mkString("/") }
              .map { case ((specId, pv), fs) =>
                val ls = labels.getOrElse(specId, st.partitionLabels)
                val part =
                  if (ls.isEmpty) null
                  else UTF8String.fromString(ls.zip(pv)
                    .map { case (c, v) => s"$c=${String.valueOf(v)}" }.mkString("/"))
                new GenericInternalRow(Array[Any](
                  part, fs.size.toLong, fs.map(_.rowCount).sum)): InternalRow
              }
          }
        }))
      case "tags" => Some(new MetaTable(s"$display.tags",
        StructType(Seq(
          StructField("tag", StringType, nullable = false),
          StructField("version", LongType, nullable = false))),
        _ => SnapshotStore.stateOf(parentKey).tags.toArray.sortBy(_._1).map {
          case (t, v) => new GenericInternalRow(Array[Any](UTF8String.fromString(t), v))
        }))
      case "refs" => Some(new MetaTable(s"$display.refs",
        // Iceberg's refs metadata table: every named ref — tags (immutable,
        // version = the tagged snapshot) and branches (mutable, version =
        // the fork base, staged_commits = unpublished snapshot count).
        StructType(Seq(
          StructField("name", StringType, nullable = false),
          StructField("type", StringType, nullable = false),
          StructField("version", LongType, nullable = false),
          StructField("staged_commits", LongType, nullable = false))),
        _ => {
          val st = SnapshotStore.stateOf(parentKey)
          val tags = st.tags.toArray.sortBy(_._1).map { case (t, v) =>
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(t), UTF8String.fromString("tag"), v, 0L))
          }
          val branches = st.branches.toArray.sortBy(_._1).map { case (b, br) =>
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(b), UTF8String.fromString("branch"),
              br.base, br.snapshots.size.toLong))
          }
          (tags ++ branches).map(r => r: InternalRow)
        }))
      case other => throw new IllegalStateException(
        s"metadata suffix '$other' is declared in Suffixes but not implemented")
    }
  }
}

private[sources] object FilesMetaTable {
  /** `content` distinguishes data files from merge-on-read position
    * deletes (Iceberg's files-metadata content column); `row_count` is
    * PHYSICAL — a data file's written rows (before position deletes) or a
    * delete file's entry count. */
  val FilesSchema: StructType = StructType(Seq(
    StructField("content", StringType, nullable = false),
    StructField("file_path", StringType, nullable = false),
    StructField("partition", StringType, nullable = true),
    StructField("row_count", LongType, nullable = false),
    // Iceberg's file_size_in_bytes (null = legacy descriptor / delete
    // file) and the data SEQUENCE number equality deletes key on.
    StructField("size_bytes", LongType, nullable = true),
    StructField("seq", LongType, nullable = false)))

  val PartitionsSchema: StructType = StructType(Seq(
    StructField("partition", StringType, nullable = true),
    StructField("file_count", LongType, nullable = false),
    StructField("row_count", LongType, nullable = false)))

  /** |files| above which `.files` / `.partitions` stop being driver-built
    * [[LocalScan]]s: past it, a million-file table's inventory must not
    * materialize as driver rows (Iceberg reads manifests distributed for
    * the same reason). Table property `read.meta.local-threshold`. */
  def localThreshold(props: Map[String, String]): Int =
    props.get("read.meta.local-threshold").map(_.toInt).getOrElse(100000)

  def partitionString(partitionCols: Seq[String], pv: Seq[Any]): UTF8String =
    if (partitionCols.isEmpty) null
    else UTF8String.fromString(partitionCols.zip(pv)
      .map { case (c, v) => s"$c=${String.valueOf(v)}" }.mkString("/"))

  /** Iceberg's files-metadata content label for a delete file. */
  def contentOf(d: SnapshotStore.DeleteFile): String =
    if (d.kind == "eq") "equality-deletes" else "position-deletes"

  /** `.partitions` above the threshold: a DISTRIBUTED aggregation over the
    * `.files` relation (itself a chunk-manifest BatchScan at this size);
    * the driver holds only the |partitions|-bounded result. `spark` is the
    * session that BUILT the enclosing scan (threaded through, never
    * `SparkSession.active` at execution time — with concurrent sessions
    * the nested read must run under the owning session's conf/catalog).
    * Rows are sorted DRIVER-SIDE by the same key as the local path (raw
    * partition VALUES, `String.valueOf`-rendered, '/'-joined) so the two
    * paths order identically, null partition included. */
  def distributedPartitionRows(parentKey: String,
      spark: SparkSession): Array[InternalRow] = {
    import org.apache.spark.sql.functions._
    val name = parentKey.split(0.toChar)
      .map(p => s"`${p.replace("`", "``")}`").mkString(".") + ".`files`"
    spark.table(name)
      .where(col("content") === "data")
      .groupBy(col("partition"))
      .agg(count(lit(1)).as("file_count"), sum(col("row_count")).as("row_count"))
      .collect()
      .sortBy(r =>
        // "c=v/d=w" → "v/w", the local path's sort key shape; the null
        // partition (unpartitioned table, a single group) sorts as "".
        if (r.isNullAt(0)) ""
        else r.getString(0).split('/')
          .map(seg => seg.substring(seg.indexOf('=') + 1)).mkString("/"))
      .map(r => new GenericInternalRow(Array[Any](
        if (r.isNullAt(0)) null else UTF8String.fromString(r.getString(0)),
        r.getLong(1), r.getLong(2))): InternalRow)
  }
}

/** The `.files` metadata relation: a [[LocalScan]] while the inventory is
  * driver-safe; above [[FilesMetaTable.localThreshold]] (and once the
  * snapshot's manifest is CHUNKED — `write.manifest.chunk-entries`), a
  * distributed batch scan with one task per manifest chunk, parsed
  * executor-side — the driver never materializes the file rows. */
private[sources] final class FilesMetaTable(name0: String, parentKey: String)
    extends Table with SupportsRead {
  override def name(): String = name0
  override def schema(): StructType = FilesMetaTable.FilesSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        val st = SnapshotStore.stateOf(parentKey)
        val chunks = st.snapshots.lastOption
          .flatMap(sn => Option(sn.manifestPath))
          .flatMap(mp => MetadataLog.manifestChunks(st.dataDir, mp))
        if (chunks.isDefined &&
            st.currentFiles.size > FilesMetaTable.localThreshold(st.properties))
          new DistributedFilesScan(st.dataDir, chunks.get, st.specLabelsMap,
            st.specTypesMap,
            MetadataLog.colCtxOf(st.schema),
            st.currentDeletes.map(d =>
              (d.path, d.entryCount, FilesMetaTable.contentOf(d), d.seq)).toArray)
        else new LocalScan {
          override def readSchema(): StructType = FilesMetaTable.FilesSchema
          override def rows(): Array[InternalRow] = {
            val labels = st.specLabelsMap
            val data = st.currentFiles.toArray.map { f =>
              new GenericInternalRow(Array[Any](
                UTF8String.fromString("data"), UTF8String.fromString(f.path),
                // Partition rendered under the file's OWN spec (evolution).
                FilesMetaTable.partitionString(
                  labels.getOrElse(f.specId, st.partitionLabels),
                  f.partitionValues),
                f.rowCount,
                if (f.sizeBytes > 0L) f.sizeBytes else null, f.seq))
            }
            val dels = st.currentDeletes.toArray.map(d =>
              new GenericInternalRow(Array[Any](
                UTF8String.fromString(FilesMetaTable.contentOf(d)),
                UTF8String.fromString(d.path), null, d.entryCount, null, d.seq)))
            (data ++ dels).map(r => r: InternalRow)
          }
        }
      }
    }
}

private[sources] final case class ManifestChunkPartition(dataDir: String,
    chunkName: String, specLabels: Map[Int, Seq[String]],
    specTypes: Map[Int, Seq[DataType]],
    ctx: MetadataLog.ColCtx)
  extends org.apache.spark.sql.connector.read.InputPartition

private[sources] final case class DeleteEntriesPartition(
    entries: Array[(String, Long, String, Long)])
  extends org.apache.spark.sql.connector.read.InputPartition

private[sources] final class DistributedFilesScan(dataDir: String,
    chunks: Vector[String], specLabels: Map[Int, Seq[String]],
    specTypes: Map[Int, Seq[DataType]],
    ctx: MetadataLog.ColCtx, deletes: Array[(String, Long, String, Long)])
    extends Scan with org.apache.spark.sql.connector.read.Batch {
  override def readSchema(): StructType = FilesMetaTable.FilesSchema
  override def toBatch: org.apache.spark.sql.connector.read.Batch = this
  override def description(): String =
    s"graft-snapshot files metadata (distributed, ${chunks.size} manifest chunks)"
  override def planInputPartitions():
      Array[org.apache.spark.sql.connector.read.InputPartition] =
    chunks.map(c => ManifestChunkPartition(dataDir, c, specLabels, specTypes,
      ctx): org.apache.spark.sql.connector.read.InputPartition).toArray ++
      (if (deletes.isEmpty) Nil else Seq(DeleteEntriesPartition(deletes):
        org.apache.spark.sql.connector.read.InputPartition))
  override def createReaderFactory():
      org.apache.spark.sql.connector.read.PartitionReaderFactory =
    FilesChunkReaderFactory(RowFiles.sessionConf())
}

private[sources] final case class FilesChunkReaderFactory(
    conf: org.apache.spark.util.SerializableConfiguration)
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  override def createReader(
      p: org.apache.spark.sql.connector.read.InputPartition):
      org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val it: Iterator[InternalRow] = p match {
      case ManifestChunkPartition(dataDir, chunk, specLabels, specTypes, ctx) =>
        MetadataLog.readChunkFiles(dataDir, chunk, specTypes, ctx, conf.value)
          .iterator.map(f => new GenericInternalRow(Array[Any](
            UTF8String.fromString("data"), UTF8String.fromString(f.path),
            FilesMetaTable.partitionString(
              specLabels.getOrElse(f.specId, Nil), f.partitionValues),
            f.rowCount,
            if (f.sizeBytes > 0L) f.sizeBytes else null, f.seq)))
      case DeleteEntriesPartition(entries) =>
        entries.iterator.map { case (path, n, content, seq) =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(content),
            UTF8String.fromString(path), null, n, null, seq))
        }
      case other => throw new IllegalStateException(
        s"unexpected metadata partition: $other")
    }
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      private var cur: InternalRow = null
      override def next(): Boolean = { if (it.hasNext) { cur = it.next(); true } else false }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

private[sources] final class MetaTable(name0: String, schema0: StructType,
    rowsFn: SparkSession => Array[InternalRow]) extends Table with SupportsRead {
  override def name(): String = name0
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // Captured at scan BUILD (the owning session's planning thread):
    // LocalScan.rows() may execute on a thread where `active` is a
    // DIFFERENT concurrent session.
    val owner = SparkSession.active
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def rows(): Array[InternalRow] = rowsFn(owner)
        override def readSchema(): StructType = schema0
      }
    }
  }
}

/** Iceberg-parity SQL PROCEDURES (`CALL graft_snap.system.<proc>(…)`) — the
  * maintenance surface as statements, not API calls, so the same deploy
  * tooling that issues DDL can issue retention/rollback/compaction
  * (Iceberg's `CALL catalog.system.expire_snapshots(…)` family):
  *
  *   - `expire_snapshots(table, keep_last)` → rows expired + files deleted
  *   - `rollback_to_version(table, version)` → the new live version
  *   - `create_tag(table, tag, version)` / `drop_tag(table, tag)`
  *   - `rewrite_data_files(table)` → files before/after (compaction)
  *
  * Each wraps the corresponding [[SnapshotCatalog]] operation; `table` is
  * the dot-joined identifier within THIS catalog (`'db.t'` — plain names,
  * no quoting: the argument is data, not parsed SQL). Results come back as
  * a one-row [[LocalScan]] (driver-bounded, like the metadata tables).
  */
private[sources] object SnapshotProcedures {

  def names: Seq[String] =
    Seq("expire_snapshots", "rollback_to_version", "create_tag", "drop_tag",
      "rewrite_data_files", "create_branch", "drop_branch", "fast_forward",
      "cherrypick_snapshot", "remove_orphan_files", "evolve_partition_spec",
      "maintain", "refresh_mv", "collect_stats")

  def load(catalogName: String, ident: Identifier): Option[UnboundProcedure] = {
    if (!ident.namespace().sameElements(Array("system"))) return None
    def identOf(s: String): Seq[String] = s.split('.').toSeq
    def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString

    ident.name() match {
      case "expire_snapshots" => Some(proc("expire_snapshots",
        "expire all but the newest keep_last snapshots; GC unreferenced files",
        Seq(in("table", StringType), in("keep_last", IntegerType)),
        StructType(Seq(StructField("expired_snapshots", IntegerType, nullable = false))),
        r => {
          val n = SnapshotCatalog.expire(catalogName, identOf(str(r, 0)), r.getInt(1))
          Array[Any](n)
        }))
      case "rollback_to_version" => Some(proc("rollback_to_version",
        "commit a new snapshot re-referencing the given version's files",
        Seq(in("table", StringType), in("version", LongType)),
        StructType(Seq(StructField("current_version", LongType, nullable = false))),
        r => Array[Any](
          SnapshotCatalog.rollback(catalogName, identOf(str(r, 0)), r.getLong(1)))))
      case "create_tag" => Some(proc("create_tag",
        "name a snapshot; tags resolve in VERSION AS OF and shield from expire",
        Seq(in("table", StringType), in("tag", StringType), in("version", LongType)),
        StructType(Seq(
          StructField("tag", StringType, nullable = false),
          StructField("version", LongType, nullable = false))),
        r => {
          SnapshotCatalog.tag(catalogName, identOf(str(r, 0)), str(r, 1), r.getLong(2))
          Array[Any](r.getUTF8String(1).copy(), r.getLong(2))
        }))
      case "drop_tag" => Some(proc("drop_tag",
        "remove a tag; its snapshot becomes expirable again",
        Seq(in("table", StringType), in("tag", StringType)),
        StructType(Seq(StructField("existed", BooleanType, nullable = false))),
        r => Array[Any](
          SnapshotCatalog.removeTag(catalogName, identOf(str(r, 0)), str(r, 1)))))
      case "create_branch" => Some(proc("create_branch",
        "fork a branch at the current version; stage appends on it, " +
          "audit, then fast_forward to publish",
        Seq(in("table", StringType), in("branch", StringType)),
        StructType(Seq(
          StructField("branch", StringType, nullable = false),
          StructField("base_version", LongType, nullable = false))),
        r => {
          val base = SnapshotCatalog.createBranch(
            catalogName, identOf(str(r, 0)), str(r, 1))
          Array[Any](r.getUTF8String(1).copy(), base)
        }))
      case "drop_branch" => Some(proc("drop_branch",
        "abandon a branch; its unpublished staged files are deleted",
        Seq(in("table", StringType), in("branch", StringType)),
        StructType(Seq(StructField("existed", BooleanType, nullable = false))),
        r => Array[Any](
          SnapshotCatalog.dropBranch(catalogName, identOf(str(r, 0)), str(r, 1)))))
      case "fast_forward" => Some(proc("fast_forward",
        "publish a branch: splice its staged commits onto the main log " +
          "(loud conflict if main advanced past the fork)",
        Seq(in("table", StringType), in("branch", StringType)),
        StructType(Seq(StructField("current_version", LongType, nullable = false))),
        r => Array[Any](
          SnapshotCatalog.fastForward(catalogName, identOf(str(r, 0)), str(r, 1)))))
      case "cherrypick_snapshot" => Some(proc("cherrypick_snapshot",
        "re-apply a commit's file delta onto the CURRENT head as a fresh " +
          "commit (OCC: overlapping file ops are a loud conflict) — " +
          "snapshot is a main-history version (re-apply a rolled-back " +
          "commit) or a branch name (publish staged commits onto a MOVED " +
          "main, fast_forward's refusal case; the ref drops on success)",
        Seq(in("table", StringType), in("snapshot", StringType)),
        StructType(Seq(StructField("current_version", LongType, nullable = false))),
        r => Array[Any](
          SnapshotCatalog.cherrypick(catalogName, identOf(str(r, 0)), str(r, 1)))))
      case "remove_orphan_files" => Some(procRows("remove_orphan_files",
        "delete unreferenced files under the table's data dir older than " +
          "older_than_hours (age floor protects in-flight writers; a " +
          "DESTRUCTIVE run requires a positive floor); dry_run lists the " +
          "orphan paths without deleting — one row per orphan",
        Seq(in("table", StringType), in("older_than_hours", DoubleType),
          in("dry_run", BooleanType)),
        StructType(Seq(
          StructField("orphan_file_location", StringType, nullable = false),
          StructField("deleted", BooleanType, nullable = false))),
        r => {
          // The age floor is the ONLY thing protecting an in-flight
          // writer's not-yet-committed files — a NULL or 0 floor on a
          // destructive run silently disables it, so both are refused.
          require(!r.isNullAt(1), "older_than_hours must not be NULL")
          require(!r.isNullAt(2), "dry_run must not be NULL")
          val hours = r.getDouble(1)
          val dry = r.getBoolean(2)
          require(hours >= 0, s"older_than_hours must be >= 0, got $hours")
          require(dry || hours > 0,
            "a destructive run needs a POSITIVE older_than_hours floor — " +
              "an in-flight writer's files are unreferenced until its " +
              "commit lands; use dry_run => true to inspect with floor 0")
          val cutoff = SnapshotStore.nowMicros() - (hours * 3600e6).toLong
          val orphans = SnapshotCatalog.removeOrphanFiles(
            catalogName, identOf(str(r, 0)), cutoff, dryRun = dry)
          orphans.map(p => new GenericInternalRow(
            Array[Any](UTF8String.fromString(p), !dry)): InternalRow).toArray
        }))
      case "maintain" => Some(proc("maintain",
        "apply the table's own retention/compaction policy properties in " +
          "one shot: history.expire.max-snapshot-age-ms (+ " +
          "min-snapshots-to-keep), maintain.compact.min-delete-files, " +
          "maintain.compact.min-files; unset properties skip their action",
        Seq(in("table", StringType)),
        StructType(Seq(
          StructField("expired_snapshots", IntegerType, nullable = false),
          StructField("files_before", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false))),
        r => {
          val (e, b, a) = SnapshotCatalog.maintain(
            SparkSession.active, catalogName, identOf(str(r, 0)))
          Array[Any](e, b, a)
        }))
      case "refresh_mv" => Some(proc("refresh_mv",
        "fold the base table's changes since the materialized view's " +
          "watermark into the stored view (one MERGE, O(changed rows)); " +
          "recover => true resolves a crashed refresh's pending claim " +
          "(verify none is running first); full => true rebuilds with one " +
          "INSERT OVERWRITE of the body — the escape hatch when the " +
          "base's history was expired past the watermark",
        Seq(in("table", StringType),
          ProcedureParameter.in("recover", BooleanType)
            .defaultValue("false").build(),
          ProcedureParameter.in("full", BooleanType)
            .defaultValue("false").build()),
        StructType(Seq(
          StructField("from_version", LongType, nullable = false),
          StructField("to_version", LongType, nullable = false),
          StructField("refreshed", BooleanType, nullable = false))),
        r => {
          val recover = !r.isNullAt(1) && r.getBoolean(1)
          val full = !r.isNullAt(2) && r.getBoolean(2)
          val (from, to, refreshed) =
            if (full) MaterializedViews.refreshFull(
              SparkSession.active, catalogName, identOf(str(r, 0)))
            else MaterializedViews.refresh(
              SparkSession.active, catalogName, identOf(str(r, 0)), recover)
          Array[Any](from, to, refreshed)
        }))
      case "evolve_partition_spec" => Some(proc("evolve_partition_spec",
        "re-partition the table WITHOUT rewriting data (Iceberg per-file " +
          "specs): new writes land under the new spec, old files keep and " +
          "prune through theirs; spec is a comma list of col, " +
          "days|hours|months|years(col), bucket(n, col), truncate(w, col); " +
          "empty = unpartitioned",
        Seq(in("table", StringType), in("spec", StringType)),
        StructType(Seq(StructField("spec_id", IntegerType, nullable = false))),
        r => Array[Any](SnapshotCatalog.evolvePartitionSpec(
          catalogName, identOf(str(r, 0)), str(r, 1)))))
      case "collect_stats" => Some(procRows("collect_stats",
        "collect equi-height histograms for the table's " +
          "stats.histogram-columns WITHOUT a rewrite (ANALYZE-style) — " +
          "two table scans total, however many columns; one row per " +
          "histogrammed column. Hot tables that are never compacted get " +
          "CBO selectivity this way; appends keep serving the stored " +
          "bins, row-changing commits retire them until the next call",
        Seq(in("table", StringType)),
        StructType(Seq(StructField("column", StringType, nullable = false))),
        r => {
          val identParts = identOf(str(r, 0))
          StatsHistograms.validate(SnapshotStore.stateOf(
            SnapshotStore.keyOf(catalogName, identParts)).properties)
          StatsHistograms.collect(SparkSession.active, catalogName, identParts)
            .map(c => new GenericInternalRow(
              Array[Any](UTF8String.fromString(c))): InternalRow).toArray
        }))
      case "rewrite_data_files" => Some(proc("rewrite_data_files",
        "compact live data to one file per partition, or about " +
          "target_file_rows per file when unpartitioned (history preserved; " +
          "a declared write.sort-order is restored — range-clustered " +
          "files); where => '<pred>' scopes the rewrite to the partitions " +
          "an identity-partition predicate selects (the nightly " +
          "compact-yesterday job) — other partitions' files survive by " +
          "path identity",
        Seq(in("table", StringType),
          ProcedureParameter.in("target_file_rows", LongType)
            .defaultValue((1L << 20).toString).build(),
          ProcedureParameter.in("where", StringType)
            .defaultValue("''").build()),
        StructType(Seq(
          StructField("files_before", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false))),
        r => {
          val target = if (r.isNullAt(1)) 1L << 20 else r.getLong(1)
          val w = if (r.isNullAt(2)) None
            else Some(r.getUTF8String(2).toString).filter(_.trim.nonEmpty)
          val (b, a) = SnapshotCatalog.compact(SparkSession.active, catalogName,
            identOf(str(r, 0)), target, w)
          Array[Any](b, a)
        }))
      case _ => None
    }
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  /** A one-result-row procedure: `body` receives the coerced argument row
    * (declared parameter order) and returns the output row's values. */
  private def proc(name0: String, desc: String, params: Seq[ProcedureParameter],
      outSchema: StructType, body: InternalRow => Array[Any]): UnboundProcedure =
    procRows(name0, desc, params, outSchema,
      input => Array(new GenericInternalRow(body(input)): InternalRow))

  /** A multi-row procedure (e.g. one row per orphan file). */
  private def procRows(name0: String, desc: String,
      params: Seq[ProcedureParameter], outSchema: StructType,
      body: InternalRow => Array[InternalRow]): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = name0
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = params.toArray
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): util.Iterator[Scan] = {
        val out = body(input)
        util.Collections.singletonList[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = out
          override def readSchema(): StructType = outSchema
        }).iterator()
      }
    }
}
