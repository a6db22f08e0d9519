package graft.sources

import java.util
import java.util.UUID
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.{expressions => ce}
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform, Expression => VExpression, Literal => VLiteral}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => VPredicate}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsPushDownV2Filters, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DataType, Decimal, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A versioned, FILE-BACKED DataSource V2 catalog with row-level-operation
  * support — the piece that makes statement-level `MERGE INTO` / `UPDATE` /
  * `DELETE` and Iceberg-style time travel (`VERSION AS OF` / `TIMESTAMP AS
  * OF`) REAL Spark SQL in this engine rather than operator-library calls.
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
  *     copy-on-write mode uses. The rewrite GROUP is a DATA FILE (Iceberg's
  *     COW granularity): only files that can contain matching rows are
  *     read, rewritten, and replaced; every other file carries over as pure
  *     metadata. Files are pruned two ways — statically, from pushed
  *     predicates over identity-partition values, and at runtime through
  *     [[SupportsRuntimeV2Filtering]] on the `_file` metadata column
  *     (Spark's `RowLevelOperationRuntimeGroupFiltering` plans a subquery
  *     for the matching `_file`s — the mechanism Iceberg uses).
  *   - [[org.apache.spark.sql.connector.write.SupportsDelta]]: the same
  *     statements in MERGE-ON-READ mode (Iceberg v2's delta path, selected
  *     by `write.delete/update/merge.mode=merge-on-read` table properties)
  *     plan `WriteDelta` instead: the scan exposes the stable row id
  *     (`_file`, `_pos`), the write appends POSITION-DELETE files, and no
  *     data file is rewritten — see [[MemDeltaRowLevelOperation]].
  *   - [[SupportsDeleteV2]]: a `DELETE` whose predicate is decidable from
  *     partition values alone never rewrites anything — the commit just
  *     drops the matching files (Iceberg's metadata delete; it outranks
  *     both row-level modes).
  *   - `TableCatalog.loadTable(ident, version|timestamp)`: `VERSION AS OF n`
  *     and `TIMESTAMP AS OF t` resolve to immutable snapshots; every commit
  *     creates a new numbered, timestamped snapshot, and
  *     [[SnapshotCatalog.expire]] is the retention operation (Iceberg's
  *     `expire_snapshots`), including physical garbage collection of data
  *     files no live snapshot references.
  *
  * SCALE CONTRACT: the driver holds ONLY metadata — per snapshot, the list
  * of (file path, partition values, row count); row data lives in data
  * files under the catalog's warehouse and flows executor → filesystem →
  * executor without ever materializing on the driver. Write tasks stream
  * rows straight to per-(task, partition) files and ship back one
  * [[SnapshotStore.DataFile]] descriptor each; the driver-side commit is an
  * O(#files) metadata splice, exactly Iceberg's manifest model. Rollback
  * re-references the old snapshot's files (no data copy); truncate/
  * overwrite only retire references (old versions stay time-travelable
  * until expired). Tables may be partitioned by identity transforms — the
  * shape the reference declares (`customers.yml:5-7`, `PARTITIONED BY
  * (CountryRegion, PostalCode)`) — and partition values ride in file
  * metadata, giving partition-pruned scans, partition-scoped overwrite
  * (static and dynamic), metadata-only deletes, and file-grained
  * copy-on-write. The data-file format is a Spark-native UnsafeRow stream
  * (length-prefixed rows; schema is fixed per table) — a deliberate
  * implementation detail behind the DataFile abstraction: swapping parquet
  * in changes the reader/writer pair only, none of the catalog semantics.
  * Readers of an expired snapshot can fail mid-scan if expire() collects
  * their files first — the same contract as Iceberg's expire_snapshots.
  */
class SnapshotCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with FunctionCatalog with ViewCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  // -- partition-transform functions (storage-partitioned joins) ----------

  /** The V2 FunctionCatalog face serves the PARTITION TRANSFORMS
    * ([[PartitionFunctions]]): Spark's `V2ScanPartitioningAndOrdering`
    * resolves a scan's reported `KeyGroupedPartitioning(bucket(8, k))`
    * by loading "bucket" from THIS catalog at the EMPTY namespace
    * (`V2ExpressionUtils.loadV2FunctionOpt`) — without it, reported
    * partitioning silently degrades to unknown and every catalog⋈catalog
    * join shuffles both sides. */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      PartitionFunctions.names.map(Identifier.of(Array.empty[String], _)).toArray
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier):
      org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace().isEmpty)
      PartitionFunctions.load(ident.name())
        .getOrElse(throw new NoSuchFunctionException(ident))
    else throw new NoSuchFunctionException(ident)

  // -- views (ViewCatalog, durable — see GraftViews.scala) -----------------

  /** Catalog-qualified path parts — the same deterministic directory
    * layout tables use, so a table and view can never silently coexist
    * at one identifier. */
  private def viewParts(ident: Identifier): Seq[String] =
    catalogName +: ident.namespace().toSeq :+ ident.name()

  override def viewExists(ident: Identifier): Boolean =
    ViewLog.exists(warehouse, viewParts(ident))

  override def listViews(namespace: String*): Array[Identifier] =
    ViewLog.list(warehouse, catalogName +: namespace)
      .map(Identifier.of(namespace.toArray, _)).toArray

  override def loadView(ident: Identifier): View =
    loadViewVersion(ident, None)

  /** Definition pinned at `version` (time travel over the definition
    * history — see [[ViewLog]]). */
  def loadViewVersion(ident: Identifier, version: Option[Long]): GraftView =
    ViewLog.load(warehouse, viewParts(ident), version)
      .map(new GraftView(ident, _))
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident))

  /** Definition current at `micros` (TIMESTAMP AS OF over the history). */
  def loadViewAsOf(ident: Identifier, micros: Long): GraftView =
    ViewLog.loadAsOf(warehouse, viewParts(ident), micros)
      .map(new GraftView(ident, _))
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident))

  override def createView(info: ViewInfo): View =
    createOrReplaceView(info, replace = false)

  override def replaceView(info: ViewInfo, orCreate: Boolean): View =
    createOrReplaceView(info, replace = true)

  private def createOrReplaceView(info: ViewInfo, replace: Boolean): View = {
    val ident = info.ident()
    // A table and a view must never share an identifier — resolution
    // would be ambiguous and the deterministic directory would entangle
    // two metadata logs. Enforced check-then-claim here and in
    // createTable/renameTable/renameView; the cross-SESSION window (a
    // concurrent CREATE TABLE and CREATE VIEW racing the same name claim
    // DIFFERENT files, v1.json vs view-v1.json, so neither CAS conflicts)
    // is a known narrow gap of the two-file layout — the same class of
    // gap Iceberg's HadoopCatalog documents for its table/namespace
    // races. Within one warehouse session the guards are exact.
    if (tableExists(ident))
      throw new TableAlreadyExistsException(
        (ident.namespace() :+ ident.name()).toSeq)
    val d = GraftView.info(ident, info, SnapshotStore.nowMicros())
    if (!ViewLog.create(warehouse, viewParts(ident), d, replace))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    loadView(ident)
  }

  /** Property changes append the NEXT definition version (the log is
    * immutable) with the same SQL. */
  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val cur = loadViewVersion(ident, None).definition
    val props = changes.foldLeft(cur.properties) {
      case (p, s: ViewChange.SetProperty) => p + (s.property() -> s.value())
      case (p, r: ViewChange.RemoveProperty) => p - r.property()
      case (p, _) => p
    }
    val next = cur.copy(properties = props,
      createdAtMicros = SnapshotStore.nowMicros())
    if (!ViewLog.create(warehouse, viewParts(ident), next, replace = true))
      throw new IllegalStateException(
        s"concurrent view change on ${viewParts(ident).mkString(".")} — retry")
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean =
    ViewLog.drop(warehouse, viewParts(ident))

  override def renameView(from: Identifier, rawTo: Identifier): Unit = {
    val to = normalizeRenameTarget(rawTo, from.namespace())
    if (!viewExists(from))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(from)
    if (viewExists(to) || tableExists(to))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(to)
    val src = new Path(MetadataLog.tableDir(warehouse, viewParts(from)))
    val dst = new Path(MetadataLog.tableDir(warehouse, viewParts(to)))
    val fs = src.getFileSystem(new Configuration())
    // fs.rename returns FALSE (not an exception) when the destination's
    // parent directory is missing — ensure it exists, like renameTable,
    // so a rename into a fresh namespace works instead of surfacing an
    // opaque failure.
    fs.mkdirs(dst.getParent)
    if (!fs.rename(src, dst))
      throw new IllegalStateException(s"renameView failed: $src -> $dst")
  }

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    // The default warehouse is PER-PROCESS (pid-suffixed): cross-session
    // sharing of a warehouse is the durable log's feature, but it must be
    // an explicit decision (`warehouse` option) — two unrelated JVMs
    // landing in one shared /tmp dir by default would silently entangle
    // their catalogs.
    warehouse = Option(options.get("warehouse")).getOrElse(
      sys.props("java.io.tmpdir") + "/graft-snap-warehouse-" +
        ProcessHandle.current().pid())
    // How bare store keys (catalog\0ns\0table) resolve back to disk.
    SnapshotStore.warehouses.put(catalogName, warehouse)
    ()
  }
  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    (catalogName +: ident.namespace() :+ ident.name()).mkString(SnapshotStore.Sep)
  private def nsKey(ns: Array[String]): String =
    (catalogName +: ns).mkString(SnapshotStore.Sep)

  // -- namespaces ----------------------------------------------------------

  // Namespaces are DIRECTORIES under the warehouse (Iceberg HadoopCatalog's
  // model): CREATE NAMESPACE mkdirs, existence is a dir probe — namespaces
  // survive the JVM like the tables they hold. The in-JVM set remains as a
  // fast path.

  override def listNamespaces(): Array[Array[String]] = {
    val cached = SnapshotStore.namespaces.keys.toSeq
      .filter(_.startsWith(catalogName + SnapshotStore.Sep))
      .map(_.split(0.toChar).drop(1).toSeq)
    val onDisk = MetadataLog.listDiskNamespaces(warehouse, catalogName)
      .map(Seq(_))
    (cached ++ onDisk).distinct.map(_.toArray).toArray
  }
  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (ns.isEmpty) listNamespaces()
    else if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    else Array.empty
  }
  override def namespaceExists(ns: Array[String]): Boolean =
    SnapshotStore.namespaces.contains(nsKey(ns)) ||
      MetadataLog.namespaceDirExists(warehouse, catalogName +: ns.toSeq)
  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    util.Collections.emptyMap()
  }
  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit = {
    SnapshotStore.namespaces.putIfAbsent(nsKey(ns), ())
    MetadataLog.mkNamespaceDir(warehouse, catalogName +: ns.toSeq)
  }
  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")
  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val existed = namespaceExists(ns)
    val owned = if (existed) listTablesIn(ns) else Nil
    if (owned.nonEmpty && !cascade)
      throw new IllegalStateException(s"namespace ${ns.mkString(".")} is not empty")
    owned.foreach(t => SnapshotStore.dropTableAndData(key(t)))
    SnapshotStore.namespaces.remove(nsKey(ns))
    RowFiles.deleteDir(
      MetadataLog.tableDir(warehouse, catalogName +: ns.toSeq))
    existed
  }

  // -- tables --------------------------------------------------------------

  /** Tables of `ns`: in-JVM cache ∪ warehouse directories holding a
    * metadata log (the cross-session / post-restart listing). */
  private def listTablesIn(ns: Array[String]): Seq[Identifier] = {
    val prefix = nsKey(ns) + SnapshotStore.Sep
    val cached = SnapshotStore.tables.keys.toSeq.filter(_.startsWith(prefix))
      .map(_.split(0.toChar).last)
    val onDisk =
      MetadataLog.listDiskTables(warehouse, catalogName +: ns.toSeq)
    (cached ++ onDisk).distinct.map(Identifier.of(ns, _))
  }

  override def listTables(ns: Array[String]): Array[Identifier] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    listTablesIn(ns).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val k = key(ident)
    SnapshotStore.resolve(k) match {
      case Some(st) =>
        new MemTable(ident.toString, k, st.schema, st.partitionCols, st.properties,
          pinned = None, partTransforms = st.partitionTransforms)
      case None =>
        // Suffix fallback (`db.t.history` / `.files` / `.changes` /
        // `.branch_<name>`): only when the FULL identifier names no real
        // table and its namespace tail names one — a genuine table always
        // wins.
        val meta = for {
          ns <- Option(ident.namespace()).filter(_.nonEmpty)
          parent = Identifier.of(ns.init, ns.last)
          pk = key(parent) if SnapshotStore.resolve(pk).isDefined
          t <- MetaTables.forSuffix(parent.toString, pk, ident.name())
            .orElse(branchFor(parent, pk, ident.name()))
        } yield t
        meta.getOrElse(throw new NoSuchTableException(ident))
    }
  }

  /** `db.t.branch_<name>` — the BRANCH as a readable/appendable relation
    * (Iceberg's branch identifier surface): reads serve the branch head,
    * `INSERT INTO` stages commits on the branch. An unknown branch falls
    * through to NOT_FOUND (loadTable doubles as Spark's existence probe, so
    * throwing anything else here would break `CREATE TABLE db.t.branch_x`
    * shadow creation). */
  private def branchFor(parent: Identifier, pk: String,
      suffix: String): Option[Table] =
    Option(suffix).filter(_.startsWith("branch_"))
      .map(_.stripPrefix("branch_"))
      .filter(SnapshotStore.stateOf(pk).branches.contains)
      .map(name => new BranchTable(s"$parent.branch_$name", pk, name))

  // -- procedures (`CALL <catalog>.system.<proc>(…)`) ----------------------

  override def loadProcedure(ident: Identifier): UnboundProcedure =
    SnapshotProcedures.load(catalogName, ident).getOrElse(
      throw new RuntimeException(
        s"procedure $ident not found; known: " +
          SnapshotProcedures.names.map(n => s"$catalogName.system.$n")
            .mkString(", ")))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      SnapshotProcedures.names.map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  /** `VERSION AS OF v` — a read-only pin of snapshot v (0 = the empty
    * just-created table), of a named tag (`VERSION AS OF 'release_1'`,
    * Iceberg's tag surface), or of a BRANCH head (the audit read of
    * write-audit-publish). Expired/future versions and unknown names fail
    * loudly. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val k = key(ident)
    val st = SnapshotStore.resolve(k).getOrElse(throw new NoSuchTableException(ident))
    st.branches.get(version) match {
      case Some(br) if version.toLongOption.isEmpty =>
        val (files, deletes) = br.head(st)
        new MemTable(s"$ident@branch:$version", k, st.schema,
          st.partitionCols, st.properties,
          pinned = Some(files), pinnedDeletes = Some(deletes),
          partTransforms = st.partitionTransforms)
      case _ =>
        val v = version.toLongOption.getOrElse(
          st.tags.getOrElse(version,
            throw new IllegalArgumentException(
              s"'$version' is not a snapshot version, tag, or branch of $ident; " +
                s"tags: ${st.tags.keys.toSeq.sorted.mkString("[", ", ", "]")}; " +
                s"branches: ${st.branches.keys.toSeq.sorted.mkString("[", ", ", "]")}")))
        new MemTable(s"$ident@v$version", k, SnapshotStore.schemaAt(k, v),
          st.partitionCols, st.properties,
          pinned = Some(SnapshotStore.filesAt(k, v)),
          pinnedDeletes = Some(SnapshotStore.deletesAt(k, v)),
          partTransforms = st.partitionTransforms)
    }
  }

  /** `TIMESTAMP AS OF t` — Spark hands micros-since-epoch; resolve to the
    * newest snapshot committed at or before it. Timestamps older than the
    * oldest LIVE snapshot of a table whose earlier history was expired fail
    * loudly (the state at that instant is unknowable, not empty) — the
    * timestamp twin of `filesAt`'s expired-version failure. An instant
    * before a never-expired table's first commit is genuinely empty. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val k = key(ident)
    val st = SnapshotStore.resolve(k).getOrElse(throw new NoSuchTableException(ident))
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
    val files =
      if (visible.isEmpty) Vector.empty[SnapshotStore.DataFile] else visible.last.files
    val schema = visible.lastOption.flatMap(s => Option(s.schema)).getOrElse(st.schema)
    new MemTable(s"$ident@t$timestampMicros", k, schema, st.partitionCols,
      st.properties, pinned = Some(files),
      pinnedDeletes = Some(visible.lastOption.fold(
        Vector.empty[SnapshotStore.DeleteFile])(_.deleteFiles)),
      partTransforms = st.partitionTransforms)
  }

  /** Accepts identity AND HIDDEN partition transforms (`PARTITIONED BY
    * (days(ts))` / `bucket(n, id)` / `truncate(w, s)` — see [[PTransform]];
    * the reference's own tables use identity, `customers.yml:5-7`, but
    * format-v2 Iceberg tables partition through transforms) and any
    * provider/properties the DDL carries (`USING iceberg` + TBLPROPERTIES
    * from the Iceberg-dialect DDL land here as the `provider` / table
    * properties, so the generated reference DDL executes against this
    * catalog as-is). A declared `location` is recorded as metadata; data
    * files live under the catalog's own warehouse (external stores aren't
    * mounted offline). */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    // A view's identifier is taken: the deterministic directory would
    // entangle the two metadata logs and resolution would be ambiguous.
    if (viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    val partFields = partitions.toSeq.map(PTransform.fromV2)
    val partCols = partFields.map(_._1)
    val partTransforms = partFields.map(_._2)
    partFields.foreach { case (c, t) =>
      require(schema.fieldNames.contains(c),
        s"partition column $c is not in the table schema")
      require(t.accepts(schema(c).dataType),
        s"partition transform ${t.name} does not accept column $c's type " +
          s"${schema(c).dataType.simpleString}")
    }
    require(partCols.map(_.toLowerCase).distinct.length == partCols.length,
      s"duplicate partition source column in ${partCols.mkString("(", ", ", ")")}" +
        " — one transform per source column")
    // `_file` / `_pos` are this catalog's metadata columns (the row-level
    // rewrite group id and the merge-on-read row id), and `_change_type` /
    // `_commit_version` / `_commit_timestamp` are the change-feed relation's
    // virtual columns. A DATA column with any of these names would shadow
    // them in resolution and silently corrupt row-level operations or the
    // change feed — reject at creation, the only safe time.
    val clash = schema.fieldNames.filter(n =>
      MemTable.ReservedColumnNames.exists(_.equalsIgnoreCase(n)))
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} are reserved metadata columns " +
        s"(${MemTable.ReservedColumnNames.mkString(", ")}) of the " +
        "snapshot catalog")
    val k = key(ident)
    // DETERMINISTIC table directory (no uuid): it is the durable identity a
    // fresh session resolves this identifier to, and claiming
    // `metadata/v1.json` inside it is what makes CREATE TABLE exclusive
    // ACROSS sessions sharing the warehouse — not just within this JVM.
    val dataDir = MetadataLog.tableDir(warehouse,
      catalogName +: ident.namespace().toSeq :+ ident.name())
    val props = properties.asScala.toMap
    if (SnapshotStore.tables.contains(k))
      throw new TableAlreadyExistsException(ident)
    // Assign FIELD IDS at birth (1..n): names become labels over ids, the
    // indirection that later makes RENAME/DROP safe (see [[FieldIds]]).
    // STRIP any incoming id metadata first — a CTAS query schema inherits
    // upstream tables' ids through Spark's metadata propagation, and those
    // foreign ids would collide with this table's own assignment.
    val (idSchema, lastId) = FieldIds.assign(FieldIds.strip(schema))
    require(idSchema.fields.flatMap(FieldIds.idOf).distinct.length ==
      idSchema.length, s"internal: duplicate field ids in $idSchema")
    // Validate the write format and sort order NOW (the ALTER path
    // already does): a bad value must not sit latent until the first
    // write task trips it.
    DataFiles.formatOf(props)
    SortOrders.of(props, idSchema)
    FileBloom.maxBits(props)
    val persisted = MetadataLog.createInitial(
      SnapshotStore.TableState(idSchema, partCols, dataDir, props, Vector.empty,
        partitionTransforms = partTransforms,
        lastFieldId = lastId, tableId = UUID.randomUUID().toString))
      .getOrElse(throw new TableAlreadyExistsException(ident))
    // The DISK claim (createInitial) decided existence; the cache insert
    // must tolerate a concurrent reader having already loaded OUR v1.json
    // — putIfAbsent-then-throw would report failure for a create that won.
    SnapshotStore.cachePutNewer(k, persisted)
    new MemTable(ident.toString, k, idSchema, partCols, props, pinned = None,
      partTransforms = partTransforms)
  }

  /** Schema evolution over per-column FIELD IDS (see [[FieldIds]]):
    * `ADD COLUMN` (nullable, appended; a fresh id — existing files hold
    * no value, readers pad NULL), `RENAME COLUMN` (the id keeps the data;
    * the name is just its label), `DROP COLUMN` (the id retires, never
    * reused; files keep the bytes, readers stop asking for them), and
    * table-property changes. Per-snapshot schemas keep time travel
    * reading each version under its own names. `ALTER COLUMN … TYPE`
    * accepts SAFE WIDENING promotions only ([[TypeWidening]]): the change
    * is metadata (a [[SnapshotStore.TableState.typeHistory]] entry);
    * readers up-cast old files' values at decode time through each file's
    * data sequence number.
    *
    * RENAME/DROP require every CURRENT data file to carry its write-time
    * (id, name) column list — files written before field-id tracking are
    * resolved positionally against the live schema and would silently
    * mis-read after either change; `rewrite_data_files` upgrades them. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val k = key(ident)
    if (SnapshotStore.resolve(k).isEmpty) throw new NoSuchTableException(ident)
    def requireIdCoverage(st: SnapshotStore.TableState, what: String): Unit = {
      // BRANCH HEADS count too: a branch's staged files are scanned against
      // the LIVE schema after the rename/drop (BranchTable resolves files
      // via the current schema), so a legacy file parked on a branch would
      // mis-read positionally exactly like one on main — same gate, same
      // remedy (the eq-delete-key DROP check below inspects branch heads
      // for the same reason).
      val branchHead = st.branches.values.flatMap(_.head(st)._1)
      val legacy = (st.currentFiles ++ branchHead)
        .filter(_.writeCols.isEmpty).distinctBy(_.path)
      require(legacy.isEmpty,
        s"$what requires every current data file (branch heads included) " +
          s"to carry its write-time column mapping, but ${legacy.size} " +
          "file(s) predate field-id tracking (e.g. " +
          legacy.take(1).map(_.path).mkString + ") — " +
          "run CALL <catalog>.system.rewrite_data_files first")
    }
    SnapshotStore.update(k) { st =>
      changes.foldLeft(st) { (cur, ch) =>
        ch match {
          case add: TableChange.AddColumn =>
            require(add.fieldNames().length == 1,
              s"nested ADD COLUMN is not supported: ${add.fieldNames().mkString(".")}")
            val colName = add.fieldNames()(0)
            require(!cur.schema.fieldNames.exists(_.equalsIgnoreCase(colName)),
              s"column $colName already exists")
            require(!MemTable.ReservedColumnNames.exists(_.equalsIgnoreCase(colName)),
              s"column name $colName is a reserved metadata column of the " +
                "snapshot catalog")
            require(add.isNullable,
              s"added column $colName must be nullable: existing data files hold no value for it")
            require(add.position() == null,
              "column position is not supported; new columns append at the end " +
                "(a position would re-map every existing file's layout)")
            val field = FieldIds.withId(org.apache.spark.sql.types.StructField(
              colName, add.dataType(), nullable = true), cur.lastFieldId + 1)
            cur.copy(
              schema = cur.schema.add(
                Option(add.comment()).fold(field)(field.withComment)),
              lastFieldId = cur.lastFieldId + 1)
          case rn: TableChange.RenameColumn =>
            require(rn.fieldNames().length == 1,
              s"nested RENAME COLUMN is not supported: ${rn.fieldNames().mkString(".")}")
            val from = rn.fieldNames()(0)
            val to = rn.newName()
            val idx = cur.schema.fieldNames.indexWhere(_.equalsIgnoreCase(from))
            require(idx >= 0, s"column $from does not exist")
            require(!cur.schema.fieldNames.exists(_.equalsIgnoreCase(to)),
              s"column $to already exists")
            require(!MemTable.ReservedColumnNames.exists(_.equalsIgnoreCase(to)),
              s"column name $to is a reserved metadata column of the " +
                "snapshot catalog")
            requireIdCoverage(cur, s"RENAME COLUMN $from")
            val fields = cur.schema.fields.clone()
            fields(idx) = fields(idx).copy(name = to)
            cur.copy(
              schema = org.apache.spark.sql.types.StructType(fields),
              partitionCols = cur.partitionCols.map(c =>
                if (c.equalsIgnoreCase(from)) to else c))
          case del: TableChange.DeleteColumn =>
            require(del.fieldNames().length == 1,
              s"nested DROP COLUMN is not supported: ${del.fieldNames().mkString(".")}")
            val colName = del.fieldNames()(0)
            val idx = cur.schema.fieldNames.indexWhere(_.equalsIgnoreCase(colName))
            if (idx < 0) {
              require(del.ifExists(), s"column $colName does not exist")
              cur
            } else {
              require(!cur.partitionCols.exists(_.equalsIgnoreCase(colName)),
                s"cannot drop partition column $colName — partition values " +
                  "are file identity")
              require(cur.schema.length > 1,
                s"cannot drop $colName: a table needs at least one column")
              requireIdCoverage(cur, s"DROP COLUMN $colName")
              // A LIVE equality delete keyed on this column would make every
              // subsequent scan of older files fail (the reader must probe
              // the key id) — reject now, while the statement can still be
              // reordered after a compaction folds the deletes.
              val colId = FieldIds.requireId(cur.schema, colName)
              val liveEq = (cur.currentDeletes ++
                cur.branches.values.flatMap(_.head(cur)._2))
                .filter(d => d.kind == "eq" && d.equalityCols.contains(colId))
              require(liveEq.isEmpty,
                s"cannot drop $colName: ${liveEq.size} live equality-delete " +
                  "file(s) key on it — run CALL <catalog>.system." +
                  "rewrite_data_files first to fold them")
              cur.copy(schema = org.apache.spark.sql.types.StructType(
                cur.schema.fields.patch(idx, Nil, 1)))
            }
          case upd: TableChange.UpdateColumnType =>
            require(upd.fieldNames().length == 1,
              s"nested ALTER COLUMN TYPE is not supported: ${upd.fieldNames().mkString(".")}")
            val colName = upd.fieldNames()(0)
            val idx = cur.schema.fieldNames.indexWhere(_.equalsIgnoreCase(colName))
            require(idx >= 0, s"column $colName does not exist")
            val from = cur.schema.fields(idx).dataType
            val to = upd.newDataType()
            if (from == to) cur // no-op retype
            else {
              require(TypeWidening.safePromotion(from, to),
                s"cannot change $colName from $from to $to: only safe " +
                  "WIDENING promotions are supported (byte/short/int→long, " +
                  "float→double, decimal precision-up)")
              // Partition values (identity AND transform results) ride in
              // manifests under immutable types — widening the source
              // would silently re-type every file's identity.
              require(!cur.partitionCols.exists(_.equalsIgnoreCase(colName)),
                s"cannot widen partition column $colName — partition values " +
                  "are file identity")
              requireIdCoverage(cur, s"ALTER COLUMN $colName TYPE")
              // A LIVE equality delete keyed on this column stores key
              // tuples in the OLD type; widening would make every probe
              // compare long-vs-int. Compaction folds them first. Branch
              // HEADS count (an EMPTY branch's head is its base snapshot,
              // whose deletes main may have since folded).
              val colId = FieldIds.requireId(cur.schema, colName)
              val liveEq = (cur.currentDeletes ++
                cur.branches.values.flatMap(_.head(cur)._2))
                .filter(d => d.kind == "eq" && d.equalityCols.contains(colId))
              require(liveEq.isEmpty,
                s"cannot widen $colName: ${liveEq.size} live equality-delete " +
                  "file(s) key on it — run CALL <catalog>.system." +
                  "rewrite_data_files first to fold them")
              // STAGED branch commits number their snapshots PAST main's
              // head, so a single max watermark cannot separate their
              // pre-widen files from main's post-widen ones — a main
              // append after the widen would get seq <= W and decode its
              // wide-written slots as the narrow type (silent garbage).
              // Publish or drop branches first; the watermark is then
              // exactly main's last version.
              require(cur.branches.values.forall(_.snapshots.isEmpty),
                s"cannot widen $colName while branches hold staged " +
                  "commits (their data sequence numbers overlap main's " +
                  "post-widen range) — fast_forward or drop_branch first")
              val w = cur.snapshots.map(_.version).foldLeft(0L)(math.max)
              val fields = cur.schema.fields.clone()
              fields(idx) = fields(idx).copy(dataType = to)
              cur.copy(
                schema = org.apache.spark.sql.types.StructType(fields),
                typeHistory = cur.typeHistory +
                  (colId -> (cur.typeHistory.getOrElse(colId, Vector.empty)
                    :+ (w, from))))
            }
          case set: TableChange.SetProperty =>
            // Validate format switches HERE, not at first write — a bad
            // value must not sit latent until some streaming epoch trips it.
            if (set.property == "write.format")
              DataFiles.formatOf(Map("write.format" -> set.value))
            if (set.property == SortOrders.Prop)
              SortOrders.of(Map(SortOrders.Prop -> set.value), cur.schema)
            if (set.property == FileBloom.MaxBytesProp)
              FileBloom.maxBits(Map(FileBloom.MaxBytesProp -> set.value))
            if (set.property == SortedScanMergePlanning.FanInProp)
              SortedScanMergePlanning.fanInOf(
                Map(SortedScanMergePlanning.FanInProp -> set.value))
            cur.copy(properties = cur.properties + (set.property -> set.value))
          case rm: TableChange.RemoveProperty =>
            cur.copy(properties = cur.properties - rm.property)
          case other => throw new UnsupportedOperationException(
            s"ALTER TABLE change not supported: $other — this catalog supports " +
              "ADD/RENAME/DROP COLUMN, safe type WIDENING (ALTER COLUMN " +
              "TYPE), and table properties")
        }
      }
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    SnapshotStore.dropTableAndData(key(ident))

  /** RENAME = one directory rename: manifests record paths RELATIVE to the
    * table dir, so nothing inside the metadata log needs rewriting — the
    * renamed table lazily reloads from its new location (Iceberg keeps
    * metadata location-relative for the same reason). Concurrent readers
    * holding the old absolute paths fail like readers of an expired
    * snapshot — the documented catalog contract for metadata races. */
  /** Spark's RenameTable hands the TARGET identifier un-stripped: a
    * catalog-qualified `RENAME TO cat.ns.t` arrives with the catalog
    * name still in `namespace()` — without normalization the rename
    * would move the directory to `warehouse/cat/cat/ns/t` and every
    * conflict guard would probe the wrong path. This catalog serves
    * single-level namespaces, so a 2-level namespace is either our own
    * catalog prefix (strip it) or an error (loud). */
  private def normalizeRenameTarget(ident: Identifier,
      sourceNs: Array[String]): Identifier =
    ident.namespace().toSeq match {
      case Seq(c, ns) if c == catalogName => Identifier.of(Array(ns), ident.name())
      case Seq(_) => ident
      case Seq() => Identifier.of(sourceNs, ident.name()) // bare: same ns
      case other => throw new IllegalArgumentException(
        s"rename target must be <namespace>.<name> within catalog " +
          s"$catalogName, got namespace ${other.mkString(".")}")
    }

  override def renameTable(oldIdent: Identifier, rawNewIdent: Identifier): Unit = {
    val newIdent = normalizeRenameTarget(rawNewIdent, oldIdent.namespace())
    val ok = key(oldIdent)
    val nk = key(newIdent)
    val st = SnapshotStore.resolve(ok)
      .getOrElse(throw new NoSuchTableException(oldIdent))
    if (SnapshotStore.resolve(nk).isDefined)
      throw new TableAlreadyExistsException(newIdent)
    // A VIEW at the target would entangle two metadata logs in one
    // directory (same invariant as createTable/createView/renameView).
    if (viewExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(newIdent)
    val newDir = new Path(MetadataLog.tableDir(warehouse,
      catalogName +: newIdent.namespace().toSeq :+ newIdent.name()))
    val fs = RowFiles.fs(newDir)
    fs.mkdirs(newDir.getParent)
    if (!fs.rename(new Path(st.dataDir), newDir))
      throw new IllegalStateException(
        s"rename $oldIdent -> $newIdent failed at the filesystem " +
          s"(${st.dataDir} -> $newDir)")
    SnapshotStore.tables.remove(ok)
    () // the new identifier lazy-loads from the moved metadata log
  }
}

object SnapshotCatalog {

  /** Thread-local permit letting the engine's OWN compaction stamp
    * `operation = replace` on a materialized view's backing table — the
    * stamp is content-neutrality evidence the MV recovery/tamper
    * machinery trusts, so user writes may never claim it there (see
    * `newWriteBuilder`). Keyed by store key; `compact` arms it around
    * its overwrite (same driver thread plans the write). */
  private[sources] val compactPermit = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }
  /** Snapshot retention (Iceberg `expire_snapshots`): keep the newest
    * `keepLast` snapshots of `catalog.ns.table`; older versions stop being
    * time-travelable (load fails loudly) while the live table is untouched.
    * Data files referenced by no surviving snapshot are physically deleted
    * (Iceberg's expire-with-GC). Returns the number of snapshots expired. */
  /** Shared expire core: drop every snapshot outside `retain`'s verdict —
    * ALWAYS keeping the newest `minKeep`, every tagged snapshot, and
    * every live branch's BASE (expiring a fork point would strand the
    * branch's reads and fast-forward) — then GC the files only the
    * dropped snapshots referenced. Both expire flavors go through here so
    * the retention shields and the GC can never diverge. */
  private def expireWhere(k: String, minKeep: Int,
      retain: SnapshotStore.Snapshot => Boolean): Int = {
    require(minKeep >= 1, s"must keep at least 1 snapshot, got $minKeep")
    val (before, after) = SnapshotStore.update(k) { st =>
      val keep = st.snapshots.filter(retain).map(_.version).toSet ++
        st.snapshots.takeRight(minKeep).map(_.version) ++
        st.tags.values ++ st.branches.values.map(_.base)
      st.copy(snapshots = st.snapshots.filter(s => keep(s.version)))
    }
    def paths(sns: Vector[SnapshotStore.Snapshot]) =
      sns.iterator.flatMap(sn =>
        sn.files.iterator.map(_.path) ++ sn.deleteFiles.iterator.map(_.path)).toSet
    RowFiles.delete(paths(before.snapshots) -- paths(after.snapshots))
    before.snapshots.size - after.snapshots.size
  }

  def expire(catalog: String, ident: Seq[String], keepLast: Int): Int =
    expireWhere((catalog +: ident).mkString(SnapshotStore.Sep), keepLast,
      _ => false)

  /** AGE-BASED expire (Iceberg's `max-snapshot-age-ms` retention): drop
    * snapshots whose commit predates `cutoffMicros`, always keeping the
    * newest `minKeep`, every tagged snapshot, and every live branch's
    * base. Same orphan-file GC as [[expire]]; the time-travel gap guards
    * keep reads into the removed range loud. */
  def expireOlderThan(catalog: String, ident: Seq[String],
      cutoffMicros: Long, minKeep: Int = 1): Int =
    expireWhere((catalog +: ident).mkString(SnapshotStore.Sep), minKeep,
      _.commitMicros >= cutoffMicros)

  /** POLICY-DRIVEN one-shot maintenance (`CALL cat.system.maintain(t)`):
    * apply the table's own `write.*`/`history.*` properties instead of
    * hand-run procedure calls — the automation a 100 TB lakehouse runs on
    * a schedule per table:
    *
    *   - `history.expire.max-snapshot-age-ms` — age-based snapshot expiry
    *     (with `history.expire.min-snapshots-to-keep`, default 1; tags and
    *     branch bases always survive).
    *   - `maintain.compact.min-delete-files` — fold merge-on-read delete
    *     files back into data files once the LIVE delete-file count
    *     reaches the threshold (read amplification is bounded by policy,
    *     not by trigger count).
    *   - `maintain.compact.min-files` — compact when the live data-file
    *     count reaches the threshold (small-file pressure from streaming
    *     appends).
    *   - `maintain.refresh-mv` (materialized views) — fold the base's
    *     changes since the watermark first, so the scheduled maintenance
    *     pass that expires/compacts a dashboard MV also keeps it FRESH
    *     (refresh before compaction: the fold's MERGE adds delete files
    *     the same pass may then fold away).
    *
    * Unset properties skip their action; the call reports what ran.
    * Compaction respects `write.sort-order` exactly like
    * `rewrite_data_files` (it IS that path). */
  def maintain(spark: org.apache.spark.sql.SparkSession, catalog: String,
      ident: Seq[String]): (Int, Int, Int) = {
    val k = SnapshotStore.keyOf(catalog, ident)
    if (SnapshotStore.stateOf(k).properties
        .get("maintain.refresh-mv").contains("true"))
      MaterializedViews.refresh(spark, catalog, ident, recover = false)
    val props = SnapshotStore.stateOf(k).properties
    val minKeep = props.get("history.expire.min-snapshots-to-keep")
      .map(_.toInt).getOrElse(1)
    val expired = props.get("history.expire.max-snapshot-age-ms")
      .map(_.toLong).fold(0) { ms =>
        expireOlderThan(catalog, ident,
          SnapshotStore.nowMicros() - ms * 1000L, minKeep)
      }
    val st = SnapshotStore.stateOf(k)
    val head = st.snapshots.lastOption
    val delCount = head.fold(0)(_.deleteFiles.size)
    val fileCount = head.fold(0)(_.files.size)
    val shouldCompact =
      props.get("maintain.compact.min-delete-files").map(_.toInt)
        .exists(t => delCount >= t && delCount > 0) ||
      props.get("maintain.compact.min-files").map(_.toInt)
        .exists(fileCount >= _)
    val (b, a) =
      if (shouldCompact)
        compact(spark, catalog, ident,
          props.get("write.compact.target-file-rows").map(_.toLong)
            .getOrElse(1L << 20))
      else (fileCount, fileCount)
    (expired, b, a)
  }

  /** Name snapshot `version` of `catalog.ns.table` (Iceberg `CREATE TAG`):
    * the tag resolves in `VERSION AS OF '<name>'` and shields its snapshot
    * from [[expire]]. Re-tagging an existing name moves it. */
  def tag(catalog: String, ident: Seq[String], name: String, version: Long): Unit = {
    require(name.toLongOption.isEmpty,
      s"tag name '$name' would be ambiguous with a numeric snapshot version")
    val k = (catalog +: ident).mkString(SnapshotStore.Sep)
    SnapshotStore.update(k) { st =>
      // Existence validated inside the atomic update: a concurrent expire
      // cannot drop the snapshot between check and tag.
      require(st.snapshots.exists(_.version == version),
        s"cannot tag version $version: not a live snapshot " +
          s"(have ${st.snapshots.map(_.version).mkString("[", ", ", "]")})")
      require(!st.branches.contains(name),
        s"'$name' is already a branch of this table — tags and branches " +
          "share the VERSION AS OF namespace")
      st.copy(tags = st.tags + (name -> version))
    }
    ()
  }

  /** Drop a tag; its snapshot becomes expirable again. True if it existed. */
  def removeTag(catalog: String, ident: Seq[String], name: String): Boolean = {
    val k = (catalog +: ident).mkString(SnapshotStore.Sep)
    SnapshotStore.update(k)(st => st.copy(tags = st.tags - name)) match {
      case (before, _) => before.tags.contains(name)
    }
  }

  /** Roll the live table back to `toVersion`'s state (Iceberg
    * `rollback_to_snapshot`) by COMMITTING A NEW SNAPSHOT that re-references
    * that version's data files — a pure metadata operation, no data copy.
    * History stays monotonic and auditable (the bad commits remain
    * time-travelable until expired) and every concurrent reader keeps its
    * pinned view. Returns the new snapshot's version. */
  def rollback(catalog: String, ident: Seq[String], toVersion: Long): Long = {
    val k = (catalog +: ident).mkString(SnapshotStore.Sep)
    SnapshotStore.update(k) { st =>
      val target =
        if (toVersion == 0L) None
        else Some(st.snapshots.find(_.version == toVersion).getOrElse(
          throw new IllegalArgumentException(
            s"cannot roll back to version $toVersion: not a live snapshot " +
              s"(have ${st.snapshots.map(_.version).mkString("[", ", ", "]")})")))
      st.copy(snapshots = st.snapshots :+
        SnapshotStore.Snapshot(st.nextVersion, SnapshotStore.nowMicros(),
          target.fold(Vector.empty[SnapshotStore.DataFile])(_.files),
          schema = st.schema,
          deleteFiles = target.fold(
            Vector.empty[SnapshotStore.DeleteFile])(_.deleteFiles),
          operation = "rollback"))
    } match {
      case (_, after) => after.snapshots.last.version
    }
  }

  /** Create a BRANCH at the table's current version (Iceberg
    * `create_branch`): a named fork whose appends stage OUTSIDE the main
    * log — the write half of write-audit-publish. Read it via
    * `SELECT … FROM t.branch_<name>` or `VERSION AS OF '<name>'`; write
    * with `INSERT INTO t.branch_<name>`; publish with [[fastForward]]. */
  def createBranch(catalog: String, ident: Seq[String], name: String): Long = {
    require(name.nonEmpty, "branch name must be non-empty")
    require(name.toLongOption.isEmpty,
      s"branch name '$name' would be ambiguous with a numeric snapshot version")
    val k = SnapshotStore.keyOf(catalog, ident)
    SnapshotStore.update(k) { st =>
      require(!st.branches.contains(name), s"branch '$name' already exists")
      require(!st.tags.contains(name),
        s"'$name' is already a tag of this table — tags and branches share " +
          "the VERSION AS OF namespace")
      val base = if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
      st.copy(branches = st.branches +
        (name -> SnapshotStore.Branch(base, Vector.empty)))
    } match { case (_, after) => after.branches(name).base }
  }

  /** Drop a branch; its staged (unpublished) data files are physically
    * deleted unless another ref still references them. True if it existed. */
  def dropBranch(catalog: String, ident: Seq[String], name: String): Boolean = {
    val k = SnapshotStore.keyOf(catalog, ident)
    val (before, after) = SnapshotStore.update(k)(st =>
      st.copy(branches = st.branches - name))
    before.branches.get(name) match {
      case None => false
      case Some(br) =>
        // GC: the branch's appended files minus anything main or another
        // branch still references (branch snapshots CARRY base files too —
        // only the genuinely branch-local ones may die).
        val keep = (after.snapshots.iterator.flatMap(_.files) ++
          after.branches.valuesIterator.flatMap(_.snapshots).flatMap(_.files))
          .map(_.path).toSet
        val mine = br.snapshots.iterator.flatMap(_.files).map(_.path).toSet
        RowFiles.delete(mine -- keep)
        true
    }
  }

  /** PUBLISH a branch (Iceberg `fast_forward`): splice its staged commits
    * onto the main log and drop the ref — every staged version becomes a
    * real, time-travelable main version in one atomic step, and the
    * append-only stream tailing the table delivers them in order. Fails
    * loudly if main advanced past the fork point (replaying staged commits
    * onto a moved base would silently interleave histories — rebase is a
    * decision, not a default). Returns the new head version. */
  def fastForward(catalog: String, ident: Seq[String], name: String): Long = {
    val k = SnapshotStore.keyOf(catalog, ident)
    SnapshotStore.update(k) { st =>
      val br = st.branches.getOrElse(name, throw new IllegalArgumentException(
        s"branch '$name' does not exist; " +
          s"branches: ${st.branches.keys.toSeq.sorted.mkString("[", ", ", "]")}"))
      val live = if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
      if (live != br.base) throw new IllegalStateException(
        s"cannot fast-forward branch '$name': it forked at v${br.base} but " +
          s"the table is now at v$live — drop the branch, re-stage its " +
          "writes on a fresh fork, or CALL <catalog>.system." +
          "cherrypick_snapshot to replay it onto the moved head")
      st.copy(snapshots = st.snapshots ++ br.snapshots,
        branches = st.branches - name)
    } match {
      case (_, after) =>
        if (after.snapshots.isEmpty) 0L else after.snapshots.last.version
    }
  }

  /** CHERRY-PICK (Iceberg `cherrypick_snapshot`): re-apply a commit's
    * FILE DELTA onto the CURRENT head as a fresh commit, with OCC
    * conflict detection — the publish path [[fastForward]]'s moved-main
    * refusal leaves closed. Two addressable sources:
    *
    *   - a MAIN-HISTORY VERSION (numeric `ref`): the delta of that
    *     commit against its immediate predecessor replays onto the head
    *     — re-applying a commit orphaned by `rollback_to_version`;
    *   - a BRANCH NAME: every staged commit replays in order onto the
    *     advanced head (fast-forward's dead end: the fork base moved),
    *     then the ref drops exactly like a publish.
    *
    * OCC rule — overlapping FILE ops are loud, never merged: a delta
    * that REMOVES a file the head no longer references (rewritten or
    * expired by a commit that landed since), ADDS a path the head
    * already references, or targets a delete structure at a data file
    * the head dropped, conflicts — both histories touched the same
    * file, and replaying would silently undo one of them. Disjoint
    * deltas (the append-only staged-branch case, or a rolled-back
    * rewrite whose inputs are untouched) apply cleanly.
    *
    * Replayed ADDED files are re-stamped with the NEW commit's sequence
    * number: equality deletes that landed on main between the source
    * commit and the head apply only to files OLDER than themselves, and
    * a cherry-picked row is logically re-appended NOW (Iceberg assigns
    * cherry-picked snapshots fresh sequence numbers for the same
    * reason). Returns the new head version. */
  def cherrypick(catalog: String, ident: Seq[String], ref: String): Long = {
    val k = SnapshotStore.keyOf(catalog, ident)
    SnapshotStore.update(k) { st =>
      def headOf(snaps: Vector[SnapshotStore.Snapshot]):
          (Vector[SnapshotStore.DataFile], Vector[SnapshotStore.DeleteFile]) =
        snaps.lastOption.map(s => (s.files, s.deleteFiles))
          .getOrElse((Vector.empty, Vector.empty))

      /** Replay `s`'s delta vs (prevFiles, prevDeletes) onto the running
        * head as version `v`; loud on any overlapping file op. */
      def applyDelta(s: SnapshotStore.Snapshot,
          prevFiles: Vector[SnapshotStore.DataFile],
          prevDeletes: Vector[SnapshotStore.DeleteFile],
          curFiles: Vector[SnapshotStore.DataFile],
          curDeletes: Vector[SnapshotStore.DeleteFile], v: Long):
          SnapshotStore.Snapshot = {
        def conflict(what: String): Nothing = throw new IllegalStateException(
          s"cannot cherry-pick '$ref' onto the moved head of " +
            s"${ident.mkString(".")}: $what — the histories touched the " +
            "same file; resolve on a fresh fork (rebase is a decision, " +
            "not a default)")
        val prevPaths = prevFiles.iterator.map(_.path).toSet
        val sPaths = s.files.iterator.map(_.path).toSet
        val added = s.files.filterNot(f => prevPaths(f.path))
        val removed = prevFiles.filterNot(f => sPaths(f.path))
        val prevDel = prevDeletes.iterator.map(_.path).toSet
        val sDel = s.deleteFiles.iterator.map(_.path).toSet
        val addedDel = s.deleteFiles.filterNot(d => prevDel(d.path))
        val removedDel = prevDeletes.filterNot(d => sDel(d.path))
        val curPaths = curFiles.iterator.map(_.path).toSet
        val curDelPaths = curDeletes.iterator.map(_.path).toSet
        removed.find(f => !curPaths(f.path)).foreach(f => conflict(
          s"source v${s.version} rewrites ${f.path}, which the head no " +
            "longer references"))
        added.find(f => curPaths(f.path)).foreach(f => conflict(
          s"source v${s.version} adds ${f.path}, which the head already " +
            "references"))
        addedDel.find(d => d.dataPath.nonEmpty && !curPaths(d.dataPath))
          .foreach(d => conflict(
            s"source v${s.version} deletes rows of ${d.dataPath}, which " +
              "the head no longer references"))
        // The one-delete-structure-per-data-file invariant (DV merge-fold)
        // must survive the replay: the head growing its OWN vector for the
        // same data file since the fork is a row-level conflict.
        addedDel.find(d => d.kind == "dv" && curDeletes.exists(c =>
          c.kind == "dv" && c.dataPath == d.dataPath)).foreach(d => conflict(
          s"source v${s.version} and the head both carry deletion " +
            s"vectors for ${d.dataPath}"))
        removedDel.find(d => !curDelPaths(d.path)).foreach(d => conflict(
          s"source v${s.version} folds delete file ${d.path}, which the " +
            "head no longer references"))
        val removedSet = removed.iterator.map(_.path).toSet
        val removedDelSet = removedDel.iterator.map(_.path).toSet
        // Appends land LAST (the appendedFiles suffix contract); added
        // entries re-stamp to the new commit's sequence number.
        val newFiles = curFiles.filterNot(f => removedSet(f.path)) ++
          added.map(_.copy(seq = v))
        val newDeletes = curDeletes.filterNot(d => removedDelSet(d.path)) ++
          addedDel.map(_.copy(seq = v))
        val pureAppend = s.appendedFiles >= 0 && removed.isEmpty &&
          addedDel.isEmpty && removedDel.isEmpty
        SnapshotStore.Snapshot(v, SnapshotStore.nowMicros(), newFiles,
          appendedFiles = if (pureAppend) added.size else -1,
          schema = st.schema, deleteFiles = newDeletes,
          operation = s.operation)
      }

      st.branches.get(ref) match {
        case Some(br) =>
          val live = if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
          if (live == br.base)
            // Unmoved main: identical to fast_forward's splice.
            st.copy(snapshots = st.snapshots ++ br.snapshots,
              branches = st.branches - ref)
          else {
            // Fork-base state (expire shields fork bases while the ref
            // lives, so a miss means genuinely unreachable history).
            var (pf, pd) =
              if (br.base == 0L)
                (Vector.empty[SnapshotStore.DataFile],
                  Vector.empty[SnapshotStore.DeleteFile])
              else st.snapshots.find(_.version == br.base)
                .map(s => (s.files, s.deleteFiles))
                .getOrElse(throw new IllegalStateException(
                  s"cannot cherry-pick branch '$ref': its fork base " +
                    s"v${br.base} is no longer in the snapshot log"))
            var snaps = st.snapshots
            var v = live
            br.snapshots.foreach { s =>
              v += 1
              val (cf, cd) = headOf(snaps)
              snaps :+= applyDelta(s, pf, pd, cf, cd, v)
              pf = s.files; pd = s.deleteFiles
            }
            st.copy(snapshots = snaps, branches = st.branches - ref)
          }
        case None =>
          val version = ref.toLongOption.getOrElse(
            throw new IllegalArgumentException(
              s"cherrypick_snapshot: '$ref' is neither a branch of " +
                s"${ident.mkString(".")} nor a numeric snapshot version; " +
                s"branches: ${st.branches.keys.toSeq.sorted
                  .mkString("[", ", ", "]")}"))
          val idx = st.snapshots.indexWhere(_.version == version)
          require(idx >= 0,
            s"cannot cherry-pick version $version: not a live snapshot " +
              s"(have ${st.snapshots.map(_.version).mkString("[", ", ", "]")})")
          val src = st.snapshots(idx)
          // The delta needs the TRUE immediate predecessor (version - 1);
          // an expired gap makes the delta unreconstructable.
          val (pf, pd) =
            if (version == st.snapshots.head.version && version == 1L)
              (Vector.empty[SnapshotStore.DataFile],
                Vector.empty[SnapshotStore.DeleteFile])
            else {
              require(idx > 0 && st.snapshots(idx - 1).version == version - 1,
                s"cannot cherry-pick version $version: its predecessor " +
                  s"v${version - 1} was expired, so the commit's delta is " +
                  "unreconstructable")
              (st.snapshots(idx - 1).files, st.snapshots(idx - 1).deleteFiles)
            }
          val (cf, cd) = headOf(st.snapshots)
          val v = st.snapshots.last.version + 1
          st.copy(snapshots = st.snapshots :+ applyDelta(src, pf, pd, cf, cd, v))
      }
    } match {
      case (_, after) =>
        if (after.snapshots.isEmpty) 0L else after.snapshots.last.version
    }
  }

  /** The snapshot history of a table: (version, commit micros, row count) —
    * the metadata surface `DESCRIBE HISTORY` exposes on lakehouse tables. */
  def history(catalog: String, ident: Seq[String]): Seq[(Long, Long, Long)] = {
    val k = (catalog +: ident).mkString(SnapshotStore.Sep)
    SnapshotStore.resolve(k).toSeq.flatMap(_.snapshots)
      .map(s => (s.version, s.commitMicros, s.files.map(_.rowCount).sum))
  }

  /** Orphan-file GC (Iceberg's `remove_orphan_files`): delete files under
    * the table's data directory that NO snapshot, delete file, or branch
    * references — the crash residue this procedure exists for (a JVM dying
    * between task file writes and the driver-side commit leaves files no
    * abort() ever saw). Only files older than `olderThanMicros` (wall
    * clock) are touched: an IN-FLIGHT writer's files are unreferenced by
    * definition until their commit lands, so an age floor is the safety
    * contract (Iceberg defaults to 3 days for the same reason). Returns
    * the deleted paths; `dryRun` lists without deleting. */
  def removeOrphanFiles(catalog: String, ident: Seq[String],
      olderThanMicros: Long, dryRun: Boolean = false): Seq[String] = {
    val k = SnapshotStore.keyOf(catalog, ident)
    val dir = new Path(SnapshotStore.stateOf(k).dataDir)
    val fs = RowFiles.fs(dir)
    if (!fs.exists(dir)) return Nil
    // Manifests may record scheme-less paths while the listing yields
    // qualified ones (file:/…): compare both sides fully qualified, or
    // every referenced file would read as an orphan — a total-data-loss
    // class of bug for a GC.
    def qualified(p: String): String = fs.makeQualified(new Path(p)).toString
    val cutoffMillis = olderThanMicros / 1000L
    val iter = fs.listFiles(dir, true)
    val aged = Iterator.continually(iter)
      .takeWhile(_.hasNext).map(_.next())
      .filter(f => f.isFile && f.getModificationTime < cutoffMillis)
      .map(f => qualified(f.getPath.toString))
      // The metadata log (v<N>.json + manifests) is referenced by the log
      // STRUCTURE, not by manifests — a GC that judged it by manifest
      // reference would delete the table's own commit history. Both sides
      // qualified: a substring match would also shield the DATA of any
      // table merely named/namespaced "metadata".
      .filterNot(p => MetadataLog.isMetadataPath(qualified(dir.toString), p))
      .toVector
    // Capture the referenced set AFTER the (potentially long) listing: any
    // commit landing mid-listing is then in the set before its files could
    // be judged — only a writer whose write-to-commit latency exceeds the
    // age floor remains exposed, which is the floor's documented contract.
    val st = SnapshotStore.stateOf(k)
    val referenced =
      (st.snapshots.iterator ++ st.branches.valuesIterator.flatMap(_.snapshots))
        .flatMap(sn => sn.files.iterator.map(_.path) ++
          sn.deleteFiles.iterator.map(_.path))
        .map(qualified).toSet
    val orphans = aged.filterNot(referenced)
    if (!dryRun) {
      // A GC that swallows delete failures and reports success leaves the
      // operator believing residue is gone — fail loudly instead. The
      // failure test is "does the path still exist afterwards", not
      // delete()'s return value: Hadoop returns false for an already-gone
      // path, and a concurrent expire()/dropBranch/second GC removing the
      // same orphan between listing and delete reached the desired end
      // state — aborting on that benign race would report failure for a
      // file that is, in fact, gone.
      val failed = orphans.filter { p =>
        try { fs.delete(new Path(p), false); fs.exists(new Path(p)) }
        catch { case _: java.io.IOException => true }
      }
      if (failed.nonEmpty) throw new IllegalStateException(
        s"remove_orphan_files: ${failed.size} of ${orphans.size} orphan(s) " +
          s"could not be deleted, e.g. ${failed.take(3).mkString(", ")}")
    }
    orphans
  }

  /** PARTITION-SPEC EVOLUTION (Iceberg's per-file specs): re-partition the
    * TABLE without touching a single data file. The current spec retires
    * into [[SnapshotStore.TableState.specHistory]] under its id (with its
    * partition-value types stored SELF-CONTAINED, so later renames/drops of
    * its source columns never orphan old files' values); new writes land
    * under the new spec; scans prune every file through ITS OWN spec.
    * `spec` is a comma list of `col`, `days|hours|months|years(col)`,
    * `bucket(n, col)`, `truncate(w, col)`; empty = unpartitioned.
    * Compaction rewrites everything under the current spec, which is how a
    * table eventually converges to one spec. Exposed as
    * `CALL <catalog>.system.evolve_partition_spec(table, spec)`. */
  def evolvePartitionSpec(catalog: String, ident: Seq[String],
      spec: String): Int = {
    val k = SnapshotStore.keyOf(catalog, ident)
    val parsed = parseSpecString(spec)
    SnapshotStore.update(k) { st =>
      parsed.foreach { case (c, t) =>
        require(st.schema.fieldNames.exists(_.equalsIgnoreCase(c)),
          s"partition column $c is not in the table schema")
        require(t.accepts(st.schema(st.schema.fieldNames
            .find(_.equalsIgnoreCase(c)).get).dataType),
          s"partition transform ${t.name} does not accept column $c's type")
      }
      require(parsed.map(_._1.toLowerCase).distinct.length == parsed.length,
        "duplicate partition source column — one transform per source column")
      if (parsed.map(_._1) == st.partitionCols &&
          parsed.map(_._2) == st.transformsOrIdentity) st // no-op re-spec
      else {
        val retired = st.partitionCols.zip(st.transformsOrIdentity)
          .zip(st.partitionValueTypes)
          .map { case ((c, t), dt) => (c, t.name, dt.json) }
        st.copy(
          partitionCols = parsed.map(_._1),
          partitionTransforms = parsed.map(_._2),
          currentSpecId = st.currentSpecId + 1,
          specHistory = st.specHistory + (st.currentSpecId -> retired))
      }
    }
    SnapshotStore.stateOf(k).currentSpecId
  }

  /** ONE spec field, for `ALTER TABLE … ADD/DROP PARTITION FIELD`. */
  private[graft] def parseSpecField(text: String): (String, PTransform) =
    parseSpecString(text) match {
      case Seq(one) => one
      case other => throw new IllegalArgumentException(
        s"expected exactly one partition field, got '$text' (${other.length})")
    }

  /** The CURRENT spec's (source column, transform) list. */
  private[graft] def currentSpecFields(catalog: String,
      ident: Seq[String]): Seq[(String, PTransform)] = {
    val st = SnapshotStore.stateOf(SnapshotStore.keyOf(catalog, ident))
    st.partitionCols.zip(st.transformsOrIdentity)
  }

  /** Render a spec list back to the procedure-argument string form. */
  private[graft] def renderSpec(fields: Seq[(String, PTransform)]): String =
    fields.map {
      case (c, PIdentity) => c
      case (c, PBucket(n)) => s"bucket($n, $c)"
      case (c, PTruncate(w)) => s"truncate($w, $c)"
      case (c, t) => s"${t.name}($c)"
    }.mkString(", ")

  /** Parse "days(ts), bucket(8, id), region" into (source col, transform)
    * pairs — the procedure-argument form of CREATE's PARTITIONED BY. */
  private[sources] def parseSpecString(spec: String): Seq[(String, PTransform)] =
    spec.trim match {
      case "" => Nil
      case str =>
        // Split at TOP-LEVEL commas only — "bucket(4, id)" is one item.
        val items = Seq.newBuilder[String]
        var depth = 0
        var start = 0
        str.zipWithIndex.foreach { case (ch, i) =>
          ch match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 0 =>
              items += str.substring(start, i); start = i + 1
            case _ => ()
          }
        }
        items += str.substring(start)
        items.result().map(_.trim).map { item =>
        val m = java.util.regex.Pattern
          .compile("(?i)^(days|hours|months|years)\\(\\s*([\\w.]+)\\s*\\)$")
          .matcher(item)
        val mb = java.util.regex.Pattern
          .compile("(?i)^(bucket|truncate)\\(\\s*(\\d+)\\s*,\\s*([\\w.]+)\\s*\\)$")
          .matcher(item)
        if (m.matches())
          (m.group(2), PTransform.fromName(m.group(1).toLowerCase))
        else if (mb.matches()) {
          val n = mb.group(2).toInt
          (mb.group(3), PTransform.fromName(
            s"${mb.group(1).toLowerCase}[$n]"))
        } else {
          require(item.matches("[\\w.]+"),
            s"cannot parse partition spec item '$item' — expected col, " +
              "days|hours|months|years(col), bucket(n, col), or truncate(w, col)")
          (item, PIdentity)
        }
      }
    }

  /** Small-file compaction (Iceberg's `rewrite_data_files`): every commit
    * adds its own file set, so a hot table degrades into many small files —
    * scan-task explosion, the #1 operational failure of file-backed
    * tables. Rewrites the live data as one truncate-overwrite commit shaped
    * to one file per partition (partitioned tables; the clustering
    * repartition guarantees it regardless of `write.distribution-mode`) or
    * ⌈rows / targetFileRows⌉ files (unpartitioned). Snapshot semantics make
    * the self-read safe: the SELECT pins the pre-compaction file list, the
    * commit only retires references, and files are physically deleted only
    * by [[expire]] — so history (time travel, tags) survives compaction
    * intact. The commit is a REWRITE: an append-only stream tailing the
    * table must pass it via its own offset management (same contract as
    * Iceberg's rewrite commits). Returns (files before, files after). */
  def compact(spark: org.apache.spark.sql.SparkSession, catalog: String,
      ident: Seq[String], targetFileRows: Long = 1L << 20,
      /** PARTITION-SCOPED compaction (`where`): rewrite only the
        * partitions a predicate selects — at 100 TB nobody compacts the
        * whole table; the nightly job compacts yesterday's partition.
        * The predicate must be decidable from identity-partition values
        * (whole files retire or survive; the write path validates
        * loudly), and the commit is the same atomic content-neutral
        * `replace`: rows of the selected partitions re-insert reshaped,
        * every other partition's files survive BY PATH IDENTITY, and
        * NULL-partition rows are untouched (a predicate that evaluates
        * NULL on them neither filters them in nor retires their files —
        * the retire set and the re-insert set agree exactly). */
      where: Option[String] = None): (Int, Int) = {
    require(targetFileRows >= 1, s"targetFileRows must be >= 1, got $targetFileRows")
    val k = SnapshotStore.keyOf(catalog, ident)
    val st = SnapshotStore.stateOf(k)
    val before = st.currentFiles.size
    // Fail-fast: a malformed histogram property must fail the procedure
    // BEFORE the rewrite commits, not after.
    StatsHistograms.validate(st.properties)
    val name = (catalog +: ident).map(p => s"`$p`").mkString(".")
    import org.apache.spark.sql.functions.{col, lit}
    val df = spark.table(name)
    // Declared clustering (`write.sort-order`): compaction RESTORES it —
    // partitioned tables re-sort within each partition's file; an
    // unpartitioned table RANGE-repartitions on the sort key so each
    // output file covers a disjoint range (tight stats -> fewer files
    // opened by a sort-key range predicate). A `zorder(a, b)` spec
    // clusters by the MORTON key instead, with each dimension
    // NORMALIZED off the manifest's global min/max (metadata-only): the
    // low-31-bit interleave then spends its bits on the occupied range,
    // so both dimensions' per-file stats come out tight however wide the
    // raw domains — the Iceberg OPTIMIZE ZORDER strategy as a declared,
    // restorable layout.
    val order = SortOrders.of(st.properties, st.schema)
    val zorder = SortOrders.zorderOf(st.properties, st.schema)
    def zKeyCol: org.apache.spark.sql.Column = {
      import org.apache.spark.sql.functions.shiftright
      val (a, b) = zorder.get
      def norm(c: String): org.apache.spark.sql.Column = {
        val raw = col(c).cast("long")
        val fidOpt = st.schema.fields.find(_.name.equalsIgnoreCase(c))
          .flatMap(FieldIds.idOf)
        def numLong(v: Any): Long = v.asInstanceOf[Number].longValue
        val boundsOpt = fidOpt.flatMap { fid =>
          // Per-file verdicts: Some(Some(range)) = usable, Some(None) =
          // all-null file (no contribution), None = stats unknown — any
          // unknown file drops normalization (raw key still correct).
          val per = st.currentFiles.map { f =>
            f.stats.get(fid) match {
              case Some(cs) if cs.min != null && cs.max != null =>
                Some(Some((numLong(cs.min), numLong(cs.max))))
              case Some(cs) if cs.min == null && cs.nulls == f.rowCount =>
                Some(None)
              case _ => None
            }
          }
          if (per.exists(_.isEmpty)) None
          else {
            val bs = per.flatten.flatten
            if (bs.isEmpty) None
            else Some((bs.map(_._1).min, bs.map(_._2).max))
          }
        }
        boundsOpt match {
          case Some((mn, mx)) =>
            // Align the dimension to the FULL 31-bit window: wide
            // domains shift down, narrow ones shift UP — interleaving
            // only tiles both dimensions when they occupy the same bit
            // width (a 5-bit column against a 38-bit one would leave
            // the narrow dimension in the Morton key's noise bits, and
            // the layout would degenerate to a linear sort of the wide
            // one).
            val range = BigInt(mx) - BigInt(mn)
            val bits = range.bitLength
            if (bits >= 31) shiftright(raw - lit(mn), bits - 31)
            else org.apache.spark.sql.functions.shiftleft(
              raw - lit(mn), 31 - bits)
          case None => raw
        }
      }
      graft.operators.ZOrder.zKey(norm(a), norm(b), 31)
    }
    def sortCols = order.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }
    where.map(_.trim).filter(_.nonEmpty) match {
      case Some(w) =>
        require(st.partitionCols.nonEmpty,
          "rewrite_data_files(where => …) compacts selected PARTITIONS — " +
            s"$name is unpartitioned; compact it whole (omit `where`)")
        // Friendly pre-check (the write path re-validates structurally):
        // the predicate may reference only identity partition columns —
        // whole files must retire or survive.
        val identCols = st.partitionCols.zip(st.transformsOrIdentity)
          .collect { case (c, tr) if tr.isIdentity => c.toLowerCase }.toSet
        val refs = spark.sessionState.sqlParser.parseExpression(w).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.name.toLowerCase
        }
        val bad = refs.filterNot(identCols).distinct
        require(bad.isEmpty,
          "rewrite_data_files(where => …) predicates must reference only " +
            s"IDENTITY partition columns ${identCols.toSeq.sorted
              .mkString("(", ", ", ")")} — whole files must retire or " +
            s"survive; got non-partition reference(s): ${bad.mkString(", ")}")
        val cond = org.apache.spark.sql.functions.expr(w)
        // Shape exactly like full partitioned compaction, over the
        // selected partitions only; `overwrite(cond)` retires precisely
        // the files whose partition values DEFINITELY satisfy the
        // predicate, which is the same row set the filter kept.
        val r = df.filter(cond).repartition(st.partitionCols.map(col): _*)
        val scoped =
          if (zorder.nonEmpty) r.sortWithinPartitions(zKeyCol)
          else if (order.nonEmpty) r.sortWithinPartitions(sortCols: _*)
          else r
        compactPermit.set(compactPermit.get() + k)
        try scoped.writeTo(name).option("graft.operation", "replace")
          .overwrite(cond)
        finally compactPermit.set(compactPermit.get() - k)
        // No histogram collection here: stored bins describe the WHOLE
        // table, and a scoped rewrite read only a slice — whole-table
        // collection belongs to full compaction or CALL collect_stats.
        return (before, SnapshotStore.stateOf(k).currentFiles.size)
      case None => ()
    }
    val shaped =
      if (st.partitionCols.nonEmpty) {
        val r = df.repartition(st.partitionCols.map(col): _*)
        if (zorder.nonEmpty) r.sortWithinPartitions(zKeyCol)
        else if (order.nonEmpty) r.sortWithinPartitions(sortCols: _*) else r
      } else {
        val rows = st.currentFiles.map(_.rowCount).sum
        val n = math.max(1, math.ceil(rows.toDouble / targetFileRows).toInt)
        if (zorder.nonEmpty)
          df.repartitionByRange(n, zKeyCol).sortWithinPartitions(zKeyCol)
        else if (order.nonEmpty)
          df.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)
        else df.repartition(n)
      }
    // `graft.operation=replace` stamps the snapshot as a compaction — the
    // files change, the logical rows do not, so the change feed skips it
    // (Iceberg excludes REPLACE snapshots from changelog scans the same way).
    // On MV backing tables the stamp is permit-fenced (newWriteBuilder):
    // MV recovery trusts replace commits as content-neutral, so only the
    // engine's own compaction may claim one there.
    compactPermit.set(compactPermit.get() + k)
    try shaped.writeTo(name).option("graft.operation", "replace").overwrite(lit(true))
    finally compactPermit.set(compactPermit.get() - k)
    // Equi-height histograms for opted-in columns ride compaction — the
    // one moment the engine already rewrites every live row (see
    // [[StatsHistograms]]); stored against the fresh snapshot version.
    // (Property validation ran BEFORE the rewrite committed.) Collection
    // runs AFTER the rewrite has already landed, so a runtime failure in
    // its aggregate queries must not fail the procedure for a state
    // change that succeeded — stats are an optimization; a retry (or
    // CALL collect_stats) re-collects.
    try StatsHistograms.collect(spark, catalog, ident)
    catch {
      case e: Exception => org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"histogram collection after compacting ${SnapshotStore.dotted(k)} " +
          s"failed (the compaction itself committed): ${e.getMessage}")
    }
    (before, SnapshotStore.stateOf(k).currentFiles.size)
  }

  /** Test/gate hygiene: drop every table (and its data files) and namespace
    * this JVM has registered under `catalog`, so re-runs converge from a
    * clean slate. */
  def reset(catalog: String): Unit = {
    val prefix = catalog + SnapshotStore.Sep
    SnapshotStore.tables.keys.filter(_.startsWith(prefix))
      .foreach(SnapshotStore.dropTableAndData)
    SnapshotStore.namespaces.keys.filter(_.startsWith(prefix))
      .foreach(SnapshotStore.namespaces.remove)
    // The durable log: wipe the catalog's warehouse subtree too, so a
    // re-run converges from a genuinely clean slate (tables a previous
    // session left behind included).
    SnapshotStore.warehouses.get(catalog).foreach { wh =>
      RowFiles.deleteDir(new Path(wh, catalog).toString)
    }
  }
}

/** JVM-wide backing store: per table, a vector of snapshots, each a list of
  * data-file descriptors — METADATA ONLY (path, partition values, row
  * count). Shared across sessions like a real catalog's metastore; row data
  * lives in the files and never passes through this object. */
private[graft] object SnapshotStore {

  /** One immutable data file: rows live at `path` (UnsafeRow stream, see
    * [[RowFiles]]), `partitionValues` are the file's constant identity-
    * partition values in table partition-column order (empty for
    * unpartitioned tables), `rowCount` sizes scan partitions without
    * opening the file. */
  final case class DataFile(path: String, partitionValues: Seq[Any], rowCount: Long,
      /** Per-column (min, max, nullCount) collected at write — the
        * manifest stats scans skip files on (see [[StatsPredicates]]).
        * Keyed by FIELD ID (stable across renames); absent = no stats
        * (pre-stats file, or the column's values invalidated tracking). */
      stats: Map[Int, ColStats] = Map.empty,
      /** File byte size (0 = unknown, legacy descriptor). */
      sizeBytes: Long = 0L,
      /** (rowOffset, byteOffset) starts of independently readable chunks
        * (parquet row groups / grf checkpoints), first chunk included —
        * scan planning cuts one big file into several tasks on these
        * boundaries without opening it (Iceberg's `split_offsets`).
        * Empty/singleton = unsplittable. */
      splitPoints: Vector[(Long, Long)] = Vector.empty,
      /** The snapshot version whose commit first added this file —
        * Iceberg's data sequence number: an equality-delete file applies
        * exactly to data files with a LOWER seq. 0 = legacy descriptor
        * (predates sequence tracking, treated as older-than-everything). */
      seq: Long = 0L,
      /** The (field id, name) column list the file was WRITTEN under, in
        * the file's physical column order — the self-contained mapping
        * that lets readers resolve requested columns by FIELD ID against
        * any file, making RENAME/DROP safe with history intact (Iceberg
        * stores field ids inside each data file; the manifest entry is
        * this catalog's equivalent). Empty = legacy file: resolved
        * positionally against the scan schema, valid only while the
        * schema evolved append-only. */
      writeCols: Vector[(Int, String)] = Vector.empty,
      /** The PARTITION SPEC this file was written under (Iceberg's
        * per-file spec id): `partitionValues` are shaped/typed by that
        * spec, and pruning consults it — never the current spec — for
        * this file. 0 = the original spec. */
      specId: Int = 0,
      /** The normalized `write.sort-order` this file's rows were SORTED
        * under at write ([[SortOrders.normalize]]) — stamped by writes
        * that enforced an ordering (sorted appends, compaction). "" =
        * unsorted/unknown. When EVERY scanned file carries the table's
        * CURRENT order, the scan reports it (`SupportsReportOrdering`)
        * and Spark elides Sort nodes over the sort key. */
      sortKey: String = "")

  /** A partition-value tuple normalized for CONTENT equality: Array[Byte]
    * values (identity transform over a binary column) compare by
    * reference inside Seq equality/hashing — every grouping or set
    * membership over partition tuples must go through this, or binary-
    * partitioned tables silently never match themselves (the dynamic-
    * overwrite and KeyGroupedPartitioning trap). */
  def comparablePartition(values: Seq[Any]): Seq[Any] =
    values.map {
      case a: Array[Byte] => a.toSeq
      case v => v
    }

  /** Content-equal wrapper for [[NdvSketch]] registers — a bare Array
    * field would give every enclosing case class REFERENCE equality,
    * silently breaking manifest round-trip comparisons. */
  final case class Ndv(registers: Array[Byte]) {
    override def equals(o: Any): Boolean = o match {
      case n: Ndv => java.util.Arrays.equals(registers, n.registers)
      case _ => false
    }
    override def hashCode(): Int = java.util.Arrays.hashCode(registers)
  }

  /** Content-equal wrapper for a serialized [[FileBloom]] filter (same
    * reference-equality trap as [[Ndv]]). */
  final case class Bloom(bytes: Array[Byte]) {
    override def equals(o: Any): Boolean = o match {
      case b: Bloom => java.util.Arrays.equals(bytes, b.bytes)
      case _ => false
    }
    override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
  }

  /** One column's per-file stats. `min`/`max` are Catalyst-internal values
    * of the column's type over the file's NON-NULL rows; both null with
    * `nulls == rowCount` marks an all-null column. `ndv` is the column's
    * [[NdvSketch]] registers (HLL, mergeable at plan time), null when the
    * file predates sketches or the column's tracking was invalidated.
    * `lenSum`/`lenMax` (STRING columns; -1 = untracked) are total and
    * max VALUE BYTES over non-null rows — the sum form merges exactly at
    * plan time into CBO's avgLen/maxLen, and tracking survives the
    * long-string min/max invalidation (where width estimation matters
    * most: a 1 KB-string column estimated at the 20-byte default is what
    * mis-sizes every downstream plan). */
  final case class ColStats(min: Any, max: Any, nulls: Long,
      ndv: Ndv = null, lenSum: Long = -1L, lenMax: Long = -1L,
      /** Serialized [[FileBloom]] point-membership filter (opt-in via
        * `stats.bloom-columns`); null = not collected. Hash-canonical
        * across type widening like `ndv`. */
      bloom: Bloom = null)

  /** lowercased-independent field id → live type map of `schema` — the
    * comparison context for stats-range pruning. */
  def idTypes(schema: StructType): Map[Int, DataType] =
    schema.fields.iterator.flatMap(f =>
      FieldIds.idOf(f).map(_ -> f.dataType)).toMap

  /** Per-SPEC pruning contexts: identity-column maps for every spec
    * (current + retired), transform fields for the CURRENT spec only —
    * a retired spec's transform may have been computed under a since-
    * evolved source type, so its files prune via identity values alone
    * (sound: pruning is best-effort, predicates stay residual). Retired
    * identity entries carry the STORED value type; a predicate typed
    * differently (source column later widened) simply fails the
    * evaluability gate and keeps the file. */
  def specPruningOf(st: TableState):
      Map[Int, (PartitionPredicates.PartCols, Seq[TransformPruning.TField])] =
    (st.specHistory.keySet + st.currentSpecId).iterator.map { id =>
      val (cols, tfs, pvT) = st.specOf(id)
      val pc: PartitionPredicates.PartCols =
        cols.zip(tfs).zipWithIndex.collect {
          case ((c, t), i) if t.isIdentity => c.toLowerCase -> (i, pvT(i))
        }.toMap
      val tf =
        if (id == st.currentSpecId)
          TransformPruning.fieldsOf(cols, tfs, st.schema)
        else Nil
      id -> (pc, tf)
    }.toMap

  /** Commit-side guard for partition-spec evolution races: every NEW
    * file's descriptor carries the spec its partition values were SHAPED
    * by (stamped at write planning); a commit landing after a concurrent
    * `evolve_partition_spec` is a LOUD conflict — the alternative is a
    * mislabeled file whose tuple is decoded under the wrong spec. */
  def requireCurrentSpec(st: TableState, newFiles: Vector[DataFile]): Unit =
    newFiles.find(_.specId != st.currentSpecId).foreach(f =>
      throw new IllegalStateException(
        s"concurrent partition-spec evolution on ${st.dataDir}: the write " +
          s"planned under spec ${f.specId} but the table is now on spec " +
          s"${st.currentSpecId} — rerun the statement"))

  /** Identity-position maps per spec for CHUNK-summary pruning: column
    * name → (partition POSITION, value type) — the StatCols shape, so
    * chunk ranges prune through [[StatsPredicates]] verbatim. */
  def specIdentCols(st: TableState): Map[Int, Map[String, (Int, DataType)]] =
    (st.specHistory.keySet + st.currentSpecId).iterator.map { id =>
      val (cols, tfs, pvT) = st.specOf(id)
      id -> cols.zip(tfs).zipWithIndex.collect {
        case ((c, t), i) if t.isIdentity => c.toLowerCase -> (i, pvT(i))
      }.toMap
    }.toMap

  /** Does equality-delete `d` possibly apply to data file `f`? Sequence
    * rule first (a delete hits strictly OLDER files); then KEY-RANGE
    * pruning: a key tuple can only match if EVERY key column's value
    * ranges overlap, so ONE disjoint column proves the whole file clean.
    * Missing stats (legacy descriptors, untracked types) conservatively
    * apply. This is what keeps an upsert touching one key from probing
    * every older file of a 100 TB table — on the read path AND in the
    * change feed's row-level reconstruction. */
  def eqApplies(d: DeleteFile, f: DataFile,
      types: Map[Int, DataType]): Boolean =
    d.seq > f.seq && !d.equalityCols.exists { id =>
      (for {
        dt <- types.get(id)
        ds <- d.stats.get(id)
        fs <- f.stats.get(id)
      } yield statRangesDisjoint(dt, ds, fs) ||
        pointKeyBloomMiss(dt, ds, fs)).getOrElse(false)
    }

  /** POINT-delete bloom pruning: a single-key equality delete (min ==
    * max, no null keys — the streaming single-key upsert shape) cannot
    * apply to a data file whose [[FileBloom]] proves the key ABSENT —
    * the skip key-range boxes cannot make on a scattered high-NDV key,
    * where every older file's range covers the key. Canonical hashing
    * keeps pre-widen blooms valid for widen-coerced key values; a bloom
    * false positive merely keeps the probe (sound). */
  private def pointKeyBloomMiss(dt: DataType, ds: ColStats,
      fs: ColStats): Boolean = {
    if (fs.bloom == null || ds.nulls > 0 ||
      ds.min == null || ds.max == null) return false
    val mn = TypeWidening.coerce(dt, ds.min)
    val mx = TypeWidening.coerce(dt, ds.max)
    val ord = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(dt)
    if (!ord.equiv(mn, mx)) return false
    NdvSketch.hash(mn, dt).exists(h =>
      !FileBloom.mightContain(fs.bloom.bytes, h))
  }

  private def statRangesDisjoint(dt: DataType, a: ColStats,
      b: ColStats): Boolean = {
    // A null key matches a null value: overlap unless one side has none.
    if (a.nulls > 0 && b.nulls > 0) return false
    if (a.min == null || a.max == null || b.min == null || b.max == null)
      return false // all-null or untracked side — cannot prove disjoint
    val ord = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(dt)
    // Pre-widen descriptors hold narrow boxes — compare in the live type.
    val amin = TypeWidening.coerce(dt, a.min)
    val amax = TypeWidening.coerce(dt, a.max)
    val bmin = TypeWidening.coerce(dt, b.min)
    val bmax = TypeWidening.coerce(dt, b.max)
    ord.lt(amax, bmin) || ord.lt(bmax, amin)
  }

  /** One immutable DELETE file — Iceberg format-v2's two merge-on-read
    * flavors plus v3's deletion vector:
    *
    *   - `kind = "pos"` (POSITION delete): `entryCount` sorted row
    *     positions at `path` (see [[RowFiles.writeDeletes]]) deleted from
    *     the data file at `dataPath`. Keyed to ONE data file so a scan
    *     task loads exactly the entries that apply to its file.
    *   - `kind = "dv"` (DELETION VECTOR, Iceberg v3's shape — see
    *     [[DeletionVectors]]): ALL dead positions of `dataPath` as one
    *     roaring-style bitmap, REWRITTEN ON MERGE at each delta commit so
    *     a data file carries at most ONE delete structure regardless of
    *     how many statements deleted from it. `supersedes` lists the
    *     predecessor structures this vector folded — the change feed's
    *     witness that their positions are re-encoded, not new deaths.
    *   - `kind = "eq"` (EQUALITY delete): `entryCount` key tuples at
    *     `path` (a regular data file whose columns are the key columns,
    *     canonically named `k0..kn`); `equalityCols` holds the key
    *     columns' FIELD IDS and `dataPath` is empty. The delete applies
    *     to every data file whose `seq` is LOWER than this delete's `seq`
    *     — which is exactly what lets a streaming upsert commit
    *     delete-by-key + append WITHOUT reading the target (rows appended
    *     in the same commit carry an equal seq and are immune).
    *
    * Readers skip matching rows; data files are never rewritten — that is
    * the whole point. */
  final case class DeleteFile(path: String, dataPath: String, entryCount: Long,
      kind: String = "pos", equalityCols: Seq[Int] = Nil, seq: Long = 0L,
      /** Per KEY-COLUMN (min, max, nullCount) of the delete file's tuples,
        * keyed by field id — collected at write exactly like data-file
        * stats. Lets both the read path and the change-feed reconstruction
        * SKIP probing data files whose key ranges are disjoint from the
        * delete's (Iceberg records delete-file bounds for the same
        * pruning). Empty = legacy descriptor, probe everything. */
      stats: Map[Int, ColStats] = Map.empty,
      /** `kind = "dv"` only: the delete-structure paths this vector
        * folded (one supersede generation — its direct predecessors). */
      supersedes: Vector[String] = Vector.empty)

  /** `appendedFiles` >= 0 marks an APPEND commit whose LAST `appendedFiles`
    * entries of `files` are the newly added ones (the streaming source's
    * unit of progress); -1 marks a rewrite (truncate-overwrite, row-level
    * replace, partition overwrite, metadata delete, rollback, or a
    * merge-on-read delta commit), which an append-only stream must refuse.
    * `schema` is the table schema AS OF this commit — time travel reads
    * each version under the schema it was written with (Iceberg's
    * per-snapshot schema), so an `ALTER TABLE ADD COLUMN` never
    * retroactively widens history. `deleteFiles` are the position deletes
    * LIVE at this snapshot (merge-on-read row-level operations append
    * them; copy-on-write commits retire those of replaced data files).
    * `operation` names WHAT the commit did (Iceberg's snapshot-summary
    * operation): `append` | `overwrite` (truncate, partition overwrite, or
    * copy-on-write row-level rewrite) | `delete` (metadata-only partition
    * delete) | `delta` (merge-on-read row-level commit) | `rollback` |
    * `replace` (compaction — files change, logical rows do not; the change
    * feed skips it). `manifestPath` is this snapshot's durable file
    * inventory in the metadata log (relative to the table dir) — null
    * until first persisted; [[MetadataLog.tryCommit]] writes each manifest
    * exactly once.
    *
    * LAZY MANIFEST RESIDENCY: a snapshot loaded from the metadata log
    * holds a manifest REFERENCE, not the inventory — `files` /
    * `deleteFiles` read the manifest on first access and soft-cache the
    * result (reclaimable under memory pressure). Table LOAD therefore
    * reads summaries only: driver-resident file entries are O(snapshots
    * actually touched) — the current snapshot for scans/commits, the
    * pinned one for time travel — never O(history × files). Fresh commits
    * are EAGER (their inventory is in hand); only history pays the lazy
    * indirection. A history-spanning operation (expire's GC set, the
    * `.history` diff relation, a full changes replay) still loads what it
    * touches — that cost is the operation's semantics, not the load's. */
  final class Snapshot private (val version: Long, val commitMicros: Long,
      filesIn: Vector[DataFile],
      val appendedFiles: Int,
      val schema: StructType,
      deletesIn: Vector[DeleteFile],
      val operation: String,
      val manifestPath: String,
      loader: MetadataLog.ManifestRef,
      /** True iff EVERY file/delete entry of this snapshot carries a real
        * data sequence number (`seq > 0`) — persisted in the snapshot
        * summary so a LOADER can decide lazy vs eager WITHOUT reading the
        * manifest (an unflagged manifest may hold pre-seq legacy entries
        * needing the global reconstruction in
        * [[MetadataLog.assignLegacySeqs]]). */
      val seqsKnown: Boolean) {

    /** Soft-cached lazily-loaded (files, deletes); null until first touch. */
    @volatile private var cached:
        java.lang.ref.SoftReference[(Vector[DataFile], Vector[DeleteFile])] = null

    private def loaded: (Vector[DataFile], Vector[DeleteFile]) = {
      val c = if (cached == null) null else cached.get()
      if (c != null) c
      else {
        // Benign race: two threads may both load; the manifest is
        // immutable, so either result is identical.
        val v = loader.load()
        cached = new java.lang.ref.SoftReference(v)
        v
      }
    }

    def files: Vector[DataFile] =
      if (filesIn != null) filesIn else loaded._1
    def deleteFiles: Vector[DeleteFile] =
      if (deletesIn != null) deletesIn else loaded._2

    /** Chunk-level planning handle: the chunk index (names + per-chunk
      * partition summaries) plus the manifest's delete files and a
      * per-chunk loader — WITHOUT forcing the full inventory. None when
      * the snapshot is eager, already resident (cache beats re-reading
      * chunks), or its manifest is unchunked. */
    def chunkSource(): Option[(Vector[MetadataLog.ChunkEntry],
        Vector[DeleteFile], String => Vector[DataFile])] = {
      if (loader == null || manifestPath == null) return None
      val c = if (cached == null) null else cached.get()
      if (c != null) return None
      MetadataLog.chunkIndex(loader.dataDir, loader.name,
        loader.specTypes, loader.ctx).map { case (idx, dels) =>
        (idx, dels, (n: String) => MetadataLog.readChunkFiles(
          loader.dataDir, n, loader.specTypes, loader.ctx,
          RowFiles.sessionConf().value))
      }
    }

    /** File entries currently resident on the driver for THIS snapshot —
      * the probe surface for the lazy-residency contract (never forces a
      * load). */
    def residentFileEntries: Int =
      if (filesIn != null) filesIn.size
      else {
        val c = if (cached == null) null else cached.get()
        if (c == null) 0 else c._1.size
      }

    def isLazy: Boolean = filesIn == null

    def copy(version: Long = version, commitMicros: Long = commitMicros,
        files: Vector[DataFile] = null, appendedFiles: Int = appendedFiles,
        schema: StructType = schema, deleteFiles: Vector[DeleteFile] = null,
        operation: String = operation,
        manifestPath: String = manifestPath): Snapshot =
      if (files == null && deleteFiles == null)
        // Inventory untouched: carry the existing source — eager vector or
        // lazy reference — WITHOUT forcing a load.
        new Snapshot(version, commitMicros, filesIn, appendedFiles, schema,
          deletesIn, operation, manifestPath, loader, seqsKnown)
      else {
        val f = if (files != null) files else this.files
        val d = if (deleteFiles != null) deleteFiles else this.deleteFiles
        new Snapshot(version, commitMicros, f, appendedFiles, schema, d,
          operation, manifestPath, null, Snapshot.allSeqStamped(f, d))
      }

    override def toString: String =
      s"Snapshot(v$version, $operation, " +
        (if (filesIn != null) s"${filesIn.size} files" else "lazy") + ")"
  }

  object Snapshot {
    private[sources] def allSeqStamped(files: Vector[DataFile],
        deletes: Vector[DeleteFile]): Boolean =
      files.forall(_.seq > 0L) && deletes.forall(_.seq > 0L)

    /** EAGER snapshot — the commit-path constructor (inventory in hand). */
    def apply(version: Long, commitMicros: Long, files: Vector[DataFile],
        appendedFiles: Int = -1, schema: StructType = null,
        deleteFiles: Vector[DeleteFile] = Vector.empty,
        operation: String = "append", manifestPath: String = null): Snapshot =
      new Snapshot(version, commitMicros, files, appendedFiles, schema,
        deleteFiles, operation, manifestPath, null,
        allSeqStamped(files, deleteFiles))

    /** LAZY snapshot — the load-path constructor: the inventory stays in
      * its manifest until touched. Only sound when the summary's `seqs`
      * flag certifies every entry carries a real sequence number. */
    private[sources] def lazyLoaded(version: Long, commitMicros: Long,
        appendedFiles: Int, schema: StructType, operation: String,
        manifestPath: String, loader: MetadataLog.ManifestRef): Snapshot =
      new Snapshot(version, commitMicros, null, appendedFiles, schema,
        null, operation, manifestPath, loader, seqsKnown = true)
  }

  /** A BRANCH (Iceberg's mutable ref): staged commits forked at `base` (a
    * main-log version), held OUTSIDE the main snapshot log until
    * fast-forward publishes them — the write-audit-publish isolation unit.
    * Branch snapshots are numbered `base+1, base+2, …` provisionally;
    * fast-forward validates main's head is still `base` (a moved main is a
    * loud conflict, never a silent interleave), so the numbering is final
    * exactly when it becomes visible. */
  final case class Branch(base: Long, snapshots: Vector[Snapshot]) {
    def head(st: TableState): (Vector[DataFile], Vector[DeleteFile]) =
      snapshots.lastOption.map(s => (s.files, s.deleteFiles)).getOrElse {
        if (base == 0L) (Vector.empty, Vector.empty)
        else st.snapshots.find(_.version == base)
          .map(s => (s.files, s.deleteFiles))
          .getOrElse(throw new IllegalStateException(
            s"branch base snapshot v$base was expired"))
      }
  }

  /** `epochs` maps each streaming QUERY id to the newest epoch it committed
    * into this table: the replay guard that makes the streaming SINK
    * exactly-once-visible under at-least-once epoch retries. Keyed per
    * query — not per table — because a NEW query (fresh checkpoint)
    * restarts its epoch numbering at 0, and a table-wide watermark would
    * silently swallow its first batches. */
  final case class TableState(schema: StructType, partitionCols: Seq[String],
      dataDir: String, properties: Map[String, String],
      snapshots: Vector[Snapshot],
      tags: Map[String, Long] = Map.empty,
      epochs: scala.collection.immutable.ListMap[String, Long] =
        scala.collection.immutable.ListMap.empty,
      branches: Map[String, Branch] = Map.empty,
      /** HIDDEN-PARTITIONING transforms, parallel to `partitionCols` (the
        * SOURCE column names). Empty = all identity (the pre-transform
        * metadata shape). File partition values are the TRANSFORMED
        * values; writes route through [[PTransform.eval]] and scans prune
        * data predicates through [[TransformPruning]]. */
      partitionTransforms: Seq[PTransform] = Nil,
      /** The metadata-log commit number backing this state (`v<N>.json`) —
        * the CAS token of the durable commit protocol. */
      metaVersion: Long = 0L,
      /** Highest FIELD ID ever assigned in this table (ids are never
        * reused — a dropped column's id stays retired, see [[FieldIds]]). */
      lastFieldId: Int = 0,
      /** CREATION identity (uuid, assigned once at CREATE TABLE and never
        * changed — Iceberg's table-uuid): distinguishes a table from a
        * later drop-and-recreate at the same identifier/directory, so
        * consumers that key durable state on a table (stream checkpoints)
        * can detect the swap instead of resuming against a stranger's
        * history. Empty = legacy metadata predating the field. */
      tableId: String = "",
      /** PARTITION-SPEC EVOLUTION (Iceberg's per-file spec ids): the id of
        * the CURRENT spec (`partitionCols` + `partitionTransforms`), bumped
        * by `evolve_partition_spec`. Data files record the spec they were
        * written under; scans prune each file through ITS OWN spec. */
      currentSpecId: Int = 0,
      /** RETIRED specs by id: per field `(source column name, transform
        * wire name, partition-value type json)` — self-contained (the
        * result type is stored, not derived) so a later rename/drop of a
        * retired spec's source column never orphans old files' values. */
      specHistory: Map[Int, Seq[(String, String, String)]] = Map.empty,
      /** TYPE-WIDENING history per FIELD ID (Iceberg's safe promotions:
        * int→long, float→double, decimal precision-up). Each entry
        * `(throughSeq, oldType)` says "data files with seq <= throughSeq
        * were written while this field's type was oldType" — ascending,
        * appended by `ALTER COLUMN … TYPE`. [[MemReaders.widenOverrides]]
        * is the ONE resolution point: readers resolve each file's
        * WRITE-TIME type through this map there
        * and up-cast decoded values to the live type; files written after
        * the widen carry the new type natively. Empty = no column ever
        * widened (every scan takes the zero-cost path). */
      typeHistory: Map[Int, Vector[(Long, DataType)]] = Map.empty) {
    def currentFiles: Vector[DataFile] =
      if (snapshots.isEmpty) Vector.empty else snapshots.last.files
    def currentDeletes: Vector[DeleteFile] =
      if (snapshots.isEmpty) Vector.empty else snapshots.last.deleteFiles
    def nextVersion: Long =
      if (snapshots.isEmpty) 1L else snapshots.last.version + 1L
    /** The transforms with the all-identity default expanded. */
    def transformsOrIdentity: Seq[PTransform] =
      if (partitionTransforms.nonEmpty) partitionTransforms
      else partitionCols.map(_ => PIdentity)
    /** Partition labels for metadata rendering ("ts_day", "id_bucket"). */
    def partitionLabels: Seq[String] =
      partitionCols.zip(transformsOrIdentity).map { case (c, t) => t.label(c) }
    /** The TRANSFORMED partition-value types — what file descriptors and
      * the manifest codec carry. */
    def partitionValueTypes: Seq[DataType] =
      partitionCols.zip(transformsOrIdentity)
        .map { case (c, t) => t.resultType(schema(c).dataType) }
    /** Partition-value types per spec id — the manifest codec's context. */
    def specTypesMap: Map[Int, Seq[DataType]] =
      specHistory.map { case (id, fs) =>
        id -> fs.map(f => DataType.fromJson(f._3))
      } + (currentSpecId -> partitionValueTypes)
    /** Partition labels ("ts_day", "id_bucket") per spec id. */
    def specLabelsMap: Map[Int, Seq[String]] =
      specHistory.map { case (id, fs) =>
        id -> fs.map(f => PTransform.fromName(f._2).label(f._1))
      } + (currentSpecId -> partitionLabels)
    /** A retired or current spec's (cols, transforms, pv types). */
    def specOf(id: Int): (Seq[String], Seq[PTransform], Seq[DataType]) =
      if (id == currentSpecId)
        (partitionCols, transformsOrIdentity, partitionValueTypes)
      else {
        val h = specHistory.getOrElse(id, throw new IllegalStateException(
          s"unknown partition spec id $id (current $currentSpecId, " +
            s"retired ${specHistory.keys.toSeq.sorted.mkString(", ")})"))
        (h.map(_._1), h.map(f => PTransform.fromName(f._2)),
          h.map(f => DataType.fromJson(f._3)))
      }
    /** Every spec id live in CURRENT files (plus the current spec). */
    def liveSpecIds: Set[Int] =
      currentFiles.iterator.map(_.specId).toSet + currentSpecId
  }

  /** In-JVM CACHE of the durable metadata log ([[MetadataLog]]) — the log
    * on disk is the source of truth; every mutation commits there first
    * (create-exclusive CAS on the next metadata file) and only then lands
    * here. A fresh JVM starts empty and lazily loads tables from the
    * warehouse on first reference. */
  val tables = new TrieMap[String, TableState]
  val namespaces = new TrieMap[String, Unit]

  /** catalog name → warehouse root, registered at catalog initialize —
    * how a bare store key resolves to its on-disk table directory. */
  val warehouses = new TrieMap[String, String]

  /** Monotonic commit clock: strictly increasing micros even for commits in
    * the same millisecond, so `TIMESTAMP AS OF` totally orders snapshots. */
  private val lastMicros = new AtomicLong(0L)
  def nowMicros(): Long = {
    val wall = System.currentTimeMillis() * 1000L
    lastMicros.updateAndGet(prev => math.max(prev + 1, wall))
  }
  /** Keep the clock ahead of history loaded from disk (restart path). */
  def bumpClock(micros: Long): Unit = {
    lastMicros.updateAndGet(prev => math.max(prev, micros))
    ()
  }

  /** Cache `st` unless a NEWER metadata version is already cached — a
    * slow thread's put must never regress reads behind a committed state. */
  private[sources] def cachePutNewer(k: String, st: TableState): Unit = {
    while (true) {
      tables.get(k) match {
        case Some(cur) if cur.metaVersion >= st.metaVersion => return
        case Some(cur) => if (tables.replace(k, cur, st)) return
        case None => if (tables.putIfAbsent(k, st).isEmpty) return
      }
    }
  }

  /** The table's state — cache hit, or lazy load from the warehouse (the
    * restart / cross-session path). None if it exists in neither. */
  def resolve(k: String): Option[TableState] =
    tables.get(k).orElse {
      MetadataLog.load(k).map { st => cachePutNewer(k, st); st }
    }

  /** Atomic, DURABLE read-modify-write of one table's state; returns
    * (before, after). The transition persists as one metadata-log commit
    * (append a manifest + claim `v<N+1>.json`); a conflicting writer —
    * another thread or another session on the same warehouse — makes the
    * claim fail, and the whole transition re-runs against the reloaded
    * state (re-validating any optimistic-concurrency base, so a moved
    * row-level base stays a loud error). `f` returning its input commits
    * nothing (the replayed-epoch no-op). */
  def update(k: String)(f: TableState => TableState): (TableState, TableState) = {
    while (true) {
      val before = stateOf(k)
      val after = f(before)
      if (after eq before) return (before, after)
      MetadataLog.tryCommit(before, after) match {
        case Some(done) =>
          cachePutNewer(k, done)
          return (before, done)
        case None =>
          // Lost the claim. If another thread in this JVM won, the cache
          // already moved past our base; otherwise reload from disk.
          if (!tables.get(k).exists(_.metaVersion > before.metaVersion)) {
            tables.remove(k, before)
            MetadataLog.load(k).foreach(cachePutNewer(k, _))
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Key separator: NUL — a character no identifier part can contain. */
  val Sep: String = 0.toChar.toString

  /** The store key of `catalog.ns...table` (keys join on NUL). */
  def keyOf(catalog: String, ident: Seq[String]): String =
    (catalog +: ident).mkString(Sep)

  /** Internal keys join on NUL; messages render them dotted. */
  def dotted(k: String): String = k.split(0.toChar).mkString(".")

  /** Table state or a clean failure (never a raw NoSuchElementException
    * with an unprintable key — a table can be dropped concurrently between
    * name resolution and scan/write build). Falls through to the durable
    * log when uncached. */
  def stateOf(k: String): TableState =
    resolve(k).getOrElse(throw new IllegalStateException(
      s"snapshot table ${dotted(k)} does not exist (dropped concurrently?)"))

  def filesAt(k: String, version: Long): Vector[DataFile] = {
    val st = stateOf(k)
    if (version == 0L) Vector.empty
    else st.snapshots.find(_.version == version).map(_.files).getOrElse {
      val have = st.snapshots.map(_.version)
      throw new IllegalArgumentException(
        s"snapshot version $version of ${dotted(k)} does not exist (expired or future); " +
          s"available: ${have.mkString("[", ", ", "]")}")
    }
  }

  /** POSITION-delete structures (per-commit `pos` files and folded `dv`
    * vectors) grouped by the data file they apply to — the shape a scan
    * needs (each file's task loads exactly its own delete entries; after
    * a merge-on-write fold that is ONE vector). Equality deletes are
    * file-spanning and ride separately (see [[eqDeletes]]). */
  def deleteMap(dels: Vector[DeleteFile]): Map[String, Vector[String]] =
    dels.filter(d => d.kind == "pos" || d.kind == "dv").groupBy(_.dataPath)
      .map { case (dp, ds) => dp -> ds.map(_.path) }

  /** The equality-delete files of a delete list (scan-planning companion
    * of [[deleteMap]]). */
  def eqDeletes(dels: Vector[DeleteFile]): Vector[DeleteFile] =
    dels.filter(_.kind == "eq")

  /** Epoch-guarded merge-on-read DELTA commit — the streaming UPSERT
    * sink's unit: one atomic snapshot carrying the epoch's appended data
    * files plus an equality-delete file of its keys, WITHOUT reading the
    * target (the appended files' seq equals the delete's, so they are
    * immune; every older file is subject). Replayed epochs no-op exactly
    * like [[commitEpoch]], and the replay's already-written files are
    * deleted as orphans. */
  def commitEpochDelta(k: String, queryId: String, epochId: Long,
      newFiles: Vector[DataFile], newDeletes: Vector[DeleteFile]): Unit = {
    val (before, after) = update(k) { st =>
      if (st.epochs.get(queryId).exists(epochId <= _)) st // replayed epoch
      else {
        val pruned =
          if (st.epochs.size >= 128 && !st.epochs.contains(queryId))
            st.epochs - st.epochs.head._1
          else st.epochs
        st.copy(
          snapshots = st.snapshots :+ Snapshot(st.nextVersion, nowMicros(),
            st.currentFiles ++ { requireCurrentSpec(st, newFiles); newFiles.map(_.copy(seq = st.nextVersion)) },
            appendedFiles = -1, schema = st.schema,
            deleteFiles = st.currentDeletes ++
              newDeletes.map(_.copy(seq = st.nextVersion)),
            operation = "delta"),
          epochs = (pruned - queryId) + (queryId -> epochId))
      }
    }
    if (before eq after)
      RowFiles.delete(newFiles.map(_.path) ++ newDeletes.map(_.path))
  }

  /** The position-delete files live AS OF `version` (companion of
    * [[filesAt]]; empty for version 0). */
  def deletesAt(k: String, version: Long): Vector[DeleteFile] = {
    val st = stateOf(k)
    if (version == 0L) Vector.empty
    else st.snapshots.find(_.version == version).map(_.deleteFiles).getOrElse(
      Vector.empty)
  }

  /** The table schema AS OF `version` (see [[Snapshot.schema]]); the
    * current schema for version 0 (the empty just-created table) and,
    * defensively, for snapshots predating per-snapshot schemas. */
  def schemaAt(k: String, version: Long): StructType = {
    val st = stateOf(k)
    st.snapshots.find(_.version == version).flatMap(s => Option(s.schema))
      .getOrElse(st.schema)
  }

  /** Drop a table's metadata and physically delete its data directory
    * (metadata log included — DROP TABLE erases history, like Iceberg's
    * `purge`). Finds the table on disk even when uncached. */
  def dropTableAndData(k: String): Boolean = {
    val st = tables.remove(k).orElse(MetadataLog.load(k))
    st match {
      case Some(s) => RowFiles.deleteDir(s.dataDir); true
      case None => false
    }
  }

  /** Commit `newFiles` as the next snapshot.
    *
    * `replace = false`: append (new files join the current list).
    * `replace = true` with no `replacedSelector`: truncate-overwrite (the
    * new files ARE the table).
    * `replace = true` with a `replacedSelector`: file-grained copy-on-write
    * — the selector picks, against the commit-time state, exactly the
    * files this commit retires (a row-level rewrite's scanned files, an
    * overwritten partition's files, a metadata delete's matches); every
    * other file carries over untouched.
    *
    * `expectedBase`: optimistic-concurrency guard for row-level rewrites —
    * the commit FAILS if the live version moved past the snapshot the
    * rewrite scanned (a silent last-writer-wins would erase the concurrent
    * commit's rows; Iceberg validates the base snapshot the same way).
    * Plain INSERT OVERWRITE passes None: truncate-replace is last-writer-
    * wins by SQL semantics.
    *
    * `operation` stamps the snapshot's [[Snapshot.operation]]; None derives
    * the unrefined default (`append` / `overwrite`). */
  def commit(k: String, newFiles: Vector[DataFile], replace: Boolean,
      expectedBase: Option[Long] = None,
      replacedSelector: Option[TableState => Vector[DataFile]] = None,
      operation: Option[String] = None): Unit = {
    update(k) { st =>
      val live = if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
      expectedBase.filter(_ != live).foreach { base =>
        throw new IllegalStateException(
          s"concurrent commit on ${dotted(k)}: the row-level rewrite read " +
            s"v$base but the table is now at v$live — rerun the statement")
      }
      // Stamp the new files' data sequence number with the version they
      // land in (carried files keep theirs): the ordering equality deletes
      // and write-schema resolution key on.
      val stamped = { requireCurrentSpec(st, newFiles); newFiles.map(_.copy(seq = st.nextVersion)) }
      val files =
        if (!replace) st.currentFiles ++ stamped
        else replacedSelector match {
          case None => stamped
          case Some(sel) =>
            val retired = sel(st).map(_.path).toSet
            st.currentFiles.filterNot(f => retired(f.path)) ++ stamped
        }
      // Position deletes follow their data file: a surviving (carried)
      // data file keeps its delete files — they still apply — while a
      // replaced/truncated one sheds them (its rewritten successor was
      // written with the deletes APPLIED, so carrying them over would
      // delete arbitrary rows of the new file). Equality deletes follow
      // their APPLICABILITY: kept while any current file is older than
      // the delete (new/rewritten files carry a newer seq and are immune),
      // dropped — folded — once compaction/rewrites retire every older
      // file.
      val surviving = files.map(_.path).toSet
      val deletes = st.currentDeletes.filter(d =>
        if (d.kind == "eq") files.exists(_.seq < d.seq)
        else surviving(d.dataPath))
      st.copy(snapshots = st.snapshots :+ Snapshot(st.nextVersion, nowMicros(), files,
        appendedFiles = if (replace) -1 else newFiles.size, schema = st.schema,
        deleteFiles = deletes,
        operation = operation.getOrElse(if (replace) "overwrite" else "append")))
    }
    ()
  }

  /** Merge-on-read DELTA commit (Iceberg v2's row-level mode): the new
    * snapshot carries every existing data file UNCHANGED plus the delta's
    * appended data files (MERGE/UPDATE inserts) and delete structures.
    * Marked a rewrite for the append-only streaming source (a row removal
    * is not representable as appends). Same optimistic base validation as
    * the copy-on-write path.
    *
    * DELETION-VECTOR fold ([[DeletionVectors.mergeOnWrite]]): the task-
    * written per-statement position files are merged with each targeted
    * data file's existing structures into ONE `dv` entry BEFORE the
    * metadata commit — the fold reads a snapshot of the state, and the
    * commit validates that snapshot is still current (the same
    * optimistic check the row-level rewrite already demands), so a
    * concurrent writer can never make a vector lie. The folded task
    * files are physically deleted after the commit (no snapshot ever
    * referenced them). */
  def commitDelta(k: String, newFiles: Vector[DataFile],
      newDeletes: Vector[DeleteFile], expectedBase: Option[Long]): Unit = {
    val (posNew, otherNew) = newDeletes.partition(_.kind == "pos")
    // The deletion-vector fold pins the state it merged against; an
    // EQ-ONLY delta (streaming upsert) folds nothing and keeps the old
    // semantics — the CAS retry loop alone, so a concurrent append does
    // NOT fail the statement (only expectedBase, when set, does).
    val (dvEntries, superseded, foldedPaths, pinnedV) =
      if (posNew.isEmpty)
        (Vector.empty[DeleteFile], Set.empty[String], Vector.empty[String],
          None: Option[Long])
      else {
        val conf = RowFiles.sessionConf().value
        val st0 = stateOf(k)
        val v0 = if (st0.snapshots.isEmpty) 0L else st0.snapshots.last.version
        expectedBase.filter(_ != v0).foreach { base =>
          throw new IllegalStateException(
            s"concurrent commit on ${dotted(k)}: the row-level rewrite read " +
              s"v$base but the table is now at v$v0 — rerun the statement")
        }
        val (e, s, f) = DeletionVectors.mergeOnWrite(st0, posNew, st0.dataDir, conf)
        (e, s, f, Some(v0))
      }
    try {
      update(k) { st =>
        val live = if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
        expectedBase.filter(_ != live).foreach { base =>
          throw new IllegalStateException(
            s"concurrent commit on ${dotted(k)}: the row-level rewrite read " +
              s"v$base but the table is now at v$live — rerun the statement")
        }
        pinnedV.filter(_ != live).foreach { v0 =>
          throw new IllegalStateException(
            s"concurrent commit on ${dotted(k)}: the delta folded deletes " +
              s"at v$v0 but the table is now at v$live — rerun the statement")
        }
        val known = (st.currentFiles.map(_.path) ++ newFiles.map(_.path)).toSet
        (otherNew ++ dvEntries).find(d => d.kind != "eq" && !known(d.dataPath))
          .foreach(d => throw new IllegalStateException(
            s"delta commit on ${dotted(k)} deletes positions of unknown data " +
              s"file ${d.dataPath}"))
        st.copy(snapshots = st.snapshots :+ Snapshot(st.nextVersion, nowMicros(),
          st.currentFiles ++ { requireCurrentSpec(st, newFiles); newFiles.map(_.copy(seq = st.nextVersion)) },
          appendedFiles = -1, schema = st.schema,
          deleteFiles = st.currentDeletes.filterNot(d => superseded(d.path)) ++
            (otherNew ++ dvEntries).map(_.copy(seq = st.nextVersion)),
          operation = "delta"))
      }
    } catch {
      case e: Throwable =>
        // The freshly written vectors are unreferenced — clean them up;
        // the task-written position files stay for the statement retry's
        // abort path to handle.
        RowFiles.delete(dvEntries.map(_.path))
        throw e
    }
    // The fold consumed the task-written position files; no snapshot ever
    // referenced them, so they would otherwise be orphans until expire().
    RowFiles.delete(foldedPaths)
    ()
  }

  /** Append `newFiles` onto a BRANCH (no main-log commit — the staged rows
    * are invisible to every reader of the table until fast-forward). The
    * branch head's position deletes carry over: a branch forked past a
    * merge-on-read commit still reads its base exactly. */
  def commitBranch(k: String, name: String, newFiles: Vector[DataFile]): Unit = {
    update(k) { st =>
      val br = st.branches.getOrElse(name, throw new IllegalStateException(
        s"branch '$name' of ${dotted(k)} does not exist (dropped concurrently?)"))
      val (headFiles, headDeletes) = br.head(st)
      val version = br.base + br.snapshots.size + 1
      val next = Snapshot(version, nowMicros(),
        { requireCurrentSpec(st, newFiles); headFiles ++ newFiles.map(_.copy(seq = version)) },
        appendedFiles = newFiles.size,
        schema = st.schema, deleteFiles = headDeletes, operation = "append")
      st.copy(branches = st.branches.updated(name,
        br.copy(snapshots = br.snapshots :+ next)))
    }
    ()
  }

  /** Epoch-stamped streaming append, replay-deduped PER QUERY: a retried
    * epoch of the same query no-ops (at-least-once → exactly-once-visible)
    * and its already-written files are deleted as orphans, while a NEW
    * query's epoch 0 over the same table commits normally. The check and
    * the append are one atomic state transition. */
  def commitEpoch(k: String, queryId: String, epochId: Long,
      newFiles: Vector[DataFile]): Unit = {
    val (before, after) = update(k) { st =>
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
            st.currentFiles ++ { requireCurrentSpec(st, newFiles); newFiles.map(_.copy(seq = st.nextVersion)) },
            appendedFiles = newFiles.size,
            schema = st.schema, deleteFiles = st.currentDeletes,
            operation = "append"),
          epochs = (pruned - queryId) + (queryId -> epochId))
      }
    }
    if (before eq after) RowFiles.delete(newFiles.map(_.path)) // replay: orphans
  }

  /** Epoch-stamped TRUNCATE-OVERWRITE — [[commitEpoch]]'s replace twin for
    * maintained-state tables an incremental engine rewrites once per
    * trigger (e.g. a connected-components assignment): a replayed epoch
    * no-ops and its files are deleted as orphans, so the pre-epoch
    * snapshot stays the replay's readable base. */
  def commitEpochReplace(k: String, queryId: String, epochId: Long,
      newFiles: Vector[DataFile]): Unit = {
    val (before, after) = update(k) { st =>
      if (st.epochs.get(queryId).exists(epochId <= _)) st // replayed epoch
      else {
        val pruned =
          if (st.epochs.size >= 128 && !st.epochs.contains(queryId))
            st.epochs - st.epochs.head._1
          else st.epochs
        st.copy(
          snapshots = st.snapshots :+ Snapshot(st.nextVersion, nowMicros(),
            { requireCurrentSpec(st, newFiles); newFiles.map(_.copy(seq = st.nextVersion)) },
            appendedFiles = -1,
            schema = st.schema, deleteFiles = Vector.empty,
            operation = "overwrite"),
          epochs = (pruned - queryId) + (queryId -> epochId))
      }
    }
    if (before eq after) RowFiles.delete(newFiles.map(_.path))
  }
}

/** The data-file format: a Spark-native stream of length-prefixed UnsafeRow
  * payloads behind the Hadoop FileSystem API (file://, hdfs://, s3a:// —
  * whatever the warehouse URI resolves to). Header: magic + field count.
  * Writers stream rows straight through a buffered FS stream (no task-side
  * row buffering); readers replay exactly the row count the file's
  * [[SnapshotStore.DataFile]] descriptor declares. */
private[sources] object RowFiles {
  val Magic = 0x47524654 // "GRFT"

  /** The session's Hadoop configuration, wrapped serializable for shipping
    * to task-side writers/readers — this is what carries `spark.hadoop.*`
    * settings (s3a credentials, HA nameservices, custom fs impls) to the
    * file IO; a bare `new Configuration()` would see classpath defaults
    * only. Driver-side helpers fall back to defaults when no session is
    * active (JVM teardown paths). */
  def sessionConf(): org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration()))

  /** Driver-side filesystem handle (metadata ops: GC, drops, orphan
    * cleanup). Task-side IO gets its conf shipped via the write/read
    * factories instead. */
  def fs(path: Path): FileSystem = path.getFileSystem(sessionConf().value)

  /** Fixed header: magic + field count. Ranged readers seek past it. */
  val HeaderBytes: Long = 8L

  final class Writer(pathStr: String, numFields: Int, conf: Configuration) {
    private val path = new Path(pathStr)
    private val fileSystem = path.getFileSystem(conf)
    private val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fileSystem.create(path, false), 1 << 16))
    out.writeInt(Magic)
    out.writeInt(numFields)
    private val scratch = new Array[Byte](4096)
    private var count = 0L
    private var bytes = HeaderBytes
    def write(row: UnsafeRow): Unit = {
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, scratch)
      count += 1
      bytes += 4L + row.getSizeInBytes
    }
    def rowCount: Long = count
    /** Bytes written so far (header included) — the byte offset the NEXT
      * row will start at, i.e. a valid split point. */
    def bytesWritten: Long = bytes
    def close(): Unit = out.close()
    def abort(): Unit = {
      try out.close() catch { case _: Exception => () }
      try fileSystem.delete(path, false) catch { case _: Exception => () }
    }
  }

  final class Reader(pathStr: String, conf: Configuration, byteStart: Long = 0L) {
    private val path = new Path(pathStr)
    private val raw = path.getFileSystem(conf).open(path)
    // FSDataInputStream is a DataInputStream: read the header off the raw
    // stream, seek to the split's offset (a row boundary the writer
    // recorded), THEN buffer — a seek through a buffer would tear it.
    require(raw.readInt() == Magic, s"not a graft row file: $pathStr")
    val numFields: Int = raw.readInt()
    if (byteStart > HeaderBytes) raw.seek(byteStart)
    val stream = new java.io.DataInputStream(
      new java.io.BufferedInputStream(raw, 1 << 16))
    def close(): Unit = stream.close()
  }

  /** Position-delete file format: magic + entry count + sorted distinct
    * positions as raw longs. Small by construction (8 bytes per deleted
    * row), loaded whole by the one scan task that reads its data file. */
  def writeDeletes(pathStr: String, positions: Array[Long],
      conf: Configuration): Unit = {
    val p = new Path(pathStr)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(p.getFileSystem(conf).create(p, false), 1 << 16))
    try {
      out.writeInt(Magic)
      out.writeInt(positions.length)
      positions.foreach(out.writeLong)
    } finally out.close()
  }

  /** Sorted dead positions of one delete structure — a position-delete
    * file (raw sorted longs) or a [[DeletionVectors]] bitmap, told apart
    * by magic, so every consumer (scan readers, change-feed
    * reconstruction, compaction) handles both through one call. */
  def readDeletes(pathStr: String, conf: Configuration): Array[Long] = {
    val p = new Path(pathStr)
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(p.getFileSystem(conf).open(p), 1 << 16))
    try {
      in.readInt() match {
        case Magic => Array.fill(in.readInt())(in.readLong())
        case DeletionVectors.Magic => DeletionVectors.readBody(in, pathStr)
        case other => sys.error(
          s"not a graft delete file: $pathStr (magic 0x${other.toHexString})")
      }
    } finally in.close()
  }

  def delete(paths: Iterable[String]): Unit = if (paths.nonEmpty) {
    // One conf for the whole batch: sessionConf() copies the full session
    // configuration, far too heavy to rebuild per deleted file (orphan GC
    // can retire thousands).
    val conf = sessionConf().value
    paths.foreach { p =>
      val hp = new Path(p)
      try hp.getFileSystem(conf).delete(hp, false) catch { case _: Exception => () }
    }
  }

  def deleteDir(dir: String): Unit = {
    val hp = new Path(dir)
    try fs(hp).delete(hp, true) catch { case _: Exception => () }
    ()
  }
}

/** Three-valued evaluation of connector [[VPredicate]]s against a file's
  * constant identity-partition values. Outer None = the predicate is not
  * decidable from partition values alone (unknown node, non-partition
  * column, type mismatch) — callers must stay conservative; inner None =
  * SQL NULL. Comparison semantics delegate to the corresponding Catalyst
  * expressions over literals, so engine and pruning can never disagree. */
private[sources] object PartitionPredicates {
  type PartCols = Map[String, (Int, DataType)]

  /** Can `p` be decided from partition values alone — for EVERY possible
    * file? This must be a STRUCTURAL check (each leaf is a literal or a
    * partition column, each node a supported operator, operand types
    * agree): running eval on a sample row instead would let three-valued
    * short-circuits hide undecidable branches (`region IS NOT NULL AND
    * id > 5` evaluates to FALSE on an all-null probe without ever looking
    * at `id`), and a caller like `canDeleteWhere` would then route a
    * rewrite-requiring statement down the metadata path, where
    * `matchesSurely` conservatively matches nothing — a DELETE/OVERWRITE
    * that silently does nothing. */
  def evaluable(p: VPredicate, cols: PartCols): Boolean = {
    def leafType(e: VExpression): Option[DataType] = e match {
      case l: VLiteral[_] => Some(l.dataType)
      case r: NamedReference if r.fieldNames().length == 1 =>
        cols.get(r.fieldNames()(0).toLowerCase).map(_._2)
      case _ => None
    }
    def childPred(i: Int): Option[VPredicate] = p.children()(i) match {
      case c: VPredicate => Some(c)
      case _ => None
    }
    p.name() match {
      case "ALWAYS_TRUE" | "ALWAYS_FALSE" => true
      case "AND" | "OR" =>
        p.children().length == 2 &&
          childPred(0).exists(evaluable(_, cols)) &&
          childPred(1).exists(evaluable(_, cols))
      case "NOT" =>
        p.children().length == 1 && childPred(0).exists(evaluable(_, cols))
      case "=" | "<=>" | "<>" | "<" | "<=" | ">" | ">=" =>
        p.children().length == 2 && {
          val ts = p.children().toSeq.map(leafType)
          ts.forall(_.isDefined) && ts.head == ts(1)
        }
      case "IS_NULL" | "IS_NOT_NULL" =>
        p.children().length == 1 && leafType(p.children()(0)).isDefined
      case "IN" =>
        p.children().length >= 2 && {
          val ts = p.children().toSeq.map(leafType)
          ts.forall(_.isDefined) && ts.tail.forall(_ == ts.head)
        }
      case _ => false
    }
  }

  /** True iff NO row of a file with `values` can satisfy `p` (false or
    * NULL under three-valued logic — both filter the row out). */
  def definitelyExcludes(p: VPredicate, cols: PartCols,
      values: Seq[Any]): Boolean = eval(p, cols, values.toIndexedSeq) match {
    case Some(Some(false)) | Some(None) => true
    case _ => false
  }

  /** True iff EVERY row of a file with `values` satisfies `p`. */
  def matchesSurely(p: VPredicate, cols: PartCols, values: Seq[Any]): Boolean =
    eval(p, cols, values.toIndexedSeq) == Some(Some(true))

  /** [[matchesSurely]] over a conjunct set that already passed
    * [[evaluable]]: an undecided eval here means the two operator tables
    * drifted apart — fail LOUDLY rather than conservatively matching
    * nothing, which would re-open the silent-no-op DELETE/OVERWRITE class
    * the structural check exists to prevent. */
  def matchesAllDecided(preds: Seq[VPredicate], cols: PartCols,
      values: Seq[Any]): Boolean =
    preds.forall { p =>
      eval(p, cols, values.toIndexedSeq) match {
        case None => throw new IllegalStateException(
          s"internal: predicate $p passed the structural decidability check " +
            "but eval could not decide it — the evaluable/eval operator " +
            "tables drifted; fix PartitionPredicates before trusting this path")
        case Some(b) => b.contains(true)
      }
    }

  def eval(p: VPredicate, cols: PartCols,
      values: IndexedSeq[Any]): Option[Option[Boolean]] = {
    def valueOf(e: VExpression): Option[(Any, DataType)] = e match {
      case l: VLiteral[_] => Some((l.value, l.dataType))
      case r: NamedReference if r.fieldNames().length == 1 =>
        cols.get(r.fieldNames()(0).toLowerCase).map { case (i, dt) =>
          (if (values == null) null else values(i), dt)
        }
      case _ => None
    }
    def child(i: Int): Option[VPredicate] = p.children()(i) match {
      case c: VPredicate => Some(c)
      case _ => None
    }
    def cmp(make: (ce.Expression, ce.Expression) => ce.Expression): Option[Option[Boolean]] =
      for {
        l <- valueOf(p.children()(0))
        r <- valueOf(p.children()(1))
        if l._2 == r._2
      } yield Option(make(ce.Literal(l._1, l._2), ce.Literal(r._1, r._2)).eval(null))
        .map(_.asInstanceOf[Boolean])

    p.name() match {
      case "ALWAYS_TRUE" => Some(Some(true))
      case "ALWAYS_FALSE" => Some(Some(false))
      case "AND" =>
        (child(0).flatMap(eval(_, cols, values)), child(1).flatMap(eval(_, cols, values))) match {
          case (Some(Some(false)), _) | (_, Some(Some(false))) => Some(Some(false))
          case (Some(a), Some(b)) =>
            Some(if (a == Some(true) && b == Some(true)) Some(true) else None)
          case _ => None
        }
      case "OR" =>
        (child(0).flatMap(eval(_, cols, values)), child(1).flatMap(eval(_, cols, values))) match {
          case (Some(Some(true)), _) | (_, Some(Some(true))) => Some(Some(true))
          case (Some(a), Some(b)) =>
            Some(if (a == Some(false) && b == Some(false)) Some(false) else None)
          case _ => None
        }
      case "NOT" => child(0).flatMap(eval(_, cols, values)).map(_.map(!_))
      case "=" => cmp(ce.EqualTo)
      case "<=>" => cmp(ce.EqualNullSafe)
      case "<>" => cmp(ce.EqualTo).map(_.map(!_))
      case "<" => cmp(ce.LessThan)
      case "<=" => cmp(ce.LessThanOrEqual)
      case ">" => cmp(ce.GreaterThan)
      case ">=" => cmp(ce.GreaterThanOrEqual)
      case "IS_NULL" => valueOf(p.children()(0)).map(v => Some(v._1 == null))
      case "IS_NOT_NULL" => valueOf(p.children()(0)).map(v => Some(v._1 != null))
      case "IN" =>
        val head = valueOf(p.children()(0))
        val rest = p.children().drop(1).toSeq.map(valueOf)
        if (head.isEmpty || rest.exists(_.isEmpty) ||
            rest.exists(_.get._2 != head.get._2)) None
        else Some(Option(
          ce.In(ce.Literal(head.get._1, head.get._2),
            rest.map(r => ce.Literal(r.get._1, r.get._2))).eval(null))
          .map(_.asInstanceOf[Boolean]))
      case _ => None
    }
  }
}

/** One table of the snapshot catalog. `pinned = Some(files)` is a read-only
  * time-travel view; `None` reads the latest snapshot at scan build.
  *
  * The `_file` metadata column is each row's data-file path — the rewrite-
  * group id for copy-on-write row-level operations (Iceberg's `_file`).
  * Row-level operations REQUIRE it for two reasons: it is the runtime
  * group-filtering attribute (Spark's RowLevelOperationRuntimeGroupFiltering
  * plans the matching `_file`s subquery over it), and requiring metadata
  * forces Spark's `ReplaceDataExec` through the data/metadata
  * `ProjectingInternalRow`s — with no required metadata attributes the
  * writer would receive the rewrite plan's RAW output, operation column
  * included, corrupting the written rows. */
private[sources] final class MemTable(fullName: String, k: String,
    tableSchema: StructType, partCols: Seq[String], props: Map[String, String],
    pinned: Option[Vector[SnapshotStore.DataFile]],
    pinnedDeletes: Option[Vector[SnapshotStore.DeleteFile]] = None,
    partTransforms: Seq[PTransform] = Nil)
    extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations
    with SupportsMetadataColumns with SupportsDeleteV2 {

  private def tOf(i: Int): PTransform =
    if (partTransforms.isEmpty) PIdentity else partTransforms(i)

  /** Is this relation the table's LIVE HEAD (not a `VERSION/TIMESTAMP AS
    * OF` pin, not a branch audit read)? MV-based query rewrite
    * ([[MvQueryRewrite]]) may only substitute live-head scans — a pinned
    * read's answer is defined by history, never by a view's freshness. */
  private[sources] def isLiveHead: Boolean =
    pinned.isEmpty && pinnedDeletes.isEmpty

  /** The [[SnapshotStore]] key this table reads — relation identity for
    * plan rules that must compare scans against catalog metadata. */
  private[sources] def storeKey: String = k

  override def name(): String = fullName
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] =
    partCols.zipWithIndex.map { case (c, i) => PTransform.toV2(c, tOf(i)) }.toArray
  override def properties(): util.Map[String, String] = props.asJava
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)

  override def metadataColumns(): Array[MetadataColumn] =
    Array(MemTable.FileColumn, MemTable.PosColumn)

  /** IDENTITY partition fields only — the map the row-decidable machinery
    * (metadata delete, static overwrite predicates, DPP) consults. A
    * TRANSFORM field's file values are transformed, so predicates over its
    * source column are NOT row-decidable from them; those prune through
    * [[TransformPruning]]'s file-level channel instead. */
  private def partColMap: PartitionPredicates.PartCols =
    partCols.zipWithIndex.collect { case (c, i) if tOf(i).isIdentity =>
      c.toLowerCase -> (i, tableSchema(c).dataType)
    }.toMap

  private def tFields: Seq[TransformPruning.TField] =
    TransformPruning.fieldsOf(partCols, partTransforms, tableSchema)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
  {
    // CHUNK-SKIPPING planning handle: only for the LIVE unpinned,
    // unrestricted scan of a lazy chunked snapshot — the case where the
    // inventory is NOT yet resident and predicates may spare reading most
    // of it. Its index also carries the manifest's delete files, so
    // taking this path forces NO manifest chunk at all.
    val filesOption = Option(options.get("files"))
    // ONE state capture for the whole build: reading the store repeatedly
    // would let a concurrent commit hand this scan version N's files with
    // version N+1's deletes (or vice versa) — a snapshot-INCONSISTENT read
    // that resurrects upserted-away rows.
    val st = SnapshotStore.stateOf(k)
    val sn = st.snapshots.lastOption
    val chunkSrc =
      if (pinned.isDefined || filesOption.isDefined) None
      else sn.flatMap(_.chunkSource())
    val (base, allDeletes): (() => Vector[SnapshotStore.DataFile],
        Vector[SnapshotStore.DeleteFile]) = pinned match {
      case Some(files) => (() => files, pinnedDeletes.getOrElse(Vector.empty))
      case None =>
        chunkSrc match {
          case Some((_, dels, _)) => (() => sn.fold(
            Vector.empty[SnapshotStore.DataFile])(_.files), dels)
          case None => (() => sn.fold(
            Vector.empty[SnapshotStore.DataFile])(_.files),
            sn.fold(Vector.empty[SnapshotStore.DeleteFile])(_.deleteFiles))
        }
    }
    val deletes = SnapshotStore.deleteMap(allDeletes)
    val eqDels = SnapshotStore.eqDeletes(allDeletes)
    // `files` reader option: restrict the scan to the named data files of
    // THIS snapshot — the incremental-read hook a manifest-diffing consumer
    // (ChangeDataFeed's pruned feed) uses to touch only changed files.
    // Unknown paths fail loudly (a typo must not silently read as empty).
    val restricted = filesOption.map { csv =>
      val allow = csv.split(',').filter(_.nonEmpty).toSet
      val all = base()
      val have = all.map(_.path).toSet
      val unknown = allow -- have
      require(unknown.isEmpty,
        s"files option names ${unknown.size} path(s) not in this snapshot of " +
          s"$fullName, e.g. ${unknown.take(2).mkString(", ")}")
      all.filter(f => allow(f.path))
    }
    new MemScanBuilder(tableSchema, partColMap,
      restricted.map(r => () => r).getOrElse(base),
      chunked = chunkSrc.map { case (idx, _, load) =>
        (idx, load, SnapshotStore.specIdentCols(st)) },
      deletes = deletes,
      // Time-travel pins and file-restricted reads are batch-only; the
      // LIVE whole table is streamable.
      streamKey = if (pinned.isEmpty && restricted.isEmpty) Some(k) else None,
      maxVersionsPerTrigger =
        Option(options.get("maxVersionsPerTrigger")).map(_.toLong),
      startingVersion = Option(options.get("startingVersion")),
      splitTargetBytes = ScanSplits.targetBytes(props),
      eqDeletes = eqDels,
      tFields = tFields,
      // Per-file write-time type resolution: the overrides compare against
      // the SCAN schema (the pinned snapshot's for time travel), so a
      // pre-widen pin reads old files natively with no override.
      typeHist = st.typeHistory,
      specPruning = SnapshotStore.specPruningOf(st),
      vectorized = ScanSplits.vectorizedEnabled(props),
      // Opt-in (Iceberg's preserve-data-grouping trade): key-grouped
      // tasks make same-spec joins Exchange-free but cap a plain full
      // scan's parallelism at the partition-value count.
      spjKeys =
        if (props.get("read.preserve-partitioning").exists(_.toBoolean) &&
            partCols.nonEmpty)
          Some(partCols.zipWithIndex.map { case (c, i) =>
            PTransform.toV2(c, tOf(i)) }.toArray)
        else None,
      currentSpecId = st.currentSpecId,
      // Sorted-scan ordering reporting (gated per file in the scan).
      tableSortOrder = SortOrders.forRead(props, tableSchema),
      // Pinned (time-travel) and `files`-restricted reads never serve
      // histograms: the stored bins describe the CURRENT WHOLE table —
      // a file subset's distribution can differ arbitrarily (changed
      // files are exactly the skewed slice).
      histograms =
        if (pinned.isDefined || restricted.isDefined) None
        else StatsHistograms.forRead(props, st, sn.fold(0L)(_.version)),
      mergeFanIn = SortedScanMergePlanning.fanInOf(props),
      runtimeFileSkipping = !props.get("read.runtime-file-skipping")
        .exists(_.equalsIgnoreCase("false")))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinned.isEmpty, s"$fullName is a time-travel view and not writable")
    // Maintenance writes (compact) stamp their snapshot's operation via a
    // write option so the change feed can tell a file reshuffle from a
    // logical rewrite. Only `replace` may be claimed — anything else could
    // relabel a data change as a no-op.
    val op = Option(info.options().get("graft.operation"))
    op.filter(_ != "replace").foreach(o => throw new IllegalArgumentException(
      s"write option graft.operation only accepts 'replace' (compaction), got '$o'"))
    // On a MATERIALIZED VIEW the replace stamp is reserved for the
    // engine's own compaction: the MV recovery/tamper machinery trusts
    // `operation = "replace"` as content-neutral, so a user overwrite
    // claiming it would launder arbitrary rows past every gate.
    if (op.isDefined && MaterializedViews.isMv(props) &&
        !SnapshotCatalog.compactPermit.get().contains(k))
      throw new IllegalArgumentException(
        s"graft.operation=replace on materialized view $fullName is " +
          "reserved for engine maintenance (rewrite_data_files) — a " +
          "replace-stamped user overwrite would defeat the view's " +
          "content-drift protection")
    new MemWriteBuilder(k, info.schema(), partColMap, queryId = info.queryId(),
      operationOverride = op)
  }

  /** Group-based row-level operation: the scan pins the current snapshot's
    * files and prunes them (statically from pushed partition predicates,
    * at runtime from the `_file` group filter); the write REPLACES exactly
    * the files the pruned scan read with the rows Catalyst's rewrite
    * produces (carry-over + merged/updated/surviving). */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(pinned.isEmpty, s"$fullName is a time-travel view and not writable")
    // Iceberg's per-statement mode properties: copy-on-write (default)
    // rewrites whole files; merge-on-read appends position-delete files
    // and leaves every data file untouched — the fast-write/deferred-merge
    // trade a 100 TB table wants for frequent small deletes.
    val modeKey = info.command() match {
      case RowLevelOperation.Command.DELETE => "write.delete.mode"
      case RowLevelOperation.Command.UPDATE => "write.update.mode"
      case RowLevelOperation.Command.MERGE => "write.merge.mode"
    }
    props.getOrElse(modeKey, "copy-on-write") match {
      case "copy-on-write" =>
        () => new MemRowLevelOperation(info.command(), k, tableSchema, partColMap)
      case "merge-on-read" =>
        () => new MemDeltaRowLevelOperation(info.command(), k, tableSchema, partColMap)
      case other => throw new IllegalArgumentException(
        s"$fullName: $modeKey must be copy-on-write or merge-on-read, got '$other'")
    }
  }

  /** Metadata-only DELETE (Iceberg's delete-by-partition): a predicate
    * decidable from identity-partition values alone retires whole files in
    * one metadata commit — nothing is read or rewritten. */
  override def canDeleteWhere(predicates: Array[VPredicate]): Boolean =
    pinned.isEmpty && {
      // Spec evolution: the predicate must be identity-decidable under the
      // spec of EVERY live file, or the statement needs the rewrite path.
      val st = SnapshotStore.stateOf(k)
      val pruning = SnapshotStore.specPruningOf(st)
      st.liveSpecIds.forall(id => predicates.forall(
        PartitionPredicates.evaluable(_, pruning(id)._1)))
    }
  override def deleteWhere(predicates: Array[VPredicate]): Unit = {
    SnapshotStore.commit(k, Vector.empty, replace = true,
      replacedSelector = Some { st =>
        val pruning = SnapshotStore.specPruningOf(st)
        st.currentFiles.filter(f =>
          PartitionPredicates.matchesAllDecided(
            predicates.toSeq, pruning(f.specId)._1, f.partitionValues))
      },
      operation = Some("delete"))
  }
}

private[sources] object MemTable {
  /** Each row's data-file path (Iceberg's `_file`): the copy-on-write
    * rewrite-group id and the runtime group-filtering attribute. */
  val FileColumnName = "_file"
  val FileColumn: MetadataColumn = new MetadataColumn {
    override def name(): String = FileColumnName
    override def dataType(): DataType = org.apache.spark.sql.types.StringType
    override def isNullable: Boolean = false
    override def comment(): String =
      "data file path (copy-on-write rewrite group)"
  }

  /** Row position within its data file (Iceberg's `_pos`): with `_file`,
    * the stable row identity merge-on-read position deletes reference. */
  val PosColumnName = "_pos"

  /** Every name the catalog may materialize alongside data columns —
    * the metadata columns plus the change-feed relation's virtual columns
    * ([[ChangesTable]]). Rejected as DATA column names at create/alter. */
  def ReservedColumnNames: Seq[String] =
    Seq(FileColumnName, PosColumnName,
      ChangesTable.TypeColumn, ChangesTable.VersionColumn,
      ChangesTable.TimestampColumn)
  val PosColumn: MetadataColumn = new MetadataColumn {
    override def name(): String = PosColumnName
    override def dataType(): DataType = org.apache.spark.sql.types.LongType
    override def isNullable: Boolean = false
    override def comment(): String =
      "row position in its data file (merge-on-read row id)"
  }
}

private[sources] final class MemRowLevelOperation(
    cmd: RowLevelOperation.Command, private[sources] val k: String,
    tableSchema: StructType, partCols: PartitionPredicates.PartCols)
    extends RowLevelOperation {
  /** The version the rewrite's scan read — the optimistic-concurrency base
    * the replacing write validates at commit (lost-update guard). */
  @volatile private var baseVersion: Option[Long] = None
  /** The files the (pruned) scan will read — exactly the rewrite groups the
    * replacing write retires. Narrowed twice: statically at scan build
    * (pushed partition predicates), then at runtime by the `_file` group
    * filter. Read at commit time, after both prunings. */
  @volatile private[sources] var scanned: Vector[SnapshotStore.DataFile] = Vector.empty
  /** Set once the runtime `_file` group filter narrows the scan. Scan
    * BUILDS happen at planning time (the rewrite relation and the
    * group-filter subquery may each build a scan); `filter` runs at
    * execution. Should any build land after the filter, it must not widen
    * `scanned` back to the static set — replacing a file whose rows were
    * never read would silently drop them. */
  @volatile private[sources] var runtimeNarrowed = false

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft-snapshot $cmd [file-grained COW]"
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val st = SnapshotStore.stateOf(k)
    baseVersion = Some(
      if (st.snapshots.isEmpty) 0L else st.snapshots.last.version)
    // Never WIDEN a scan set the runtime `_file` group filter already
    // narrowed: should a scan build ever land after filter() ran (plan
    // re-execution), resetting `scanned` to the full file list would make
    // the replacing commit retire files whose rows were never read —
    // silent row loss. Unreachable under normal plan-then-execute
    // ordering; enforced, not just documented.
    if (!runtimeNarrowed) scanned = st.currentFiles
    new MemRowLevelScanBuilder(this, tableSchema, partCols, st.currentFiles,
      SnapshotStore.deleteMap(st.currentDeletes),
      SnapshotStore.eqDeletes(st.currentDeletes),
      TransformPruning.fieldsOf(st.partitionCols, st.partitionTransforms,
        st.schema),
      typeHist = st.typeHistory,
      specPruning = SnapshotStore.specPruningOf(st))
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(k, info.schema(), partCols, forceReplace = true,
      queryId = info.queryId(), expectedBase = baseVersion,
      rowLevelScanned = Some(() => scanned.map(_.path).toSet))
  /** Forces the projecting write path and feeds the runtime group filter —
    * see [[MemTable]]'s doc. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(MemTable.FileColumnName))
}

/** Scan builder for row-level operations: pushes partition predicates down
  * to file-level static pruning (everything stays residual — the engine
  * re-applies the filters post-scan, so pruning only has to be SOUND:
  * a file is dropped only when no row in it can match). */
private[sources] final class MemRowLevelScanBuilder(op: MemRowLevelOperation,
    fullSchema: StructType, partCols: PartitionPredicates.PartCols,
    files: Vector[SnapshotStore.DataFile],
    deletes: Map[String, Vector[String]] = Map.empty,
    eqDeletes: Vector[SnapshotStore.DeleteFile] = Vector.empty,
    tFields: Seq[TransformPruning.TField] = Nil,
    typeHist: Map[Int, Vector[(Long, DataType)]] = Map.empty,
    /** Per-SPEC pruning contexts (partition-spec evolution): each file is
      * pruned through the spec IT was written under. Empty = single-spec
      * table (partCols/tFields apply to every file). */
    specPruning: Map[Int, (PartitionPredicates.PartCols, Seq[TransformPruning.TField])] =
      Map.empty)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownV2Filters {
  private val statCols = StatsPredicates.statCols(fullSchema)
  private var required: StructType = fullSchema
  private var pushed: Array[VPredicate] = Array.empty
  private var statsUsable: Array[VPredicate] = Array.empty
  private var transformUsable: Array[VPredicate] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushPredicates(predicates: Array[VPredicate]): Array[VPredicate] = {
    pushed = predicates.filter(PartitionPredicates.evaluable(_, partCols))
    // Transform pruning and column-stats skipping narrow the REWRITE
    // GROUP set too, and are sound for the same reason partition pruning
    // is: a skipped file cannot contain a matching row, so not rewriting
    // it loses nothing.
    transformUsable = predicates.filter(p =>
      !pushed.contains(p) && TransformPruning.usable(p, tFields))
    statsUsable = predicates.filter(p =>
      !pushed.contains(p) && !transformUsable.contains(p) &&
        StatsPredicates.usable(p, statCols))
    predicates // all residual: pruning is file-level, rows still need the filter
  }
  override def pushedPredicates(): Array[VPredicate] =
    pushed ++ transformUsable ++ statsUsable
  /** The pruning context for one FILE: its own spec's identity map and
    * transform fields (pre-evolution tables fall back to the builder's). */
  private def specOf(f: SnapshotStore.DataFile):
      (PartitionPredicates.PartCols, Seq[TransformPruning.TField]) =
    if (specPruning.isEmpty) (partCols, tFields)
    else specPruning.getOrElse(f.specId, (partCols, tFields))

  override def build(): Scan = {
    val retained = files.filter { f =>
      val (pc, tf) = specOf(f)
      !pushed.exists(
        PartitionPredicates.definitelyExcludes(_, pc, f.partitionValues)) &&
      !transformUsable.exists(
        TransformPruning.definitelyExcludes(_, tf, f.partitionValues)) &&
      !statsUsable.exists(
        StatsPredicates.definitelyExcludes(_, statCols, f.stats, f.rowCount))
    }
    if (!op.runtimeNarrowed) op.scanned = retained
    new MemRowLevelScan(op, fullSchema, required, retained, deletes, eqDeletes)
  }
}

/** The row-level operation's scan: batch over the statically-retained
  * files, further narrowed at runtime by Spark's group filter on `_file`
  * (an IN-subquery over the rows matching the operation's condition). The
  * operation's `scanned` set tracks every narrowing so the replacing write
  * retires exactly what was read. */
private[sources] final class MemRowLevelScan(op: MemRowLevelOperation,
    fullSchema: StructType, required: StructType,
    initial: Vector[SnapshotStore.DataFile],
    deletes: Map[String, Vector[String]] = Map.empty,
    eqDeletes: Vector[SnapshotStore.DeleteFile] = Vector.empty)
    extends Scan with Batch with SupportsRuntimeV2Filtering {
  private var files = initial

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-snapshot cow scan (${files.size} candidate files)"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(MemTable.FileColumnName))

  override def filter(predicates: Array[VPredicate]): Unit = {
    predicates.foreach { p =>
      fileSet(p).foreach { allowed =>
        files = files.filter(f => allowed(f.path))
      }
    }
    op.runtimeNarrowed = true
    op.scanned = files
  }

  /** Parse the runtime filter's `_file IN (...)` / `_file = ...` shape;
    * anything else is ignored (no pruning — sound, just less sharp). */
  private def fileSet(p: VPredicate): Option[Set[String]] = {
    def isFileRef(e: VExpression): Boolean = e match {
      case r: NamedReference => r.fieldNames().sameElements(Array(MemTable.FileColumnName))
      case _ => false
    }
    p.name() match {
      case "IN" if p.children().nonEmpty && isFileRef(p.children()(0)) =>
        Some(p.children().drop(1).collect {
          case l: VLiteral[_] if l.value != null => l.value.toString
        }.toSet)
      case "=" if p.children().length == 2 && isFileRef(p.children()(0)) =>
        Some(p.children().drop(1).collect {
          case l: VLiteral[_] if l.value != null => l.value.toString
        }.toSet)
      case _ => None
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    // Split-planned like the plain scan: `_pos` counts file-globally from
    // each slice's rowStart, so the rewrite's row identity is unaffected.
    ScanSplits.partitions(files, deletes,
      ScanSplits.targetBytes(SnapshotStore.stateOf(op.k).properties), eqDeletes,
      SnapshotStore.idTypes(fullSchema))

  override def createReaderFactory(): PartitionReaderFactory =
    MemReaders.factory(fullSchema, required, RowFiles.sessionConf(),
      SnapshotStore.stateOf(op.k).typeHistory)
}

/** MERGE-ON-READ row-level operation (Iceberg v2's delta mode, selected
  * per statement kind by `write.delete.mode` / `write.update.mode` /
  * `write.merge.mode` = merge-on-read): Catalyst plans `WriteDelta`
  * instead of `ReplaceData`, the scan exposes the stable row identity
  * (`_file`, `_pos`), and the write appends POSITION-DELETE files plus
  * (for MERGE/UPDATE) new data files — no existing data file is read for
  * rewriting or replaced. Updates are represented as delete+reinsert
  * ([[SupportsDelta.representUpdateAsDeleteAndInsert]]), the Iceberg
  * position-delta shape.
  *
  * SCALE CONTRACT: a delete of k rows from an N-row table writes O(k)
  * bytes (the positions) instead of copy-on-write's O(files-touched)
  * rewrite — the fast-write side of the trade; reads then pay the
  * per-file delete-set union until `rewrite_data_files` folds the
  * deletes in (compaction purges: it reads with deletes applied and
  * truncate-overwrites, and the commit rule sheds delete files of
  * replaced data files). Same optimistic base-version validation as the
  * copy-on-write path. */
private[sources] final class MemDeltaRowLevelOperation(
    cmd: RowLevelOperation.Command, k: String, tableSchema: StructType,
    partCols: PartitionPredicates.PartCols)
    extends RowLevelOperation with SupportsDelta {
  @volatile private var baseVersion: Option[Long] = None

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft-snapshot $cmd [position-delete MOR]"
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val st = SnapshotStore.stateOf(k)
    baseVersion = Some(
      if (st.snapshots.isEmpty) 0L else st.snapshots.last.version)
    // A plain pruned scan of the current snapshot (deletes applied — a
    // second MOR statement must not resurrect or re-delete rows): no
    // group filtering, because nothing is replaced.
    new MemScanBuilder(tableSchema, partCols, () => st.currentFiles,
      deletes = SnapshotStore.deleteMap(st.currentDeletes),
      splitTargetBytes = ScanSplits.targetBytes(st.properties),
      eqDeletes = SnapshotStore.eqDeletes(st.currentDeletes),
      tFields = TransformPruning.fieldsOf(st.partitionCols,
        st.partitionTransforms, st.schema),
      typeHist = st.typeHistory,
      specPruning = SnapshotStore.specPruningOf(st),
      vectorized = ScanSplits.vectorizedEnabled(st.properties))
  }
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new MemDeltaWriteBuilder(k, info.schema(), baseVersion)
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(MemTable.FileColumnName),
      Expressions.column(MemTable.PosColumnName))
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(MemTable.FileColumnName),
      Expressions.column(MemTable.PosColumnName))
  override def representUpdateAsDeleteAndInsert(): Boolean = true
}

private[sources] final class MemDeltaWriteBuilder(k: String,
    rowSchema: StructType, expectedBase: Option[Long]) extends DeltaWriteBuilder {
  override def build(): DeltaWrite = new DeltaWrite {
    override def description(): String = "graft-snapshot delta (merge-on-read)"
    override def toBatch: DeltaBatchWrite =
      new MemDeltaBatchWrite(k, rowSchema, expectedBase)
  }
}

private[sources] final class MemDeltaBatchWrite(k: String, rowSchema: StructType,
    expectedBase: Option[Long]) extends DeltaBatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    val st = SnapshotStore.stateOf(k)
    MemDeltaWriterFactory(rowSchema, st.partitionCols, st.dataDir,
      RowFiles.sessionConf(), st.properties,
      if (rowSchema.isEmpty) Vector.empty
      else FieldIds.writeColsFor(st.schema, rowSchema),
      st.partitionTransforms)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.iterator.map(_.asInstanceOf[MemDeltaCommitMessage]).toVector
    SnapshotStore.commitDelta(k,
      msgs.flatMap(_.files), msgs.flatMap(_.deletes), expectedBase)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.iterator.map(_.asInstanceOf[MemDeltaCommitMessage]).toVector
    RowFiles.delete(msgs.flatMap(m =>
      m.files.map(_.path) ++ m.deletes.map(_.path)))
  }
}

private[sources] final case class MemDeltaCommitMessage(
    files: Array[SnapshotStore.DataFile],
    deletes: Array[SnapshotStore.DeleteFile]) extends WriterCommitMessage

/** Task-side delta writer: inserts stream through the shared
  * partition-routing writer (new data files); deletes buffer (data path →
  * positions) and flush at commit as one sorted position-delete file per
  * targeted data file — task memory is O(deleted rows of this task), the
  * positions themselves. */
private[sources] final case class MemDeltaWriterFactory(rowSchema: StructType,
    partitionCols: Seq[String], dataDir: String,
    fsConf: org.apache.spark.util.SerializableConfiguration,
    props: Map[String, String], writeCols: Vector[(Int, String)],
    transforms: Seq[PTransform] = Nil)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val tag = s"mor-p$partitionId-t$taskId-${UUID.randomUUID.toString.take(8)}"
      // LAZY: a pure DELETE plans WriteDelta with an EMPTY row schema (no
      // inserts exist), which cannot satisfy the partition-routing
      // writer's column lookup — and needs no data files at all.
      private var inserts: DataWriter[InternalRow] = null
      private def insertWriter: DataWriter[InternalRow] = {
        if (inserts == null)
          inserts = MemWriters.writer(rowSchema, partitionCols, dataDir,
            tag, fsConf.value, props, writeCols, transforms)
        inserts
      }
      private val positions = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
      private val writtenDeleteFiles = scala.collection.mutable.ArrayBuffer.empty[String]

      override def insert(row: InternalRow): Unit = insertWriter.write(row)
      override def delete(metadata: InternalRow, id: InternalRow): Unit =
        positions.getOrElseUpdate(id.getUTF8String(0).toString,
          scala.collection.mutable.ArrayBuffer.empty[Long]) += id.getLong(1)
      override def update(metadata: InternalRow, id: InternalRow,
          row: InternalRow): Unit = {
        // Unreachable under representUpdateAsDeleteAndInsert, but the
        // semantics are exactly delete + insert either way.
        delete(metadata, id); insert(row)
      }
      override def commit(): WriterCommitMessage = {
        val dataMsg =
          if (inserts == null) MemCommitMessage(Array.empty)
          else inserts.commit().asInstanceOf[MemCommitMessage]
        var seq = 0
        val dels = positions.iterator.map { case (dataPath, poss) =>
          val sorted = poss.distinct.sorted.toArray
          val path = s"$dataDir/$tag-del$seq.grfd"
          seq += 1
          RowFiles.writeDeletes(path, sorted, fsConf.value)
          writtenDeleteFiles += path
          SnapshotStore.DeleteFile(path, dataPath, sorted.length.toLong)
        }.toArray
        MemDeltaCommitMessage(dataMsg.files, dels)
      }
      override def abort(): Unit = {
        if (inserts != null) inserts.abort()
        writtenDeleteFiles.foreach { p =>
          val hp = new Path(p)
          try hp.getFileSystem(fsConf.value).delete(hp, false)
          catch { case _: Exception => () }
        }
      }
      override def close(): Unit = ()
    }
}

/** Write modes, resolved at build time, applied at the driver-side commit:
  * append, truncate, partition-scoped overwrite (static predicate or
  * dynamic by written partitions), or the row-level rewrite's file-grained
  * replace. */
/** TABLE SORT ORDER (Iceberg's `write.sort-order`, e.g. "ts" or
  * "region ASC, amount DESC"): a declarative clustering contract carried
  * as a table property. Batch WRITES enforce it through Spark's
  * [[RequiresDistributionAndOrdering]] (the engine sorts rows within each
  * write task before they reach the file writers — no writer-side
  * buffering), and COMPACTION restores it globally: partitioned tables
  * re-sort within each partition; unpartitioned tables range-repartition
  * on the sort key so each output file covers a DISJOINT range. The payoff
  * is per-file stats tightness — a range predicate on the sort key opens
  * O(matching) files instead of all of them. */
private[sources] object SortOrders {
  val Prop = "write.sort-order"

  /** `zorder(a, b)` spec (round 18): MULTI-DIMENSIONAL clustering as
    * declared table layout — Iceberg's OPTIMIZE ZORDER as a sort-order
    * strategy. Two integral columns interleave into a Morton key; writes
    * task-sort by it (via the catalog's `zorder2` V2 function) and
    * COMPACTION range-clusters by the manifest-normalized key, after
    * which point predicates on EITHER column open O(selectivity) files —
    * the two-column layout a linear `'a, b'` order cannot give (b is
    * unclustered within every run of a). Returns (colA, colB); None when
    * the property is absent or a linear spec; loud on a malformed or
    * ill-typed zorder form. */
  def zorderOf(props: Map[String, String], schema: StructType):
      Option[(String, String)] =
    props.get(Prop).map(_.trim).filter(_.nonEmpty).flatMap { spec =>
      if (!spec.toLowerCase.startsWith("zorder")) None
      else {
        val m = "(?i)^zorder\\s*\\(\\s*([^,()\\s]+)\\s*,\\s*([^,()\\s]+)\\s*\\)$"
          .r.findFirstMatchIn(spec).getOrElse(
            throw new IllegalArgumentException(
              s"$Prop zorder form must be 'zorder(<colA>, <colB>)', got '$spec'"))
        val cols = Seq(m.group(1), m.group(2))
        cols.foreach { c =>
          val f = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
            throw new IllegalArgumentException(
              s"$Prop names unknown column '$c' (schema: " +
                s"${schema.fieldNames.mkString(", ")})"))
          require(PartitionFunctions.zorderAccepts(f.dataType),
            s"$Prop zorder column '$c' must be integral " +
              s"(got ${f.dataType.catalogString}) — CAST or derive an " +
              "integral surrogate column")
        }
        require(!cols.head.equalsIgnoreCase(cols(1)),
          s"$Prop zorder needs two DISTINCT columns, got '$spec'")
        Some((cols.head, cols(1)))
      }
    }

  /** The per-file stamp of a zorder-enforced write — never equal to any
    * linear [[normalize]] form, so reads report NO ordering over
    * z-clustered files (correct: a Morton layout is not sorted by any
    * column). Field-id keyed like the linear stamp. */
  def zorderStamp(cols: (String, String), schema: StructType): Option[String] = {
    def idOf(c: String): Option[Int] =
      schema.fields.find(_.name.equalsIgnoreCase(c)).flatMap(FieldIds.idOf)
    for { a <- idOf(cols._1); b <- idOf(cols._2) } yield s"z:$a,$b"
  }

  /** Parse the property into (column, ascending) pairs; empty = unsorted
    * (a `zorder(…)` spec validates via [[zorderOf]] and reports NO linear
    * order — Morton clustering is not a column sort).
    * Fails loudly on unknown columns or malformed directions. */
  def of(props: Map[String, String], schema: StructType): Seq[(String, Boolean)] =
    props.get(Prop).map(_.trim).filter(_.nonEmpty).fold(
      Seq.empty[(String, Boolean)]) { spec =>
      if (spec.toLowerCase.startsWith("zorder")) {
        zorderOf(props, schema)
        return Nil
      }
      spec.split(',').toSeq.map { part =>
        val toks = part.trim.split("\\s+")
        require(toks.nonEmpty && toks.length <= 2,
          s"$Prop entry '$part' must be '<col> [ASC|DESC]'")
        val colName = toks(0)
        require(schema.fieldNames.exists(_.equalsIgnoreCase(colName)),
          s"$Prop names unknown column '$colName' (schema: " +
            s"${schema.fieldNames.mkString(", ")})")
        val asc = toks.lift(1).map(_.toUpperCase) match {
          case None | Some("ASC") => true
          case Some("DESC") => false
          case Some(other) =>
            throw new IllegalArgumentException(
              s"$Prop direction must be ASC or DESC, got '$other'")
        }
        (colName, asc)
      }
    }

  /** The connector-API ordering the write advertises. */
  def v2Ordering(order: Seq[(String, Boolean)]):
      Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    order.map { case (c, asc) =>
      Expressions.sort(Expressions.identity(c),
        if (asc) org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING
        else org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING)
    }.toArray

  /** The canonical per-file stamp of an enforced order — what
    * [[SnapshotStore.DataFile.sortKey]] records and scans compare with
    * the current property. Keyed by FIELD ID, not name: names are
    * reusable (RENAME a TO z; RENAME b TO a would make a name-keyed
    * stamp claim an order the files do not have — the same reused-name
    * trap the projection's `_graft_absent_` defense closes), ids are
    * rename-stable. None when any sort column lacks an id (legacy
    * pre-field-id tables): never stamp, never report. */
  def normalize(order: Seq[(String, Boolean)],
      schema: StructType): Option[String] = {
    val parts = order.map { case (c, asc) =>
      schema.fields.find(_.name.equalsIgnoreCase(c))
        .flatMap(FieldIds.idOf)
        .map(id => s"$id " + (if (asc) "asc" else "desc"))
    }
    if (parts.forall(_.isDefined)) Some(parts.map(_.get).mkString(","))
    else None
  }

  /** The current table order for READ-side reporting — never throws:
    * a sort-order property naming a since-dropped column just reports
    * nothing (the write path keeps its loud failure). */
  def forRead(props: Map[String, String], schema: StructType): Seq[(String, Boolean)] =
    if (props.get("read.report-ordering").exists(_.equalsIgnoreCase("false"))) Nil
    else try of(props, schema) catch { case _: Exception => Nil }
}

private[sources] final class MemWriteBuilder(k: String, writeSchema: StructType,
    partCols: PartitionPredicates.PartCols,
    forceReplace: Boolean = false, queryId: String = "",
    expectedBase: Option[Long] = None,
    rowLevelScanned: Option[() => Set[String]] = None,
    operationOverride: Option[String] = None)
    extends WriteBuilder with SupportsOverwriteV2 with SupportsDynamicOverwrite {

  private var replace = forceReplace
  private var overwritePreds: Option[Array[VPredicate]] = None
  private var dynamicParts = false

  override def truncate(): WriteBuilder = { replace = true; this }

  override def canOverwrite(predicates: Array[VPredicate]): Boolean =
    predicates.forall(PartitionPredicates.evaluable(_, partCols))

  /** INSERT OVERWRITE ... [WHERE p] — p must be decidable from identity-
    * partition values (whole files retire or survive); `true` is a plain
    * truncate. */
  override def overwrite(predicates: Array[VPredicate]): WriteBuilder = {
    require(canOverwrite(predicates),
      "overwrite predicates must be decidable from the table's identity " +
        s"partition columns ${partCols.keys.toSeq.sorted.mkString("(", ", ", ")")}; " +
        s"got: ${predicates.mkString(", ")}")
    replace = true
    if (!predicates.forall(_.name() == "ALWAYS_TRUE"))
      overwritePreds = Some(predicates)
    this
  }

  /** Dynamic partition overwrite: retire exactly the partitions the new
    * data lands in (Hive/Iceberg dynamic mode). */
  override def overwriteDynamicPartitions(): WriteBuilder = {
    replace = true
    dynamicParts = true
    this
  }

  override def build(): Write = {
    // Iceberg's write.distribution-mode=hash: ask Spark to CLUSTER the
    // incoming rows by the identity-partition columns, so each partition
    // lands wholly in one task and the write produces one file per
    // partition instead of (tasks × partitions) — the first operational
    // lever against small-file explosion on partitioned tables. Off by
    // default (a table property opt-in): clustering is one extra shuffle
    // per write, the wrong trade for single-partition appends.
    val st = SnapshotStore.stateOf(k)
    val hashDistribute = st.partitionCols.nonEmpty &&
      st.properties.get("write.distribution-mode").exists(_.equalsIgnoreCase("hash"))
    // `write.sort-order`: the engine sorts each task's rows before they
    // reach the writers, so every produced file is internally clustered
    // and its sort-key stats are tight ([[SortOrders]]).
    val sortOrder = SortOrders.of(st.properties, st.schema)
      .filter { case (c, _) => writeSchema.fieldNames.exists(_.equalsIgnoreCase(c)) }
    // `zorder(a, b)` layout: the write's required ordering is the Morton
    // key, expressed as the catalog-served `zorder2` V2 function
    // (Spark's DistributionAndOrderingUtils resolves it through this
    // catalog's FunctionCatalog face) — each task's file is z-clustered,
    // so BOTH dimensions' per-file stats tighten. Compaction restores
    // the layout globally with manifest-normalized dimensions.
    val zorder = SortOrders.zorderOf(st.properties, st.schema).filter {
      case (a, b) => Seq(a, b).forall(c =>
        writeSchema.fieldNames.exists(_.equalsIgnoreCase(c)))
    }
    // write.distribution-mode=range + a sort order = a GLOBAL range sort
    // (Iceberg's range mode): Spark range-partitions the incoming rows on
    // the sort key, so each task's file covers a DISJOINT key range —
    // tight per-file stats straight from the write, not only after
    // compaction. Plain sort order without range mode = task-local sort.
    val rangeDistribute = (sortOrder.nonEmpty || zorder.nonEmpty) &&
      st.properties.get("write.distribution-mode").exists(_.equalsIgnoreCase("range"))
    val v2Order: Array[org.apache.spark.sql.connector.expressions.SortOrder] =
      zorder match {
        case Some((a, b)) => Array(Expressions.sort(
          Expressions.apply("zorder2",
            Expressions.column(a), Expressions.column(b)),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
        case None => SortOrders.v2Ordering(sortOrder)
      }
    if (hashDistribute || rangeDistribute || sortOrder.nonEmpty || zorder.nonEmpty)
      new GraftWrite(
        zorder.flatMap(SortOrders.zorderStamp(_, st.schema)).getOrElse(
          if (sortOrder.isEmpty) ""
          else SortOrders.normalize(sortOrder, st.schema).getOrElse("")))
          with RequiresDistributionAndOrdering {
        override def requiredDistribution():
            org.apache.spark.sql.connector.distributions.Distribution =
          if (rangeDistribute)
            org.apache.spark.sql.connector.distributions.Distributions.ordered(
              v2Order)
          else if (hashDistribute)
            org.apache.spark.sql.connector.distributions.Distributions.clustered(
              st.partitionCols.map(c => Expressions.identity(c): VExpression).toArray)
          else
            org.apache.spark.sql.connector.distributions.Distributions.unspecified()
        override def requiredOrdering():
            Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          v2Order
      }
    else new GraftWrite
  }

  /** `sortStamp`: the normalized order the write ENFORCED (via
    * [[RequiresDistributionAndOrdering]]) — every produced file's rows
    * are sorted under it, recorded per file so reads can report ordering. */
  private class GraftWrite(sortStamp: String = "") extends Write {
    override def description(): String =
      s"graft-snapshot ${if (replace) "replace" else "append"}"
    override def toBatch: BatchWrite = {
      val selector: Option[SnapshotStore.TableState => Vector[SnapshotStore.DataFile]] =
        (rowLevelScanned, overwritePreds) match {
          case (Some(scanned), _) =>
            // Row-level rewrite: retire exactly the files the pruned scan
            // read. Evaluated at commit time, after runtime group filtering
            // (the OCC base check guarantees commit-time state == the
            // scanned base, so the paths still resolve).
            Some(cur => {
              val paths = scanned()
              cur.currentFiles.filter(f => paths(f.path))
            })
          case (_, Some(preds)) =>
            Some { cur =>
              val pruning = SnapshotStore.specPruningOf(cur)
              // The overwrite decides per FILE under its own spec; a file
              // whose spec cannot decide must fail loudly, not silently
              // survive (Iceberg rejects undeterminable overwrites too).
              cur.liveSpecIds.foreach(id => require(
                preds.forall(PartitionPredicates.evaluable(_, pruning(id)._1)),
                s"INSERT OVERWRITE predicate is not decidable under " +
                  s"partition spec $id (spec evolution) — run CALL " +
                  "<catalog>.system.rewrite_data_files to converge specs"))
              cur.currentFiles.filter(f =>
                PartitionPredicates.matchesAllDecided(
                  preds.toSeq, pruning(f.specId)._1, f.partitionValues))
            }
          case _ => None // plain truncate (if replace) or append
        }
      operationOverride.foreach(_ => require(replace,
        "graft.operation=replace is only valid on a truncate-overwrite " +
          "(compaction) write, not an append"))
      new MemBatchWrite(k, writeSchema, replace,
        // Base validation applies only to row-level rewrites; a user
        // truncate/overwrite is last-writer-wins by SQL semantics.
        if (forceReplace) expectedBase else None,
        selector, dynamicParts, operationOverride, sortStamp)
    }
    override def toStreaming:
        org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      require(!replace,
        "streaming writes to the snapshot catalog are append-only " +
          "(complete/truncate modes would rewrite history per epoch)")
      new MemStreamingWrite(k, writeSchema, queryId)
    }
  }
}

/** Exactly-once streaming SINK: each epoch's rows stream to per-task data
  * files and land as ONE epoch-stamped append commit at the driver-side
  * commit point — [[SnapshotStore.commitEpoch]] no-ops replayed epochs
  * (deleting their orphan files), so a restarted or retried micro-batch
  * never double-appends. The mirror of [[MemMicroBatchStream]]: a table can
  * be streamed INTO and OUT OF, each epoch becoming one time-travelable
  * snapshot version. */
private[sources] final class MemStreamingWrite(k: String, writeSchema: StructType,
    queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo):
      org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val st = SnapshotStore.stateOf(k)
    MemStreamWriterFactory(writeSchema, st.partitionCols, st.dataDir,
      RowFiles.sessionConf(), st.properties,
      FieldIds.writeColsFor(st.schema, writeSchema),
      st.partitionTransforms, st.currentSpecId)
  }
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.iterator
      .map(_.asInstanceOf[MemCommitMessage])
      .flatMap(_.files)
      .toVector
    SnapshotStore.commitEpoch(k, queryId, epochId, files)
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    RowFiles.delete(messages.iterator.map(_.asInstanceOf[MemCommitMessage])
      .flatMap(_.files).map(_.path).toSeq)
}

/** Executor tasks stream rows to data files and ship back file descriptors;
  * the driver-side commit point splices them into one new snapshot —
  * all-or-nothing visibility, like any V2 batch write. */
private[sources] final class MemBatchWrite(k: String, writeSchema: StructType,
    replace: Boolean, expectedBase: Option[Long] = None,
    replacedSelector: Option[SnapshotStore.TableState => Vector[SnapshotStore.DataFile]] = None,
    dynamicParts: Boolean = false,
    operationOverride: Option[String] = None,
    sortStamp: String = "") extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val st = SnapshotStore.stateOf(k)
    new MemWriterFactory(writeSchema, st.partitionCols, st.dataDir,
      RowFiles.sessionConf(), st.properties,
      FieldIds.writeColsFor(st.schema, writeSchema),
      st.partitionTransforms, st.currentSpecId)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.iterator
      .map(_.asInstanceOf[MemCommitMessage])
      .flatMap(_.files)
      .map(f => if (sortStamp.isEmpty) f else f.copy(sortKey = sortStamp))
      .toVector
    val selector =
      if (!dynamicParts) replacedSelector
      else {
        // Dynamic overwrite: retire the partitions the new files land in.
        // Partition identity is the TRANSFORMED value tuple — comparable
        // only within one spec, so mixed-spec tables must converge first.
        // Content-normalized: binary partition values compare by
        // reference raw, and a missed match here APPENDS instead of
        // replacing (duplicate rows).
        val newParts = files.map(f =>
          SnapshotStore.comparablePartition(f.partitionValues)).toSet
        Some((cur: SnapshotStore.TableState) => {
          val stale = cur.currentFiles.filter(_.specId != cur.currentSpecId)
          require(stale.isEmpty,
            s"dynamic partition overwrite needs every live file on the " +
              s"current partition spec, but ${stale.size} file(s) carry a " +
              "retired spec — run CALL <catalog>.system.rewrite_data_files " +
              "first")
          cur.currentFiles.filter(f =>
            newParts(SnapshotStore.comparablePartition(f.partitionValues)))
        })
      }
    SnapshotStore.commit(k, files, replace, expectedBase, selector,
      operationOverride)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    RowFiles.delete(messages.iterator.map(_.asInstanceOf[MemCommitMessage])
      .flatMap(_.files).map(_.path).toSeq)
}

private[sources] final case class MemCommitMessage(files: Array[SnapshotStore.DataFile])
    extends WriterCommitMessage

/** Top-level case class (Serializable) — a lambda here would capture the
  * non-serializable StreamingWrite instance and fail task serialization. */
private[sources] final case class MemStreamWriterFactory(writeSchema: StructType,
    partitionCols: Seq[String], dataDir: String,
    fsConf: org.apache.spark.util.SerializableConfiguration,
    props: Map[String, String], writeCols: Vector[(Int, String)],
    transforms: Seq[PTransform] = Nil, specId: Int = 0)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    MemWriters.writer(writeSchema, partitionCols, dataDir,
      s"e$epochId-p$partitionId-t$taskId-${UUID.randomUUID.toString.take(8)}",
      fsConf.value, props, writeCols, transforms, specId)
}

private[sources] object MemWriters {
  /** Shared batch/streaming task writer: routes each row to its partition's
    * file (opened lazily per distinct partition value tuple) and streams it
    * straight through — no task-side row buffering, so task memory is
    * O(open files), not O(rows). `format` picks the data-file format
    * ([[DataFiles]]); per-file column stats ride back in the descriptor. */
  def writer(writeSchema: StructType, partitionCols: Seq[String],
      dataDir: String, taskTag: String,
      conf: Configuration,
      props: Map[String, String] = Map.empty,
      writeCols: Vector[(Int, String)] = Vector.empty,
      transforms: Seq[PTransform] = Nil,
      /** The partition SPEC id the partitionCols/transforms above belong
        * to — stamped into each file descriptor at WRITE time (the values
        * are shaped by this spec); the commit validates it against the
        * then-current spec, so a concurrent evolve_partition_spec is a
        * LOUD conflict, never a mislabeled file. */
      specId: Int = 0): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val format = DataFiles.formatOf(props)
      // Stats come back keyed by write-schema NAME; the descriptor keys
      // them by FIELD ID (stable across renames). Name → id via writeCols.
      private val idByName: Map[String, Int] = writeCols.map(_.swap).toMap
      private val proj = UnsafeProjection.create(writeSchema)
      private val ords = partitionCols.map { c =>
        require(writeSchema.fieldNames.contains(c),
          s"write schema ${writeSchema.fieldNames.mkString("(", ", ", ")")} " +
            s"is missing partition column $c")
        writeSchema.fieldIndex(c)
      }.toArray
      private val types = ords.map(writeSchema.fields(_).dataType)
      // Hidden partitioning: each row's routing key is the TRANSFORMED
      // value (identity = pass-through), so a `days(ts)` table opens one
      // file per day per task, not one per distinct timestamp.
      private val tfs: Array[PTransform] =
        if (transforms.isEmpty) partitionCols.map(_ => PIdentity).toArray
        else transforms.toArray
      private def tval(u: UnsafeRow, i: Int): Any =
        tfs(i).eval(u.get(ords(i), types(i)), types(i))
      private val open = scala.collection.mutable.LinkedHashMap
        .empty[Seq[Any], (DataFiles.RowFileWriter, String, Seq[Any])]
      private var fileSeq = 0
      // Hot-path fast paths: unpartitioned tables route every row to ONE
      // writer with zero per-row allocation, and partitioned writes are
      // typically clustered (runs of equal partition values — guaranteed
      // under write.distribution-mode=hash), so an element-wise compare
      // against the LAST key usually short-circuits the Seq allocation +
      // map lookup.
      private var lastKey: Seq[Any] = null
      private var lastWriter: DataFiles.RowFileWriter = null

      private def sameAsLast(u: UnsafeRow): Boolean = {
        if (lastKey == null) return false
        var i = 0
        while (i < ords.length) {
          val v = tval(u, i)
          val lv = lastKey(i)
          if (if (v == null) lv != null else !v.equals(lv)) return false
          i += 1
        }
        true
      }

      private def writerFor(u: UnsafeRow): DataFiles.RowFileWriter = {
        if (ords.isEmpty) {
          if (lastWriter == null) lastWriter = register(Vector.empty)
          return lastWriter
        }
        if (sameAsLast(u)) return lastWriter
        // The probe key holds views into the reused row buffer — fine for
        // lookup (UTF8String equality is content-based); deep-copy only
        // when registering a new partition.
        val probe: Seq[Any] =
          ords.indices.map(i => tval(u, i)).toVector
        val w = open.get(probe) match {
          case Some((existing, _, key)) => lastKey = key; existing
          case None =>
            val copied: Seq[Any] = probe.map(v =>
              if (v == null) null else InternalRow.copyValue(v)).toVector
            lastKey = copied
            register(copied)
        }
        lastWriter = w
        w
      }

      private def register(key: Seq[Any]): DataFiles.RowFileWriter = {
        val path = s"$dataDir/$taskTag-$fileSeq${DataFiles.extensionOf(format)}"
        fileSeq += 1
        val w = DataFiles.writer(path, writeSchema, conf, props)
        open.put(key, (w, path, key))
        w
      }

      override def write(row: InternalRow): Unit = {
        val u = proj(row)
        writerFor(u).write(u)
      }
      // Metadata-carrying writes (the projecting ReplaceData task): `_file`
      // is required to force the projection and feed the group filter; the
      // written row carries data columns only.
      override def write(metadata: InternalRow, row: InternalRow): Unit = write(row)
      override def commit(): WriterCommitMessage = {
        val files = open.valuesIterator.map { case (w, path, pv) =>
          val meta = w.close()
          val idStats = meta.stats.flatMap { case (n, s) =>
            idByName.get(n).map(_ -> s) }
          SnapshotStore.DataFile(path, pv, w.rowCount, idStats,
            meta.sizeBytes, meta.splitPoints, writeCols = writeCols,
            specId = specId)
        }.toArray
        open.clear()
        MemCommitMessage(files)
      }
      override def abort(): Unit = {
        open.valuesIterator.foreach(_._1.abort())
        open.clear()
      }
      override def close(): Unit = ()
    }
}

private[sources] final class MemWriterFactory(writeSchema: StructType,
    partitionCols: Seq[String], dataDir: String,
    fsConf: org.apache.spark.util.SerializableConfiguration,
    props: Map[String, String],
    writeCols: Vector[(Int, String)],
    transforms: Seq[PTransform] = Nil, specId: Int = 0) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    MemWriters.writer(writeSchema, partitionCols, dataDir,
      s"p$partitionId-t$taskId-${UUID.randomUUID.toString.take(8)}",
      fsConf.value, props, writeCols, transforms, specId)
}

/** Plain read path: column pruning plus file-level partition pruning from
  * pushed predicates (a `WHERE partCol = 'x'` scan opens only that
  * partition's files — predicates stay residual, pruning only has to be
  * sound). */
private[sources] final class MemScanBuilder(fullSchema: StructType,
    partCols: PartitionPredicates.PartCols,
    files: () => Vector[SnapshotStore.DataFile], streamKey: Option[String] = None,
    maxVersionsPerTrigger: Option[Long] = None,
    startingVersion: Option[String] = None,
    deletes: Map[String, Vector[String]] = Map.empty,
    splitTargetBytes: Long = ScanSplits.DefaultTargetBytes,
    eqDeletes: Vector[SnapshotStore.DeleteFile] = Vector.empty,
    tFields: Seq[TransformPruning.TField] = Nil,
    typeHist: Map[Int, Vector[(Long, DataType)]] = Map.empty,
    /** Per-SPEC pruning contexts (partition-spec evolution): each file is
      * pruned through the spec IT was written under. Empty = single-spec
      * table (partCols/tFields apply to every file). */
    specPruning: Map[Int, (PartitionPredicates.PartCols, Seq[TransformPruning.TField])] =
      Map.empty,
    /** CHUNK-SKIPPING planning (lazy chunked manifests): the chunk index
      * with per-chunk partition summaries, a per-chunk loader, and the
      * per-spec identity-position maps — when pushed predicates can
      * exclude a whole chunk, its manifest file is never read, so
      * planning IO is O(matching chunks), not O(inventory) (Iceberg's
      * manifest-list filtering). */
    chunked: Option[(Vector[MetadataLog.ChunkEntry],
      String => Vector[SnapshotStore.DataFile],
      Map[Int, Map[String, (Int, DataType)]])] = None,
    /** Table property `read.vectorized` (default true): the operational
      * off-switch for batch decode — and the bench lane's row-decode
      * twin (cat05). */
    vectorized: Boolean = true,
    /** STORAGE-PARTITIONED JOINS: the current spec's transforms, reported
      * as `KeyGroupedPartitioning` when set (table property
      * `read.preserve-partitioning` — opt-in like Iceberg's
      * preserve-data-grouping, because grouping tasks by partition value
      * caps a plain full scan's parallelism at the partition count). */
    spjKeys: Option[Array[Transform]] = None,
    currentSpecId: Int = 0,
    /** The table's current `write.sort-order` for READ-side ordering
      * reporting ([[SortOrders.forRead]]); Nil = never report. */
    tableSortOrder: Seq[(String, Boolean)] = Nil,
    /** Equi-height histograms ([[StatsHistograms]]) with their stamp
      * version, keyed by FIELD ID; served to CBO only by scans whose
      * pruning dropped NOTHING the bins describe (pre-stamp files). */
    histograms: Option[(Long, Map[Int, StatsHistograms.ColHist])] = None,
    /** K-way merge fan-in bound for sorted-overlapping ORDER BY planning
      * ([[MemScan.mergeGroups]]); 0 = disabled. */
    mergeFanIn: Int = SortedScanMergePlanning.DefaultFanIn,
    /** Runtime data-column file skipping (sort/bloom columns reported
      * as dynamically filterable). */
    runtimeFileSkipping: Boolean = true)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownV2Filters {
  private val statCols = StatsPredicates.statCols(fullSchema)
  private var required: StructType = fullSchema
  private var pushed: Array[VPredicate] = Array.empty
  private var statsUsable: Array[VPredicate] = Array.empty
  private var transformUsable: Array[VPredicate] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushPredicates(predicates: Array[VPredicate]): Array[VPredicate] = {
    // Three pruning channels, all file-level and all SOUND: identity-
    // partition predicates decide from a file's constant partition values;
    // HIDDEN-partitioning predicates push a DATA predicate through the
    // partition transform (`ts BETWEEN …` prunes day files); anything else
    // referencing a stats-tracked column skips files whose (min, max,
    // nullCount) cannot satisfy it. All predicates stay residual — the
    // engine re-applies them row-level after the scan.
    pushed = predicates.filter(PartitionPredicates.evaluable(_, partCols))
    transformUsable = predicates.filter(p =>
      !pushed.contains(p) && TransformPruning.usable(p, tFields))
    statsUsable = predicates.filter(p =>
      !pushed.contains(p) && !transformUsable.contains(p) &&
        StatsPredicates.usable(p, statCols))
    predicates
  }
  override def pushedPredicates(): Array[VPredicate] =
    pushed ++ transformUsable ++ statsUsable
  /** The pruning context for one FILE: its own spec's identity map and
    * transform fields (pre-evolution tables fall back to the builder's). */
  private def specOf(f: SnapshotStore.DataFile):
      (PartitionPredicates.PartCols, Seq[TransformPruning.TField]) =
    if (specPruning.isEmpty) (partCols, tFields)
    else specPruning.getOrElse(f.specId, (partCols, tFields))

  /** The files this scan plans over: through the chunk index (skipping
    * whole chunks whose identity-column ranges a pushed predicate
    * excludes) when available AND some predicate pushed; the plain
    * (cached) inventory otherwise. */
  private def sourceFiles(): Vector[SnapshotStore.DataFile] = chunked match {
    case Some((index, load, identCols))
        if pushed.nonEmpty || transformUsable.nonEmpty || statsUsable.nonEmpty =>
      val preds = pushed ++ transformUsable ++ statsUsable
      index.filter { ce =>
        val cols = identCols.getOrElse(ce.specId, Map.empty)
        if (cols.isEmpty || ce.ranges.isEmpty) true
        else {
          // nullState rides as the nulls count against rowCount = 2:
          // 0 = no nulls, 1 = some, 2 = all — exactly the three cases
          // StatsPredicates' null logic distinguishes.
          val stats = ce.ranges.zipWithIndex.map { case ((mn, mx, ns), pos) =>
            pos -> SnapshotStore.ColStats(mn, mx, ns)
          }.toMap
          !preds.exists(p => StatsPredicates.usable(p, cols) &&
            StatsPredicates.definitelyExcludes(p, cols, stats, 2L))
        }
      }.flatMap(ce => load(ce.name))
    case _ => files()
  }

  override def build(): Scan = {
    val src = sourceFiles()
    val retained = src.filter { f =>
      val (pc, tf) = specOf(f)
      !pushed.exists(
        PartitionPredicates.definitelyExcludes(_, pc, f.partitionValues)) &&
      !transformUsable.exists(
        TransformPruning.definitelyExcludes(_, tf, f.partitionValues)) &&
      !statsUsable.exists(
        StatsPredicates.definitelyExcludes(_, statCols, f.stats, f.rowCount))
    }
    // O(chunks) plan-time statistics: when the scan retained EVERY file
    // (nothing pushed → nothing pruned) and the lazy chunk index carries
    // pre-merged summaries, column stats merge |chunks| register arrays
    // instead of |files| — byte-identical results (HLL union is
    // associative). A pruned scan keeps the per-file merge: its tighter
    // file set IS the estimate.
    val chunkNdv = chunked match {
      case Some((index, _, _))
          if pushed.isEmpty && transformUsable.isEmpty &&
            statsUsable.isEmpty && index.nonEmpty =>
        Some(index.map(_.stats))
      case _ => None
    }
    new MemScan(fullSchema, required, retained, streamKey, maxVersionsPerTrigger,
      startingVersion, deletes, partCols, splitTargetBytes, eqDeletes,
      typeHist = typeHist, specPruning = specPruning, vectorized = vectorized,
      spjKeys = spjKeys, currentSpecId = currentSpecId, chunkNdv = chunkNdv,
      tableSortOrder = tableSortOrder, mergeFanIn = mergeFanIn,
      runtimeFileSkipping = runtimeFileSkipping,
      // Histograms only when pruning dropped NOTHING the bins describe:
      // a predicate-pruned STAMPED file would double-count the predicate
      // (the filter estimate re-applies it over the histogram), but a
      // pruned file sequenced PAST the stamp holds rows the bins never
      // saw — dropping it is free. Chunk-skipped scans suppress rather
      // than force the full inventory to compare.
      histograms = histograms match {
        case Some((stampV, m))
            if (chunked.isEmpty || (pushed.isEmpty &&
              transformUsable.isEmpty && statsUsable.isEmpty)) && {
              retained.size == src.size || {
                val kept = retained.iterator.map(_.path).toSet
                src.forall(f => kept(f.path) || f.seq > stampV)
              }
            } => m
        case _ => Map.empty
      })
  }
}

/** One scan partition per data-file SLICE — whole file by default;
  * split-planned big files carry a byte range plus the slice's starting
  * physical row index so `_pos` identity (and with it position deletes and
  * row-level rewrites) is split-agnostic. The descriptor's counts bound the
  * read without opening the file. */
private[sources] final case class MemFilePartition(path: String, rowCount: Long,
    deletePaths: Seq[String] = Nil, rowStart: Long = 0L,
    byteStart: Long = 0L, byteEnd: Long = Long.MaxValue,
    writeCols: Seq[(Int, String)] = Nil,
    /** Equality-delete files APPLICABLE to this data file (delete seq >
      * file seq), as (path, key field ids, entry count) — the reader
      * probes each row's key tuple against their union. */
    eqDeletePaths: Seq[(String, Seq[Int], Long)] = Nil,
    /** The file's data sequence number — resolves its WRITE-TIME column
      * types through the table's type-widening history. */
    seq: Long = 0L,
    /** The file's constant TRANSFORMED partition values (spec order) —
      * the partition key storage-partitioned joins group tasks by. Empty
      * for unpartitioned tables (the scan then never reports key-grouped
      * partitioning, so `partitionKey` is never consulted). */
    partitionValues: Seq[Any] = Nil)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  def split: DataFiles.Split = DataFiles.Split(rowStart, rowCount, byteStart, byteEnd)
  override def partitionKey(): InternalRow =
    new ce.GenericInternalRow(partitionValues.toArray)
}

/** SPLIT-BY-OFFSET scan planning: cut each data file into tasks of about
  * `read.split.target-bytes` (default 128 MiB) on its recorded chunk
  * boundaries. Without this, `planInputPartitions` emits one task per file
  * and a compacted one-file partition SERIALIZES its whole scan — at 100 TB
  * the compaction that should help reads would cap their parallelism.
  * Files without split metadata (legacy descriptors) stay whole-file. */
private[sources] object ScanSplits {
  val DefaultTargetBytes: Long = 128L << 20

  def targetBytes(props: Map[String, String]): Long =
    props.get("read.split.target-bytes").map(_.toLong)
      .getOrElse(DefaultTargetBytes)

  /** `read.vectorized` table property — batch decode on by default. */
  def vectorizedEnabled(props: Map[String, String]): Boolean =
    props.get("read.vectorized").forall(_.toBoolean)

  def partitions(files: Vector[SnapshotStore.DataFile],
      deletes: Map[String, Vector[String]],
      target: Long,
      eqDels: Vector[SnapshotStore.DeleteFile] = Vector.empty,
      /** Live field types for KEY-RANGE pruning of equality deletes
        * ([[SnapshotStore.eqApplies]]); empty = sequence rule only. */
      idTypes: Map[Int, DataType] = Map.empty): Array[InputPartition] =
    files.filter(_.rowCount > 0).flatMap { f =>
      val dels = deletes.getOrElse(f.path, Vector.empty)
      // An equality delete applies to STRICTLY OLDER files — rows appended
      // in the delete's own commit (equal seq) are the upsert's winners —
      // and only where its key ranges can overlap the file's.
      val eqs = eqDels.filter(SnapshotStore.eqApplies(_, f, idTypes))
        .map(d => (d.path, d.equalityCols, d.entryCount))
      val pts = f.splitPoints
      if (pts.length <= 1 || f.sizeBytes <= 0L || f.sizeBytes <= target)
        Vector(MemFilePartition(f.path, f.rowCount, dels,
          writeCols = f.writeCols, eqDeletePaths = eqs,
          seq = f.seq, partitionValues = f.partitionValues): InputPartition)
      else {
        // Greedily group consecutive chunks until a split reaches target.
        // Every recorded point starts a non-empty chunk, so (rowEnd >
        // rowStart) holds; guarded anyway against a degenerate descriptor.
        val out = Vector.newBuilder[InputPartition]
        var startIdx = 0
        var i = 1
        while (i <= pts.length) {
          val endByte = if (i == pts.length) f.sizeBytes else pts(i)._2
          if (i == pts.length || endByte - pts(startIdx)._2 >= target) {
            val rowStart = pts(startIdx)._1
            val rowEnd = if (i == pts.length) f.rowCount else pts(i)._1
            if (rowEnd > rowStart)
              out += MemFilePartition(f.path, rowEnd - rowStart, dels,
                rowStart, pts(startIdx)._2, endByte, f.writeCols, eqs, f.seq,
                f.partitionValues)
            startIdx = i
          }
          i += 1
        }
        out.result()
      }
    }.toArray
}

private[sources] object MemReaders {
  /** field id → WRITE-TIME type for the columns of `readSchema` a type
    * widen re-typed AFTER the file of data sequence number `seq` was
    * written — what [[DataFiles.projectionFor]] needs to decode the file
    * natively and up-cast. Empty (the zero-cost path) unless the table
    * was ever widened. */
  def widenOverrides(typeHist: Map[Int, Vector[(Long, DataType)]],
      readSchema: StructType, seq: Long): Map[Int, DataType] =
    if (typeHist.isEmpty) Map.empty
    else readSchema.fields.iterator.flatMap { f =>
      FieldIds.idOf(f).flatMap(id =>
        typeHist.get(id).flatMap(_.find(seq <= _._1)).collect {
          case (_, wt) if wt != f.dataType => id -> wt
        })
    }.toMap

  /** An equality-delete KEY tuple as a hash-set element: array-backed with
    * content equality/hash. Exists so the innermost scan loop can probe
    * with ONE REUSABLE instance (fill the array in place, `contains`) —
    * the Vector-per-row-per-group allocation this replaces was a measured
    * tax on every row of every older file while any equality delete was
    * live. Stored instances (built once per delete file) hold copied
    * values and are never mutated; only each reader's private probe
    * instance is. */
  private[sources] final class EqKey(val values: Array[Any]) {
    override def hashCode: Int = {
      // Arrays.hashCode over the boxed values — content-based for
      // UTF8String/Decimal/boxed primitives, matching equals below.
      var h = 1
      var i = 0
      while (i < values.length) {
        val v = values(i)
        h = 31 * h + (if (v == null) 0 else v.hashCode)
        i += 1
      }
      h
    }
    override def equals(o: Any): Boolean = o match {
      case k: EqKey =>
        val a = values; val b = k.values
        if (a.length != b.length) return false
        var i = 0
        while (i < a.length) {
          val x = a(i); val y = b(i)
          if (if (x == null) y != null else !x.equals(y)) return false
          i += 1
        }
        true
      case _ => false
    }
  }

  /** Per-reader probe over a set of equality-delete key groups: one
    * preallocated key buffer per group, filled in place per row — zero
    * per-row allocation. NOT thread-safe (one instance per partition
    * reader, the PartitionReader contract). */
  private[sources] final class EqProbe(
      groups: Array[(Array[Int], java.util.HashSet[EqKey])],
      readSchema: StructType) {
    private val probes = groups.map { case (ords, _) =>
      new EqKey(new Array[Any](ords.length)) }
    private val types = groups.map { case (ords, _) =>
      ords.map(o => readSchema.fields(o).dataType) }
    def isEmpty: Boolean = groups.isEmpty
    def nonEmpty: Boolean = groups.nonEmpty
    /** Does row `r` (in `readSchema` shape) match ANY of the key sets? */
    def matched(r: InternalRow): Boolean = {
      var g = 0
      while (g < groups.length) {
        val ords = groups(g)._1
        val pk = probes(g)
        var i = 0
        while (i < ords.length) {
          val o = ords(i)
          pk.values(i) = if (r.isNullAt(o)) null else r.get(o, types(g)(i))
          i += 1
        }
        if (groups(g)._2.contains(pk)) return true
        g += 1
      }
      false
    }
  }

  /** JVM-wide soft cache of equality-delete key sets, keyed by file path —
    * sound because delete files are IMMUTABLE once committed. Soft
    * references let the sets go under memory pressure (they reload). */
  private val eqSetCache = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.ref.SoftReference[java.util.HashSet[EqKey]]]()

  /** UP-CASTING view over a decoded column vector — how a vectorized
    * scan serves a column WIDENED after this file was written
    * ([[TypeWidening]]) without demoting to the row path: the file
    * decodes natively in its write-time type (the delegate) and every
    * read of the LIVE type converts on access. Promotions are exactly
    * [[TypeWidening.safePromotion]]'s (byte/short/int → wider ints,
    * float → double, decimal precision/scale-up), all between scalar
    * vectorizable types, so only the scalar accessors convert; nulls
    * delegate untouched. Decimal re-precisions per access (allocation
    * on the widened-decimal path only — never on the hot never-widened
    * path, which skips wrapping entirely). */
  private[sources] final class WidenedColumnVector(
      d: org.apache.spark.sql.vectorized.ColumnVector,
      from: DataType, to: DataType)
      extends org.apache.spark.sql.vectorized.ColumnVector(to) {
    import org.apache.spark.sql.types.{ByteType, DecimalType, FloatType, IntegerType, ShortType}
    // NO-OP close (like [[SelectedColumnVector]]): the delegate is the
    // DECODER's reusable vector, owned and closed by the reader itself —
    // Spark closes each emitted batch, and a delegating close here would
    // free the reader's buffers mid-stream (NPE on the next decode).
    override def close(): Unit = ()
    override def hasNull: Boolean = d.hasNull
    override def numNulls(): Int = d.numNulls()
    override def isNullAt(i: Int): Boolean = d.isNullAt(i)
    override def getBoolean(i: Int): Boolean = d.getBoolean(i)
    override def getByte(i: Int): Byte = d.getByte(i)
    override def getShort(i: Int): Short = from match {
      case ByteType => d.getByte(i).toShort
      case _ => d.getShort(i)
    }
    override def getInt(i: Int): Int = from match {
      case ByteType => d.getByte(i).toInt
      case ShortType => d.getShort(i).toInt
      case _ => d.getInt(i)
    }
    override def getLong(i: Int): Long = from match {
      case ByteType => d.getByte(i).toLong
      case ShortType => d.getShort(i).toLong
      case IntegerType => d.getInt(i).toLong
      case _ => d.getLong(i)
    }
    override def getFloat(i: Int): Float = d.getFloat(i)
    override def getDouble(i: Int): Double = from match {
      case FloatType => d.getFloat(i).toDouble
      case _ => d.getDouble(i)
    }
    override def getDecimal(i: Int, precision: Int, scale: Int):
        org.apache.spark.sql.types.Decimal = from match {
      case dt: DecimalType =>
        val v = d.getDecimal(i, dt.precision, dt.scale)
        // Re-precision through the public constructor (exact: widening
        // only ever grows precision/scale, so setScale cannot round).
        if (v == null) null
        else org.apache.spark.sql.types.Decimal(
          v.toJavaBigDecimal.setScale(scale), precision, scale)
      case _ => d.getDecimal(i, precision, scale)
    }
    override def getUTF8String(i: Int): org.apache.spark.unsafe.types.UTF8String =
      d.getUTF8String(i)
    override def getBinary(i: Int): Array[Byte] = d.getBinary(i)
    override def getArray(i: Int): org.apache.spark.sql.vectorized.ColumnarArray =
      d.getArray(i)
    override def getMap(i: Int): org.apache.spark.sql.vectorized.ColumnarMap =
      d.getMap(i)
    override def getChild(ordinal: Int): org.apache.spark.sql.vectorized.ColumnVector =
      d.getChild(ordinal)
  }

  /** Zero-copy SELECTION over a decoded column vector: row `i` of this
    * vector is row `sel(i)` of the delegate — how a vectorized scan keeps
    * its ColumnarBatch shape when merge-on-read deletes drop rows
    * (Iceberg's vectorized reads filter through the same row-id remap).
    * The emitted batch's row count bounds the valid range; `sel` is
    * reused batch-to-batch (the standard valid-until-`next()` reader
    * contract, same as the decoder's own vector reuse). Struct children
    * share the parent's row ids, so they remap through the SAME
    * selection; array/map payloads live in child vectors addressed by
    * offsets the delegate returns, so those pass through untouched. */
  private[sources] final class SelectedColumnVector(
      d: org.apache.spark.sql.vectorized.ColumnVector, sel: Array[Int])
      extends org.apache.spark.sql.vectorized.ColumnVector(d.dataType) {
    private lazy val kids: Array[SelectedColumnVector] = d.dataType match {
      case s: StructType =>
        Array.tabulate(s.length)(i => new SelectedColumnVector(d.getChild(i), sel))
      case _ => Array.empty
    }
    /** The delegate is owned by the decode stream; never double-close. */
    override def close(): Unit = ()
    // Pre-selection approximations: may report nulls the selection
    // dropped. Sound — they only force per-row isNullAt checks downstream,
    // never skip them (under-reporting would be the unsafe direction).
    override def hasNull: Boolean = d.hasNull
    override def numNulls: Int = d.numNulls
    override def isNullAt(i: Int): Boolean = d.isNullAt(sel(i))
    override def getBoolean(i: Int): Boolean = d.getBoolean(sel(i))
    override def getByte(i: Int): Byte = d.getByte(sel(i))
    override def getShort(i: Int): Short = d.getShort(sel(i))
    override def getInt(i: Int): Int = d.getInt(sel(i))
    override def getLong(i: Int): Long = d.getLong(sel(i))
    override def getFloat(i: Int): Float = d.getFloat(sel(i))
    override def getDouble(i: Int): Double = d.getDouble(sel(i))
    override def getArray(i: Int): org.apache.spark.sql.vectorized.ColumnarArray =
      d.getArray(sel(i))
    override def getMap(i: Int): org.apache.spark.sql.vectorized.ColumnarMap =
      d.getMap(sel(i))
    override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
      d.getDecimal(sel(i), precision, scale)
    override def getUTF8String(i: Int): UTF8String = d.getUTF8String(sel(i))
    override def getBinary(i: Int): Array[Byte] = d.getBinary(sel(i))
    override def getChild(ordinal: Int): org.apache.spark.sql.vectorized.ColumnVector =
      kids(ordinal)
  }

  /** The read schema a scan must STREAM so equality-delete keys can be
    * probed: the requested data columns plus any key columns the
    * projection pruned (streamed, never emitted). */
  def schemaWithEqKeys(fullSchema: StructType, dataSchema: StructType,
      keyIds: Seq[Int]): StructType = {
    val have = dataSchema.fieldNames
      .map(n => FieldIds.requireId(fullSchema, n)).toSet
    val extra = keyIds.distinct.filterNot(have)
    StructType(dataSchema.fields ++ extra.map(id =>
      fullSchema.fields.find(f => FieldIds.idOf(f).contains(id))
        .getOrElse(sys.error(
          s"equality-delete key field id $id is not in the scan schema"))))
  }

  /** A per-reader [[EqProbe]] over a list of equality-delete files against
    * `readSchema` (already extended by [[schemaWithEqKeys]]). */
  def eqProbeFor(paths: Seq[(String, Seq[Int], Long)], readSchema: StructType,
      fullSchema: StructType, conf: Configuration): EqProbe = {
    if (paths.isEmpty)
      return new EqProbe(Array.empty, readSchema)
    val idPos = readSchema.fieldNames.zipWithIndex.map { case (n, i) =>
      FieldIds.requireId(fullSchema, n) -> i
    }.toMap
    new EqProbe(paths.toArray.map { case (delPath, keyIds, entryCount) =>
      val ords = keyIds.map(idPos(_)).toArray
      val types = keyIds.map(id => readSchema.fields(idPos(id)).dataType)
      (ords, eqDeleteSet(delPath, entryCount, types.toArray, conf))
    }, readSchema)
  }

  def eqDeleteSet(path: String, entryCount: Long,
      types: Array[org.apache.spark.sql.types.DataType],
      conf: Configuration): java.util.HashSet[EqKey] = {
    val ref = eqSetCache.get(path)
    val cached = Option(ref).flatMap(r => Option(r.get()))
    if (ref != null && cached.isEmpty) eqSetCache.remove(path, ref) // stale entry
    cached.getOrElse {
      val keyProj = DataFiles.Projection(
        types.indices.map(i => s"k$i").toArray,
        types.indices.toArray, types)
      val set = new java.util.HashSet[EqKey]()
      val s = DataFiles.stream(path,
        DataFiles.wholeFile(entryCount), keyProj, conf)
      try {
        var r = s.next()
        while (r != null) {
          set.add(new EqKey(types.indices.map(i =>
            if (r.isNullAt(i)) null
            else InternalRow.copyValue(r.get(i, types(i)))).toArray))
          r = s.next()
        }
      } finally s.close()
      eqSetCache.put(path, new java.lang.ref.SoftReference(set))
      set
    }
  }

  /** Shared batch/streaming reader factory: data columns come from the
    * file through a format-dispatched [[DataFiles.DataStream]] (parquet
    * decodes only the requested columns; narrow pre-ALTER files pad NULL),
    * `_file`/`_pos` are woven in as the file path and the PHYSICAL row
    * index — the stable identity position deletes reference, so it
    * advances on skipped rows too. The output row is reused (values valid
    * until the next `next()` — the standard PartitionReader contract;
    * downstream operators copy what they keep). */
  def factory(fullSchema: StructType, required: StructType,
      fsConf: org.apache.spark.util.SerializableConfiguration,
      typeHist: Map[Int, Vector[(Long, DataType)]] = Map.empty,
      /** Plan VECTORIZED reads: the scan proved every partition decodes
        * batch-wise (`MemScan.columnarEligible` — parquet only, no
        * metadata weaving, no widening up-casts), so each task decodes
        * straight to ColumnarBatch ([[DataFiles.ParquetBatchStream]]).
        * Merge-on-read position/equality deletes stay ON the batch path:
        * survivors remap through a per-batch selection
        * ([[MemReaders.SelectedColumnVector]]). `capacity` is the
        * driver-resolved batch row count
        * (`spark.sql.parquet.columnarReaderBatchSize`). */
      columnar: Boolean = false,
      capacity: Int = 4096): PartitionReaderFactory = {
    val dataSchema = StructType(required.fields.filter(f =>
      f.name != MemTable.FileColumnName && f.name != MemTable.PosColumnName))
    // Each required field: -1 = `_file`, -2 = `_pos`, else index into the
    // stream's data-column shape.
    val ordinals = {
      var di = -1
      required.fieldNames.map {
        case MemTable.FileColumnName => -1
        case MemTable.PosColumnName => -2
        case _ => di += 1; di
      }
    }
    new PartitionReaderFactory {
      override def supportColumnarReads(p: InputPartition): Boolean = columnar

      override def createColumnarReader(partition: InputPartition):
          PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
        val part = partition.asInstanceOf[MemFilePartition]
        // Equality deletes probe key columns the projection may have
        // pruned: extend the READ schema exactly like the row path. The
        // required fields stay a PREFIX of the read schema (extra key
        // columns are appended), so the emitted batch simply keeps the
        // first `dataSchema.length` vectors.
        val readSchema = MemReaders.schemaWithEqKeys(
          fullSchema, dataSchema, part.eqDeletePaths.flatMap(_._2))
        // Type widening: decode the file NATIVELY in its write-time types
        // and wrap each widened column with an up-casting view — the
        // batch path's twin of the row path's per-slot casts (a widened
        // table no longer demotes the whole scan to row decode).
        val proj = DataFiles.projectionFor(fullSchema, readSchema,
          part.writeCols,
          MemReaders.widenOverrides(typeHist, readSchema, part.seq))
        val widenBatch: org.apache.spark.sql.vectorized.ColumnarBatch =>
            org.apache.spark.sql.vectorized.ColumnarBatch =
          if (proj.casts == null) identity
          else { b =>
            val cols = Array.tabulate(b.numCols()) { i =>
              if (proj.fileTypes(i) == proj.types(i)) b.column(i)
              else new MemReaders.WidenedColumnVector(b.column(i),
                proj.fileTypes(i), proj.types(i))
            }
            new org.apache.spark.sql.vectorized.ColumnarBatch(cols, b.numRows())
          }
        val stream = new DataFiles.ParquetBatchStream(part.path, part.split,
          proj, fsConf.value, capacity)
        val eqProbe = MemReaders.eqProbeFor(part.eqDeletePaths, readSchema,
          fullSchema, fsConf.value)
        val deleted: java.util.HashSet[java.lang.Long] =
          if (part.deletePaths.isEmpty) null
          else {
            val set = new java.util.HashSet[java.lang.Long]()
            part.deletePaths.foreach(dp =>
              RowFiles.readDeletes(dp, fsConf.value).foreach(set.add(_)))
            set
          }
        if (deleted == null && eqProbe.isEmpty)
          new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
            override def next(): Boolean = stream.next()
            override def get(): org.apache.spark.sql.vectorized.ColumnarBatch =
              widenBatch(stream.get())
            override def close(): Unit = stream.close()
          }
        else
          // MERGE-ON-READ over batches: decode stays columnar (the 2×+
          // win), surviving row ids are collected per batch, and the
          // emitted vectors REMAP through the selection — zero copy
          // (Iceberg's vectorized read with deletes uses the same
          // row-id-filter shape). Positions count FILE-globally from the
          // slice's first physical row, split-agnostic, exactly like the
          // row path's `_pos`.
          new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
            private var pos = part.rowStart
            private val sel = new Array[Int](capacity)
            private var out: org.apache.spark.sql.vectorized.ColumnarBatch = null
            override def next(): Boolean = {
              while (stream.next()) {
                val b = widenBatch(stream.get())
                val n = b.numRows()
                var k = 0
                var i = 0
                while (i < n) {
                  if ((deleted == null || !deleted.contains(pos + i)) &&
                      (eqProbe.isEmpty || !eqProbe.matched(b.getRow(i)))) {
                    sel(k) = i; k += 1
                  }
                  i += 1
                }
                pos += n
                if (k > 0) {
                  out =
                    if (k == n && readSchema.length == dataSchema.length) b
                    else {
                      val cols = new Array[
                        org.apache.spark.sql.vectorized.ColumnVector](dataSchema.length)
                      var c = 0
                      while (c < cols.length) {
                        cols(c) =
                          if (k == n) b.column(c)
                          else new MemReaders.SelectedColumnVector(b.column(c), sel)
                        c += 1
                      }
                      new org.apache.spark.sql.vectorized.ColumnarBatch(cols, k)
                    }
                  return true
                }
              }
              false
            }
            override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = out
            override def close(): Unit = stream.close()
          }
      }

      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val part = partition.asInstanceOf[MemFilePartition]
      new PartitionReader[InternalRow] {
        // Equality deletes probe key columns the projection may have
        // pruned: extend the READ schema with them (streamed, never
        // emitted). Key sets are shared JVM-wide per immutable delete file
        // (several splits and several data files of one scan all probe the
        // same file — loading per task would be O(splits × delete bytes)).
        private val readSchema = MemReaders.schemaWithEqKeys(
          fullSchema, dataSchema, part.eqDeletePaths.flatMap(_._2))
        private val proj =
          DataFiles.projectionFor(fullSchema, readSchema, part.writeCols,
            MemReaders.widenOverrides(typeHist, readSchema, part.seq))
        private val stream = DataFiles.stream(part.path, part.split,
          proj, fsConf.value)
        private val pathValue = UTF8String.fromString(part.path)
        private val eqProbe =
          MemReaders.eqProbeFor(part.eqDeletePaths, readSchema, fullSchema,
            fsConf.value)
        // Merge-on-read: union this data file's position-delete entries
        // (each file small by construction; several delta commits may each
        // have deleted rows of this file) and skip those positions.
        private val deleted: java.util.HashSet[java.lang.Long] =
          if (part.deletePaths.isEmpty) null
          else {
            val set = new java.util.HashSet[java.lang.Long]()
            part.deletePaths.foreach(dp =>
              RowFiles.readDeletes(dp, fsConf.value).foreach(set.add(_)))
            set
          }
        // `_pos` counts FILE-globally from the slice's first physical row,
        // so position deletes and rewrite row ids are split-agnostic.
        private var pos = part.rowStart - 1L
        private var cur: InternalRow = null
        private val out = new ce.GenericInternalRow(required.length)
        override def next(): Boolean = {
          while (true) {
            cur = stream.next()
            if (cur == null) return false
            pos += 1
            if ((deleted == null || !deleted.contains(pos)) &&
                (eqProbe.isEmpty || !eqProbe.matched(cur))) return true
          }
          false
        }
        override def get(): InternalRow = {
          var j = 0
          while (j < ordinals.length) {
            out.update(j, ordinals(j) match {
              case -1 => pathValue
              case -2 => pos
              case i => cur.get(i, dataSchema.fields(i).dataType)
            })
            j += 1
          }
          out
        }
        override def close(): Unit = stream.close()
      }
      }
    }
  }

  /** Reader for [[MemChangePartition]]s: the data columns stream exactly
    * like [[factory]], and the three change columns are per-partition
    * constants. Keep-mode stops as soon as every kept position has been
    * emitted — a merge-on-read delete of k rows reads at most the prefix
    * containing them, not the whole file. */
  def changeFactory(dataSchema: StructType, required: StructType,
      fsConf: org.apache.spark.util.SerializableConfiguration,
      typeHist: Map[Int, Vector[(Long, DataType)]] = Map.empty): PartitionReaderFactory = {
    val streamSchema = StructType(required.fields.filter(f =>
      f.name != ChangesTable.TypeColumn && f.name != ChangesTable.VersionColumn &&
        f.name != ChangesTable.TimestampColumn))
    val ordinals = {
      var di = -1
      required.fieldNames.map {
        case ChangesTable.TypeColumn => -3
        case ChangesTable.VersionColumn => -4
        case ChangesTable.TimestampColumn => -5
        case _ => di += 1; di
      }
    }
    (partition: InputPartition) => {
      val part = partition.asInstanceOf[MemChangePartition]
      new PartitionReader[InternalRow] {
        // Equality modes probe key columns the projection may have pruned:
        // stream them, never emit them (streamSchema stays the prefix).
        private val readSchema = MemReaders.schemaWithEqKeys(dataSchema,
          streamSchema, (part.keepEqPaths ++ part.skipEqPaths).flatMap(_._2))
        private val stream = DataFiles.stream(part.path,
          DataFiles.wholeFile(part.rowCount),
          DataFiles.projectionFor(dataSchema, readSchema, part.writeCols,
            MemReaders.widenOverrides(typeHist, readSchema, part.seq)),
          fsConf.value)
        private val ctValue = UTF8String.fromString(part.changeType)
        private def positions(paths: Seq[String]): java.util.HashSet[java.lang.Long] =
          if (paths.isEmpty) null
          else {
            val set = new java.util.HashSet[java.lang.Long]()
            paths.foreach(p =>
              RowFiles.readDeletes(p, fsConf.value).foreach(set.add(_)))
            set
          }
        private val keep = positions(part.keepPositionPaths)
        private val skip = positions(part.skipDeletePaths)
        private val keepEq = MemReaders.eqProbeFor(part.keepEqPaths,
          readSchema, dataSchema, fsConf.value)
        private val skipEq = MemReaders.eqProbeFor(part.skipEqPaths,
          readSchema, dataSchema, fsConf.value)
        private var kept = 0L
        private var pos = -1L
        private var cur: InternalRow = null
        private val out = new ce.GenericInternalRow(required.length)
        override def next(): Boolean = {
          while (keep == null || kept < keep.size) {
            cur = stream.next()
            if (cur == null) return false
            pos += 1
            if (keep != null) {
              // Position-keep mode: the kept set names candidate rows; a
              // position ALSO present in the skip set is excluded — the
              // keep∖skip difference is how a CUMULATIVE deletion vector
              // reports only its delta (new deaths = dv minus the
              // structures it superseded; resurrections = the dropped
              // vector minus what still holds). A still-applicable
              // equality delete suppresses a restore the same way. Both
              // suppressions still count toward the early exit.
              if (keep.contains(pos)) {
                kept += 1
                if ((skip == null || !skip.contains(pos)) &&
                    (skipEq.isEmpty || !skipEq.matched(cur))) return true
              }
            } else if (keepEq.nonEmpty) {
              // EQUALITY-keep mode: the commit's key sets select the rows,
              // minus rows already dead before it.
              if ((skip == null || !skip.contains(pos)) &&
                  !skipEq.matched(cur) && keepEq.matched(cur)) return true
            } else if ((skip == null || !skip.contains(pos)) &&
                (skipEq.isEmpty || !skipEq.matched(cur))) return true
          }
          false
        }
        override def get(): InternalRow = {
          var j = 0
          while (j < ordinals.length) {
            out.update(j, ordinals(j) match {
              case -3 => ctValue
              case -4 => part.commitVersion
              case -5 => part.commitMicros
              case i => cur.get(i, streamSchema.fields(i).dataType)
            })
            j += 1
          }
          out
        }
        override def close(): Unit = stream.close()
      }
    }
  }
}

private[sources] final class MemScan(fullSchema: StructType,
    required: StructType, initial: Vector[SnapshotStore.DataFile],
    streamKey: Option[String], maxVersionsPerTrigger: Option[Long] = None,
    startingVersion: Option[String] = None,
    deletes: Map[String, Vector[String]] = Map.empty,
    partCols: PartitionPredicates.PartCols = Map.empty,
    splitTargetBytes: Long = ScanSplits.DefaultTargetBytes,
    eqDeletes: Vector[SnapshotStore.DeleteFile] = Vector.empty,
    typeHist: Map[Int, Vector[(Long, DataType)]] = Map.empty,
    specPruning: Map[Int, (PartitionPredicates.PartCols, Seq[TransformPruning.TField])] =
      Map.empty,
    vectorized: Boolean = true,
    spjKeys: Option[Array[Transform]] = None,
    currentSpecId: Int = 0,
    /** Pre-merged per-chunk (NDV registers, nulls) by field id — set only
      * for an UNPRUNED scan over a lazy chunked manifest, where merging
      * |chunks| arrays replaces merging |files| (see the builder). */
    chunkNdv: Option[Vector[Map[Int, (SnapshotStore.Ndv, Long)]]] = None,
    tableSortOrder: Seq[(String, Boolean)] = Nil,
    histograms: Map[Int, StatsHistograms.ColHist] = Map.empty,
    /** Max partitions one [[mergeGroups]] component may merge (k-way
      * fan-in); 0 disables merge planning (`read.merge-scan=false`). */
    mergeFanIn: Int = SortedScanMergePlanning.DefaultFanIn,
    /** Report sort/bloom columns for runtime data-column file skipping
      * (`read.runtime-file-skipping`, default on). */
    runtimeFileSkipping: Boolean = true)
    extends Scan with Batch with SupportsRuntimeV2Filtering
    with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {
  private var files = initial
  private def pcOf(f: SnapshotStore.DataFile): PartitionPredicates.PartCols =
    if (specPruning.isEmpty) partCols
    else specPruning.get(f.specId).map(_._1).getOrElse(partCols)

  /** PLANNER statistics from the manifest entries this scan already holds
    * (Iceberg's `SparkScan.estimateStatistics` surface): row count is the
    * descriptors' exact physical sum, size is rowCount × the unencoded
    * width of the REQUIRED projection — the in-memory estimate join
    * planning compares against `autoBroadcastJoinThreshold` (raw disk
    * bytes would under-report snappy-compressed columns and over-trigger
    * broadcasts). Because the scan was built AFTER pushdown pruned
    * `files`, the estimate tightens with every pushed predicate — a
    * filtered dimension reports its filtered size. Without this, the
    * relation falls back to `spark.sql.defaultSizeInBytes` (≈ infinite):
    * a 25-row dimension in the catalog could never statically broadcast,
    * and at 100 TB the star-join plan is wrong by default.
    *
    * Merge-on-read tables over-count rows still masked by delete files —
    * statistics are planner estimates, over-counting is the conservative
    * direction (Iceberg reports the same pre-delete counts). */
  override def estimateStatistics(): Statistics = {
    val live = files
    val rows = live.map(_.rowCount).sum
    val width = 8L + required.fields.map(_.dataType.defaultSize.toLong).sum
    val size = math.max(rows * width, 1L)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(size)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
      /** Per-column NDV (merged manifest [[NdvSketch]]s) + null counts +
        * MIN/MAX ranges — what cost-based join reordering and FILTER
        * SELECTIVITY estimation need to see catalog-table cardinalities
        * (`col > X` cardinality is guesswork from a distinct count
        * alone). NDV/nulls are claimed only when EVERY retained file
        * tracks the column (a partial merge would silently under-count);
        * min/max merge over whichever files carry bounds (a partial
        * range is still a sound over-approximation of the scanned range)
        * and only for the value classes Spark's `ValueInterval` can
        * actually estimate with — numeric/date/timestamp/boolean;
        * strings would be dead weight. Everything is gated on CBO: the
        * merge is O(required columns × files × 512B) per planning, and
        * without CBO the attribute stats are unread. */
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        val m = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        if (!org.apache.spark.sql.internal.SQLConf.get.cboEnabled) return m
        required.fields.foreach { f =>
          FieldIds.idOf(f).foreach { id =>
            val per = live.map(_.stats.get(id))
            // NDV + null totals: O(chunks) from the index's pre-merged
            // summaries when this scan qualifies (unpruned over a lazy
            // chunked manifest), else the per-file merge. Identical
            // results — HLL union is associative — different plan-time
            // cost: |chunks| vs |files| 512-byte merges per column.
            val ndvAndNulls: Option[(Long, Long)] = chunkNdv match {
              case Some(chunks) if chunks.nonEmpty &&
                  chunks.forall(_.get(id).exists(
                    _._1.registers.length == NdvSketch.M)) =>
                val entries = chunks.map(_(id))
                MetadataLog.statsMergeInputs.addAndGet(entries.size.toLong)
                NdvSketch.mergedEstimate(
                  entries.iterator.map(_._1.registers))
                  .map(d => (d, entries.map(_._2).sum))
              case _ =>
                if (live.nonEmpty && per.forall(_.exists(_.ndv != null))) {
                  MetadataLog.statsMergeInputs.addAndGet(per.size.toLong)
                  NdvSketch.mergedEstimate(
                    per.iterator.map(_.get.ndv.registers))
                    .map(d => (d, per.map(_.get.nulls).sum))
                } else None
            }
            // STRING width stats (avgLen bytes, maxLen): claimed when
            // every retained file tracked lengths — including files whose
            // min/max were invalidated by long strings, which is exactly
            // the wide-value case row-width estimation exists for. The
            // lenSum form merges exactly: avg = Σsum / Σnon-null.
            val lens: Option[(Long, Long)] =
              if (live.nonEmpty && per.forall(_.exists(_.lenSum >= 0))) {
                val entries = per.map(_.get)
                val nonNull =
                  live.map(_.rowCount).sum - entries.map(_.nulls).sum
                Some((
                  if (nonNull <= 0) 0L
                  else entries.map(_.lenSum).sum / nonNull,
                  entries.map(_.lenMax).max))
              } else None
            // Equi-height histogram (compaction-collected, current
            // snapshot only — the skewed-column selectivity fix).
            val histOpt: Option[StatsHistograms.ColHist] =
              histograms.get(id).filter(_.bins.nonEmpty)
            if (ndvAndNulls.isDefined || lens.isDefined || histOpt.isDefined) {
              val ndvOpt = ndvAndNulls.map(_._1)
              val totalNulls = ndvAndNulls.map(_._2).getOrElse(
                per.map(_.fold(0L)(_.nulls)).sum)
              val rangeable = f.dataType match {
                case _: org.apache.spark.sql.types.NumericType |
                    org.apache.spark.sql.types.DateType |
                    org.apache.spark.sql.types.TimestampType |
                    org.apache.spark.sql.types.TimestampNTZType |
                    org.apache.spark.sql.types.BooleanType => true
                case _ => false
              }
              val (minV, maxV) =
                if (!rangeable) (None, None)
                else {
                  val ord = org.apache.spark.sql.catalyst.util.TypeUtils
                    .getInterpretedOrdering(f.dataType)
                  // A file written before a type WIDEN carries narrow
                  // boxes in the resident state (manifests coerce at
                  // serialization; the cache is pre-coercion) — widen
                  // into the live type before comparing.
                  val mins = per.flatMap(_.toSeq)
                    .map(s => TypeWidening.coerce(f.dataType, s.min))
                    .filter(_ != null)
                  val maxs = per.flatMap(_.toSeq)
                    .map(s => TypeWidening.coerce(f.dataType, s.max))
                    .filter(_ != null)
                  (mins.reduceOption((a, b) => ord.min(a, b)),
                    maxs.reduceOption((a, b) => ord.max(a, b)))
                }
              m.put(Expressions.column(f.name),
                new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
                  override def distinctCount(): java.util.OptionalLong =
                    ndvOpt.fold(java.util.OptionalLong.empty())(
                      java.util.OptionalLong.of)
                  override def nullCount(): java.util.OptionalLong =
                    java.util.OptionalLong.of(totalNulls)
                  override def min(): java.util.Optional[Object] =
                    minV.fold(java.util.Optional.empty[Object]())(v =>
                      java.util.Optional.of(v.asInstanceOf[Object]))
                  override def max(): java.util.Optional[Object] =
                    maxV.fold(java.util.Optional.empty[Object]())(v =>
                      java.util.Optional.of(v.asInstanceOf[Object]))
                  override def avgLen(): java.util.OptionalLong =
                    lens.fold(java.util.OptionalLong.empty())(l =>
                      java.util.OptionalLong.of(l._1))
                  override def maxLen(): java.util.OptionalLong =
                    lens.fold(java.util.OptionalLong.empty())(l =>
                      java.util.OptionalLong.of(l._2))
                  override def histogram(): java.util.Optional[
                      org.apache.spark.sql.connector.read.colstats.Histogram] =
                    histOpt.fold(java.util.Optional.empty[
                        org.apache.spark.sql.connector.read.colstats.Histogram]()) { h =>
                      java.util.Optional.of(
                        new org.apache.spark.sql.connector.read.colstats.Histogram {
                          override def height(): Double = h.height
                          override def bins(): Array[
                              org.apache.spark.sql.connector.read.colstats.HistogramBin] =
                            h.bins.map(b =>
                              new org.apache.spark.sql.connector.read.colstats.HistogramBin {
                                override def lo(): Double = b.lo
                                override def hi(): Double = b.hi
                                override def ndv(): Long = b.ndv
                              }: org.apache.spark.sql.connector.read.colstats.HistogramBin
                            ).toArray
                        })
                    }
                })
            }
          }
        }
        m
      }
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-snapshot scan (${files.map(_.rowCount).sum} rows, ${files.size} files)"

  /** DYNAMIC PARTITION PRUNING for plain scans: declaring the identity-
    * partition columns filterable lets Spark's `PartitionPruning` rule
    * plan a dynamic-pruning subquery over the (broadcast) dimension side
    * of a star join and re-filter this scan's FILES at execution with the
    * dimension's actual join keys — the fact side of
    * `fact JOIN dim ON fact.pk = dim.k WHERE dim.x = …` opens only the
    * partitions that can match, without a static predicate anywhere
    * (Iceberg's runtime filtering surface). Pruning reuses the same
    * three-valued evaluator as static pushdown, so it is sound by the
    * same argument: a file is dropped only when a predicate DEFINITELY
    * excludes every row it can hold. */
  /** RUNTIME DATA-COLUMN file skipping ([[RuntimeFilePruning]]): beyond
    * identity partition columns, the scan reports as filterable the
    * columns whose MANIFEST evidence can actually skip files at 100 TB —
    * the leading LINEAR sort column (range-clustered by compaction, so
    * per-file [min, max] boxes are tight) and any column some current
    * file carries a [[FileBloom]] for (point membership on a scattered
    * key). Spark's dynamic-pruning planning then builds the dim-side
    * subquery for star joins keyed on them, exactly as it would for a
    * partition column — no declared partitioning required. Off via
    * table property `read.runtime-file-skipping = false`. */
  private lazy val runtimeSkipNames: Set[String] =
    if (!runtimeFileSkipping) Set.empty
    else {
      val sc = StatsPredicates.statCols(fullSchema)
      val sortLead = tableSortOrder.headOption.map(_._1.toLowerCase)
        .filter(sc.contains).toSet
      val bloomIds = initial.iterator.flatMap(_.stats.iterator)
        .collect { case (id, s) if s.bloom != null => id }.toSet
      sortLead ++ sc.collect { case (n, (id, _)) if bloomIds(id) => n }
    }
  private lazy val runtimeStatCols: StatsPredicates.StatCols =
    StatsPredicates.statCols(fullSchema)

  override def filterAttributes(): Array[NamedReference] = {
    // Report the schema's original casing (the partCols map keys are
    // lowercased for case-insensitive predicate matching) — and ONLY
    // columns this scan actually OUTPUTS: Spark's PartitionPruning rule
    // resolves the reported attributes against the pruned scan relation
    // and throws (rather than skips) on a miss, so a column-pruned scan
    // that dropped the partition column must not advertise it.
    val lower = partCols.keySet
    val out = required.fieldNames.toSet
    fullSchema.fieldNames.filter(n =>
      (lower(n.toLowerCase) || runtimeSkipNames(n.toLowerCase)) && out(n))
      .map(Expressions.column)
  }
  override def filter(predicates: Array[VPredicate]): Unit = {
    files = files.filter(f => !predicates.exists(
      PartitionPredicates.definitelyExcludes(_, pcOf(f), f.partitionValues)))
    // Data-column runtime skipping on the reported stat/bloom columns —
    // sound like static stats pushdown (predicates stay residual), but
    // fed by the JOIN's actual keys at execution.
    if (runtimeSkipNames.nonEmpty)
      files = RuntimeFilePruning.prune(files, predicates, runtimeStatCols)
  }

  /** Post-runtime-filter file count — test observable for the skipping
    * contracts (never forces planning). */
  private[graft] def currentFileCount: Int = files.size

  override def planInputPartitions(): Array[InputPartition] =
    ScanSplits.partitions(files, deletes, splitTargetBytes, eqDeletes,
      SnapshotStore.idTypes(fullSchema))

  /** PLAN-TIME partition count for the ordering gates ([[outputOrdering]]
    * and the sort-elision rule) — memoized: each gate would otherwise
    * re-run full split planning (O(files)) per Sort node per optimizer
    * pass. Computed over the pre-runtime-filter file set; runtime
    * filtering only REMOVES partitions, so every ≤-bound checked against
    * this count stays conservative. */
  private[sources] lazy val planTimePartitionCount: Int =
    try planInputPartitions().length catch { case _: Exception => Int.MaxValue }

  /** STORAGE-PARTITIONED JOINS: report the current spec's transforms as
    * `KeyGroupedPartitioning` (every task of one partition VALUE lands in
    * one group), so two catalog tables sharing the spec join with ZERO
    * Exchange — the persisted-store probe pattern at 100 TB, where the
    * big bucketed side must never re-shuffle. Only sound when every
    * scanned file was written under the CURRENT spec (a retired spec's
    * tuples are shaped differently); mixed histories report unknown and
    * plan like any other scan. Spark resolves the transforms through this
    * catalog's FunctionCatalog face and groups tasks by
    * [[MemFilePartition.partitionKey]]. */
  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    spjKeys match {
      case Some(keys) if keys.nonEmpty && files.nonEmpty &&
          files.forall(_.specId == currentSpecId) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          keys.map(t => t: VExpression),
          // Content-normalized: raw Array[Byte] values would make
          // Seq.distinct over-count groups (reference equality).
          files.map(f =>
            SnapshotStore.comparablePartition(f.partitionValues))
            .distinct.size)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
          files.size)
    }

  /** SORTED SCANS (`SupportsReportOrdering`): report the table's
    * `write.sort-order` as this scan's per-partition output ordering when
    * it is PROVABLY true of every task — then Spark's
    * `V2ScanPartitioningAndOrdering` + `RemoveRedundantSorts` /
    * `EnsureRequirements` elide the Sort nodes a merge join, sorted
    * aggregate, or ORDER BY would otherwise pay to re-sort 100 TB that is
    * already sorted on disk. Sound because:
    *
    *   - every retained file carries a [[SnapshotStore.DataFile.sortKey]]
    *     stamp equal to the CURRENT normalized order (a file appended
    *     before the property was set, or under an older order, reports
    *     nothing — the all-files gate, mirroring SPJ's current-spec gate);
    *   - an input partition is a CONTIGUOUS slice of one sorted file
    *     (split planning never bin-packs files), so any slice is sorted;
    *     position/equality deletes only SKIP rows, preserving order;
    *   - under KEY-GROUPED partitioning (SPJ) Spark CONCATENATES a
    *     group's partitions, so ordering is only reported when every
    *     group is exactly one unsplit file (the compacted-bucket case —
    *     where the zero-Exchange, zero-Sort merge join lives);
    *   - sort columns must survive the projection (the reported
    *     references resolve against this scan's OUTPUT).
    *
    * `read.report-ordering = false` turns reporting off (the A/B lever;
    * answers must be identical either way). */
  override def outputOrdering():
      Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    val none = Array.empty[org.apache.spark.sql.connector.expressions.SortOrder]
    if (tableSortOrder.isEmpty || files.isEmpty) return none
    val key = SortOrders.normalize(tableSortOrder, fullSchema) match {
      case Some(k) => k
      case None => return none // legacy id-less sort column
    }
    if (!files.forall(_.sortKey == key)) return none
    if (!tableSortOrder.forall { case (c, _) =>
        required.fieldNames.exists(_.equalsIgnoreCase(c)) }) return none
    val grouped = spjKeys.exists(ks => ks.nonEmpty &&
      files.forall(_.specId == currentSpecId))
    if (grouped) {
      val groups = files.map(f =>
        SnapshotStore.comparablePartition(f.partitionValues)).distinct.size
      if (files.size != groups) return none
      if (planTimePartitionCount != files.size) return none // splits
    }
    // Report with the OUTPUT schema's casing so the references resolve.
    SortOrders.v2Ordering(tableSortOrder.map { case (c, asc) =>
      (required.fieldNames.find(_.equalsIgnoreCase(c)).getOrElse(c), asc)
    })
  }

  /** MULTI-PARTITION sorted ORDER BY (the 100 TB case the ≤1-partition
    * elision cannot serve): a compacted range-distributed table's files
    * are range-DISJOINT on the leading sort column — the manifests know
    * — so concatenating this scan's partitions in file-range order
    * (slices of one file stay in byte order; a sorted file's slices are
    * ascending by construction) IS the global order: no Exchange, no
    * Sort. Returns the partition permutation in [[planInputPartitions]]
    * order, or None when not provable:
    *
    *   - the scan does not report ordering (covers the all-files
    *     sortKey-stamp, projection-survival, and A/B-lever gates);
    *   - key-grouped (SPJ) output — Spark concatenates groups itself,
    *     in group order, which is not range order;
    *   - a file lacks leading-column stats or holds NULLs in it (null
    *     rows sort first/last; their file placement is not provable
    *     from counts alone);
    *   - file ranges OVERLAP, or touch at a boundary while the query
    *     orders by FURTHER columns (`strictOnly` — boundary-equal rows
    *     could interleave on the secondary keys; a single-column order
    *     tolerates equal boundaries, equal values are interchangeable).
    *
    * Returns (permutation, mayClaimClustering): the second component is
    * true only when every consecutive file pair was STRICTLY disjoint
    * AND no file was split — only then may the exec claim
    * `RangePartitioning` (a boundary tie, or a split file's unknowable
    * intra-file slice boundary, can put one key value in two partitions,
    * which the clustering contract forbids even though the ORDER stays
    * correct).
    *
    * Deterministic over the current file set, so the execution-time
    * recompute (after runtime filtering REMOVED files — removal keeps
    * disjointness and strictness) agrees with plan-time feasibility. */
  private[sources] def rangeConcatPermutation(
      strictOnly: Boolean): Option[(Seq[Int], Boolean)] = {
    // Runtime filtering can empty the file set AFTER planning elided the
    // Sort — an empty scan is trivially ordered (the exec must return
    // zero rows, not throw "disjointness no longer holds").
    if (files.isEmpty) return Some((Nil, true))
    if (outputOrdering().isEmpty) return None
    if (spjKeys.exists(_.nonEmpty)) return None
    val (colName, asc) = tableSortOrder.head
    val field = fullSchema.fields.find(_.name.equalsIgnoreCase(colName))
      .getOrElse(return None)
    val id = FieldIds.idOf(field).getOrElse(return None)
    val ord: Ordering[Any] = {
      val o = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(field.dataType)
      if (asc) o else o.reverse
    }
    // (lo, hi) per file in the DIRECTION's sense; pre-widen boxes coerce
    // into the live type before comparing (the estimator's rule).
    val range: Map[String, (Any, Any)] = files.iterator.map { f =>
      val s = f.stats.getOrElse(id, return None)
      if (s.min == null || s.max == null || s.nulls != 0L) return None
      val mn = TypeWidening.coerce(field.dataType, s.min)
      val mx = TypeWidening.coerce(field.dataType, s.max)
      f.path -> (if (asc) (mn, mx) else (mx, mn))
    }.toMap
    val mem = planInputPartitions().map {
      case p: MemFilePartition => p
      case _ => return None
    }
    if (mem.isEmpty) return Some((Nil, true)) // only 0-row files remained
    val ranked = mem.map(_.path).distinct.toSeq.sortBy(p => range(p)._1)(ord)
    var allStrict = true
    ranked.sliding(2).foreach {
      case Seq(a, b) =>
        val c = ord.compare(range(a)._2, range(b)._1)
        if (c > 0 || (c == 0 && strictOnly)) return None
        if (c == 0) allStrict = false
      case _ => ()
    }
    // The clustering claim additionally demands ONE PARTITION PER FILE:
    // a split file's intra-file slice boundaries can put one key value
    // in two partitions (manifest stats cannot see inside a file), which
    // RangePartitioning's contract forbids even though the concatenated
    // ORDER is still correct.
    val unsplit = mem.length == ranked.length
    val rank = ranked.zipWithIndex.toMap
    Some((mem.indices.sortBy(i => (rank(mem(i).path), mem(i).byteStart)),
      allStrict && unsplit))
  }

  /** PLAN-TIME feasibility probes for the rule — memoized like
    * [[planTimePartitionCount]] (the fixed-point optimizer batch would
    * otherwise re-run O(files) split planning + range sorting per Sort
    * node per pass); execution calls [[rangeConcatPermutation]] fresh
    * (post-runtime-filter). */
  private lazy val rangeConcatStrictProbe = rangeConcatPermutation(true)
  private lazy val rangeConcatLooseProbe = rangeConcatPermutation(false)
  private[sources] def rangeConcatProbe(
      strictOnly: Boolean): Option[(Seq[Int], Boolean)] =
    if (strictOnly) rangeConcatStrictProbe else rangeConcatLooseProbe

  /** SORTED-OVERLAPPING scans — the case [[rangeConcatPermutation]]
    * refuses: files are all sorted under the current order but their
    * leading-column ranges OVERLAP (the steady-state compacted-table-
    * plus-sorted-appends shape: big disjoint compacted files, small
    * sorted appends straddling them). Concatenation cannot serve a
    * global ORDER BY there, but a K-WAY MERGE of the overlapping
    * partitions' sorted streams can — no Exchange, no Sort, no row
    * buffering beyond one head per stream.
    *
    * Groups this scan's partitions into range-CONNECTED COMPONENTS of
    * their files' leading-sort-column intervals, walking files in range
    * order: a file joins the open component while its lo sits inside
    * the component's running hi (touching boundaries also join under
    * `strictOnly` — equal leading values could interleave on the
    * secondary sort columns, and the in-component merge compares FULL
    * row order, which handles any interleaving). Components are
    * pairwise range-disjoint in order by construction, so merging each
    * component and concatenating components in range order IS the
    * global order. Split files' slices share the file's interval and
    * land in one component; each slice is a sorted stream of its own.
    *
    * Same stats gates as range-concat (ordering reported, no SPJ
    * grouping, leading-column stats present and null-free). Refuses
    * (None) when any component's fan-in exceeds [[mergeFanIn]] — a
    * single component spanning everything would serialize the table
    * through one merge task, where the parallel Sort it replaces is the
    * better plan — and when NO component merges (all singletons is
    * range-concat's case, which the rule already tried).
    *
    * Returns (component → child-partition indices in
    * [[planInputPartitions]] order, mayClaimClustering); the clustering
    * claim holds only when every INTER-component boundary is strictly
    * disjoint (a tolerated single-column boundary tie can put one key
    * value in two output partitions). Deterministic over the current
    * file set — the execution-time recompute (post-runtime-filter; file
    * removal preserves sortedness and disjointness) agrees with
    * plan-time feasibility wherever the file set did not change. */
  private[sources] def mergeGroups(
      strictOnly: Boolean): Option[(Seq[Seq[Int]], Boolean)] = {
    if (mergeFanIn <= 0) return None
    if (files.isEmpty) return Some((Nil, true))
    if (outputOrdering().isEmpty) return None
    if (spjKeys.exists(_.nonEmpty)) return None
    val (colName, asc) = tableSortOrder.head
    val field = fullSchema.fields.find(_.name.equalsIgnoreCase(colName))
      .getOrElse(return None)
    val id = FieldIds.idOf(field).getOrElse(return None)
    val ord: Ordering[Any] = {
      val o = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(field.dataType)
      if (asc) o else o.reverse
    }
    val range: Map[String, (Any, Any)] = files.iterator.map { f =>
      val s = f.stats.getOrElse(id, return None)
      if (s.min == null || s.max == null || s.nulls != 0L) return None
      val mn = TypeWidening.coerce(field.dataType, s.min)
      val mx = TypeWidening.coerce(field.dataType, s.max)
      f.path -> (if (asc) (mn, mx) else (mx, mn))
    }.toMap
    val mem = planInputPartitions().map {
      case p: MemFilePartition => p
      case _ => return None
    }
    if (mem.isEmpty) return Some((Nil, true))
    val ranked = mem.map(_.path).distinct.toSeq.sortBy(p => range(p)._1)(ord)
    // Walk files in range order building components; `hi` is the open
    // component's running max (intervals are not nested-free — a wide
    // compacted file can contain several appends).
    val components = Vector.newBuilder[Vector[String]]
    var current = Vector(ranked.head)
    var hi = range(ranked.head)._2
    var allBreaksStrict = true
    ranked.drop(1).foreach { p =>
      val (lo, pHi) = range(p)
      val c = ord.compare(hi, lo)
      if (c > 0 || (c == 0 && strictOnly)) {
        current :+= p
        if (ord.compare(pHi, hi) > 0) hi = pHi
      } else {
        if (c == 0) allBreaksStrict = false
        components += current
        current = Vector(p); hi = pHi
      }
    }
    components += current
    val comps = components.result()
    if (comps.forall(_.length <= 1)) return None // range-concat's case
    // Component per partition, partitions kept in (component, byteStart)
    // order for determinism.
    val compOf: Map[String, Int] =
      comps.zipWithIndex.flatMap { case (c, i) => c.map(_ -> i) }.toMap
    val groups = mem.indices
      .groupBy(i => compOf(mem(i).path))
      .toSeq.sortBy(_._1)
      .map { case (_, idxs) =>
        idxs.sortBy(i => (comps(compOf(mem(i).path))
          .indexOf(mem(i).path), mem(i).byteStart)) }
    if (groups.exists(_.length > mergeFanIn)) return None
    Some((groups, allBreaksStrict))
  }

  /** Plan-time feasibility probes, memoized like [[rangeConcatProbe]];
    * execution calls [[mergeGroups]] fresh (post-runtime-filter). */
  private lazy val mergeGroupsStrictProbe = mergeGroups(true)
  private lazy val mergeGroupsLooseProbe = mergeGroups(false)
  private[sources] def mergeGroupsProbe(
      strictOnly: Boolean): Option[(Seq[Seq[Int]], Boolean)] =
    if (strictOnly) mergeGroupsStrictProbe else mergeGroupsLooseProbe

  /** Can EVERY partition of this scan decode vectorized? Columnar and
    * row partitions cannot mix inside one scan (Spark's
    * PARTITION_DEFINED contract), so the decision is scan-global and
    * conservative, over the pre-runtime-filter `initial` set (runtime
    * filtering only removes files — a uniformly eligible set stays
    * eligible). Requirements: parquet files only, no `_file`/`_pos`
    * metadata weaving, every READ type vectorizable, and a non-empty
    * projection (zero-column count scans keep the row stream).
    * Position/equality deletes do NOT demote the scan — the batch reader
    * filters survivors through a selection remap — and neither does TYPE
    * WIDENING: pre-widen files decode natively and serve through an
    * up-casting vector view ([[MemReaders.WidenedColumnVector]]).
    * Equality deletes widen the check to the eq-key-extended READ schema
    * (key columns are decoded for probing even when the projection pruned
    * them, so they too must decode vectorized). A key column dropped from
    * the current schema makes the extension throw → fall back to the row
    * path, which surfaces the same error at read time with its richer
    * message. */
  private def columnarEligible: Boolean =
    vectorized && required.fields.nonEmpty &&
      required.fields.forall(f =>
        f.name != MemTable.FileColumnName && f.name != MemTable.PosColumnName &&
          DataFiles.vectorizable(f.dataType)) &&
      (try {
        val readSchema =
          if (eqDeletes.isEmpty) required
          else MemReaders.schemaWithEqKeys(
            fullSchema, required, eqDeletes.flatMap(_.equalityCols))
        readSchema.fields.forall(f => DataFiles.vectorizable(f.dataType)) &&
          initial.forall(_.path.endsWith(".parquet"))
      } catch { case _: RuntimeException => false })

  override def createReaderFactory(): PartitionReaderFactory =
    MemReaders.factory(fullSchema, required, RowFiles.sessionConf(), typeHist,
      columnar = columnarEligible,
      capacity = org.apache.spark.sql.internal.SQLConf.get
        .parquetVectorizedReaderBatchSize)

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new MemMicroBatchStream(
      streamKey.getOrElse(sys.error("time-travel views are not streamable")),
      fullSchema, required, maxVersionsPerTrigger, startingVersion)
}

/** Streaming read of a snapshot-catalog table: SNAPSHOT VERSIONS are the
  * offsets, each micro-batch carries exactly the files APPENDED by the
  * commits in `(start, end]` — the versioned catalog as an exactly-once
  * streaming source (Iceberg/Delta's streaming-read surface), including
  * replay of the full commit history on first start.
  *
  * Contract: append-only. A rewrite commit (truncate-overwrite, row-level
  * UPDATE/DELETE, partition overwrite, rollback) inside the offset range
  * fails the stream loudly — its row delta is not representable as
  * appends; the CDF operator (m08) is the read for rewriting tables.
  * Snapshots expired past a restarting stream's offset also fail loudly
  * rather than silently skipping rows.
  */
private[sources] final class MemMicroBatchStream(k: String,
    fullSchema: StructType, required: StructType,
    maxVersionsPerTrigger: Option[Long] = None,
    startingVersion: Option[String] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  maxVersionsPerTrigger.foreach(m => require(m >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $m"))

  private val shown = SnapshotStore.dotted(k)

  /** Trigger.AvailableNow: pin the catch-up target at prepare time so the
    * run honors `maxVersionsPerTrigger` per batch and stops at the
    * prepare-time head (see [[ChangesMicroBatchStream]]). */
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(versionNow())

  private def versionNow(): Long = {
    val st = SnapshotStore.resolve(k).getOrElse(
      throw new IllegalStateException(s"streamed table dropped: $shown"))
    val now = if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
    availableNowTarget.fold(now)(math.min(now, _))
  }

  /** `startingVersion` reader option (Delta's knob of the same name): the
    * FIRST commit whose appends the stream delivers — history before it is
    * skipped without scanning (offsets are versions, so skipping is free).
    * `"latest"` delivers only commits after stream start. Default: full
    * history replay. A starting version whose history was expired fails
    * loudly at the first batch (planInputPartitions' liveness guard), not
    * silently as an empty stream. */
  override def initialOffset(): Offset = VersionOffset(startingVersion match {
    case None => 0L
    case Some("latest") => versionNow()
    case Some(v) =>
      val n = v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"startingVersion must be a version number or 'latest', got '$v'"))
      require(n >= 1, s"startingVersion must be >= 1, got $n")
      n - 1 // offset = versions consumed THROUGH n-1; first delivery is n
  })
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
    val st = SnapshotStore.resolve(k).getOrElse(
      throw new IllegalStateException(s"streamed table dropped: $shown"))
    val inRange = st.snapshots.filter(sn => sn.version > s && sn.version <= e)
    // Expired snapshots inside the range would silently lose rows.
    require(inRange.size == (e - s),
      s"stream offset range ($s, $e] of $shown covers ${e - s} commits but only " +
        s"${inRange.size} snapshots are live — expired past the stream's offset")
    val appended = inRange.flatMap { sn =>
      require(sn.appendedFiles >= 0,
        s"commit v${sn.version} of $shown is a rewrite (overwrite/row-level/rollback); " +
          "append-only streaming cannot represent it — read changes via " +
          "ChangeDataFeed (m08) instead")
      sn.files.takeRight(sn.appendedFiles)
    }
    ScanSplits.partitions(appended.toVector, Map.empty,
      ScanSplits.targetBytes(st.properties))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    MemReaders.factory(fullSchema, required, RowFiles.sessionConf(),
      SnapshotStore.resolve(k).map(_.typeHistory).getOrElse(Map.empty))
}

private[sources] final case class VersionOffset(version: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = version.toString
}

/** The CHANGE FEED of a snapshot-catalog table, exact from its own
  * metadata — no key columns, no joins, no row through the driver. Each
  * commit's row-level changes are derivable from what the commit recorded:
  *
  *   - data files ADDED → their live rows are INSERTs;
  *   - data files REMOVED → their previously-live rows are DELETEs
  *     (rows a position delete had already removed are excluded — they
  *     were not live at the predecessor version);
  *   - position-delete files ADDED on surviving data files (merge-on-read)
  *     → exactly those positions' rows are DELETEs;
  *   - position-delete files REMOVED from surviving data files (rollback)
  *     → those positions' rows are restored INSERTs;
  *   - `replace` commits (compaction) reshuffle files without changing
  *     rows → no changes (Iceberg excludes REPLACE snapshots from
  *     changelog scans the same way).
  *
  * A copy-on-write rewrite surfaces at FILE grain — carried rows of a
  * rewritten file appear as DELETE+INSERT pairs of the same commit, which
  * is Iceberg's changelog semantics for COW; the key-based
  * [[graft.operators.ChangeDataFeed]] (m08) is the net-changes view.
  * Merge-on-read commits are exact at ROW grain — the reason MOR mode is
  * what a CDC-tailed 100 TB table wants. */
private[sources] object ChangeLog {
  import SnapshotStore.{DataFile, DeleteFile, Snapshot}

  /** The scan partitions carrying commit `cur`'s change rows. Appends are
    * computed from the commit's own record (no predecessor needed — an
    * append-only tail tolerates expired history); every other operation
    * diffs against the predecessor snapshot and fails loudly if it was
    * expired (the changes would be unknowable, not empty). */
  def changePartitions(st: SnapshotStore.TableState, cur: Snapshot,
      shown: String): Seq[MemChangePartition] = {
    def part(f: DataFile, ctype: String, skip: Seq[String]) =
      MemChangePartition(f.path, f.rowCount, ctype, cur.version,
        cur.commitMicros, skipDeletePaths = skip, writeCols = f.writeCols,
        seq = f.seq)
    val curDelByData = SnapshotStore.deleteMap(cur.deleteFiles)
    def eqTuple(d: DeleteFile) = (d.path, d.equalityCols, d.entryCount)
    val out: Seq[MemChangePartition] = cur.operation match {
      case "replace" => Nil
      case "append" =>
        // Every append constructor stamps appendedFiles >= 0; a violation
        // would silently VANISH the commit's rows from the feed, so it is
        // loud here exactly as in the append-only stream's guard.
        require(cur.appendedFiles >= 0,
          s"append snapshot v${cur.version} of $shown carries no " +
            s"appendedFiles count (${cur.appendedFiles}) — feed would be silently empty")
        cur.files.takeRight(cur.appendedFiles)
          .map(f => part(f, "INSERT", curDelByData.getOrElse(f.path, Vector.empty)))
      case _ =>
        val (prevFiles, prevDels) =
          if (cur.version == 1L)
            (Vector.empty[DataFile], Vector.empty[DeleteFile])
          else st.snapshots.find(_.version == cur.version - 1)
            .map(p => (p.files, p.deleteFiles))
            .getOrElse(throw new IllegalStateException(
              s"cannot compute changes of $shown at v${cur.version}: its " +
                s"predecessor snapshot v${cur.version - 1} was expired"))
        val prevPaths = prevFiles.map(_.path).toSet
        val curPaths = cur.files.map(_.path).toSet
        val prevDelByData = SnapshotStore.deleteMap(prevDels)
        val prevDelPaths = prevDels.map(_.path).toSet
        val curDelPaths = cur.deleteFiles.map(_.path).toSet
        def survived(p: String) = prevPaths(p) && curPaths(p)
        val fileOf = (prevFiles ++ cur.files).map(f => f.path -> f).toMap
        val prevEq = SnapshotStore.eqDeletes(prevDels)
        val curEq = SnapshotStore.eqDeletes(cur.deleteFiles)
        // Equality deletes applicable to `f` from `dels` — strictly newer.
        val liveTypes = SnapshotStore.idTypes(st.schema)
        // Applicable = newer AND key ranges overlap (stats pruning — the
        // reconstruction must not probe every older file per upsert).
        def applEq(dels: Vector[DeleteFile], f: DataFile) =
          dels.filter(SnapshotStore.eqApplies(_, f, liveTypes)).map(eqTuple)
        def anyApplies(dels: Vector[DeleteFile], f: DataFile) =
          dels.exists(SnapshotStore.eqApplies(_, f, liveTypes))

        // An (re-)added file's INSERT reports only rows alive under the
        // commit's own deletes — a rollback re-adding a file still subject
        // to a live equality delete must not resurrect its dead rows.
        val inserts = cur.files.filterNot(f => prevPaths(f.path))
          .map(f => part(f, "INSERT", curDelByData.getOrElse(f.path, Vector.empty))
            .copy(skipEqPaths = applEq(curEq, f)))
        // A retired file's DELETE reports only rows that were still ALIVE:
        // minus its position deletes AND minus rows prior equality deletes
        // had already killed.
        val fileDeletes = prevFiles.filterNot(f => curPaths(f.path))
          .map(f => part(f, "DELETE", prevDelByData.getOrElse(f.path, Vector.empty))
            .copy(skipEqPaths = applEq(prevEq, f)))
        // Deletion-vector lineage: a structure listed in a dv's
        // `supersedes` holds positions that dv re-encodes — its
        // appearance or disappearance across the version boundary is a
        // FOLD, not a change (one generation deep; a multi-generation
        // rollback still reconstructs exactly through the keep∖skip
        // set-difference below, at the cost of scanning a file that
        // emits nothing).
        val prevSuperseded =
          prevDels.iterator.filter(_.kind == "dv").flatMap(_.supersedes).toSet
        val curSuperseded = cur.deleteFiles.iterator
          .filter(_.kind == "dv").flatMap(_.supersedes).toSet
        // New position structures on carried files: the newly dead rows.
        // Per-commit `pos` files name exactly the rows that died (alive by
        // construction — the MOR writer's eq-applied scan only targets
        // live rows); a `dv` is CUMULATIVE, so the predecessor structures
        // it folded ride as a skip-set and the reader emits the set
        // difference — the true delta.
        val posDeletes = cur.deleteFiles
          .filter(d => (d.kind == "pos" || d.kind == "dv") &&
            !prevDelPaths(d.path) && !prevSuperseded(d.path) &&
            survived(d.dataPath))
          .groupBy(_.dataPath).toSeq.map { case (dp, ds) =>
            MemChangePartition(dp, fileOf(dp).rowCount, "DELETE", cur.version,
              cur.commitMicros, keepPositionPaths = ds.map(_.path),
              skipDeletePaths = prevDelByData.getOrElse(dp, Vector.empty),
              writeCols = fileOf(dp).writeCols, seq = fileOf(dp).seq) }
        // New EQUALITY deletes (an upsert's delete-by-key): the dead rows
        // are reconstructed by probing each OLDER carried file with the
        // commit's key sets, minus rows already dead (position deletes or
        // prior equality deletes) — exact row-level changes from key
        // tuples, Iceberg's changelog semantics for eq deletes.
        val newEq = curEq.filter(d => !prevDelPaths(d.path))
        val eqDeletes =
          if (newEq.isEmpty) Nil
          else cur.files.filter(f =>
              prevPaths(f.path) && anyApplies(newEq, f)).map { f =>
            MemChangePartition(f.path, f.rowCount, "DELETE", cur.version,
              cur.commitMicros,
              skipDeletePaths = curDelByData.getOrElse(f.path, Vector.empty),
              writeCols = f.writeCols, seq = f.seq,
              keepEqPaths = applEq(newEq, f),
              skipEqPaths = applEq(prevEq, f))
          }
        // Position structures dropped from carried files (rollback):
        // restored — unless the drop was a deletion-vector FOLD (the
        // surviving dv lists the path in `supersedes`: those positions
        // are still dead), and minus positions the commit's own
        // structures still hold (a rollback across dv generations
        // resurrects exactly the newer vector's extra positions). A
        // still-live equality delete also keeps a row dead (the reader's
        // keep mode consults both skip sets, still counting the
        // suppressed position toward its early exit).
        val restored = prevDels
          .filter(d => (d.kind == "pos" || d.kind == "dv") &&
            !curDelPaths(d.path) && !curSuperseded(d.path) &&
            survived(d.dataPath))
          .groupBy(_.dataPath).toSeq.map { case (dp, ds) =>
            MemChangePartition(dp, fileOf(dp).rowCount, "INSERT", cur.version,
              cur.commitMicros, keepPositionPaths = ds.map(_.path),
              skipDeletePaths = curDelByData.getOrElse(dp, Vector.empty),
              writeCols = fileOf(dp).writeCols, seq = fileOf(dp).seq,
              skipEqPaths = applEq(curEq, fileOf(dp))) }
        // Equality deletes dropped from carried files (rollback): rows
        // matching the dropped keys come back — minus rows still dead via
        // the commit's remaining deletes, and minus rows that were ALSO
        // position-dead at prev (if they resurrect, the positional
        // `restored` path owns the INSERT — emitting here too would
        // duplicate it; if they stay pos-dead, they did not resurrect).
        val droppedEq = prevEq.filter(d => !curDelPaths(d.path))
        val eqRestored =
          if (droppedEq.isEmpty) Nil
          else cur.files.filter(f =>
              prevPaths(f.path) && anyApplies(droppedEq, f)).map { f =>
            MemChangePartition(f.path, f.rowCount, "INSERT", cur.version,
              cur.commitMicros,
              skipDeletePaths =
                (prevDelByData.getOrElse(f.path, Vector.empty) ++
                  curDelByData.getOrElse(f.path, Vector.empty)).distinct,
              writeCols = f.writeCols, seq = f.seq,
              keepEqPaths = applEq(droppedEq, f),
              skipEqPaths = applEq(curEq, f))
          }
        inserts ++ fileDeletes ++ posDeletes ++ eqDeletes ++ restored ++ eqRestored
    }
    out.filter(_.rowCount > 0)
  }
}

private[sources] object ChangesTable {
  /** Delta's CDF column names (m08's operator feed uses the same two). */
  val TypeColumn = "_change_type"
  val VersionColumn = "_commit_version"
  val TimestampColumn = "_commit_timestamp"

  def schemaFor(data: StructType): StructType = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, TimestampType}
    StructType(data.fields ++ Seq(
      StructField(TypeColumn, StringType, nullable = false),
      StructField(VersionColumn, LongType, nullable = false),
      StructField(TimestampColumn, TimestampType, nullable = false)))
  }
}

/** `SELECT … FROM cat.db.t.changes` / `spark.readStream.table("….changes")`
  * — the change feed as a RELATION (Delta's `table_changes` + CDF-streaming
  * surface): batch reads replay a version range of changes, streaming reads
  * tail every commit — including the rewrites the append-only stream must
  * refuse — with snapshot versions as exactly-once offsets. Unlike the
  * other metadata suffixes this is a DISTRIBUTED scan: change rows are row
  * data and never pass through the driver.
  *
  * Options: `startingVersion` (first commit delivered; streaming also
  * accepts `latest`), `endingVersion` (batch, inclusive),
  * `maxVersionsPerTrigger` (streaming admission control). */
private[sources] final class ChangesTable(display: String, k: String)
    extends Table with SupportsRead {
  private val dataSchema = SnapshotStore.stateOf(k).schema
  override def name(): String = display
  override def schema(): StructType = ChangesTable.schemaFor(dataSchema)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ChangesScanBuilder(k, dataSchema, schema(), options)
}

private[sources] final class ChangesScanBuilder(k: String,
    dataSchema: StructType, full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required = full
  override def pruneColumns(r: StructType): Unit = required = r
  override def build(): Scan = {
    def opt(name: String): Option[String] = Option(options.get(name))
    def longOpt(name: String): Option[Long] = opt(name).map(v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"$name must be a version number, got '$v'")))
    new ChangesScan(k, dataSchema, required,
      startingVersion = opt("startingVersion"),
      endingVersion = longOpt("endingVersion"),
      maxVersionsPerTrigger = longOpt("maxVersionsPerTrigger"))
  }
}

private[sources] final class ChangesScan(k: String, dataSchema: StructType,
    required: StructType, startingVersion: Option[String],
    endingVersion: Option[Long], maxVersionsPerTrigger: Option[Long])
    extends Scan with Batch {
  private val shown = SnapshotStore.dotted(k)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-snapshot changes $shown [" +
      startingVersion.fold("")(s => s"from v$s") +
      endingVersion.fold("")(e => s" to v$e") + "]"

  override def planInputPartitions(): Array[InputPartition] = {
    val st = SnapshotStore.stateOf(k)
    val start = startingVersion.map(v => v.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"batch startingVersion must be a version number, got '$v'")))
    start.foreach(s => require(s >= 1, s"startingVersion must be >= 1, got $s"))
    endingVersion.foreach(e => require(start.forall(_ <= e),
      s"endingVersion $e precedes startingVersion ${start.get}"))
    val sns = st.snapshots.filter(sn =>
      start.forall(sn.version >= _) && endingVersion.forall(sn.version <= _))
    // Silent gaps would read as "no changes happened" — every failure to
    // cover the requested range must be loud.
    start.foreach(s => require(sns.headOption.exists(_.version == s),
      s"startingVersion $s of $shown is not a live snapshot (expired or future)"))
    endingVersion.foreach(e => require(sns.lastOption.exists(_.version == e),
      s"endingVersion $e of $shown is not a live snapshot (expired or future)"))
    if (start.isEmpty) sns.headOption.foreach(first =>
      require(first.version == 1L,
        s"history of $shown before v${first.version} was expired; pass " +
          "startingVersion to read the live range"))
    sns.iterator.sliding(2).withPartial(false).foreach { pair =>
      require(pair(1).version == pair(0).version + 1,
        s"versions v${pair(0).version + 1}..v${pair(1).version - 1} of $shown " +
          "were expired — their changes are unknowable")
    }
    sns.flatMap(sn => ChangeLog.changePartitions(st, sn, shown))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    MemReaders.changeFactory(dataSchema, required, RowFiles.sessionConf(),
      SnapshotStore.resolve(k).map(_.typeHistory).getOrElse(Map.empty))

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(endingVersion.isEmpty,
      "endingVersion is a batch option; a stream has no end")
    new ChangesMicroBatchStream(k, dataSchema, required,
      maxVersionsPerTrigger, startingVersion)
  }
}

/** Streaming change feed: identical offset/admission semantics to the
  * append-only [[MemMicroBatchStream]] (versions are offsets,
  * `maxVersionsPerTrigger` bounds replay, expired in-range snapshots fail
  * loudly) — but each micro-batch carries the commits' CHANGE rows, so
  * rewrites (row-level UPDATE/DELETE, partition overwrite, rollback) flow
  * through instead of failing the stream. Compactions pass as empty. */
private[sources] final class ChangesMicroBatchStream(k: String,
    dataSchema: StructType, required: StructType,
    maxVersionsPerTrigger: Option[Long], startingVersion: Option[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  maxVersionsPerTrigger.foreach(m => require(m >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $m"))

  private val shown = SnapshotStore.dotted(k)

  /** Trigger.AvailableNow: the catch-up TARGET is pinned at prepare time,
    * so the run still honors `maxVersionsPerTrigger` PER BATCH (several
    * rate-limited batches, then stop) instead of one unbounded batch —
    * and commits landing after prepare wait for the next run. */
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(versionNow())

  private def versionNow(): Long = {
    val st = SnapshotStore.resolve(k).getOrElse(
      throw new IllegalStateException(s"streamed table dropped: $shown"))
    val now = if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
    availableNowTarget.fold(now)(math.min(now, _))
  }

  override def initialOffset(): Offset = VersionOffset(startingVersion match {
    case None => 0L
    case Some("latest") => versionNow()
    case Some(v) =>
      val n = v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"startingVersion must be a version number or 'latest', got '$v'"))
      require(n >= 1, s"startingVersion must be >= 1, got $n")
      n - 1
  })
  override def latestOffset(): Offset = VersionOffset(versionNow())
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
    val st = SnapshotStore.resolve(k).getOrElse(
      throw new IllegalStateException(s"streamed table dropped: $shown"))
    val inRange = st.snapshots.filter(sn => sn.version > s && sn.version <= e)
    require(inRange.size == (e - s),
      s"stream offset range ($s, $e] of $shown covers ${e - s} commits but only " +
        s"${inRange.size} snapshots are live — expired past the stream's offset")
    inRange.flatMap(sn => ChangeLog.changePartitions(st, sn, shown)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    MemReaders.changeFactory(dataSchema, required, RowFiles.sessionConf(),
      SnapshotStore.resolve(k).map(_.typeHistory).getOrElse(Map.empty))
}

/** A branch as a relation (`db.t.branch_<name>`): reads pin the branch
  * HEAD (base files + staged appends, base position deletes applied);
  * writes are APPEND-ONLY commits staged on the branch — invisible to the
  * table's readers until `fast_forward` publishes them. Truncate/overwrite
  * and row-level statements are not offered (no `SupportsOverwriteV2` /
  * row-level interfaces): write-audit-publish stages NEW data; rewriting
  * shared history belongs on main, after publish, where OCC guards it. */
private[sources] final class BranchTable(display: String, k: String,
    branch: String) extends Table with SupportsRead with SupportsWrite {
  private val st0 = SnapshotStore.stateOf(k)
  override def name(): String = display
  override def schema(): StructType = st0.schema
  override def partitioning(): Array[Transform] =
    st0.partitionCols.zip(st0.transformsOrIdentity)
      .map { case (c, t) => PTransform.toV2(c, t) }.toArray
  override def properties(): util.Map[String, String] = st0.properties.asJava
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val st = SnapshotStore.stateOf(k)
    val br = st.branches.getOrElse(branch, throw new IllegalStateException(
      s"branch '$branch' of ${SnapshotStore.dotted(k)} was dropped"))
    val (files, deletes) = br.head(st)
    // Identity fields only — transform fields prune via their own channel.
    val partColMap: PartitionPredicates.PartCols =
      st.partitionCols.zip(st.transformsOrIdentity).zipWithIndex.collect {
        case ((c, t), i) if t.isIdentity =>
          c.toLowerCase -> (i, st.schema(c).dataType)
      }.toMap
    new MemScanBuilder(st.schema, partColMap, () => files,
      deletes = SnapshotStore.deleteMap(deletes),
      splitTargetBytes = ScanSplits.targetBytes(st.properties),
      eqDeletes = SnapshotStore.eqDeletes(deletes),
      tFields = TransformPruning.fieldsOf(st.partitionCols,
        st.partitionTransforms, st.schema),
      typeHist = st.typeHistory,
      specPruning = SnapshotStore.specPruningOf(st),
      vectorized = ScanSplits.vectorizedEnabled(st.properties))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def description(): String = s"graft-snapshot branch $branch append"
      override def toBatch: BatchWrite = new BatchWrite {
        override def createBatchWriterFactory(
            info: PhysicalWriteInfo): DataWriterFactory = {
          val st = SnapshotStore.stateOf(k)
          // Branch files land in the table's own data dir: fast-forward is
          // pure metadata, never a copy.
          new MemWriterFactory(schema(), st.partitionCols, st.dataDir,
            RowFiles.sessionConf(), st.properties,
            FieldIds.writeColsFor(st.schema, schema()),
            st.partitionTransforms, st.currentSpecId)
        }
        override def commit(messages: Array[WriterCommitMessage]): Unit = {
          val files = messages.iterator.map(_.asInstanceOf[MemCommitMessage])
            .flatMap(_.files).toVector
          SnapshotStore.commitBranch(k, branch, files)
        }
        override def abort(messages: Array[WriterCommitMessage]): Unit =
          RowFiles.delete(messages.iterator.map(_.asInstanceOf[MemCommitMessage])
            .flatMap(_.files).map(_.path).toSeq)
        }
      }
    }
}

/** One data file's contribution to one commit's change feed. Either
  * skip-mode (emit all rows EXCEPT `skipDeletePaths`' positions — whole
  * files entering/leaving the table) or keep-mode (emit ONLY
  * `keepPositionPaths`' positions — merge-on-read deletes/restores).
  * `rowCount` is the data file's physical row count. */
private[sources] final case class MemChangePartition(path: String, rowCount: Long,
    changeType: String, commitVersion: Long, commitMicros: Long,
    skipDeletePaths: Seq[String] = Nil,
    keepPositionPaths: Seq[String] = Nil,
    writeCols: Seq[(Int, String)] = Nil,
    /** EQUALITY-keep mode: emit exactly the rows matching any of these key
      * sets (an equality-delete commit's row-level changes, reconstructed
      * by probing the OLDER file) … */
    keepEqPaths: Seq[(String, Seq[Int], Long)] = Nil,
    /** … minus rows that were ALREADY dead before the commit (prior
      * applicable equality deletes; prior position deletes ride
      * `skipDeletePaths`). */
    skipEqPaths: Seq[(String, Seq[Int], Long)] = Nil,
    /** The data file's sequence number — write-time type resolution
      * through the widening history, exactly like [[MemFilePartition]]. */
    seq: Long = 0L) extends InputPartition

