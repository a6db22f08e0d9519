package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The DURABLE METADATA LOG of the snapshot catalog — Iceberg's
  * table-metadata shape reduced to its load-bearing core, so the catalog
  * state SURVIVES the JVM and is SHARED between sessions pointing at the
  * same warehouse (the entire reason the reference wires Glue + `S3FileIO`,
  * `create_iceberg_tables.py:122-126`: catalog state that outlives and is
  * shared across drivers).
  *
  * Layout, per table directory (`<warehouse>/<catalog>/<ns>/<table>`):
  *
  *   <table>/…                      data files (*.grf, *.grfd)
  *   <table>/metadata/v<N>.json     table metadata as of commit N: schema,
  *                                  partition spec, properties, tags,
  *                                  branches, streaming-epoch watermarks,
  *                                  and the snapshot list — each snapshot a
  *                                  SUMMARY entry pointing at its manifest
  *   <table>/metadata/manifest-v<V>-<uuid>.json
  *                                  one snapshot's full file inventory
  *                                  (data files with partition values + row
  *                                  counts, position-delete files), written
  *                                  ONCE at that snapshot's commit and
  *                                  never rewritten
  *
  * COMMIT PROTOCOL — append one file, conflict on its name: a commit writes
  * the new snapshot's manifest (a fresh, never-contended file), then claims
  * `v<N+1>.json` with an ATOMIC CREATE-EXCLUSIVE. Two writers racing the
  * same table both target the same name; exactly one creation succeeds, the
  * loser reloads the winner's state and retries its whole transition
  * (re-running any optimistic-concurrency validation against the new base —
  * a moved row-level base stays a loud conflict). This is append-plus-claim,
  * not read-modify-write of a shared document: nothing is ever overwritten,
  * the highest `v<N>.json` IS the current-state pointer, and old metadata
  * files remain as the audit trail. On `file://` the claim is a hard-link
  * create (POSIX-atomic, content and claim in one step); on cluster
  * filesystems it delegates to the FileSystem's own create-exclusive
  * (atomic on HDFS at the NameNode; object stores need their conditional
  * put, the same requirement Iceberg's HadoopTableOperations documents).
  *
  * Manifest paths inside metadata are RELATIVE to the table directory, so a
  * table rename is one directory rename — no manifest rewrite, exactly why
  * Iceberg keeps metadata location-relative where it can.
  *
  * SCALE CONTRACT: one commit writes O(current files) manifest bytes plus
  * O(snapshots) summary bytes — never O(history × files). Loading a table
  * reads the newest metadata file and its live manifests only.
  */
private[sources] object MetadataLog {
  import SnapshotStore.{Branch, DataFile, DeleteFile, Snapshot, TableState}

  /** The table directory of `catalog +: namespace :+ table` under
    * `warehouse` — DETERMINISTIC (no uuid): the directory is the durable
    * identity a fresh session resolves the identifier against, and the
    * metadata claim inside it is what makes CREATE TABLE exclusive across
    * sessions. */
  def tableDir(warehouse: String, parts: Seq[String]): String =
    new Path(new Path(warehouse), parts.mkString("/")).toString

  def metaDir(dataDir: String): Path = new Path(dataDir, "metadata")

  /** Is `path` part of the metadata log (vN.json / manifests)? Orphan-file
    * GC must never judge these: they are referenced by the log structure
    * itself, not by manifests. */
  def isMetadataPath(dataDir: String, qualifiedPath: String): Boolean =
    qualifiedPath.contains("/metadata/")

  private def fsOf(p: Path): FileSystem =
    p.getFileSystem(RowFiles.sessionConf().value)

  // -- relative paths --------------------------------------------------------

  private def rel(dataDir: String, path: String): String = {
    val prefix = dataDir + "/"
    require(path.startsWith(prefix),
      s"data file $path is outside its table directory $dataDir — " +
        "cannot be recorded relative to it")
    path.substring(prefix.length)
  }
  private def abs(dataDir: String, r: String): String = s"$dataDir/$r"

  // -- partition-value codec -------------------------------------------------

  /** Identity-partition values ride in manifests; the codec is
    * type-directed off the (immutable — retype is rejected) partition
    * column types. Float/double go through `toString`/parse — the JDK
    * round-trip contract guarantees exactness, where a JSON number could
    * drift through a printer. */
  private[sources] def pvToJson(dt: DataType, v: Any): JValue =
    if (v == null) JNull
    else dt match {
      case StringType => JString(v.toString)
      case IntegerType => JLong(v.asInstanceOf[Int].toLong)
      case LongType => JLong(v.asInstanceOf[Long])
      case ShortType => JLong(v.asInstanceOf[Short].toLong)
      case ByteType => JLong(v.asInstanceOf[Byte].toLong)
      case BooleanType => JBool(v.asInstanceOf[Boolean])
      case DateType => JLong(v.asInstanceOf[Int].toLong)
      case TimestampType | TimestampNTZType => JLong(v.asInstanceOf[Long])
      case FloatType => JString(v.asInstanceOf[Float].toString)
      case DoubleType => JString(v.asInstanceOf[Double].toString)
      case _: DecimalType =>
        JString(v.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString)
      case other => throw new UnsupportedOperationException(
        s"partition column type $other is not serializable in the metadata log")
    }

  private[sources] def pvFromJson(dt: DataType, j: JValue): Any = j match {
    case JNull => null
    case _ => dt match {
      case StringType => UTF8String.fromString(jStr(j))
      case IntegerType => jLong(j).toInt
      case LongType => jLong(j)
      case ShortType => jLong(j).toShort
      case ByteType => jLong(j).toByte
      case BooleanType => j match {
        case JBool(b) => b
        case other => throw new IllegalStateException(s"expected bool, got $other")
      }
      case DateType => jLong(j).toInt
      case TimestampType | TimestampNTZType => jLong(j)
      case FloatType => jStr(j).toFloat
      case DoubleType => jStr(j).toDouble
      case d: DecimalType => Decimal(BigDecimal(jStr(j)), d.precision, d.scale)
      case other => throw new UnsupportedOperationException(
        s"partition column type $other is not deserializable from the metadata log")
    }
  }

  // -- tiny JSON accessors (explicit — no reflective extraction) -------------

  private def jStr(j: JValue): String = j match {
    case JString(s) => s
    case other => throw new IllegalStateException(s"expected string, got $other")
  }
  private def jLong(j: JValue): Long = j match {
    case JInt(i) => i.toLong
    case JLong(l) => l
    case other => throw new IllegalStateException(s"expected integer, got $other")
  }
  private def jInt(j: JValue): Int = jLong(j).toInt
  private def jArr(j: JValue): List[JValue] = j match {
    case JArray(xs) => xs
    case other => throw new IllegalStateException(s"expected array, got $other")
  }
  private def jObj(j: JValue): List[(String, JValue)] = j match {
    case JObject(fs) => fs
    case other => throw new IllegalStateException(s"expected object, got $other")
  }
  private def field(j: JValue, name: String): JValue =
    jObj(j).collectFirst { case (`name`, v) => v }.getOrElse(
      throw new IllegalStateException(s"metadata is missing field '$name'"))
  private def fieldOpt(j: JValue, name: String): Option[JValue] =
    jObj(j).collectFirst { case (`name`, v) => v }

  // -- manifests --------------------------------------------------------------

  /** Write one snapshot's manifest; returns (relative name, absolute path).
    * Names are uuid'd — manifests are never contended. Each file entry is
    * `[relPath, rowCount, [partitionValues…], {col: [min, max, nulls]},
    * sizeBytes, [[rowOffset, byteOffset]…]]` — the column stats scans skip
    * files on, plus the size and split points scan planning cuts big files
    * into multiple tasks with (both optional: older manifests lack them
    * and read back as unsplittable). */
  /** Entries per manifest CHUNK: a snapshot inventorying more files than
    * this writes its file list as several chunk files referenced from an
    * index manifest, so metadata-table reads (`.files` / `.partitions`)
    * can DISTRIBUTE — one scan task per chunk — instead of materializing
    * millions of rows on the driver. Table property
    * `write.manifest.chunk-entries`. */
  private val DefaultChunkEntries = 100000
  def chunkEntriesOf(props: Map[String, String]): Int =
    props.get("write.manifest.chunk-entries").map(_.toInt)
      .getOrElse(DefaultChunkEntries)

  private def fileEntryJson(dataDir: String, pvTypes: Seq[DataType],
      colTypes: Map[String, DataType], f: DataFile): JValue = {
    // A column the CURRENT schema no longer types identically is
    // unserializable — cannot happen today (no drop/retype), guarded
    // anyway so a future evolution bug loses stats, not correctness.
    val statsJson: JValue = JObject(f.stats.toList.collect {
      case (c, s) if colTypes.contains(c) =>
        val dt = colTypes(c)
        c -> (JArray(List(pvToJson(dt, s.min), pvToJson(dt, s.max),
          JLong(s.nulls))): JValue)
    })
    JArray(List(
      JString(rel(dataDir, f.path)),
      JLong(f.rowCount),
      JArray(pvTypes.zip(f.partitionValues)
        .map { case (t, v) => pvToJson(t, v) }.toList),
      statsJson,
      JLong(f.sizeBytes),
      JArray(f.splitPoints.toList.map { case (r, b) =>
        JArray(List(JLong(r), JLong(b))) })))
  }

  /** Parse one manifest file entry — shared by the driver-side state load
    * and the EXECUTOR-side distributed `.files` chunk reader. */
  private[sources] def fileEntryFromJson(dataDir: String, pvTypes: Seq[DataType],
      colTypes: Map[String, DataType], e: JValue): DataFile = {
    val es = jArr(e)
    val stats =
      if (es.length < 4) Map.empty[String, SnapshotStore.ColStats]
      else jObj(es(3)).collect {
        case (c, v) if colTypes.contains(c) =>
          val dt = colTypes(c)
          val vs = jArr(v)
          c -> SnapshotStore.ColStats(
            pvFromJson(dt, vs.head), pvFromJson(dt, vs(1)), jLong(vs(2)))
      }.toMap
    val sizeBytes = if (es.length > 4) jLong(es(4)) else 0L
    val splits =
      if (es.length > 5) jArr(es(5)).map { sp =>
        val ps = jArr(sp); (jLong(ps.head), jLong(ps(1)))
      }.toVector
      else Vector.empty[(Long, Long)]
    DataFile(abs(dataDir, jStr(es.head)), jArr(es(2)).zip(pvTypes)
      .map { case (v, t) => pvFromJson(t, v) }.toVector, jLong(es(1)), stats,
      sizeBytes, splits)
  }

  private def writeManifest(dataDir: String, sn: Snapshot,
      pvTypes: Seq[DataType], colTypes: Map[String, DataType],
      chunkEntries: Int): (String, Seq[Path]) = {
    val stem =
      s"metadata/manifest-v${sn.version}-${UUID.randomUUID.toString.take(8)}"
    val name = s"$stem.json"
    val deletesJson = JArray(sn.deleteFiles.toList.map(d => JArray(List(
      JString(rel(dataDir, d.path)),
      JString(rel(dataDir, d.dataPath)),
      JLong(d.entryCount)))))
    def entry(f: DataFile) = fileEntryJson(dataDir, pvTypes, colTypes, f)
    val written = Seq.newBuilder[Path]
    val json =
      if (sn.files.size <= chunkEntries)
        JObject(
          "files" -> JArray(sn.files.toList.map(entry)),
          "deletes" -> deletesJson)
      else {
        // CHUNKED: the index manifest lists chunk names; each chunk holds a
        // slice of the file inventory. Chunk files are written before the
        // index, so a reader never observes a dangling reference.
        val chunkNames = sn.files.grouped(chunkEntries).zipWithIndex.map {
          case (slice, i) =>
            val cn = s"$stem-c$i.json"
            val p = new Path(dataDir, cn)
            writeFile(p, JsonMethods.compact(JsonMethods.render(
              JObject("files" -> JArray(slice.toList.map(entry)))))
              .getBytes(UTF_8))
            written += p
            cn
        }.toList
        JObject(
          "chunks" -> JArray(chunkNames.map(JString(_))),
          "deletes" -> deletesJson)
      }
    val p = new Path(dataDir, name)
    writeFile(p, JsonMethods.compact(JsonMethods.render(json)).getBytes(UTF_8))
    written += p
    (name, written.result())
  }

  /** The chunk names (relative) of `name` if it is a chunked index
    * manifest; None for a plain single-file manifest. */
  def manifestChunks(dataDir: String, name: String): Option[Vector[String]] = {
    val j = JsonMethods.parse(readFully(new Path(dataDir, name)))
    fieldOpt(j, "chunks").map(c => jArr(c).map(jStr).toVector)
  }

  /** Read one CHUNK's file entries — the executor-side body of the
    * distributed `.files` metadata scan. */
  def readChunkFiles(dataDir: String, chunkName: String,
      pvTypes: Seq[DataType], colTypes: Map[String, DataType],
      conf: org.apache.hadoop.conf.Configuration): Vector[DataFile] = {
    val p = new Path(dataDir, chunkName)
    val j = JsonMethods.parse(readFullyWith(p, conf))
    jArr(field(j, "files"))
      .map(fileEntryFromJson(dataDir, pvTypes, colTypes, _)).toVector
  }

  private def readManifest(dataDir: String, name: String,
      pvTypes: Seq[DataType],
      colTypes: Map[String, DataType]): (Vector[DataFile], Vector[DeleteFile]) = {
    val j = JsonMethods.parse(readFully(new Path(dataDir, name)))
    val entries = fieldOpt(j, "chunks") match {
      case None => jArr(field(j, "files"))
      case Some(chunks) => jArr(chunks).flatMap(c =>
        jArr(field(JsonMethods.parse(
          readFully(new Path(dataDir, jStr(c)))), "files")))
    }
    val files =
      entries.map(fileEntryFromJson(dataDir, pvTypes, colTypes, _)).toVector
    val deletes = jArr(field(j, "deletes")).map { e =>
      val es = jArr(e)
      DeleteFile(abs(dataDir, jStr(es.head)), abs(dataDir, jStr(es(1))),
        jLong(es(2)))
    }.toVector
    (files, deletes)
  }

  // -- table metadata ----------------------------------------------------------

  private def snapToJson(sn: Snapshot): JValue = {
    require(sn.manifestPath != null,
      s"internal: snapshot v${sn.version} reached serialization without a manifest")
    JObject(
      "v" -> JLong(sn.version),
      "ts" -> JLong(sn.commitMicros),
      "appended" -> JLong(sn.appendedFiles.toLong),
      "op" -> JString(sn.operation),
      "schema" -> (if (sn.schema == null) JNull else JString(sn.schema.json)),
      "manifest" -> JString(sn.manifestPath))
  }

  private def snapFromJson(dataDir: String, pvTypes: Seq[DataType],
      colTypes: Map[String, DataType], j: JValue): Snapshot = {
    val manifest = jStr(field(j, "manifest"))
    val (files, deletes) = readManifest(dataDir, manifest, pvTypes, colTypes)
    Snapshot(jLong(field(j, "v")), jLong(field(j, "ts")), files,
      appendedFiles = jInt(field(j, "appended")),
      schema = field(j, "schema") match {
        case JNull => null
        case s => DataType.fromJson(jStr(s)).asInstanceOf[StructType]
      },
      deleteFiles = deletes,
      operation = jStr(field(j, "op")),
      manifestPath = manifest)
  }

  private def renderState(st: TableState): String = {
    val json = JObject(
      "format" -> JLong(1L),
      "schema" -> JString(st.schema.json),
      "partitionCols" -> JArray(st.partitionCols.toList.map(JString(_))),
      "properties" -> JObject(st.properties.toList.map {
        case (k, v) => k -> (JString(v): JValue) }),
      "tags" -> JObject(st.tags.toList.map {
        case (n, v) => n -> (JLong(v): JValue) }),
      // Epoch watermarks keep their recency order (it IS the LRU order).
      "epochs" -> JArray(st.epochs.toList.map {
        case (q, e) => JArray(List(JString(q), JLong(e))) }),
      "snapshots" -> JArray(st.snapshots.toList.map(snapToJson)),
      "branches" -> JObject(st.branches.toList.map { case (n, br) =>
        n -> (JObject(
          "base" -> JLong(br.base),
          "snapshots" -> JArray(br.snapshots.toList.map(snapToJson))): JValue)
      }))
    JsonMethods.compact(JsonMethods.render(json))
  }

  private def parseState(dataDir: String, metaVersion: Long,
      jsonStr: String): TableState = {
    val j = JsonMethods.parse(jsonStr)
    val schema = DataType.fromJson(jStr(field(j, "schema"))).asInstanceOf[StructType]
    val partitionCols = jArr(field(j, "partitionCols")).map(jStr)
    val pvTypes = partitionCols.map(c => schema(c).dataType)
    val colTypes = schema.fields.map(f => f.name -> f.dataType).toMap
    TableState(
      schema = schema,
      partitionCols = partitionCols,
      dataDir = dataDir, // derived from location, never trusted from content
      properties = jObj(field(j, "properties")).map {
        case (k, v) => k -> jStr(v) }.toMap,
      snapshots = jArr(field(j, "snapshots"))
        .map(snapFromJson(dataDir, pvTypes, colTypes, _)).toVector,
      tags = jObj(field(j, "tags")).map { case (n, v) => n -> jLong(v) }.toMap,
      epochs = scala.collection.immutable.ListMap(
        jArr(field(j, "epochs")).map { e =>
          val es = jArr(e); jStr(es.head) -> jLong(es(1))
        }: _*),
      branches = jObj(field(j, "branches")).map { case (n, b) =>
        n -> Branch(jLong(field(b, "base")),
          jArr(field(b, "snapshots"))
            .map(snapFromJson(dataDir, pvTypes, colTypes, _)).toVector)
      }.toMap,
      metaVersion = metaVersion)
  }

  // -- commit / create / load ---------------------------------------------------

  /** Persist `before → after` as metadata commit `before.metaVersion + 1`.
    * Returns the persisted state (manifest paths assigned, metaVersion
    * bumped), or None on a CAS conflict — another writer claimed the same
    * commit number; the caller reloads and retries its transition. */
  def tryCommit(before: TableState, after: TableState): Option[TableState] = {
    val dataDir = after.dataDir
    val pvTypes = after.partitionCols.map(c => after.schema(c).dataType)
    val colTypes = after.schema.fields.map(f => f.name -> f.dataType).toMap
    val chunkEntries = chunkEntriesOf(after.properties)
    val written = scala.collection.mutable.ArrayBuffer.empty[Path]
    def withManifests(sns: Vector[Snapshot]): Vector[Snapshot] = sns.map { sn =>
      if (sn.manifestPath != null) sn
      else {
        val (name, ps) = writeManifest(dataDir, sn, pvTypes, colTypes, chunkEntries)
        written ++= ps
        sn.copy(manifestPath = name)
      }
    }
    val persisted = after.copy(
      snapshots = withManifests(after.snapshots),
      branches = after.branches.map { case (n, br) =>
        n -> br.copy(snapshots = withManifests(br.snapshots)) },
      metaVersion = before.metaVersion + 1)
    val target = new Path(metaDir(dataDir), s"v${persisted.metaVersion}.json")
    if (writeExclusive(target, renderState(persisted).getBytes(UTF_8)))
      Some(persisted)
    else {
      // Lost the claim: the manifests written for this attempt are orphans
      // of a commit that never happened — clean them now, not via GC.
      val fs = fsOf(target)
      written.foreach(p =>
        try fs.delete(p, false) catch { case _: java.io.IOException => () })
      None
    }
  }

  /** Durable CREATE TABLE: claim `metadata/v1.json` in the deterministic
    * table directory. Returns the persisted state, or None if another
    * session (or a leftover) already claimed the table. */
  def createInitial(st: TableState): Option[TableState] = {
    val md = metaDir(st.dataDir)
    fsOf(md).mkdirs(md)
    val persisted = st.copy(metaVersion = 1L)
    if (writeExclusive(new Path(md, "v1.json"),
        renderState(persisted).getBytes(UTF_8))) Some(persisted)
    else None
  }

  /** Load a table's state from its warehouse directory: newest
    * `v<N>.json` plus the live manifests it references. None if the
    * catalog's warehouse is unknown to this JVM or no metadata exists. */
  def load(k: String): Option[TableState] = {
    val parts = k.split(0.toChar).toSeq
    val wh = SnapshotStore.warehouses.get(parts.head).getOrElse(return None)
    val dataDir = tableDir(wh, parts)
    val md = metaDir(dataDir)
    val fs = fsOf(md)
    if (!fs.exists(md)) return None
    val versions = fs.listStatus(md).toSeq.flatMap { s =>
      val n = s.getPath.getName
      if (n.startsWith("v") && n.endsWith(".json"))
        n.stripPrefix("v").stripSuffix(".json").toLongOption
      else None
    }
    if (versions.isEmpty) return None
    val v = versions.max
    val st = parseState(dataDir, v, readFully(new Path(md, s"v$v.json")))
    // A restarted JVM's commit clock must stay ahead of every loaded
    // commit, or TIMESTAMP AS OF could see a non-monotonic history.
    val maxMicros = (st.snapshots.iterator ++
      st.branches.valuesIterator.flatMap(_.snapshots))
      .map(_.commitMicros).maxOption.getOrElse(0L)
    SnapshotStore.bumpClock(maxMicros)
    Some(st)
  }

  /** Table names present on disk under `catalog +: namespace` (directories
    * holding a metadata log). */
  def listDiskTables(warehouse: String, parts: Seq[String]): Seq[String] = {
    val dir = new Path(tableDir(warehouse, parts))
    val fs = fsOf(dir)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory &&
        fs.exists(new Path(s.getPath, "metadata")))
      .map(_.getPath.getName)
  }

  /** Namespace directories on disk directly under `warehouse/catalog`
    * (single-level namespaces — the only kind this catalog serves). */
  def listDiskNamespaces(warehouse: String, catalog: String): Seq[String] = {
    val dir = new Path(warehouse, catalog)
    val fs = fsOf(dir)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  def namespaceDirExists(warehouse: String, parts: Seq[String]): Boolean = {
    val dir = new Path(tableDir(warehouse, parts))
    fsOf(dir).exists(dir)
  }

  def mkNamespaceDir(warehouse: String, parts: Seq[String]): Unit = {
    val dir = new Path(tableDir(warehouse, parts))
    fsOf(dir).mkdirs(dir)
    ()
  }

  // -- file primitives -----------------------------------------------------------

  private def writeFile(p: Path, bytes: Array[Byte]): Unit = {
    val out = fsOf(p).create(p, false)
    try out.write(bytes) finally out.close()
  }

  private def readFully(p: Path): String = readFullyWith(p, null)

  /** Read a metadata file whole. `conf` is the EXPLICIT Hadoop conf shipped
    * to executor-side readers (the distributed `.files` chunk scan); null
    * falls back to the driver's session conf. */
  private def readFullyWith(p: Path,
      conf: org.apache.hadoop.conf.Configuration): String = {
    val fs = if (conf == null) fsOf(p) else p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen.toInt
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      new String(buf, UTF_8)
    } finally in.close()
  }

  /** Atomic create-exclusive of `target` WITH content. `file://` uses a
    * hard link from a fully-written temp file (POSIX-atomic: claim and
    * content are one step, a concurrent loader can never observe a partial
    * file); other schemes delegate to the FileSystem's create-exclusive
    * (atomic on HDFS; object stores need conditional put — the same
    * requirement Iceberg's Hadoop table operations document). Returns false
    * iff the target already exists (the CAS conflict). */
  private def writeExclusive(target: Path, bytes: Array[Byte]): Boolean = {
    val fs = fsOf(target)
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(target.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      val tmp = local.resolveSibling(s".tmp-${UUID.randomUUID}")
      java.nio.file.Files.write(tmp, bytes)
      try { java.nio.file.Files.createLink(local, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      if (fs.exists(target)) return false
      try {
        val out = fs.create(target, false)
        try out.write(bytes) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException => if (fs.exists(target)) false else throw e
      }
    }
  }
}
