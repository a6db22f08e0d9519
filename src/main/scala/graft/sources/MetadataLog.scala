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

  /** Is `path` inside THIS table's metadata log (vN.json / manifests)?
    * Orphan-file GC must never judge these: they are referenced by the log
    * structure itself, not by manifests. Both arguments must be
    * fs-qualified the same way — and the check is anchored at the table
    * dir, so the data files of a table merely NAMED (or namespaced)
    * "metadata" are still GC-eligible. */
  def isMetadataPath(qualifiedDataDir: String, qualifiedPath: String): Boolean =
    qualifiedPath.startsWith(
      qualifiedDataDir.stripSuffix("/") + "/metadata/")

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

  /** The column-type context a manifest (de)serializes file entries
    * against: field id → type (the stats key space) plus lowercased
    * name → id (legacy manifests keyed stats by name). */
  private[sources] final case class ColCtx(byId: Map[Int, DataType],
      nameToId: Map[String, Int])
  private[sources] def colCtxOf(schema: StructType): ColCtx = ColCtx(
    schema.fields.iterator.flatMap(f =>
      FieldIds.idOf(f).map(_ -> f.dataType)).toMap,
    FieldIds.idsByName(schema))

  private def fileEntryJson(dataDir: String, specTypes: Map[Int, Seq[DataType]],
      ctx: ColCtx, f: DataFile): JValue = {
    // Stats are keyed by FIELD ID (stable across renames); an id the
    // current schema no longer types (dropped column) is unserializable —
    // skipped, losing stats, never correctness.
    // Keys are "#<field id>" — the '#' marks the id keyspace so a LEGACY
    // name-keyed entry whose column is literally named like a number can
    // never be misread as an id (and vice versa).
    val statsJson: JValue = JObject(f.stats.toList.collect {
      case (id, s) if ctx.byId.contains(id) =>
        val dt = ctx.byId(id)
        // A file written before a type WIDEN carries narrow stat boxes (an
        // Int min under a now-Long column) — coerce into the manifest
        // schema's type (identity for never-widened tables). The optional
        // 4th element is the column's NDV sketch registers (base64) —
        // hash-canonical across widening, so no coercion needed. The
        // optional 5th is [lenSum, lenMax] (string byte widths); when
        // lengths exist without a sketch (long-string invalidation) the
        // 4th rides as an explicit null placeholder.
        val ndvJ: Option[JValue] = Option(s.ndv).map(n => JString(
          java.util.Base64.getEncoder.encodeToString(n.registers)))
        val lenJ: Option[JValue] =
          if (s.lenSum >= 0)
            Some(JArray(List(JLong(s.lenSum), JLong(s.lenMax))))
          else None
        // Optional 6th element: the serialized [[FileBloom]] filter
        // (base64); earlier optionals ride as null placeholders when a
        // later one exists.
        val bloomJ: Option[JValue] = Option(s.bloom).map(b => JString(
          java.util.Base64.getEncoder.encodeToString(b.bytes)))
        val tail: List[JValue] =
          if (bloomJ.isDefined)
            List(ndvJ.getOrElse(JNull), lenJ.getOrElse(JNull), bloomJ.get)
          else if (lenJ.isDefined) List(ndvJ.getOrElse(JNull), lenJ.get)
          else ndvJ.toList
        s"#$id" -> (JArray(List(
          pvToJson(dt, TypeWidening.coerce(dt, s.min)),
          pvToJson(dt, TypeWidening.coerce(dt, s.max)),
          JLong(s.nulls)) ++ tail): JValue)
    })
    // Partition values are typed by the file's OWN spec (spec evolution).
    val pvT = specTypes.getOrElse(f.specId,
      throw new IllegalStateException(
        s"file ${f.path} carries unknown partition spec id ${f.specId}"))
    JArray(List(
      JString(rel(dataDir, f.path)),
      JLong(f.rowCount),
      JArray(pvT.zip(f.partitionValues)
        .map { case (t, v) => pvToJson(t, v) }.toList),
      statsJson,
      JLong(f.sizeBytes),
      JArray(f.splitPoints.toList.map { case (r, b) =>
        JArray(List(JLong(r), JLong(b))) }),
      JLong(f.seq),
      JArray(f.writeCols.toList.map { case (id, n) =>
        JArray(List(JLong(id.toLong), JString(n))) }),
      JLong(f.specId.toLong),
      // Normalized write-time sort order ("" = unsorted/unknown).
      JString(f.sortKey)))
  }

  /** Parse one manifest file entry — shared by the driver-side state load
    * and the EXECUTOR-side distributed `.files` chunk reader. Legacy
    * manifests keyed stats by column NAME; those resolve through the
    * current name → id map (a name no longer present conservatively drops
    * its stats). */
  private[sources] def fileEntryFromJson(dataDir: String,
      specTypes: Map[Int, Seq[DataType]],
      ctx: ColCtx, e: JValue): DataFile = {
    val es = jArr(e)
    val stats =
      if (es.length < 4) Map.empty[Int, SnapshotStore.ColStats]
      else jObj(es(3)).flatMap { case (key, v) =>
        // "#<id>" = the id keyspace; anything else is a legacy NAME key
        // resolved through the schema (see statsJson's keyspace note).
        val id =
          if (key.startsWith("#")) key.drop(1).toIntOption
          else ctx.nameToId.get(key.toLowerCase)
        id.filter(ctx.byId.contains).map { i =>
          val dt = ctx.byId(i)
          val vs = jArr(v)
          val ndv = if (vs.length > 3) vs(3) match {
            case JString(b64) => SnapshotStore.Ndv(
              java.util.Base64.getDecoder.decode(b64))
            case _ => null
          } else null
          val (lenSum, lenMax) = if (vs.length > 4) vs(4) match {
            case JArray(ls) => (jLong(ls.head), jLong(ls(1)))
            case _ => (-1L, -1L)
          } else (-1L, -1L)
          val bloom = if (vs.length > 5) vs(5) match {
            case JString(b64) => SnapshotStore.Bloom(
              java.util.Base64.getDecoder.decode(b64))
            case _ => null
          } else null
          i -> SnapshotStore.ColStats(
            pvFromJson(dt, vs.head), pvFromJson(dt, vs(1)), jLong(vs(2)),
            ndv, lenSum, lenMax, bloom)
        }
      }.toMap
    val sizeBytes = if (es.length > 4) jLong(es(4)) else 0L
    val splits =
      if (es.length > 5) jArr(es(5)).map { sp =>
        val ps = jArr(sp); (jLong(ps.head), jLong(ps(1)))
      }.toVector
      else Vector.empty[(Long, Long)]
    val seq = if (es.length > 6) jLong(es(6)) else 0L
    val writeCols =
      if (es.length > 7) jArr(es(7)).map { wc =>
        val ws = jArr(wc); (jInt(ws.head), jStr(ws(1)))
      }.toVector
      else Vector.empty[(Int, String)]
    val specId = if (es.length > 8) jInt(es(8)) else 0
    val sortKey = if (es.length > 9) jStr(es(9)) else ""
    val pvT = specTypes.getOrElse(specId,
      throw new IllegalStateException(
        s"manifest entry carries unknown partition spec id $specId"))
    DataFile(abs(dataDir, jStr(es.head)), jArr(es(2)).zip(pvT)
      .map { case (v, t) => pvFromJson(t, v) }.toVector, jLong(es(1)), stats,
      sizeBytes, splits, seq, writeCols, specId, sortKey)
  }

  private def writeManifest(dataDir: String, sn: Snapshot,
      specTypes: Map[Int, Seq[DataType]], ctx: ColCtx,
      chunkEntries: Int): (String, Seq[Path]) = {
    val stem =
      s"metadata/manifest-v${sn.version}-${UUID.randomUUID.toString.take(8)}"
    val name = s"$stem.json"
    val deletesJson = JArray(sn.deleteFiles.toList.map(d => JArray(List(
      JString(rel(dataDir, d.path)),
      // Equality deletes are file-spanning: no dataPath to relativize.
      JString(if (d.dataPath.isEmpty) "" else rel(dataDir, d.dataPath)),
      JLong(d.entryCount),
      JString(d.kind),
      JArray(d.equalityCols.toList.map(id => JLong(id.toLong))),
      JLong(d.seq),
      // Key-column bounds ("#id" keyspace like data-file stats) — the
      // delete-file pruning surface; widen-coerced like file stats.
      JObject(d.stats.toList.collect {
        case (id, cs) if ctx.byId.contains(id) =>
          val dt = ctx.byId(id)
          s"#$id" -> (JArray(List(
            pvToJson(dt, TypeWidening.coerce(dt, cs.min)),
            pvToJson(dt, TypeWidening.coerce(dt, cs.max)),
            JLong(cs.nulls))): JValue)
      }),
      // Deletion-vector supersede lineage (kind = "dv" only).
      JArray(d.supersedes.toList.map(p => JString(rel(dataDir, p))))))))
    def entry(f: DataFile) = fileEntryJson(dataDir, specTypes, ctx, f)
    val written = Seq.newBuilder[Path]
    val json =
      if (sn.files.size <= chunkEntries)
        JObject(
          "files" -> JArray(sn.files.toList.map(entry)),
          "deletes" -> deletesJson)
      else {
        // CHUNKED: the index manifest lists chunk entries; each chunk holds
        // a slice of the file inventory. Chunk files are written before the
        // index, so a reader never observes a dangling reference. Slices
        // are grouped PER PARTITION SPEC and each index entry records the
        // chunk's spec id plus per-position partition-value RANGES
        // [min, max, nullState 0|1|2] — Iceberg's manifest-list partition
        // summaries: scan planning skips whole chunks a partition
        // predicate cannot match without reading them.
        var ci = -1
        val chunkEntriesJson = sn.files.groupBy(_.specId).toList
          .sortBy(_._1).flatMap { case (specId, ofSpec) =>
            val pvT = specTypes.getOrElse(specId, Seq.empty)
            ofSpec.grouped(chunkEntries).map { slice =>
              ci += 1
              val cn = s"$stem-c$ci.json"
              val p = new Path(dataDir, cn)
              writeFile(p, JsonMethods.compact(JsonMethods.render(
                JObject("files" -> JArray(slice.toList.map(entry)))))
                .getBytes(UTF_8))
              written += p
              val ranges: JValue = JArray(pvT.zipWithIndex.toList.map {
                case (dt, pos) =>
                  val vs = slice.map(_.partitionValues(pos))
                  val nonNull = vs.filter(_ != null)
                  val nullState =
                    if (nonNull.size == vs.size) 0L
                    else if (nonNull.isEmpty) 2L else 1L
                  if (nonNull.isEmpty)
                    JArray(List(JNull, JNull, JLong(nullState)))
                  else {
                    val ord = org.apache.spark.sql.catalyst.util.TypeUtils
                      .getInterpretedOrdering(dt)
                    JArray(List(
                      pvToJson(dt, nonNull.min(ord)),
                      pvToJson(dt, nonNull.max(ord)),
                      JLong(nullState)))
                  }
              })
              // Pre-merged per-column NDV registers + null totals — the
              // O(chunks) plan-time statistics surface: a fresh planner
              // estimates column cardinalities from |chunks| merges
              // instead of |files| (HLL union is associative, so the
              // chunk-level merge lands on EXACTLY the per-file result).
              // Recorded only when every file in the slice tracks the
              // column, mirroring columnStats' partial-merge gate.
              val ids = slice.flatMap(_.stats.keySet).distinct.sorted
              val st: JValue = JObject(ids.toList.flatMap { id =>
                val per = slice.map(_.stats.get(id))
                // Coverage-gated like columnStats: EVERY file must carry a
                // WELL-FORMED sketch (NdvSketch.apply validates length) —
                // a malformed one degrades to "no chunk summary" rather
                // than failing the commit or under-counting silently.
                val sketches = per.map(s =>
                  s.flatMap(cs => Option(cs.ndv))
                    .flatMap(n => NdvSketch(n.registers)))
                if (ctx.byId.contains(id) && sketches.forall(_.isDefined)) {
                  val acc = new NdvSketch(
                    sketches.head.get.registers.clone())
                  sketches.tail.foreach(s => acc.mergeInPlace(s.get))
                  Some(s"#$id" -> (JArray(List(
                    JString(java.util.Base64.getEncoder
                      .encodeToString(acc.registers)),
                    JLong(per.map(_.get.nulls).sum))): JValue))
                } else None
              })
              JObject("n" -> JString(cn), "s" -> JLong(specId.toLong),
                "r" -> ranges, "st" -> st): JValue
            }
          }
        JObject(
          "chunks" -> JArray(chunkEntriesJson),
          "deletes" -> deletesJson)
      }
    val p = new Path(dataDir, name)
    writeFile(p, JsonMethods.compact(JsonMethods.render(json)).getBytes(UTF_8))
    written += p
    (name, written.result())
  }

  /** One chunk of a chunked index manifest: its file name, the partition
    * spec its files share, and per-position partition-value ranges
    * `(min, max, nullState)` with nullState 0=no nulls, 1=some, 2=all —
    * the summary scan planning skips chunks on. Legacy string entries
    * parse with no summary (never skipped). */
  final case class ChunkEntry(name: String, specId: Int,
      ranges: Seq[(Any, Any, Long)],
      /** Pre-merged per-FIELD-ID (NDV registers, null total) over the
        * chunk's files; empty for pre-summary chunks (planning falls
        * back to the per-file merge). */
      stats: Map[Int, (SnapshotStore.Ndv, Long)] = Map.empty)

  private def chunkEntryFromJson(specTypes: Map[Int, Seq[DataType]],
      e: JValue): ChunkEntry = e match {
    case JString(n) => ChunkEntry(n, 0, Nil) // legacy: names only
    case obj =>
      val specId = jInt(field(obj, "s"))
      val pvT = specTypes.getOrElse(specId, Seq.empty)
      val ranges = jArr(field(obj, "r")).zip(pvT).map { case (r, dt) =>
        val rs = jArr(r)
        (pvFromJson(dt, rs.head), pvFromJson(dt, rs(1)), jLong(rs(2)))
      }
      val stats = fieldOpt(obj, "st").map(jObj(_).flatMap { case (key, v) =>
        key.drop(1).toIntOption.map { id =>
          val vs = jArr(v)
          val b64 = vs.head match {
            case JString(b) => b
            case other => sys.error(s"chunk stats malformed: $other")
          }
          id -> (SnapshotStore.Ndv(
            java.util.Base64.getDecoder.decode(b64)), jLong(vs(1)))
        }
      }.toMap).getOrElse(Map.empty)
      ChunkEntry(jStr(field(obj, "n")), specId, ranges, stats)
  }

  /** The chunk names (relative) of `name` if it is a chunked index
    * manifest; None for a plain single-file manifest. */
  def manifestChunks(dataDir: String, name: String): Option[Vector[String]] = {
    val j = JsonMethods.parse(readFully(new Path(dataDir, name)))
    fieldOpt(j, "chunks").map(c => jArr(c).map {
      case JString(n) => n
      case obj => jStr(field(obj, "n"))
    }.toVector)
  }

  /** The chunk index WITH partition summaries plus the manifest's delete
    * files — everything chunk-skipping scan planning needs WITHOUT
    * touching a single chunk. None for unchunked manifests. */
  def chunkIndex(dataDir: String, name: String,
      specTypes: Map[Int, Seq[DataType]], ctx: ColCtx):
      Option[(Vector[ChunkEntry], Vector[DeleteFile])] = {
    val j = JsonMethods.parse(readFully(new Path(dataDir, name)))
    fieldOpt(j, "chunks").map { c =>
      (jArr(c).map(chunkEntryFromJson(specTypes, _)).toVector,
        deletesFromJson(dataDir, ctx, j))
    }
  }

  /** Chunk loads since JVM start — the observable for chunk-skip tests. */
  val chunkLoads = new java.util.concurrent.atomic.AtomicLong(0L)

  /** NDV register arrays consumed by plan-time column-stats merging —
    * the observable for the O(chunks)-vs-O(files) stats claim. */
  val statsMergeInputs = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Read one CHUNK's file entries — the executor-side body of the
    * distributed `.files` metadata scan. */
  def readChunkFiles(dataDir: String, chunkName: String,
      specTypes: Map[Int, Seq[DataType]], ctx: ColCtx,
      conf: org.apache.hadoop.conf.Configuration): Vector[DataFile] = {
    chunkLoads.incrementAndGet()
    val p = new Path(dataDir, chunkName)
    val j = JsonMethods.parse(readFullyWith(p, conf))
    jArr(field(j, "files"))
      .map(fileEntryFromJson(dataDir, specTypes, ctx, _)).toVector
  }

  /** A deferred manifest read: everything needed to materialize one
    * snapshot's file inventory on first touch — the LAZY residency handle
    * [[SnapshotStore.Snapshot]] holds for history loaded from the log
    * (`ctx` is the snapshot's OWN column context, so stats resolve exactly
    * as an eager load would). */
  private[sources] final case class ManifestRef(dataDir: String, name: String,
      specTypes: Map[Int, Seq[DataType]], ctx: ColCtx) {
    def load(): (Vector[DataFile], Vector[DeleteFile]) =
      readManifest(dataDir, name, specTypes, ctx)
  }

  private def readManifest(dataDir: String, name: String,
      specTypes: Map[Int, Seq[DataType]],
      ctx: ColCtx): (Vector[DataFile], Vector[DeleteFile]) = {
    val j = JsonMethods.parse(readFully(new Path(dataDir, name)))
    val entries = fieldOpt(j, "chunks") match {
      case None => jArr(field(j, "files"))
      case Some(chunks) => jArr(chunks).flatMap { c =>
        // Entries are objects (name + partition summary) since chunk
        // summaries landed; bare strings are the legacy form.
        val cn = c match {
          case JString(n) => n
          case obj => jStr(field(obj, "n"))
        }
        jArr(field(JsonMethods.parse(
          readFully(new Path(dataDir, cn))), "files"))
      }
    }
    val files =
      entries.map(fileEntryFromJson(dataDir, specTypes, ctx, _)).toVector
    (files, deletesFromJson(dataDir, ctx, j))
  }

  private def deletesFromJson(dataDir: String, ctx: ColCtx,
      j: JValue): Vector[DeleteFile] =
    jArr(field(j, "deletes")).map { e =>
      val es = jArr(e)
      val dataRel = jStr(es(1))
      DeleteFile(abs(dataDir, jStr(es.head)),
        if (dataRel.isEmpty) "" else abs(dataDir, dataRel),
        jLong(es(2)),
        kind = if (es.length > 3) jStr(es(3)) else "pos",
        equalityCols =
          if (es.length > 4) jArr(es(4)).map(jInt) else Nil,
        seq = if (es.length > 5) jLong(es(5)) else 0L,
        stats =
          if (es.length > 6) jObj(es(6)).flatMap { case (key, v) =>
            key.drop(1).toIntOption.filter(ctx.byId.contains).map { i =>
              val dt = ctx.byId(i)
              val vs = jArr(v)
              i -> SnapshotStore.ColStats(
                pvFromJson(dt, vs.head), pvFromJson(dt, vs(1)), jLong(vs(2)))
            }
          }.toMap
          else Map.empty,
        supersedes =
          if (es.length > 7) jArr(es(7)).map(p => abs(dataDir, jStr(p))).toVector
          else Vector.empty)
    }.toVector

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
      "manifest" -> JString(sn.manifestPath),
      // Certifies every manifest entry carries a real sequence number, so
      // a loader may defer the manifest read (lazy residency) — an
      // UNFLAGGED summary forces the eager path and the legacy-seq
      // reconstruction. Carried from the in-memory snapshot: computing it
      // here would force lazy history back into memory on every commit.
      "seqs" -> JBool(sn.seqsKnown))
  }

  private def snapFromJson(dataDir: String, specTypes: Map[Int, Seq[DataType]],
      tableCtx: ColCtx, j: JValue): Snapshot = {
    val manifest = jStr(field(j, "manifest"))
    // A pre-field-id snapshot schema migrates POSITIONALLY — sound because
    // pre-id history was append-only (see FieldIds.assign).
    val schema = field(j, "schema") match {
      case JNull => null
      case s => FieldIds.assign(
        DataType.fromJson(jStr(s)).asInstanceOf[StructType])._1
    }
    // Manifest stats resolve against the SNAPSHOT's own schema (the types
    // and names its entries were serialized under).
    val ctx = if (schema == null) tableCtx else colCtxOf(schema)
    val seqsKnown = fieldOpt(j, "seqs").exists {
      case JBool(b) => b
      case _ => false
    }
    if (seqsKnown)
      // LAZY: the summary certifies seq-stamped entries, so the manifest
      // stays on disk until this snapshot's inventory is actually touched
      // — table load is O(snapshots) summaries, not O(history × files).
      Snapshot.lazyLoaded(jLong(field(j, "v")), jLong(field(j, "ts")),
        appendedFiles = jInt(field(j, "appended")),
        schema = schema,
        operation = jStr(field(j, "op")),
        manifestPath = manifest,
        loader = ManifestRef(dataDir, manifest, specTypes, ctx))
    else {
      // EAGER: unflagged summary (legacy metadata) — entries may predate
      // sequence tracking and need the global reconstruction in
      // [[assignLegacySeqs]], which must see them materialized.
      val (files, deletes) = readManifest(dataDir, manifest, specTypes, ctx)
      Snapshot(jLong(field(j, "v")), jLong(field(j, "ts")), files,
        appendedFiles = jInt(field(j, "appended")),
        schema = schema,
        deleteFiles = deletes,
        operation = jStr(field(j, "op")),
        manifestPath = manifest)
    }
  }

  private def renderState(st: TableState): String = {
    val json = JObject(
      "format" -> JLong(1L),
      "tableId" -> JString(st.tableId),
      "schema" -> JString(st.schema.json),
      "lastFieldId" -> JLong(st.lastFieldId.toLong),
      "partitionCols" -> JArray(st.partitionCols.toList.map(JString(_))),
      // Hidden-partitioning transforms, parallel to partitionCols by wire
      // name ("identity", "days", "bucket[8]", …). Absent in legacy
      // metadata = all identity.
      "partitionTransforms" -> JArray(
        st.transformsOrIdentity.toList.map(t => JString(t.name))),
      "currentSpecId" -> JLong(st.currentSpecId.toLong),
      // Retired partition specs by id: [(source col, transform wire name,
      // pv type json)] — self-contained so later schema changes to a
      // retired spec's source column never orphan old files' values.
      "specHistory" -> JObject(st.specHistory.toList.map { case (id, fs) =>
        id.toString -> (JArray(fs.toList.map { case (c, t, dt) =>
          JArray(List(JString(c), JString(t), JString(dt))) }): JValue)
      }),
      // Type-widening history: field id -> ascending [(throughSeq,
      // oldType.json)] — how readers resolve a file's WRITE-TIME types.
      // Absent in legacy metadata = never widened.
      "typeHistory" -> JObject(st.typeHistory.toList.map { case (id, hist) =>
        id.toString -> (JArray(hist.toList.map { case (v, dt) =>
          JArray(List(JLong(v), JString(dt.json))) }): JValue)
      }),
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
    // Pre-field-id metadata migrates on load: ids assigned positionally
    // (sound — pre-id history was append-only), lastFieldId derived.
    val (schema, assignedLast) = FieldIds.assign(
      DataType.fromJson(jStr(field(j, "schema"))).asInstanceOf[StructType])
    val lastFieldId = fieldOpt(j, "lastFieldId")
      .map(jLong(_).toInt).getOrElse(assignedLast)
    val partitionCols = jArr(field(j, "partitionCols")).map(jStr)
    val transforms = fieldOpt(j, "partitionTransforms")
      .map(ts => jArr(ts).map(t => PTransform.fromName(jStr(t))))
      .getOrElse(partitionCols.map(_ => PIdentity))
    // Manifests carry TRANSFORMED partition values — decode in their types.
    val pvTypes = partitionCols.zip(transforms)
      .map { case (c, t) => t.resultType(schema(c).dataType) }
    val currentSpecId = fieldOpt(j, "currentSpecId").map(jInt).getOrElse(0)
    val specHistory: Map[Int, Seq[(String, String, String)]] =
      fieldOpt(j, "specHistory").map(sh =>
        jObj(sh).map { case (id, fs) =>
          id.toInt -> jArr(fs).map { f =>
            val es = jArr(f); (jStr(es.head), jStr(es(1)), jStr(es(2)))
          }
        }.toMap).getOrElse(Map.empty)
    val specTypes: Map[Int, Seq[DataType]] =
      specHistory.map { case (id, fs) =>
        id -> fs.map(f => DataType.fromJson(f._3))
      } + (currentSpecId -> pvTypes)
    val ctx = colCtxOf(schema)
    val st = TableState(
      schema = schema,
      partitionCols = partitionCols,
      dataDir = dataDir, // derived from location, never trusted from content
      properties = jObj(field(j, "properties")).map {
        case (k, v) => k -> jStr(v) }.toMap,
      snapshots = jArr(field(j, "snapshots"))
        .map(snapFromJson(dataDir, specTypes, ctx, _)).toVector,
      tags = jObj(field(j, "tags")).map { case (n, v) => n -> jLong(v) }.toMap,
      epochs = scala.collection.immutable.ListMap(
        jArr(field(j, "epochs")).map { e =>
          val es = jArr(e); jStr(es.head) -> jLong(es(1))
        }: _*),
      branches = jObj(field(j, "branches")).map { case (n, b) =>
        n -> Branch(jLong(field(b, "base")),
          jArr(field(b, "snapshots"))
            .map(snapFromJson(dataDir, specTypes, ctx, _)).toVector)
      }.toMap,
      metaVersion = metaVersion,
      lastFieldId = lastFieldId,
      tableId = fieldOpt(j, "tableId").map(jStr).getOrElse(""),
      partitionTransforms = transforms,
      currentSpecId = currentSpecId,
      specHistory = specHistory,
      typeHistory = fieldOpt(j, "typeHistory").map(th =>
        jObj(th).map { case (id, hist) =>
          id.toInt -> jArr(hist).map { e =>
            val es = jArr(e)
            (jLong(es.head), DataType.fromJson(jStr(es(1))))
          }.toVector
        }.toMap).getOrElse(Map.empty))
    assignLegacySeqs(st)
  }

  /** Legacy descriptors (pre-seq manifests) get their data sequence number
    * reconstructed as the FIRST retained snapshot version referencing the
    * path. That can overestimate a file's true age when its original
    * commit was expired — safe here because equality deletes postdate
    * sequence tracking, so every delete's seq exceeds any reconstructed
    * file seq.
    *
    * LAZY snapshots are exempt by construction: their summaries certify
    * every entry seq-stamped (`seqs` flag), so only EAGER (unflagged)
    * snapshots can hold legacy entries — the scan below never forces a
    * lazy load. A legacy path's first retained reference is itself in an
    * unflagged snapshot (carrying a seq-0 entry unflags the manifest), so
    * reconstructing over the eager subset is complete for legacy paths. */
  private def assignLegacySeqs(st: TableState): TableState = {
    def anyLegacy(sns: Vector[Snapshot]) =
      sns.exists(sn => !sn.seqsKnown && sn.files.exists(_.seq == 0L))
    if (!anyLegacy(st.snapshots) && !st.branches.values.exists(b => anyLegacy(b.snapshots)))
      return st
    val first = scala.collection.mutable.HashMap.empty[String, Long]
    (st.snapshots.sortBy(_.version) ++
      st.branches.values.toSeq.flatMap(_.snapshots).sortBy(_.version))
      .filterNot(_.seqsKnown)
      .foreach(sn => sn.files.foreach(f =>
        if (!first.contains(f.path)) first(f.path) = sn.version))
    def fix(sns: Vector[Snapshot]) = sns.map(sn =>
      if (sn.seqsKnown) sn
      else sn.copy(files =
        sn.files.map(f => if (f.seq == 0L) f.copy(seq = first(f.path)) else f)))
    st.copy(
      snapshots = fix(st.snapshots),
      branches = st.branches.map { case (n, b) =>
        n -> b.copy(snapshots = fix(b.snapshots)) })
  }

  // -- commit / create / load ---------------------------------------------------

  /** Persist `before → after` as metadata commit `before.metaVersion + 1`.
    * Returns the persisted state (manifest paths assigned, metaVersion
    * bumped), or None on a CAS conflict — another writer claimed the same
    * commit number; the caller reloads and retries its transition. */
  def tryCommit(before: TableState, after: TableState): Option[TableState] = {
    val dataDir = after.dataDir
    val specTypes = after.specTypesMap
    val tableCtx = colCtxOf(after.schema)
    val chunkEntries = chunkEntriesOf(after.properties)
    val written = scala.collection.mutable.ArrayBuffer.empty[Path]
    def withManifests(sns: Vector[Snapshot]): Vector[Snapshot] = sns.map { sn =>
      if (sn.manifestPath != null) sn
      else {
        // Serialize under the SNAPSHOT's own schema: stats ids/types must
        // match what that version's readers resolve against.
        val ctx = if (sn.schema == null) tableCtx else colCtxOf(sn.schema)
        val (name, ps) = writeManifest(dataDir, sn, specTypes, ctx, chunkEntries)
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
    val raw = readFully(new Path(md, s"v$v.json"))
    // A VIEW's table-namespace claim marker (see ViewLog.TableClaimMarker):
    // the identifier is a view, not a table. Only v1 can be the marker —
    // a real table's later commits claim v2+.
    if (v == 1L && ViewLog.isViewClaimContent(raw)) return None
    val st = parseState(dataDir, v, raw)
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
      .filter { s =>
        // v1.json, not just metadata/: a VIEW's directory holds a metadata
        // dir too (view-v<N>.json) and must not list as a table — and a
        // post-round-15 view ALSO claims v1.json as its table-namespace
        // marker, so the view-definition probe decides. A marker WITHOUT
        // definitions (a creation crashed between its two writes) is
        // caught by the v2-or-content check: real tables either committed
        // past v1 (no read) or their v1 parses as table state.
        val m = new Path(s.getPath, "metadata")
        // ONE status probe replaces the bare exists: the claim marker is
        // a fixed-length constant, so file SIZE decides table-vs-marker
        // without reading content for every single-commit table (the
        // prefix read runs only on an exact size collision).
        def v1Status: Option[org.apache.hadoop.fs.FileStatus] =
          try Some(fs.getFileStatus(new Path(m, "v1.json")))
          catch { case _: java.io.FileNotFoundException => None }
        def v1IsTableState: Boolean = v1Status.exists { st =>
          st.getLen != ViewLog.TableClaimMarker.length.toLong ||
            (try !ViewLog.isViewClaimContent(readFully(st.getPath))
            catch { case _: Exception => false })
        }
        s.isDirectory && !fs.exists(new Path(m, "view-v1.json")) &&
          v1IsTableState
      }
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

  private[sources] def readFully(p: Path): String = readFullyWith(p, null)

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
  private[sources] def writeExclusive(target: Path, bytes: Array[Byte]): Boolean = {
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
