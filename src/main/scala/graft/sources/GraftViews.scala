package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** SQL VIEWS on the snapshot catalog — the Iceberg view spec's shape
  * carried on the same durable metadata-log protocol as tables: each view
  * is a directory under its namespace holding `metadata/view-v<N>.json`,
  * one immutable file per DEFINITION VERSION, claimed with the same
  * atomic create-exclusive as table commits. The highest version IS the
  * current definition; `CREATE OR REPLACE VIEW` appends the next version
  * (never rewrites), so a view's definition history is time-travelable
  * exactly like a table's schema history: `SELECT … FROM v VERSION AS OF
  * 2` reads the definition that was current at version 2. Views survive
  * the JVM and are shared across sessions on one warehouse, and CREATE is
  * exclusive across sessions for free (the v1 claim).
  *
  * A definition stores the ORIGINAL SQL plus the name-resolution context
  * it was written in (current catalog + namespace) and the ANALYZED
  * schema/column names at creation — reads re-parse and re-analyze, so a
  * dropped underlying column fails LOUDLY at query time rather than
  * serving stale data (Iceberg views behave the same; the stored schema
  * is documentation + the `DESCRIBE` surface, not a cache).
  *
  * Scale: a view is O(1) metadata — one small JSON per version; reading
  * one never touches table manifests until the expanded query plans.
  */
private[graft] object ViewLog {

  /** One shared Hadoop Configuration for every view-log filesystem probe:
    * `exists` runs for EVERY unresolved relation on every analyzer
    * iteration ([[graft.plans.GraftViewReads]]), and constructing a fresh
    * Configuration per probe re-parses the hadoop XML resources each time
    * — measurable per-relation analysis latency on large queries. The
    * object is only read after construction, which Hadoop documents as
    * thread-safe. */
  private val hconf = new org.apache.hadoop.conf.Configuration()

  final case class Def(
      sql: String,
      currentCatalog: String,
      currentNamespace: Seq[String],
      schema: StructType,
      queryColumnNames: Seq[String],
      columnAliases: Seq[String],
      columnComments: Seq[String],
      properties: Map[String, String],
      createdAtMicros: Long,
      version: Long)

  private def dirOf(warehouse: String, parts: Seq[String]): Path =
    new Path(MetadataLog.tableDir(warehouse, parts), "metadata")

  private def fileOf(warehouse: String, parts: Seq[String], v: Long): Path =
    new Path(dirOf(warehouse, parts), s"view-v$v.json")

  private def render(d: Def): String = {
    val j: JValue = JObject(
      "kind" -> JString("view"),
      "sql" -> JString(d.sql),
      "currentCatalog" -> JString(d.currentCatalog),
      "currentNamespace" -> JArray(d.currentNamespace.map(JString(_)).toList),
      "schema" -> JsonMethods.parse(d.schema.json),
      "queryColumnNames" -> JArray(d.queryColumnNames.map(JString(_)).toList),
      "columnAliases" -> JArray(d.columnAliases.map(JString(_)).toList),
      "columnComments" -> JArray(d.columnComments.map(c =>
        if (c == null) JNull else JString(c): JValue).toList),
      "properties" -> JObject(d.properties.toList.map { case (k, v) =>
        k -> (JString(v): JValue) }),
      "createdAtMicros" -> JLong(d.createdAtMicros))
    JsonMethods.pretty(JsonMethods.render(j))
  }

  private def parse(s: String, version: Long): Def = {
    val j = JsonMethods.parse(s)
    def str(n: String): String = (j \ n) match {
      case JString(v) => v
      case other => sys.error(s"view metadata field '$n' malformed: $other")
    }
    def arr(n: String): Seq[String] = (j \ n) match {
      case JArray(vs) => vs.map { case JString(v) => v
        case other => sys.error(s"view metadata '$n' entry malformed: $other") }
      case _ => Nil
    }
    Def(
      sql = str("sql"),
      currentCatalog = str("currentCatalog"),
      currentNamespace = arr("currentNamespace"),
      schema = DataType.fromJson(
        JsonMethods.compact(JsonMethods.render(j \ "schema")))
        .asInstanceOf[StructType],
      queryColumnNames = arr("queryColumnNames"),
      columnAliases = arr("columnAliases"),
      columnComments = (j \ "columnComments") match {
        case JArray(vs) => vs.map {
          case JString(v) => v
          case _ => null
        }
        case _ => Nil
      },
      properties = (j \ "properties") match {
        case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty
      },
      createdAtMicros = (j \ "createdAtMicros") match {
        case JLong(v) => v
        case JInt(v) => v.toLong
        case _ => 0L
      },
      version = version)
  }

  /** Every persisted version number of the view at `parts` (ascending);
    * empty = no view. */
  def versions(warehouse: String, parts: Seq[String]): Seq[Long] = {
    val md = dirOf(warehouse, parts)
    val fs = md.getFileSystem(hconf)
    if (!fs.exists(md)) return Nil
    fs.listStatus(md).toSeq.flatMap { s =>
      val n = s.getPath.getName
      if (n.startsWith("view-v") && n.endsWith(".json"))
        n.stripPrefix("view-v").stripSuffix(".json").toLongOption
      else None
    }.sorted
  }

  /** O(1): a live view ALWAYS has `view-v1.json` (creation claims v1 and
    * drop removes every version), so existence is one file probe — this
    * runs for every graft-qualified unresolved relation during analysis,
    * where listing a busy table's whole metadata dir (thousands of
    * vN.json + manifests) per reference would be a planning regression. */
  def exists(warehouse: String, parts: Seq[String]): Boolean = {
    val f = fileOf(warehouse, parts, 1L)
    f.getFileSystem(hconf).exists(f)
  }

  /** Load the CURRENT definition, or a pinned `version`. */
  def load(warehouse: String, parts: Seq[String],
      version: Option[Long] = None): Option[Def] = {
    val vs = versions(warehouse, parts)
    if (vs.isEmpty) return None
    val v = version match {
      case Some(pin) =>
        if (!vs.contains(pin)) throw new IllegalArgumentException(
          s"view ${parts.mkString(".")} has no version $pin " +
            s"(versions: ${vs.mkString(", ")})")
        pin
      case None => vs.max
    }
    Some(parse(MetadataLog.readFully(fileOf(warehouse, parts, v)), v))
  }

  /** The definition current AT `micros` (TIMESTAMP AS OF): the newest
    * version created at-or-before it. */
  def loadAsOf(warehouse: String, parts: Seq[String], micros: Long): Option[Def] = {
    val vs = versions(warehouse, parts)
    val defs = vs.map(v =>
      parse(MetadataLog.readFully(fileOf(warehouse, parts, v)), v))
    val live = defs.filter(_.createdAtMicros <= micros)
    if (live.isEmpty && defs.nonEmpty)
      throw new IllegalArgumentException(
        s"view ${parts.mkString(".")} did not exist at timestamp $micros µs")
    live.lastOption
  }

  /** The TABLE-claim marker a fresh view writes at `metadata/v1.json` —
    * the SAME file CREATE TABLE's `createInitial` claims — so a
    * concurrent CREATE TABLE and CREATE VIEW racing one identifier
    * contend on ONE create-exclusive claim instead of two disjoint files
    * (the documented round-14 gap). Compact and prefix-stable:
    * [[MetadataLog.load]] recognizes it by prefix and reports "not a
    * table". Views created before the marker existed (no v1.json) keep
    * working; they just lack the cross-kind race guard. */
  private[sources] val TableClaimMarker =
    """{"kind":"view","note":"claim marker: this identifier is a VIEW (see view-v<N>.json)"}"""

  /** Claim the NEXT definition version. `expectNone` makes plain CREATE
    * exclusive; REPLACE appends after the current max. Returns false when
    * another writer claimed the same version first. A FIRST version also
    * claims the table-namespace marker (see [[TableClaimMarker]]). */
  def create(warehouse: String, parts: Seq[String], d: Def,
      replace: Boolean): Boolean = {
    val vs = versions(warehouse, parts)
    if (vs.nonEmpty && !replace) return false
    if (vs.isEmpty) {
      val marker = new Path(dirOf(warehouse, parts), "v1.json")
      val fs = marker.getFileSystem(hconf)
      fs.mkdirs(marker.getParent)
      if (!MetadataLog.writeExclusive(marker, TableClaimMarker.getBytes(UTF_8))) {
        // Taken — by a table (v1.json is real state), by a live view, or
        // by a crashed view creation's ORPHAN (marker without any
        // view-v<N>.json). The orphan would wedge the name for BOTH
        // kinds forever; it is reclaimable exactly because no definition
        // ever landed — nothing can be reading it. AGE-FLOORED: a young
        // marker is indistinguishable from a concurrent creation BETWEEN
        // its two writes, and stealing that claim would let the loser's
        // cleanup delete the winner's marker — only markers old enough
        // that any in-flight creation has long finished reclaim here
        // (the remove_orphan_files age-floor argument).
        if (!isOrphanedMarker(fs, marker, warehouse, parts,
          minAgeMs = OrphanReclaimAgeMs)) return false
        fs.delete(marker, false)
        if (!MetadataLog.writeExclusive(marker,
            TableClaimMarker.getBytes(UTF_8))) return false
      }
      val ok =
        try MetadataLog.writeExclusive(fileOf(warehouse, parts, 1L),
          render(d.copy(version = 1L)).getBytes(UTF_8))
        catch {
          case e: Throwable => fs.delete(marker, false); throw e
        }
      // A definition that lost its own claim releases the marker — never
      // leave the two-file pair half-claimed on a non-crash failure.
      if (!ok) fs.delete(marker, false)
      return ok
    }
    val next = vs.lastOption.getOrElse(0L) + 1L
    MetadataLog.writeExclusive(fileOf(warehouse, parts, next),
      render(d.copy(version = next)).getBytes(UTF_8))
  }

  /** Prefix every claim-marker check keys on — ONE definition (three
    * call sites would otherwise hardcode the magic string and drift). */
  private[sources] val ViewClaimPrefix = """{"kind":"view""""

  private[sources] def isViewClaimContent(s: String): Boolean =
    s.startsWith(ViewClaimPrefix)

  /** Auto-reclaim floor for orphaned markers: in-flight creations finish
    * their second write in milliseconds, so minutes of age proves a
    * crash. DROP VIEW reclaims without the floor (an explicit operator
    * action). */
  private val OrphanReclaimAgeMs = 10L * 60 * 1000

  /** Is `marker` a view claim with NO definition versions — the residue
    * of a creation that crashed between its two writes? `minAgeMs` > 0
    * additionally demands the marker be old enough that no creation can
    * still be in flight. */
  private def isOrphanedMarker(fs: org.apache.hadoop.fs.FileSystem,
      marker: Path, warehouse: String, parts: Seq[String],
      minAgeMs: Long = 0L): Boolean =
    (try {
      val st = fs.getFileStatus(marker)
      (minAgeMs == 0L ||
        System.currentTimeMillis() - st.getModificationTime >= minAgeMs) &&
        isViewClaimContent(MetadataLog.readFully(marker))
    } catch { case _: Exception => false }) &&
      versions(warehouse, parts).isEmpty

  /** Drop every version (the whole definition history). A crashed
    * creation's ORPHANED claim marker (no definitions) also drops here —
    * the SQL-level recovery for the wedged-name state. */
  def drop(warehouse: String, parts: Seq[String]): Boolean = {
    val vs = versions(warehouse, parts)
    val md = dirOf(warehouse, parts)
    val fs = md.getFileSystem(hconf)
    if (vs.isEmpty) {
      val marker = new Path(md, "v1.json")
      if (!fs.exists(marker) ||
        !isOrphanedMarker(fs, marker, warehouse, parts)) return false
      fs.delete(marker, false)
      return true
    }
    vs.foreach(v => fs.delete(fileOf(warehouse, parts, v), false))
    // Release the table-namespace claim LAST (readers between the two
    // deletes see marker-without-definitions, which load() tolerates).
    // Content-checked: a TABLE's v1.json must never be deleted here —
    // though a dir can only hold one kind, legacy layouts predate the
    // marker and defensiveness is free.
    val marker = new Path(md, "v1.json")
    if (fs.exists(marker) &&
        (try isViewClaimContent(MetadataLog.readFully(marker))
          catch { case _: Exception => false }))
      fs.delete(marker, false)
    // Remove the view dir if nothing else (no table metadata) lives there.
    val tdir = new Path(MetadataLog.tableDir(warehouse, parts))
    if (fs.exists(md) && fs.listStatus(md).isEmpty) fs.delete(md, false)
    if (fs.exists(tdir) && fs.listStatus(tdir).isEmpty) fs.delete(tdir, false)
    true
  }

  /** View names on disk under `catalog +: namespace`. */
  def list(warehouse: String, parts: Seq[String]): Seq[String] = {
    val ns = new Path(MetadataLog.tableDir(warehouse, parts))
    val fs = ns.getFileSystem(hconf)
    if (!fs.exists(ns)) return Nil
    fs.listStatus(ns).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => exists(warehouse, parts :+ n))
  }
}

/** V2 [[View]] face over one loaded definition. */
private[graft] final class GraftView(ident: Identifier, d: ViewLog.Def)
    extends View {
  override def name(): String = ident.toString
  override def query(): String = d.sql
  override def currentCatalog(): String = d.currentCatalog
  override def currentNamespace(): Array[String] = d.currentNamespace.toArray
  override def schema(): StructType = d.schema
  override def queryColumnNames(): Array[String] = d.queryColumnNames.toArray
  override def columnAliases(): Array[String] = d.columnAliases.toArray
  override def columnComments(): Array[String] = d.columnComments.toArray
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    d.properties.foreach { case (k, v) => m.put(k, v) }
    m
  }
  def definition: ViewLog.Def = d
}

private[graft] object GraftView {
  def info(ident: Identifier, info: ViewInfo, createdAtMicros: Long): ViewLog.Def =
    ViewLog.Def(
      sql = info.sql(),
      currentCatalog = info.currentCatalog(),
      currentNamespace = info.currentNamespace().toSeq,
      schema = info.schema(),
      queryColumnNames = info.queryColumnNames().toSeq,
      columnAliases = info.columnAliases().toSeq,
      columnComments = info.columnComments().toSeq,
      properties = {
        import scala.jdk.CollectionConverters._
        info.properties().asScala.toMap
      },
      createdAtMicros = createdAtMicros,
      version = 0L)
}
