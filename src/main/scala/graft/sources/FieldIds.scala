package graft.sources

import org.apache.spark.sql.types._

/** Per-column FIELD IDs — Iceberg's schema-evolution mechanism, reduced to
  * its load-bearing core: every column carries an immutable integer id in
  * its StructField metadata, so a column's NAME is just a label over the
  * id. RENAME changes the label; DROP retires the id (ids are never
  * reused); and every data file's manifest entry records the (id, name)
  * column list it was written under, so readers resolve requested columns
  * against ANY file by id — the mapping that makes rename/drop safe with
  * full history intact (time travel reads each version under its own
  * names; the same physical column serves both).
  *
  * The reference provisions Iceberg format-v2 tables
  * (`create_iceberg_tables.py:121-128`), whose schema evolution is exactly
  * this field-id indirection.
  */
private[graft] object FieldIds {
  /** StructField metadata key holding the column's field id. */
  val MetaKey = "graft.field.id"

  def idOf(f: StructField): Option[Int] =
    if (f.metadata.contains(MetaKey)) Some(f.metadata.getLong(MetaKey).toInt)
    else None

  def withId(f: StructField, id: Int): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(MetaKey, id.toLong).build())

  def hasIds(schema: StructType): Boolean = schema.fields.forall(idOf(_).isDefined)

  /** Remove any field-id metadata. CREATE TABLE must start from a clean
    * slate: a CTAS query schema INHERITS upstream tables' id metadata
    * through Spark's column-metadata propagation, and those foreign ids
    * would collide with (or shadow) the new table's own assignment. */
  def strip(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      if (!f.metadata.contains(MetaKey)) f
      else {
        val mb = new MetadataBuilder().withMetadata(f.metadata)
        mb.remove(MetaKey)
        f.copy(metadata = mb.build())
      }
    })

  /** Assign ids POSITIONALLY (1..n) to any field lacking one; returns the
    * schema and the highest id in it. Positional assignment is the legacy
    * MIGRATION rule and is sound exactly because pre-id history was
    * append-only (rename/drop were rejected), so a column's position is
    * stable across every pre-id snapshot schema. */
  def assign(schema: StructType): (StructType, Int) = {
    var last = 0
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      idOf(f) match {
        case Some(id) => last = math.max(last, id); f
        case None => last = math.max(last, i + 1); withId(f, i + 1)
      }
    }
    (StructType(fields), last)
  }

  /** Lowercased column name → field id for the given schema (predicate and
    * projection matching is case-insensitive like the rest of the engine). */
  def idsByName(schema: StructType): Map[String, Int] =
    schema.fields.iterator.flatMap(f =>
      idOf(f).map(id => f.name.toLowerCase -> id)).toMap

  /** The (id, name) column list a file written under `schema` records in
    * its manifest entry — write order, which IS the file's physical column
    * order for the grf format and the name source for parquet. */
  def writeColsOf(schema: StructType): Vector[(Int, String)] =
    schema.fields.iterator.map(f =>
      (idOf(f).getOrElse(sys.error(
        s"column ${f.name} has no field id — schema not id-assigned")),
        f.name)).toVector

  /** Resolve the id of `name` (case-insensitive) in `schema`, or fail
    * loudly naming the schema. */
  def requireId(schema: StructType, name: String): Int =
    schema.fields.collectFirst {
      case f if f.name.equalsIgnoreCase(name) && idOf(f).isDefined => idOf(f).get
    }.getOrElse(sys.error(
      s"column $name has no field id in ${schema.fieldNames.mkString("(", ", ", ")")}"))

  /** The (id, name) list a WRITE with `writeSchema` records per file: the
    * write schema's names (Spark's resolved query output, which may lack
    * the metadata), ids resolved against the table schema. */
  def writeColsFor(tableSchema: StructType, writeSchema: StructType): Vector[(Int, String)] =
    writeSchema.fields.iterator
      .map(f => (requireId(tableSchema, f.name), f.name)).toVector
}
