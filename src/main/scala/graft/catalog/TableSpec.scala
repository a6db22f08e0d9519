package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.yaml.snakeyaml.{LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor

/** One column of a declaratively-specified table.
  *
  * `dataType` is any Spark SQL DDL type string (`string`, `bigint`,
  * `decimal(12,2)`, `array<float>`, …) — the reference splices the YAML `type`
  * verbatim into DDL (`create_iceberg_tables.py:25`), so the implied type system
  * is "whatever Spark SQL accepts"; we validate eagerly via [[toStructField]].
  */
final case class ColumnSpec(name: String, dataType: String) {
  def toStructField: StructField =
    StructField(name, DataType.fromDDL(dataType), nullable = true)
}

/** Declarative table specification — the reference's YAML data model
  * (`/root/reference/iceberg_tables/customers.yml:1-28`, consumed at
  * `create_iceberg_tables.py:25-36`).
  *
  * Five keys: database, table, optional explicit storage location,
  * Iceberg format-version (default "2", `create_iceberg_tables.py:36`), and
  * identity-transform partition columns + a fixed declared schema.
  */
final case class TableSpec(
    database: String,
    table: String,
    location: Option[String],
    formatVersion: String,
    partitionedBy: Seq[String],
    columns: Seq[ColumnSpec],
    clusterBy: Seq[String] = Seq.empty) {

  require(database.nonEmpty, "database must be non-empty")
  require(table.nonEmpty, "table must be non-empty")
  require(columns.nonEmpty, s"$database.$table: at least one column required")
  // Case-insensitive: Spark resolves column names case-insensitively by
  // default (spark.sql.caseSensitive=false), so 'a' and 'A' would pass a
  // case-sensitive check here and then fail at CREATE TABLE execution.
  // Locale.ROOT: default-locale lowercasing breaks on e.g. tr_TR ("ID" → "ıd").
  private val dupCols =
    columns.groupBy(_.name.toLowerCase(java.util.Locale.ROOT))
      .collect { case (_, cs) if cs.size > 1 => cs.head.name }
  require(
    dupCols.isEmpty,
    s"$database.$table: duplicate column name(s): ${dupCols.mkString(", ")}")
  private val colNames = columns.map(_.name).toSet
  partitionedBy.foreach { p =>
    require(colNames.contains(p), s"partition column '$p' not in declared columns")
  }
  clusterBy.foreach { c =>
    require(colNames.contains(c), s"cluster column '$c' not in declared columns")
  }
  // Spark's CREATE TABLE rejects combining them; fail at spec load instead.
  require(partitionedBy.isEmpty || clusterBy.isEmpty,
    s"$database.$table: PARTITIONED BY and CLUSTER BY are mutually exclusive")

  def fullName: String = s"$database.$table"

  /** Declared schema as a Spark StructType (validates every column's DDL type). */
  def schema: StructType = StructType(columns.map(_.toStructField))
}

object TableSpec {

  /** Parse a YAML table spec (the reference's `customers.yml` shape).
    *
    * Implements the *intended* semantics of `generate_sql`
    * (`create_iceberg_tables.py:25-37`): the reference's own function builds
    * config-driven DDL and then dead-code-overwrites it with a hardcoded string
    * (`:38-55`); we keep the config-driven contract and drop the bug.
    */
  def fromYaml(text: String): TableSpec = {
    val yaml = new Yaml(new SafeConstructor(new LoaderOptions()))
    val root = yaml.load[java.util.Map[String, Object]](text)
    require(root != null, "empty YAML document")
    val m = root.asScala

    def str(k: String): Option[String] = m.get(k).map(_.toString)

    val cols = m.get("columns") match {
      case Some(l: java.util.List[_]) =>
        l.asScala.toSeq.map {
          case cm: java.util.Map[_, _] =>
            val c = cm.asScala.map { case (k, v) => k.toString -> v.toString }
            ColumnSpec(
              c.getOrElse("name", sys.error("column missing 'name'")),
              c.getOrElse("type", sys.error("column missing 'type'")))
          case other => sys.error(s"bad column entry: $other")
        }
      case _ => sys.error("spec missing 'columns' list")
    }
    def strList(k: String): Seq[String] = m.get(k) match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
      case _                          => Seq.empty
    }
    TableSpec(
      database = str("database").getOrElse(sys.error("spec missing 'database'")),
      table = str("table").getOrElse(sys.error("spec missing 'table'")),
      location = str("location"),
      formatVersion = str("format_version").getOrElse("2"),
      partitionedBy = strList("partitioned_by"),
      columns = cols,
      // Spec extension beyond the reference's five keys: Spark 4 clustered
      // tables (`CLUSTER BY`) — the modern layout declaration (Iceberg and
      // Delta both map it to their clustering metadata).
      clusterBy = strList("cluster_by"))
  }

  def fromYamlFile(path: String): TableSpec =
    fromYaml(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
