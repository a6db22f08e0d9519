package graft.catalog

/** Which catalog/table-format dialect the generated DDL targets.
  *
  * The reference hard-wires one: an AWS Glue Iceberg catalog
  * (`create_iceberg_tables.py:121-128`). This environment has no Iceberg
  * runtime jar and no network (SURVEY.md §7), so the dialect is a seam:
  * semantics (idempotent create, identity partitioning, namespaces) are
  * format-agnostic; only the `USING` clause, table properties, and session
  * config keys differ. The Iceberg profile is exercised as generated-text
  * goldens; the Builtin profile is exercised behaviorally.
  */
sealed trait CatalogProfile {
  /** Catalog name to prefix identifiers with (empty = session default). */
  def catalogName: Option[String]
  def usingClause: String
  def tblProperties(spec: TableSpec): Seq[(String, String)]
  /** SparkSession config this profile needs (builder `.config` pairs). */
  def sessionConfig: Seq[(String, String)]

  def qualified(spec: TableSpec): String =
    (catalogName.toSeq :+ spec.database :+ spec.table).mkString(".")
  def qualifiedDb(db: String): String =
    (catalogName.toSeq :+ db).mkString(".")
}

object CatalogProfile {

  /** Spark's builtin (in-memory or Derby-backed) catalog; parquet storage.
    * Identity partition transforms are the only kind the reference uses
    * (`customers.yml:5-7`), so `USING parquet PARTITIONED BY` preserves
    * semantics including partition pruning.
    */
  final case class Builtin(warehouseDir: Option[String] = None) extends CatalogProfile {
    val catalogName: Option[String] = None
    val usingClause: String = "parquet"
    def tblProperties(spec: TableSpec): Seq[(String, String)] = Seq.empty
    def sessionConfig: Seq[(String, String)] =
      warehouseDir.map("spark.sql.warehouse.dir" -> _).toSeq
  }

  /** Emits exactly the reference's Iceberg dialect: `USING iceberg` +
    * `TBLPROPERTIES ('format-version'='…')` (`create_iceberg_tables.py:33-36,51-54`)
    * and the catalog config keys (`create_iceberg_tables.py:121-128`). The
    * DynamoDB lock manager (`:125-126`) is deprecated upstream and deliberately
    * not reproduced.
    */
  final case class Iceberg(
      catalog: String = "glue_catalog",
      warehouse: String = "/tmp/warehouse",
      sparkCatalogImpl: String = "org.apache.iceberg.spark.SparkCatalog",
      catalogImpl: String = "org.apache.iceberg.aws.glue.GlueCatalog",
      ioImpl: String = "org.apache.iceberg.aws.s3.S3FileIO",
      extraProperties: Seq[(String, String)] = Seq.empty)
      extends CatalogProfile {
    val catalogName: Option[String] = Some(catalog)
    val usingClause: String = "iceberg"
    def tblProperties(spec: TableSpec): Seq[(String, String)] =
      Seq("format-version" -> spec.formatVersion)
    def sessionConfig: Seq[(String, String)] = Seq(
      s"spark.sql.catalog.$catalog" -> sparkCatalogImpl,
      s"spark.sql.catalog.$catalog.catalog-impl" -> catalogImpl,
      s"spark.sql.catalog.$catalog.io-impl" -> ioImpl,
      s"spark.sql.catalog.$catalog.warehouse" -> warehouse,
      "spark.sql.extensions" ->
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
      "spark.sql.defaultCatalog" -> catalog) ++
      extraProperties.map { case (k, v) => s"spark.sql.catalog.$catalog.$k" -> v }
  }
}

/** Renders a [[TableSpec]] into Spark SQL DDL — the engine's equivalent of the
  * reference's `generate_sql` (`create_iceberg_tables.py:24-57`), implementing
  * the intended config-driven path (`:25-37`) rather than the dead-code
  * hardcoded override (`:38-55`).
  */
object DdlGenerator {

  /** Backtick-quote an identifier, escaping embedded backticks — YAML specs
    * may contain reserved words or special characters.
    */
  def quoteIdent(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** Escape a string literal for splicing into DDL (LOCATION path,
    * TBLPROPERTIES). Quotes are escaped by doubling (`''`), which Spark's
    * parser accepts in both default and legacy/Hive-compat
    * (`spark.sql.parser.escapedStringLiterals=true`) literal modes — a
    * backslash-quote escape only parses in the former. Backslashes are
    * doubled for the default mode (the one the engine's sessions pin);
    * legacy mode treats them literally, where paths with backslashes would
    * need no escaping at all.
    */
  def quoteLiteral(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  private def quoteQualified(parts: Seq[String]): String =
    parts.map(quoteIdent).mkString(".")

  def createDatabase(db: String, profile: CatalogProfile): String =
    s"CREATE DATABASE IF NOT EXISTS ${quoteQualified(profile.catalogName.toSeq :+ db)}"

  /** Idempotent CREATE TABLE — `IF NOT EXISTS` is the reference's whole
    * "automation" semantic (re-running a deploy converges, never errors;
    * `create_iceberg_tables.py:30,39`).
    */
  def createTable(spec: TableSpec, profile: CatalogProfile): String = {
    // Validate the declared types eagerly (fail at generation, not execution).
    spec.schema

    val cols = spec.columns
      .map(c => s"  ${quoteIdent(c.name)} ${c.dataType.toUpperCase}")
      .mkString(",\n")
    val partition =
      if (spec.partitionedBy.isEmpty) ""
      else s"\nPARTITIONED BY (${spec.partitionedBy.map(quoteIdent).mkString(", ")})"
    val cluster =
      if (spec.clusterBy.isEmpty) ""
      else s"\nCLUSTER BY (${spec.clusterBy.map(quoteIdent).mkString(", ")})"
    val location = spec.location.map(l => s"\nLOCATION ${quoteLiteral(l)}").getOrElse("")
    val props = profile.tblProperties(spec) match {
      case Nil => ""
      case ps =>
        // Keys/values come from the same untrusted YAML as identifiers and
        // LOCATION (e.g. format_version) — render through quoteLiteral.
        ps.map { case (k, v) => s"${quoteLiteral(k)}=${quoteLiteral(v)}" }
          .mkString("\nTBLPROPERTIES (", ", ", ")")
    }
    val qualifiedName =
      quoteQualified(profile.catalogName.toSeq :+ spec.database :+ spec.table)
    s"""CREATE TABLE IF NOT EXISTS $qualifiedName (
$cols
)
USING ${profile.usingClause}$partition$cluster$location$props"""
  }
}
