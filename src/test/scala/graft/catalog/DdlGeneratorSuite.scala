package graft.catalog

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class DdlGeneratorSuite extends AnyFunSuite {

  /** Manual property driver (no scalatest-scalacheck bridge in the offline cache). */
  private def forAllSamples[A](gen: Gen[A], n: Int = 100)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  val spec: TableSpec = TableSpec(
    database = "bronze",
    table = "customers",
    location = Some("s3://bucket/warehouse/bronze/customers"),
    formatVersion = "2",
    partitionedBy = Seq("CountryRegion", "PostalCode"),
    columns = Seq(
      ColumnSpec("FirstName", "string"),
      ColumnSpec("CountryRegion", "string"),
      ColumnSpec("PostalCode", "string")))

  test("Iceberg dialect golden — the reference's intended config-driven DDL " +
    "(create_iceberg_tables.py:25-37, not the :38-55 dead-code override)") {
    val ddl = DdlGenerator.createTable(spec, CatalogProfile.Iceberg())
    assert(ddl ==
      """CREATE TABLE IF NOT EXISTS `glue_catalog`.`bronze`.`customers` (
        |  `FirstName` STRING,
        |  `CountryRegion` STRING,
        |  `PostalCode` STRING
        |)
        |USING iceberg
        |PARTITIONED BY (`CountryRegion`, `PostalCode`)
        |LOCATION 's3://bucket/warehouse/bronze/customers'
        |TBLPROPERTIES ('format-version'='2')""".stripMargin)
  }

  test("Builtin dialect: parquet, no catalog prefix, no TBLPROPERTIES") {
    val ddl = DdlGenerator.createTable(
      spec.copy(location = None), CatalogProfile.Builtin())
    assert(ddl ==
      """CREATE TABLE IF NOT EXISTS `bronze`.`customers` (
        |  `FirstName` STRING,
        |  `CountryRegion` STRING,
        |  `PostalCode` STRING
        |)
        |USING parquet
        |PARTITIONED BY (`CountryRegion`, `PostalCode`)""".stripMargin)
  }

  test("CLUSTER BY renders for clustered specs and excludes PARTITIONED BY") {
    val clustered = spec.copy(partitionedBy = Seq.empty,
      clusterBy = Seq("CountryRegion", "PostalCode"), location = None)
    val ddl = DdlGenerator.createTable(clustered, CatalogProfile.Builtin())
    assert(ddl ==
      """CREATE TABLE IF NOT EXISTS `bronze`.`customers` (
        |  `FirstName` STRING,
        |  `CountryRegion` STRING,
        |  `PostalCode` STRING
        |)
        |USING parquet
        |CLUSTER BY (`CountryRegion`, `PostalCode`)""".stripMargin)
    // Iceberg dialect carries clustering the same way.
    assert(DdlGenerator.createTable(clustered, CatalogProfile.Iceberg())
      .contains("CLUSTER BY (`CountryRegion`, `PostalCode`)"))
    // Combining the two layouts fails at SPEC time, not execution time.
    intercept[IllegalArgumentException](
      spec.copy(clusterBy = Seq("PostalCode")))
    // Unknown cluster columns fail at spec time too.
    intercept[IllegalArgumentException](
      spec.copy(partitionedBy = Seq.empty, clusterBy = Seq("nope")))
  }

  test("identifiers with reserved words/special chars and quoted locations are escaped") {
    val tricky = TableSpec(
      database = "select",
      table = "we`ird",
      location = Some("/tmp/o'brien"),
      formatVersion = "2",
      partitionedBy = Seq.empty,
      columns = Seq(ColumnSpec("order", "string")))
    val ddl = DdlGenerator.createTable(tricky, CatalogProfile.Builtin())
    assert(ddl.contains("`select`.`we``ird`"))
    assert(ddl.contains("  `order` STRING"))
    // Quote escaped by doubling — parses in both default and
    // escapedStringLiterals parser modes (ADVICE r2).
    assert(ddl.contains("LOCATION '/tmp/o''brien'"))
  }

  test("reserved-word names round-trip through the live catalog probes (ADVICE r2)") {
    // The in-memory SessionCatalog's validateName rejects spaces/backticks
    // outright, so reserved words are the realistic tricky case the probes
    // must quote (unquoted, `select`.`order` fails to parse as an
    // identifier).
    val spark = graft.SparkTestSession.spark
    val tricky = TableSpec(
      database = "select",
      table = "order",
      location = None,
      formatVersion = "2",
      partitionedBy = Seq.empty,
      columns = Seq(ColumnSpec("group", "string")))
    val auto = new CatalogAutomation(spark, CatalogProfile.Builtin())
    auto.createTable(tricky)
    assert(auto.tableExists("select", "order"))
    assert(auto.listTables("select").contains("order"))
  }

  test("Iceberg profile emits the reference's session config keys " +
    "(create_iceberg_tables.py:121-128), minus the deprecated DynamoDB lock") {
    val conf = CatalogProfile.Iceberg(warehouse = "s3://w").sessionConfig.toMap
    assert(conf("spark.sql.catalog.glue_catalog") ==
      "org.apache.iceberg.spark.SparkCatalog")
    assert(conf("spark.sql.catalog.glue_catalog.catalog-impl") ==
      "org.apache.iceberg.aws.glue.GlueCatalog")
    assert(conf("spark.sql.catalog.glue_catalog.io-impl") ==
      "org.apache.iceberg.aws.s3.S3FileIO")
    assert(conf("spark.sql.catalog.glue_catalog.warehouse") == "s3://w")
    assert(conf("spark.sql.extensions") ==
      "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    assert(conf("spark.sql.defaultCatalog") == "glue_catalog")
    assert(!conf.keys.exists(_.contains("lock")))
  }

  test("Iceberg profile extraProperties pass through namespaced under the catalog") {
    val conf = CatalogProfile.Iceberg(
      extraProperties = Seq("glue.skip-archive" -> "true")).sessionConfig.toMap
    assert(conf("spark.sql.catalog.glue_catalog.glue.skip-archive") == "true")
  }

  test("CREATE DATABASE is idempotent text") {
    assert(DdlGenerator.createDatabase("bronze", CatalogProfile.Builtin()) ==
      "CREATE DATABASE IF NOT EXISTS `bronze`")
    assert(DdlGenerator.createDatabase("bronze", CatalogProfile.Iceberg()) ==
      "CREATE DATABASE IF NOT EXISTS `glue_catalog`.`bronze`")
  }

  // --- property: generated DDL round-trips through Spark's own DDL parser ---

  private val identGen: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(7, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val typeGen: Gen[String] = Gen.oneOf(
    "string", "int", "bigint", "double", "float", "boolean",
    "date", "timestamp", "decimal(10,2)", "array<string>", "map<string,int>")

  private val specGen: Gen[TableSpec] = for {
    db <- identGen
    tb <- identGen
    n <- Gen.choose(1, 8)
    names <- Gen.listOfN(n, identGen).map(_.distinct).suchThat(_.nonEmpty)
    types <- Gen.listOfN(names.size, typeGen)
    nParts <- Gen.choose(0, math.min(2, names.size))
  } yield TableSpec(db, tb, None, "2", names.take(nParts),
    names.zip(types).map { case (c, t) => ColumnSpec(c, t) })

  test("property: arbitrary specs produce DDL whose column block reparses to the same StructType") {
    forAllSamples(specGen) { s =>
      val ddl = DdlGenerator.createTable(s, CatalogProfile.Builtin())
      // Extract "name TYPE" lines between ( and ) and reparse via fromDDL.
      val body = ddl.linesIterator
        .filter(_.startsWith("  ")).map(_.trim.stripSuffix(",")).mkString(", ")
      val reparsed = org.apache.spark.sql.types.StructType.fromDDL(body)
      assert(reparsed == s.schema)
    }
  }
}
