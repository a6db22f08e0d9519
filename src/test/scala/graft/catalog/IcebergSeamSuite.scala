package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.{ProvisionTables, SparkTestSession}

/** The Iceberg-dialect seam, exercised BEHAVIORALLY — not just as golden
  * text: the profile's own `sessionConfig` wires a catalog name to a V2
  * catalog implementation, the generated `USING iceberg` DDL
  * (`create_iceberg_tables.py:24-57`'s intended output) EXECUTES against
  * it through `ProvisionTables`, and the provisioned format-v2 table then
  * serves exactly what the reference provisions Iceberg tables FOR —
  * row-level MERGE and time travel.
  *
  * Offline there is no Iceberg runtime jar, so `sparkCatalogImpl` points
  * at the engine's own [[graft.sources.SnapshotCatalog]] — a V2 catalog
  * honoring the same public Spark contracts (`TableCatalog`,
  * `SupportsRowLevelOperations`, versioned `loadTable`). The two keys a
  * real Iceberg deployment would add on top — the
  * `IcebergSparkSessionExtensions` extension class (builder-time, jar
  * absent; Catalyst's built-in row-level planning covers the statements
  * used here) and `spark.sql.defaultCatalog` (skipped so the SHARED test
  * session's default catalog is not mutated under concurrently running
  * suites; every identifier below is catalog-qualified, which is what the
  * key affects) — are filtered explicitly.
  */
class IcebergSeamSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val customersYaml =
    """database: bronze_seam
      |table: customers
      |format_version: "2"
      |partitioned_by:
      |  - CountryRegion
      |  - PostalCode
      |columns:
      |  - {name: FirstName, type: string}
      |  - {name: LastName, type: string}
      |  - {name: Phone, type: string}
      |  - {name: CustomerID, type: string}
      |  - {name: CountryRegion, type: string}
      |  - {name: PostalCode, type: string}
      |""".stripMargin

  test("the Iceberg profile provisions THROUGH a live V2 catalog, and the " +
    "table serves MERGE + VERSION AS OF (what format v2 exists for)") {
    val wh = Files.createTempDirectory("graft-seam-wh").toString
    val profile = CatalogProfile.Iceberg(
      catalog = "glue_seam",
      warehouse = wh,
      sparkCatalogImpl = "graft.sources.SnapshotCatalog")

    // The profile's OWN sessionConfig does the wiring (minus the two
    // documented offline/shared-session exclusions) — asserting the config
    // the reference sets (`create_iceberg_tables.py:121-128`) is the
    // config that makes the DDL below executable.
    val applied = profile.sessionConfig.filterNot { case (k, _) =>
      k == "spark.sql.extensions" || k == "spark.sql.defaultCatalog"
    }
    assert(applied.toMap.get("spark.sql.catalog.glue_seam")
      .contains("graft.sources.SnapshotCatalog"))
    assert(applied.toMap.get("spark.sql.catalog.glue_seam.warehouse").contains(wh))
    applied.foreach { case (k, v) => spark.conf.set(k, v) }

    val dir = Files.createTempDirectory("graft-seam-specs")
    Files.writeString(dir.resolve("customers.yml"), customersYaml)
    spark.sql("DROP TABLE IF EXISTS glue_seam.bronze_seam.customers")

    val out = ProvisionTables.run(spark, dir, profile = Some(profile))
    val ddl = out.head._2
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS " +
      "`glue_seam`.`bronze_seam`.`customers`"), ddl)
    assert(ddl.contains("USING iceberg"), ddl)
    assert(ddl.contains("PARTITIONED BY (`CountryRegion`, `PostalCode`)"), ddl)
    assert(ddl.contains("TBLPROPERTIES ('format-version'='2')"), ddl)

    // The DDL executed: the table is live in the catalog, carrying the
    // Iceberg provider + format-version properties the statement declared.
    val t = "glue_seam.bronze_seam.customers"
    assert(spark.catalog.tableExists(t))
    val props = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("format-version").contains("2"), props)
    // SHOW TBLPROPERTIES hides reserved keys (provider among them) — the
    // catalog's stored state shows `USING iceberg` arrived as the provider.
    import graft.sources.SnapshotStore
    val k = SnapshotStore.keyOf("glue_seam", Seq("bronze_seam", "customers"))
    assert(SnapshotStore.stateOf(k).properties.get("provider").contains("iceberg"))

    // Idempotent re-provision (the reference's automation semantic).
    ProvisionTables.run(spark, dir, profile = Some(profile))

    // And the payoff — the reason the reference pins format v2
    // (`customers.yml:4`): row-level SQL and time travel WORK on the
    // provisioned table.
    spark.sql(s"INSERT INTO $t VALUES " +
      "('Ada', 'L', '555-1', 'c1', 'GB', 'SW1'), " +
      "('Alan', 'T', '555-2', 'c2', 'GB', 'SW2')") // v1
    spark.sql(
      s"""MERGE INTO $t c
         |USING (SELECT 'c1' AS CustomerID, '555-9' AS Phone) u
         |ON c.CustomerID = u.CustomerID
         |WHEN MATCHED THEN UPDATE SET Phone = u.Phone""".stripMargin) // v2
    assert(spark.sql(s"SELECT Phone FROM $t WHERE CustomerID = 'c1'")
      .collect().toSeq === Seq(Row("555-9")))
    assert(spark.sql(
      s"SELECT Phone FROM $t VERSION AS OF 1 WHERE CustomerID = 'c1'")
      .collect().toSeq === Seq(Row("555-1")))
    // Identity partitioning is honored: c2's partition never matched the
    // MERGE, so its v1 file carried over untouched into v2.
    val v1Files = SnapshotStore.filesAt(k, 1L).map(_.path).toSet
    val v2Files = SnapshotStore.filesAt(k, 2L).map(_.path).toSet
    val sw2 = SnapshotStore.filesAt(k, 1L)
      .filter(_.partitionValues.map(String.valueOf(_)) == Seq("GB", "SW2"))
    assert(sw2.nonEmpty && sw2.forall(f => v2Files.contains(f.path)),
      s"untouched partition's file must survive the MERGE: v1=$v1Files v2=$v2Files")
  }
}
