package graft.catalog

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral tests on the Builtin profile — end of M1 = reference parity
  * (SURVEY.md §7): ensureDatabase, idempotent createTable, listTables,
  * showDatabases, partition metadata.
  */
class CatalogAutomationSuite extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val auto = new CatalogAutomation(spark, CatalogProfile.Builtin())

  val spec: TableSpec = TableSpec(
    database = "bronze",
    table = "customers",
    location = None,
    formatVersion = "2",
    partitionedBy = Seq("CountryRegion", "PostalCode"),
    columns = Seq(
      ColumnSpec("FirstName", "string"),
      ColumnSpec("EmailAddress", "string"),
      ColumnSpec("CountryRegion", "string"),
      ColumnSpec("PostalCode", "string")))

  test("provision is idempotent: double create converges, never errors") {
    auto.createTable(spec)
    auto.createTable(spec) // the reference's whole automation semantic
    assert(auto.tableExists("bronze", "customers"))
    assert(auto.listTables("bronze").contains("customers"))
  }

  test("SHOW DATABASES surfaces the created namespace (test_iceberg.py:86)") {
    auto.ensureDatabase("bronze")
    val dbs = auto.showDatabases().collect().map(_.getString(0))
    assert(dbs.contains("bronze"))
  }

  test("created table carries declared schema and partition columns") {
    auto.createTable(spec)
    val cols = spark.catalog.listColumns("bronze.customers").collect()
    assert(cols.map(_.name).toSet ==
      Set("FirstName", "EmailAddress", "CountryRegion", "PostalCode"))
    assert(cols.filter(_.isPartition).map(_.name).toSet ==
      Set("CountryRegion", "PostalCode"))
  }

  test("write → read round-trip through the provisioned table") {
    import spark.implicits._
    auto.createTable(spec)
    Seq(("Ada", "a@x.com", "DE", "10115"), ("Bo", "b@x.com", "US", "94110"))
      .toDF("FirstName", "EmailAddress", "CountryRegion", "PostalCode")
      .write.mode("overwrite").insertInto("bronze.customers")
    val got = spark.table("bronze.customers")
    assert(got.count() == 2)
    // partition pruning works on the identity partition column
    assert(got.where("CountryRegion = 'DE'").count() == 1)
  }

  test("profile seam: V2 writeTo is rejected on the builtin V1 catalog") {
    // `df.writeTo(...).append()` (the V2 AppendData path, SURVEY §2.2) needs
    // a V2 catalog — with the Iceberg profile it is the native write route;
    // the builtin session catalog serves V1 parquet tables, where Spark
    // refuses it and `insertInto` (previous test) is the supported path.
    // Pinned so a future profile change is caught.
    import spark.implicits._
    val spec2 = spec.copy(table = "customers_v2")
    auto.createTable(spec2)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("Cy", "c@x.com", "FR", "75001"))
        .toDF("FirstName", "EmailAddress", "CountryRegion", "PostalCode")
        .writeTo("bronze.customers_v2").append()
    }
    assert(e.getMessage.contains("v1 table"))
  }

  test("clustered spec provisions a CLUSTER BY table; layout lands in " +
    "catalog metadata and a clustered write round-trips") {
    import spark.implicits._
    val clustered = spec.copy(table = "customers_clustered",
      partitionedBy = Seq.empty, clusterBy = Seq("CountryRegion"))
    auto.createTable(clustered)
    auto.createTable(clustered) // idempotence holds for clustered DDL too
    // Spark records clustering as a spec the DESCRIBE surface exposes.
    val describe = spark.sql("DESCRIBE TABLE EXTENDED bronze.customers_clustered")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(describe.contains("Clustering Information") ||
      describe.toLowerCase.contains("countryregion"), describe)
    Seq(("Ada", "a@x.com", "DE", "10115"), ("Bo", "b@x.com", "FR", "75001"))
      .toDF("FirstName", "EmailAddress", "CountryRegion", "PostalCode")
      .write.mode("append").insertInto("bronze.customers_clustered")
    assert(spark.table("bronze.customers_clustered").count() === 2)
  }
}
