package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** EP1 parity: provisioning the reference's `customers.yml` shape
  * (`/root/reference/iceberg_tables/customers.yml:1-28`) end-to-end through
  * the CLI's code path.
  */
class ProvisionTablesSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val referenceShapedYaml =
    """database: bronze_ep1
      |table: customers
      |format_version: "2"
      |partitioned_by:
      |  - CountryRegion
      |  - PostalCode
      |columns:
      |  - {name: FirstName, type: string}
      |  - {name: LastName, type: string}
      |  - {name: CompanyName, type: string}
      |  - {name: EmailAddress, type: string}
      |  - {name: Phone, type: string}
      |  - {name: CustomerID, type: string}
      |  - {name: AddressLine1, type: string}
      |  - {name: City, type: string}
      |  - {name: CountryRegion, type: string}
      |  - {name: PostalCode, type: string}
      |""".stripMargin

  test("provisions a directory of reference-shaped specs, idempotently") {
    val dir = Files.createTempDirectory("graft-specs")
    Files.writeString(dir.resolve("customers.yml"), referenceShapedYaml)

    val out = ProvisionTables.run(spark, dir)
    assert(out.map(_._1.fullName) === Seq("bronze_ep1.customers"))
    assert(out.head._2.contains("CREATE TABLE IF NOT EXISTS `bronze_ep1`.`customers`"))
    assert(spark.catalog.tableExists("bronze_ep1.customers"))
    assert(
      spark.table("bronze_ep1.customers").schema.fieldNames.toSeq
        === Seq("FirstName", "LastName", "CompanyName", "EmailAddress", "Phone",
          "CustomerID", "AddressLine1", "City", "CountryRegion", "PostalCode"))

    // Idempotent: a second provision converges without error (the
    // reference's whole automation semantic).
    val again = ProvisionTables.run(spark, dir)
    assert(again.map(_._1.fullName) === Seq("bronze_ep1.customers"))
  }

  test("rejects an empty spec directory") {
    val dir = Files.createTempDirectory("graft-empty")
    val e = intercept[IllegalArgumentException](ProvisionTables.run(spark, dir))
    assert(e.getMessage.contains("no .yml/.yaml specs"))
  }

  test("CLI flag parsing rejects unknown flags BEFORE starting Spark") {
    val e = intercept[IllegalArgumentException](
      ProvisionTables.main(Array("tables/", "--bogus")))
    assert(e.getMessage.contains("unknown flag"), e.getMessage)
  }

  test("specPaths accepts a single file path") {
    val f = Files.createTempFile("solo", ".yml")
    assert(ProvisionTables.specPaths(f) === Seq(f))
    assert(ProvisionTables.specPaths(Paths.get(f.toString)).nonEmpty)
  }
}
