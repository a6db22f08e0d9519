package graft.catalog

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TableSpecSuite extends AnyFunSuite {

  // The reference's own spec shape (/root/reference/iceberg_tables/customers.yml).
  val customersYaml: String =
    """database: bronze
      |table: customers
      |location: s3://bucket/warehouse/bronze/customers
      |format_version: 2
      |partitioned_by:
      |  - CountryRegion
      |  - PostalCode
      |columns:
      |  - name: FirstName
      |    type: string
      |  - name: LastName
      |    type: string
      |  - name: CustomerID
      |    type: string
      |  - name: CountryRegion
      |    type: string
      |  - name: PostalCode
      |    type: string
      |""".stripMargin

  test("parses the reference customers.yml shape") {
    val spec = TableSpec.fromYaml(customersYaml)
    assert(spec.database == "bronze")
    assert(spec.table == "customers")
    assert(spec.location.contains("s3://bucket/warehouse/bronze/customers"))
    assert(spec.formatVersion == "2")
    assert(spec.partitionedBy == Seq("CountryRegion", "PostalCode"))
    assert(spec.columns.size == 5)
    assert(spec.columns.forall(_.dataType == "string"))
  }

  test("cluster_by parses from YAML and validates against declared columns") {
    val spec = TableSpec.fromYaml(
      "database: d\ntable: t\ncluster_by:\n  - a\ncolumns:\n  - name: a\n    type: int\n")
    assert(spec.clusterBy == Seq("a") && spec.partitionedBy.isEmpty)
    intercept[IllegalArgumentException](TableSpec.fromYaml(
      "database: d\ntable: t\ncluster_by:\n  - nope\ncolumns:\n  - name: a\n    type: int\n"))
    intercept[IllegalArgumentException](TableSpec.fromYaml(
      "database: d\ntable: t\npartitioned_by:\n  - a\ncluster_by:\n  - a\n" +
        "columns:\n  - name: a\n    type: int\n"))
  }

  test("format_version defaults to 2 when omitted (create_iceberg_tables.py:36)") {
    val spec = TableSpec.fromYaml(
      "database: d\ntable: t\ncolumns:\n  - name: a\n    type: int\n")
    assert(spec.formatVersion == "2")
    assert(spec.partitionedBy.isEmpty)
    assert(spec.location.isEmpty)
  }

  test("schema materializes full Spark type system, not just STRING") {
    val spec = TableSpec.fromYaml(
      """database: d
        |table: t
        |columns:
        |  - name: a
        |    type: bigint
        |  - name: b
        |    type: decimal(12,2)
        |  - name: c
        |    type: array<float>
        |  - name: d
        |    type: struct<x:int,y:string>
        |""".stripMargin)
    assert(spec.schema == StructType(Seq(
      StructField("a", LongType),
      StructField("b", DecimalType(12, 2)),
      StructField("c", ArrayType(FloatType)),
      StructField("d", StructType(Seq(
        StructField("x", IntegerType), StructField("y", StringType)))))))
  }

  test("rejects duplicate column names with a message naming them") {
    val bad =
      "database: d\ntable: t\ncolumns:\n  - name: a\n    type: int\n  - name: a\n    type: string\n"
    val e = intercept[IllegalArgumentException](TableSpec.fromYaml(bad))
    assert(e.getMessage.contains("duplicate column name(s): a"))
  }

  test("rejects partition column not in declared columns") {
    val bad =
      "database: d\ntable: t\npartitioned_by:\n  - nope\ncolumns:\n  - name: a\n    type: int\n"
    assertThrows[IllegalArgumentException](TableSpec.fromYaml(bad))
  }

  test("rejects missing required keys") {
    assertThrows[RuntimeException](TableSpec.fromYaml("table: t\ncolumns:\n  - name: a\n    type: int\n"))
    assertThrows[RuntimeException](TableSpec.fromYaml("database: d\ntable: t\n"))
  }

  test("invalid DDL type fails at schema materialization") {
    val spec = TableSpec.fromYaml(
      "database: d\ntable: t\ncolumns:\n  - name: a\n    type: not_a_type\n")
    assertThrows[Exception](spec.schema)
  }
}
