package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.catalog.{CatalogAutomation, CatalogProfile, TableSpec}

/** Provisioning CLI — the reference's EP1 entry point
  * (`create_iceberg_tables.py:60-67,140-156`) as a runnable program:
  * `runMain graft.ProvisionTables <specFileOrDir> [warehouseDir]`.
  *
  * Walks a YAML table-spec file or a directory of them, ensures each
  * database, and executes idempotent CREATEs. Unlike the reference, errors
  * propagate (non-zero exit) instead of being printed and swallowed
  * (`create_iceberg_tables.py:149-156`), and there is no jar-download or
  * boto3 side-channel — the catalog is Spark's.
  */
object ProvisionTables {

  def specPaths(root: Path): Seq[Path] =
    if (Files.isDirectory(root)) {
      val stream = Files.list(root) // must be closed: holds a directory handle
      try stream.iterator().asScala
        .filter(p => p.toString.endsWith(".yml") || p.toString.endsWith(".yaml"))
        .toSeq.sortBy(_.toString)
      finally stream.close()
    } else Seq(root)

  /** Provision every spec found at `root` against the given session;
    * returns (spec, executed DDL) pairs. The seam `main` and tests share.
    * `profile` selects the DDL dialect: the default Builtin profile
    * (parquet, session catalog) or the reference's Iceberg dialect
    * (`create_iceberg_tables.py:121-128`) pointed at any V2 catalog that
    * accepts `USING iceberg` — offline, the engine's own
    * [[graft.sources.SnapshotCatalog]] (IcebergSeamSuite drives this path
    * end-to-end). */
  def run(spark: org.apache.spark.sql.SparkSession, root: Path,
      warehouseDir: Option[String] = None,
      profile: Option[CatalogProfile] = None): Seq[(TableSpec, String)] = {
    val paths = specPaths(root)
    require(paths.nonEmpty, s"no .yml/.yaml specs under $root")
    val specs = paths.map(p => TableSpec.fromYamlFile(p.toString))
    val auto = new CatalogAutomation(spark,
      profile.getOrElse(CatalogProfile.Builtin(warehouseDir)))
    specs.zip(auto.provision(specs))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProvisionTables <specFileOrDir> [warehouseDir]")
    val spark = {
      val b = SessionFactory.configure(
        org.apache.spark.sql.SparkSession.builder()
          .master(s"local[${SessionFactory.defaultCores}]"),
        appName = "graft-provision")
      args.lift(1).fold(b)(wh => b.config("spark.sql.warehouse.dir", wh)).getOrCreate()
    }
    spark.sparkContext.setLogLevel("WARN")
    try
      run(spark, Paths.get(args(0)), args.lift(1)).foreach { case (spec, ddl) =>
        println(s"[provision] created ${spec.fullName}")
        println(ddl.linesIterator.map("  " + _).mkString("\n"))
      }
    finally spark.stop()
  }
}
