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

  /** `--iceberg`: provision through the Iceberg DIALECT offline — the
    * profile's own sessionConfig wires `glue_catalog` to the engine's
    * [[graft.sources.SnapshotCatalog]] (the V2 catalog honoring the same
    * contracts, since no Iceberg runtime jar exists offline), minus the
    * two keys that need the real runtime (`spark.sql.extensions`) or
    * would change the session default catalog. */
  private def icebergProfile(warehouseDir: Option[String]): CatalogProfile =
    CatalogProfile.Iceberg(
      warehouse = warehouseDir.getOrElse("/tmp/graft-iceberg-warehouse"),
      sparkCatalogImpl = "graft.sources.SnapshotCatalog")

  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    val unknown = flags.filterNot(_ == "--iceberg")
    require(positional.nonEmpty && unknown.isEmpty,
      "usage: ProvisionTables <specFileOrDir> [warehouseDir] [--iceberg]" +
        (if (unknown.nonEmpty) s"; unknown flag(s): ${unknown.mkString(", ")}" else ""))
    val warehouseDir = positional.lift(1)
    val profile = if (flags.contains("--iceberg"))
      Some(icebergProfile(warehouseDir)) else None
    val spark = {
      val b0 = SessionFactory.configure(
        org.apache.spark.sql.SparkSession.builder()
          .master(s"local[${SessionFactory.defaultCores}]"),
        appName = "graft-provision")
      val b1 = warehouseDir.fold(b0)(wh => b0.config("spark.sql.warehouse.dir", wh))
      profile.fold(b1)(p =>
        p.sessionConfig.filterNot { case (k, _) =>
          k == "spark.sql.extensions" || k == "spark.sql.defaultCatalog"
        }.foldLeft(b1) { case (b, (k, v)) => b.config(k, v) })
        .getOrCreate()
    }
    spark.sparkContext.setLogLevel("WARN")
    try
      run(spark, Paths.get(positional(0)), warehouseDir, profile)
        .foreach { case (spec, ddl) =>
          println(s"[provision] created ${profile.fold(spec.fullName)(_.qualified(spec))}")
          println(ddl.linesIterator.map("  " + _).mkString("\n"))
        }
    finally spark.stop()
  }
}
