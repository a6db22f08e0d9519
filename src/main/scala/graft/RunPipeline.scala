package graft

import java.nio.file.{Files, Path, Paths}

import graft.catalog.PipelineSpec
import graft.queries.PipelineRunner

/** Pipeline CLI — the data-plane twin of [[ProvisionTables]]:
  * `runMain graft.RunPipeline <specFileOrDir> <sfDir>`.
  *
  * Walks a YAML pipeline-spec file or a directory of them and executes
  * each against the fixture tables in `sfDir`. Specs without a sink are
  * validated, built, and counted (a dry-run that still exercises the whole
  * plan); specs with a sink are written. Errors propagate — a bad spec
  * fails the run, matching the engine-wide fail-loudly convention.
  */
object RunPipeline {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunPipeline <specFileOrDir> <sfDir>")
    val root = Paths.get(args(0))
    val sfDir = args(1)
    val paths: Seq[Path] = ProvisionTables.specPaths(root)
    require(paths.nonEmpty, s"no .yml/.yaml specs under $root")

    val spark = SessionFactory
      .configure(
        org.apache.spark.sql.SparkSession.builder()
          .master(s"local[${SessionFactory.defaultCores}]"),
        appName = "graft-pipeline")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val runner = new PipelineRunner(spark)
      paths.foreach { p =>
        val spec = PipelineSpec.fromYamlFile(p.toString)
        if (spec.sourceChanges) {
          // Incremental run over the source's `.changes` stream: catch up
          // (AvailableNow), rate-limited per the spec, then stop. The
          // checkpoint is keyed on the spec name AND the source table's
          // CREATION identity: a spec-name-only path would let a stale
          // checkpoint from a run against a since-dropped-and-recreated
          // source resume from an offset belonging to the dead table's
          // history — silently skipping the new table's commits. A
          // recreated source has a fresh tableId, hence a fresh checkpoint
          // and a full replay.
          val srcParts = spec.sourceTable.split('.').toSeq
          val srcState = graft.sources.SnapshotStore.stateOf(
            graft.sources.SnapshotStore.keyOf(srcParts.head, srcParts.tail))
          val srcId =
            if (srcState.tableId.nonEmpty) srcState.tableId.take(8)
            else java.util.UUID.nameUUIDFromBytes(srcState.dataDir.getBytes(
              java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
          val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-pipeline-" +
            s"ckpt-${spec.name}-$srcId"
          runner.runChanges(spec, ckpt).awaitTermination()
          println(s"[pipeline] ${spec.name}: changes run caught up into " +
            spec.sinkDescription)
        } else if (spec.hasSink) {
          runner.run(spec, sfDir)
          println(s"[pipeline] ${spec.name}: wrote ${spec.sinkDescription}")
        } else {
          val n = runner.build(spec, sfDir).count()
          println(s"[pipeline] ${spec.name}: dry-run OK, $n rows")
        }
      }
    } finally spark.stop()
  }
}
