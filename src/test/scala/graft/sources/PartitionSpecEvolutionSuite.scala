package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** PARTITION-SPEC EVOLUTION (Iceberg's per-file spec ids): a table's
  * partitioning changes WITHOUT rewriting a single data file — new writes
  * land under the new spec, every file prunes through the spec it was
  * written under, and compaction converges the table back to one spec. */
class PartitionSpecEvolutionSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.pse")
    spark.sql(s"DROP TABLE IF EXISTS $cat.pse.$name")
    s"$cat.pse.$name"
  }
  private def keyOf(name: String) = SnapshotStore.keyOf(cat, Seq("pse", name))

  private def scannedFiles(sql: String): Long =
    spark.sql(sql).queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputRDD.getNumPartitions
    }.sum.toLong

  test("unpartitioned -> days(ts): old files stay put, new files land " +
      "per-day, a ts range prunes the new vintage, answers exact") {
    val t = fresh("d")
    spark.sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP, v STRING)")
    spark.sql(s"INSERT INTO $t SELECT id, " +
      "timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,CAST(id AS INT)), 'old' " +
      "FROM range(0, 8)") // 8 days, one unpartitioned vintage
    val oldPaths = SnapshotStore.stateOf(keyOf("d")).currentFiles.map(_.path).toSet
    spark.sql(s"CALL $cat.system.evolve_partition_spec('pse.d', 'days(ts)')")
    spark.sql(s"INSERT INTO $t SELECT id, " +
      "timestamp'2024-03-20 00:00:00' + make_interval(0,0,0,CAST(id AS INT)), 'new' " +
      "FROM range(0, 8)") // 8 new days, one file each
    val st = SnapshotStore.stateOf(keyOf("d"))
    assert(st.currentSpecId === 1 && st.specHistory.keySet === Set(0))
    // Not a single pre-evolution file was rewritten.
    assert(oldPaths.subsetOf(st.currentFiles.map(_.path).toSet))
    assert(st.currentFiles.count(_.specId == 1) >= 8)
    // A ts range inside the NEW vintage: its day files prune; the old
    // unpartitioned files are kept (their spec cannot decide) — sound.
    val oldCount = st.currentFiles.count(_.specId == 0)
    val hit = scannedFiles(
      s"SELECT * FROM $t WHERE ts >= timestamp'2024-03-21 00:00:00' " +
        "AND ts < timestamp'2024-03-23 00:00:00'")
    assert(hit <= oldCount + 2, s"expected <= ${oldCount + 2} files, got $hit")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 16L)
    assert(spark.sql(
      s"SELECT count(*) FROM $t WHERE ts >= timestamp'2024-03-21 00:00:00' " +
        "AND ts < timestamp'2024-03-23 00:00:00'")
      .collect().head.getLong(0) === 2L)
  }

  test("identity(region) -> bucket(4, id): old files still prune by " +
      "region, both vintages read, .partitions shows both specs, restart " +
      "replays it all") {
    val t = fresh("b")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING, v DOUBLE) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'east', 1.0), (2, 'west', 2.0)")
    spark.sql(s"CALL $cat.system.evolve_partition_spec('pse.b', 'bucket(4, id)')")
    spark.sql(s"INSERT INTO $t VALUES (3, 'east', 3.0), (4, 'west', 4.0)")
    val st = SnapshotStore.stateOf(keyOf("b"))
    assert(st.currentFiles.map(_.specId).toSet === Set(0, 1))
    // region predicate prunes OLD (identity-spec) files by metadata; new
    // bucket files are kept — and results stay exact.
    val all = scannedFiles(s"SELECT * FROM $t")
    val pruned = scannedFiles(s"SELECT * FROM $t WHERE region = 'east'")
    assert(pruned < all, s"old-spec identity pruning must engage: $pruned/$all")
    assert(spark.sql(s"SELECT id FROM $t WHERE region = 'east' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // .partitions unions the specs (region=... rows AND id_bucket=... rows).
    val parts = spark.sql(s"SELECT partition FROM $t.partitions")
      .collect().map(_.getString(0)).toSet
    assert(parts.exists(_.startsWith("region=")) &&
      parts.exists(_.startsWith("id_bucket=")), parts.toString)
    // Durability: spec history, per-file spec ids, pruning after restart.
    SnapshotStore.tables.clear()
    val st2 = SnapshotStore.stateOf(keyOf("b"))
    assert(st2.currentSpecId === 1 &&
      st2.currentFiles.map(_.specId).toSet === Set(0, 1))
    assert(scannedFiles(s"SELECT * FROM $t WHERE region = 'east'") < all)
    assert(spark.sql(s"SELECT sum(v) FROM $t").collect().head.getDouble(0) === 10.0)
  }

  test("row-level ops and metadata ops across mixed specs: DELETE falls " +
      "back to rewrite when undecidable, dynamic overwrite refuses stale " +
      "specs, compaction converges to the current spec") {
    val t = fresh("m")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING, v DOUBLE) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'east', 1.0), (2, 'west', 2.0)")
    spark.sql(s"CALL $cat.system.evolve_partition_spec('pse.m', '')") // unpartition
    spark.sql(s"INSERT INTO $t VALUES (3, 'east', 3.0)")
    // region='west' is identity-decidable for spec-0 files but NOT for the
    // new unpartitioned vintage -> the engine must take the rewrite path
    // and still be exact.
    spark.sql(s"DELETE FROM $t WHERE region = 'west'")
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // Dynamic overwrite with retired-spec files present: loud refusal.
    spark.sql(s"CALL $cat.system.evolve_partition_spec('pse.m', 'region')")
    spark.sql(s"INSERT INTO $t VALUES (4, 'north', 4.0)")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val e = intercept[Exception](
        spark.sql(s"INSERT OVERWRITE $t VALUES (5, 'north', 5.0)"))
      assert(e.getMessage.contains("rewrite_data_files"), e.getMessage)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    // Compaction rewrites everything under the CURRENT spec -> converged.
    spark.sql(s"CALL $cat.system.rewrite_data_files('pse.m')")
    val st = SnapshotStore.stateOf(keyOf("m"))
    assert(st.currentFiles.map(_.specId).toSet === Set(st.currentSpecId))
    // And dynamic overwrite now works.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(s"INSERT OVERWRITE $t VALUES (5, 'north', 5.0)")
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(spark.sql(s"SELECT id, region FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "east"), Row(3L, "east"), Row(5L, "north")))
  }

  test("a write planned under a retired spec is a LOUD commit conflict, " +
      "never a mislabeled file") {
    val t = fresh("race")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region)")
    val k = keyOf("race")
    val st = SnapshotStore.stateOf(k)
    // Simulate the race: a task writes its file under spec 0's shape...
    val w = MemWriters.writer(st.schema, st.partitionCols, st.dataDir,
      "race-task", RowFiles.sessionConf().value, st.properties,
      FieldIds.writeColsFor(st.schema, st.schema), st.partitionTransforms,
      specId = st.currentSpecId)
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(st.schema)
    w.write(proj(org.apache.spark.sql.catalyst.InternalRow(1L,
      org.apache.spark.unsafe.types.UTF8String.fromString("east"))))
    val files = w.commit().asInstanceOf[MemCommitMessage].files.toVector
    // ... and the spec evolves before the commit lands.
    spark.sql(s"CALL $cat.system.evolve_partition_spec('pse.race', 'bucket(4, id)')")
    val e = intercept[IllegalStateException](
      SnapshotStore.commit(k, files, replace = false))
    assert(e.getMessage.contains("partition-spec evolution"), e.getMessage)
  }

  test("equality upserts and the incremental primitives work on an " +
      "EVOLVED table (writers stamp the new spec)") {
    val t = fresh("ups")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) PARTITIONED BY (v)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"CALL $cat.system.evolve_partition_spec('pse.ups', 'bucket(4, id)')")
    import spark.implicits._
    SnapshotUpsert.upsertBatch(t, Seq((1L, "A")).toDF("id", "v"), Seq("id"))
    assert(spark.sql(s"SELECT v FROM $t ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("A", "b"))
    SnapshotUpsert.replaceByKey(t, Seq((3L, "c")).toDF("id", "v"),
      Seq(2L).toDF("id"), Seq("id"))
    assert(spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "A"), Row(3L, "c")))
  }

  test("spec strings parse and validate; a retired spec's source column " +
      "can later be renamed without orphaning old files") {
    val t = fresh("v")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'east')")
    intercept[Exception](spark.sql(
      s"CALL $cat.system.evolve_partition_spec('pse.v', 'nope(id)')"))
    intercept[Exception](spark.sql(
      s"CALL $cat.system.evolve_partition_spec('pse.v', 'days(region)')"))
    intercept[Exception](spark.sql(
      s"CALL $cat.system.evolve_partition_spec('pse.v', 'ghost')"))
    spark.sql(s"CALL $cat.system.evolve_partition_spec('pse.v', 'bucket(8, id)')")
    // region is no longer a partition column of the CURRENT spec: renaming
    // it is legal, and the retired spec's stored value types keep the old
    // file's partition tuple readable.
    spark.sql(s"ALTER TABLE $t RENAME COLUMN region TO area")
    spark.sql(s"INSERT INTO $t VALUES (2, 'west')")
    SnapshotStore.tables.clear()
    assert(spark.sql(s"SELECT id, area FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "east"), Row(2L, "west")))
  }
}
