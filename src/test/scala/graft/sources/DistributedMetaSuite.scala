package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** DISTRIBUTED metadata tables: past a driver-safe file count
  * (`read.meta.local-threshold`), `.files` stops being a driver-built
  * LocalScan and becomes a batch scan with one task per manifest CHUNK
  * (`write.manifest.chunk-entries` shards each snapshot's inventory at
  * write), parsed executor-side — Iceberg reads manifests distributed for
  * the same reason: a 100 TB table's file inventory is millions of rows,
  * not driver memory. `.partitions` above the bound aggregates over the
  * distributed `.files` relation, holding only |partitions| result rows. */
class DistributedMetaSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.dmeta")
    spark.sql(s"DROP TABLE IF EXISTS $cat.dmeta.$name")
    s"$cat.dmeta.$name"
  }

  private def isBatchScan(sql: String): Boolean = {
    val plan = spark.sql(sql).queryExecution.executedPlan
    plan.collectFirst { case b: BatchScanExec => b }.isDefined
  }

  test("a table past the local threshold serves .files as a BatchScan over " +
      "manifest chunks; answers identical to the small-table local path") {
    val t = fresh("big")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region) " +
      "TBLPROPERTIES ('write.manifest.chunk-entries'='2', " +
      "'read.meta.local-threshold'='3')")
    // Four single-file commits → 4 files > threshold 3, manifest chunked 2+2.
    Seq("eu", "eu", "us", "ap").zipWithIndex.foreach { case (r, i) =>
      spark.sql(s"INSERT INTO $t VALUES ($i, '$r')")
    }
    assert(isBatchScan(s"SELECT * FROM $t.files"),
      "expected the distributed manifest-chunk scan")
    val rows = spark.sql(
      s"SELECT content, partition, row_count FROM $t.files ORDER BY partition, row_count")
      .collect().toSeq
    assert(rows.size === 4)
    assert(rows.count(_.getString(1) == "region=eu") === 2)
    assert(rows.forall(r => r.getString(0) == "data" && r.getLong(2) === 1L))

    // .partitions rides the distributed path too, same answers.
    assert(spark.sql(s"SELECT * FROM $t.partitions ORDER BY partition")
      .collect().toSeq ===
      Seq(Row("region=ap", 1L, 1L), Row("region=eu", 2L, 2L), Row("region=us", 1L, 1L)))
    // size_bytes and seq serve through the distributed chunk path too.
    val meta = spark.sql(
      s"SELECT size_bytes, seq FROM $t.files ORDER BY seq").collect().toSeq
    assert(meta.map(_.getLong(1)) === Seq(1L, 2L, 3L, 4L),
      "each single-commit file carries its data sequence number")
    assert(meta.forall(r => !r.isNullAt(0) && r.getLong(0) > 0L),
      "parquet files report their byte size")
  }

  test("below the threshold the local plan stays (no executor round-trip " +
      "for a dimension-sized inventory)") {
    val t = fresh("small")
    spark.sql(s"CREATE TABLE $t (id BIGINT)") // default threshold 100k
    spark.sql(s"INSERT INTO $t VALUES (1)")
    spark.sql(s"INSERT INTO $t VALUES (2)")
    assert(!isBatchScan(s"SELECT * FROM $t.files"))
    assert(spark.sql(s"SELECT count(*) FROM $t.files").collect().head.getLong(0) === 2L)
  }

  test("position-delete files appear in the distributed .files (content = " +
      "position-deletes)") {
    val t = fresh("mor")
    spark.sql(s"CREATE TABLE $t (id BIGINT) " +
      "TBLPROPERTIES ('write.manifest.chunk-entries'='2', " +
      "'read.meta.local-threshold'='3', 'write.delete.mode'='merge-on-read')")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO $t VALUES ($i)"))
    spark.sql(s"DELETE FROM $t WHERE id = 2")
    assert(isBatchScan(s"SELECT * FROM $t.files"))
    val byContent = spark.sql(
      s"SELECT content, count(*) FROM $t.files GROUP BY content ORDER BY content")
      .collect().toSeq
    assert(byContent === Seq(Row("data", 4L), Row("position-deletes", 1L)))
  }

  test("chunked manifests reload identically after restart (durable log)") {
    val t = fresh("reload")
    spark.sql(s"CREATE TABLE $t (id BIGINT) " +
      "TBLPROPERTIES ('write.manifest.chunk-entries'='2', " +
      "'read.meta.local-threshold'='3')")
    (1 to 5).foreach(i => spark.sql(s"INSERT INTO $t VALUES ($i)"))
    val k = SnapshotStore.keyOf(cat, Seq("dmeta", "reload"))
    val before = SnapshotStore.stateOf(k).currentFiles.map(_.path).sorted
    SnapshotStore.tables.clear()
    val after = SnapshotStore.stateOf(k).currentFiles.map(_.path).sorted
    assert(after === before)
    assert(spark.sql(s"SELECT sum(id) FROM $t").collect().head.getLong(0) === 15L)
    assert(spark.sql(s"SELECT count(*) FROM $t.files").collect().head.getLong(0) === 5L)
  }
}
