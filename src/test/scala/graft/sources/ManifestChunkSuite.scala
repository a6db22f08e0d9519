package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** MANIFEST-CHUNK PARTITION SUMMARIES (Iceberg's manifest-list filtering):
  * each chunk of a chunked manifest records per-position partition-value
  * ranges in the INDEX, so scan planning over a lazy snapshot loads ONLY
  * the chunks a pushed partition predicate can match — planning IO is
  * O(matching chunks), never O(inventory). */
class ManifestChunkSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  test("a partition-predicate scan on a many-chunk table reads only the " +
      "matching chunks; results exact; unfiltered scans use the cache") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mc")
    val t = s"$cat.mc.chunked"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (p INT, v STRING) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('write.manifest.chunk-entries'='2')")
    // 8 single-partition commits -> 8 files; chunk-entries=2 -> 4 chunks,
    // each covering 2 consecutive p values in its index summary.
    (1 to 8).foreach(i =>
      spark.sql(s"INSERT INTO $t VALUES ($i, 'v$i')"))
    // Reload from the metadata log: the current snapshot must be LAZY
    // (chunked manifest, seq-stamped) with zero resident entries.
    SnapshotStore.tables.clear()
    val k = SnapshotStore.keyOf(cat, Seq("mc", "chunked"))
    val sn = SnapshotStore.stateOf(k).snapshots.last
    assert(sn.isLazy && sn.residentFileEntries === 0)
    val before = MetadataLog.chunkLoads.get()
    val rows = spark.sql(s"SELECT v FROM $t WHERE p = 3").collect()
    val loaded = MetadataLog.chunkLoads.get() - before
    assert(rows.map(_.getString(0)).toSeq === Seq("v3"))
    assert(loaded === 1L,
      s"p = 3 lives in exactly one of 4 chunks; planning read $loaded")
    // A range over p in {2,3,4,5} touches chunks [1,2], [3,4], [5,6] —
    // exactly three of four.
    val before2 = MetadataLog.chunkLoads.get()
    val n = spark.sql(s"SELECT count(*) FROM $t WHERE p BETWEEN 2 AND 5")
      .collect().head.getLong(0)
    assert(n === 4L)
    assert(MetadataLog.chunkLoads.get() - before2 === 3L)
    // The snapshot is STILL not fully resident — planning never forced the
    // whole inventory.
    assert(SnapshotStore.stateOf(k).snapshots.last.residentFileEntries === 0)
    // An unfiltered scan materializes (and caches) the full inventory once;
    // subsequent filtered scans then use the cache, not chunk reads.
    assert(spark.table(t).count() === 8L)
    val before3 = MetadataLog.chunkLoads.get()
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE p = 7")
      .collect().head.getLong(0) === 1L)
    assert(MetadataLog.chunkLoads.get() === before3,
      "a resident snapshot must not re-read chunks")
  }

  test("summaries survive spec evolution: chunks are single-spec and a " +
      "retired-spec chunk prunes by its own identity ranges") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mc")
    val t = s"$cat.mc.evo"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (p INT, v STRING) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('write.manifest.chunk-entries'='2')")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO $t VALUES ($i, 'old$i')"))
    spark.sql(s"CALL $cat.system.evolve_partition_spec('mc.evo', 'bucket(2, v)')")
    (5 to 8).foreach(i => spark.sql(s"INSERT INTO $t VALUES ($i, 'new$i')"))
    SnapshotStore.tables.clear()
    val before = MetadataLog.chunkLoads.get()
    // p = 2: old-spec chunks prune to 1 by identity ranges; the bucket-spec
    // chunks carry no p summary and must all load (sound, not sharp).
    val rows = spark.sql(s"SELECT v FROM $t WHERE p = 2").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("old2"))
    val loaded = MetadataLog.chunkLoads.get() - before
    assert(loaded === 3L, s"1 old-spec chunk + 2 new-spec chunks, got $loaded")
  }
}
