package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.CreateTableWriter
import org.apache.spark.sql.functions.{bucket, col}

/** Write helpers for the engine's persisted ANN/LSH store tables, hosted on
  * the SNAPSHOT CATALOG (`graft_snap.…` 3-part names) instead of V1
  * session-catalog bucketed parquet.
  *
  * Why (optimization round 20, guide §6): every V1 bucketed `saveAsTable`
  * append paid a fixed ~1.4 s of directory listing + Hadoop commit protocol
  * + Hive-shaped catalog update at fixture scale — the measured top cost of
  * the three biggest bench lanes (p04/p05/p06 spend their wall in
  * per-trigger store appends). The snapshot catalog's write path is a
  * task-side grf/parquet file write plus ONE driver-side manifest commit
  * (no listing — manifest metadata is the point of a table format at
  * 100 TB), and its scans report `KeyGroupedPartitioning` for the bucket
  * transform (`read.preserve-partitioning`), so probe joins keep the
  * store side shuffle-free exactly as the V1 bucket spec did.
  *
  * The old per-process tmp-dir discipline (pid-suffixed store paths, rmrf
  * of managed dirs) is inherited for free: the snapshot catalog's default
  * warehouse is already per-process, so concurrent driver JVMs cannot drop
  * files under each other's scans, and a fresh JVM starts from an empty
  * catalog with no stale-directory collisions.
  */
object StoreTables {

  /** CREATE NAMESPACE IF NOT EXISTS for a 3-part table name. */
  def ensureNamespace(s: SparkSession, table: String): Unit = {
    val parts = table.split('.')
    require(parts.length == 3,
      s"store tables live on the snapshot catalog (<cat>.<ns>.<tbl>): $table")
    s.sql(s"CREATE NAMESPACE IF NOT EXISTS ${parts(0)}.${parts(1)}")
    ()
  }

  private def createWriter(df: DataFrame, table: String,
      bucketSpec: Option[(Int, String)],
      sortOrder: Option[String]): CreateTableWriter[Row] = {
    var w: CreateTableWriter[Row] = df.writeTo(table)
    sortOrder.foreach(o => w = w.tableProperty("write.sort-order", o))
    bucketSpec.foreach { case (n, c) =>
      // Report the bucket layout to the planner so probe joins co-locate
      // on the store side without an Exchange (storage-partitioned join).
      w = w.tableProperty("read.preserve-partitioning", "true")
        .partitionedBy(bucket(n, col(c)))
    }
    w
  }

  /** Append `df`, creating the table with the given layout on first use
    * (CTAS). Append-only store tables (streaming ingest, ledgers, pairs
    * logs) go through here; the create/append split is per-table and all
    * concurrent callers target distinct tables, so the exists-check needs
    * no lock. */
  def append(df: DataFrame, table: String,
      bucketSpec: Option[(Int, String)] = None,
      sortOrder: Option[String] = None): Unit = {
    val s = df.sparkSession
    if (!s.catalog.tableExists(table)) {
      ensureNamespace(s, table)
      createWriter(df, table, bucketSpec, sortOrder).create()
    } else df.writeTo(table).append()
  }

  /** Drop-and-rebuild with the given layout — the bulk store builds. */
  def replace(df: DataFrame, table: String,
      bucketSpec: Option[(Int, String)] = None,
      sortOrder: Option[String] = None): Unit = {
    ensureNamespace(df.sparkSession, table)
    createWriter(df, table, bucketSpec, sortOrder).createOrReplace()
  }
}
