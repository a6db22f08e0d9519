package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change-data-feed over a versioned catalog table: the row-level changes
  * between two snapshot versions, one row per changed key per commit, tagged
  * `_change_type` (INSERT / UPDATE / DELETE) and `_commit_version`, with
  * `old_<col>` / `new_<col>` pre/post images of every non-key column — the
  * incremental-read surface lakehouse tables expose (Iceberg's incremental
  * scan, Delta's `table_changes`), computed here against the engine's
  * versioned V2 catalog (`VERSION AS OF` reads of
  * [[graft.sources.SnapshotCatalog]] tables, or any other time-travelable
  * catalog).
  *
  * The reference provisions Iceberg `format_version: 2` tables
  * (`create_iceberg_tables.py:121-128`, `customers.yml:4`) precisely so that
  * downstream consumers can read row-level deltas instead of re-scanning
  * snapshots; this operator is that consumer-side read.
  *
  * SCALE CONTRACT: each adjacent-version diff is ONE full-outer equi-join on
  * the key columns — it shuffles both snapshots by key and nothing else, so
  * cost is O(|prev| + |cur|) per commit step with no driver materialization.
  * That is the engine-agnostic fallback plan; a file-backed lakehouse catalog
  * short-circuits it from manifests/delete files without touching unchanged
  * data files, and swapping that in changes no caller. Downstream consumers
  * (incremental refresh m03, SCD2 m02) take this feed as their change batch,
  * closing the loop: commit → CDF → incremental maintenance.
  */
object ChangeDataFeed {

  /** Changes from `fromVersion` (exclusive) to `toVersion` (inclusive) of
    * `table`, a catalog-qualified name supporting `VERSION AS OF`.
    * `fromVersion = 0` diffs against the empty just-created table, so the
    * feed replays the table's whole history as changes.
    *
    * UPDATE rows are emitted only when some non-key column actually changed
    * (null-safe compare) — a copy-on-write rewrite that carries a row over
    * unmodified is NOT a change, exactly like Iceberg/Delta CDF.
    */
  def tableChanges(spark: SparkSession, table: String, keyCols: Seq[String],
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(0 <= fromVersion && fromVersion < toVersion,
      s"need 0 <= fromVersion < toVersion, got [$fromVersion, $toVersion]")
    (fromVersion + 1 to toVersion).map { v =>
      diff(spark.sql(s"SELECT * FROM $table VERSION AS OF ${v - 1}"),
        spark.sql(s"SELECT * FROM $table VERSION AS OF $v"),
        keyCols, commitVersion = v)
    }.reduce(_.unionAll(_))
  }

  /** The change set `prev → cur` of any two same-schema relations: one
    * distributed full-outer key join, no catalog required — the building
    * block `tableChanges` folds per commit, and the standalone form for
    * diffing parquet snapshots, table dumps, or staging vs production. */
  def diff(prevRel: DataFrame, curRel: DataFrame, keyCols: Seq[String],
      commitVersion: Long): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val v = commitVersion
    // Presence markers instead of key-null tests: keys are typically non-null,
    // but a marker is correct even when a key column is legitimately null.
    val prev = prevRel.withColumn("_in_prev", lit(1))
    val cur = curRel.withColumn("_in_cur", lit(1))
    val dataCols = prev.columns.filterNot(c => keyCols.contains(c) || c == "_in_prev")

    val p = prev.as("p")
    val c = cur.as("c")
    val joinCond = keyCols.map(k => col(s"p.$k") <=> col(s"c.$k")).reduce(_ && _)
    val anyChanged = dataCols
      .map(d => !(col(s"p.$d") <=> col(s"c.$d")))
      .reduceOption(_ || _)
      .getOrElse(lit(false)) // key-only table: only INSERT/DELETE are possible

    val changeType = when(col("p._in_prev").isNull, "INSERT")
      .when(col("c._in_cur").isNull, "DELETE")
      .when(anyChanged, "UPDATE") // otherwise null: unchanged carry-over row

    val keyOut = keyCols.map(k => coalesce(col(s"c.$k"), col(s"p.$k")).as(k))
    val imageOut = dataCols.flatMap(d =>
      Seq(col(s"p.$d").as(s"old_$d"), col(s"c.$d").as(s"new_$d")))

    p.join(c, joinCond, "full_outer")
      .withColumn("_change_type", changeType)
      .filter(col("_change_type").isNotNull)
      .select(keyOut ++ Seq(col("_change_type"), lit(v).as("_commit_version")) ++
        imageOut: _*)
  }
}
