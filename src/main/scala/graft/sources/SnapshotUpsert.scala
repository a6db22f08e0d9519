package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/** STREAMING UPSERT into a versioned snapshot-catalog table WITHOUT
  * reading the target — Iceberg v2's equality-delete pattern: each batch
  * commits, as ONE merge-on-read delta snapshot, (a) its rows as new data
  * files and (b) its keys as an equality-delete file. The delete applies
  * to every data file with a LOWER sequence number, so older rows with the
  * same key die and the batch's own rows (equal seq) survive — MERGE
  * semantics at append cost, the shape a CDC upsert sink needs when the
  * target is 100 TB and a per-batch target read would dominate the
  * trigger interval. Reads pay the key-probe until `rewrite_data_files`
  * folds the deletes (see [[SnapshotStore.DeleteFile]]).
  *
  * Exactly-once: pass `sinkId`/`epochId` (e.g. from `foreachBatch`) and a
  * replayed epoch no-ops via the table's durable epoch watermark, its
  * already-written files deleted as orphans. */
object SnapshotUpsert {

  /** Upsert `batch` into `table` (`catalog.db.t`) by `keyCols`. The batch
    * must carry exactly the table's columns (any order) and UNIQUE keys —
    * duplicate keys in one batch have no well-defined winner, exactly why
    * SQL MERGE rejects multiple matches. */
  def upsertBatch(table: String, batch: DataFrame, keyCols: Seq[String],
      sinkId: String = "", epochId: Long = -1L): Unit = {
    val parts = table.split('.').toSeq
    require(parts.length >= 3,
      s"upsert needs a catalog-qualified table (catalog.db.t), got '$table'")
    val k = SnapshotStore.keyOf(parts.head, parts.tail)
    val st = SnapshotStore.stateOf(k)
    val tableCols = st.schema.fieldNames.toSeq
    require(batch.columns.toSet == tableCols.toSet,
      s"upsert batch columns ${batch.columns.mkString("(", ", ", ")")} must " +
        s"be exactly the table's ${tableCols.mkString("(", ", ", ")")}")
    keyCols.foreach(c => require(tableCols.contains(c),
      s"key column $c is not a table column"))
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val aligned = batch.select(tableCols.map(col): _*)
    st.schema.fields.zip(aligned.schema.fields).foreach { case (t, b) =>
      require(t.dataType == b.dataType,
        s"column ${t.name}: batch type ${b.dataType} != table type ${t.dataType}")
    }
    // PIN the batch: the duplicate-key check is a separate job and the
    // cache saves its full recompute. Correctness does NOT lean on the
    // cache — data files and the equality-delete key file are written in
    // ONE pass over ONE iterator below, so the keys can never diverge from
    // the rows actually appended, even if a lost cached partition
    // recomputes differently from a non-deterministic source.
    val pinned = aligned.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dup = pinned.groupBy(keyCols.map(col): _*).count()
        .filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"upsert batch has duplicate keys (e.g. ${dup.headOption.fold("")(_.toString)}) " +
          "— a multi-match upsert has no well-defined winner; dedup upstream")

      val keyIds = keyCols.map(c => FieldIds.requireId(st.schema, c))
      val conf = RowFiles.sessionConf()
      val props = st.properties
      val writeSchema = st.schema
      val writeCols = FieldIds.writeColsFor(st.schema, writeSchema)
      val partitionCols = st.partitionCols
      val transforms = st.partitionTransforms
      // The spec the partition routing above is SHAPED by — stamped into
      // the descriptors; the commit validates it (evolution race guard).
      val specId = st.currentSpecId
      val dataDir = st.dataDir
      val tag = java.util.UUID.randomUUID.toString.take(8)

      // Key columns, canonically named k0..kn in key order (rename-proof:
      // the manifest records the key FIELD IDS; readers resolve from them).
      val keySchema = StructType(keyCols.zipWithIndex.map { case (c, i) =>
        StructField(s"k$i", st.schema(c).dataType, nullable = true)
      })
      val keyOrds = keyCols.map(tableCols.indexOf).toArray
      val ext = DataFiles.extensionOf(DataFiles.formatOf(props))

      // ONE pass per task writes BOTH the data files and that task's
      // equality-delete key file from the SAME rows — a retried task
      // re-derives both together, so keys and appends cannot diverge.
      // The target is never opened. File names carry a per-ATTEMPT uuid:
      // a task retry or speculative attempt must never collide with a
      // failed attempt's partial file on the create-exclusive open (the
      // retry's files win at collect time; orphans are GC'd).
      val results = pinned.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val attempt = java.util.UUID.randomUUID.toString.take(8)
          val w = MemWriters.writer(writeSchema, partitionCols, dataDir,
            s"ups-$tag-p$pid-$attempt", conf.value, props, writeCols, transforms,
            specId)
          val keyPath = s"$dataDir/ups-$tag-eq-p$pid-$attempt$ext"
          val keyProj = UnsafeProjection.create(
            keyOrds.toIndexedSeq.map(o =>
              org.apache.spark.sql.catalyst.expressions.BoundReference(
                o, writeSchema.fields(o).dataType, nullable = true)))
          val kw = DataFiles.writer(keyPath, keySchema, conf.value, props)
          var n = 0L
          it.foreach { r => w.write(r); kw.write(keyProj(r)); n += 1 }
          val keyMeta = kw.close()
          Iterator.single((w.commit().asInstanceOf[MemCommitMessage].files,
            SnapshotStore.DeleteFile(keyPath, "", n, "eq", keyIds,
              stats = SnapshotUpsert.keyStats(keyMeta, keyIds))))
        }
      }.collect().toVector

      val files = results.flatMap(_._1)
      val eqFiles = results.map(_._2)
      if (files.isEmpty) return // empty batch: nothing to delete or add

      if (sinkId.nonEmpty && epochId >= 0L)
        SnapshotStore.commitEpochDelta(k, sinkId, epochId, files, eqFiles)
      else
        SnapshotStore.commitDelta(k, files, eqFiles, expectedBase = None)
    } finally pinned.unpersist()
  }

  /** Map a key file's name-keyed stats ("k0".."kn", write order) onto the
    * key FIELD IDS — the delete-file manifest stats range pruning keys on
    * ([[SnapshotStore.eqApplies]]). */
  private[sources] def keyStats(meta: DataFiles.FileMeta,
      keyIds: Seq[Int]): Map[Int, SnapshotStore.ColStats] =
    meta.stats.flatMap { case (name, cs) =>
      name.stripPrefix("k").toIntOption.collect {
        // ndv AND length stats stripped: delete manifests serialize
        // (min, max, nulls) only, and any memory-only extra would desync
        // the restart round-trip.
        case i if i < keyIds.length =>
          keyIds(i) -> cs.copy(ndv = null, lenSum = -1L, lenMax = -1L)
      }
    }

  /** A `writeStream.foreachBatch` body: epoch-deduped upserts keyed by
    * `sinkId` (pick one stable id per logical sink+checkpoint). */
  def upserter(table: String, keyCols: Seq[String],
      sinkId: String): (DataFrame, Long) => Unit =
    (batch, epochId) => upsertBatch(table, batch, keyCols, sinkId, epochId)

  /** GENERALIZED key-replace: one atomic merge-on-read delta commit that
    * (a) equality-DELETES every existing row whose key tuple is in
    * `deleteKeys` ∪ keys(`rows`), and (b) appends `rows` — the maintenance
    * primitive an incremental view needs ("retract these keys, restate
    * those"), at append cost: the target is never read. Unlike
    * [[upsertBatch]], `rows` may carry SEVERAL rows per key (replace-all
    * semantics, not upsert-one), and `rows` may be empty (pure retraction).
    * Epoch-guarded exactly like [[upsertBatch]]. */
  def replaceByKey(table: String, rows: DataFrame, deleteKeys: DataFrame,
      keyCols: Seq[String], sinkId: String = "", epochId: Long = -1L): Unit = {
    val parts = table.split('.').toSeq
    require(parts.length >= 3,
      s"replaceByKey needs a catalog-qualified table (catalog.db.t), got '$table'")
    val k = SnapshotStore.keyOf(parts.head, parts.tail)
    val st = SnapshotStore.stateOf(k)
    val tableCols = st.schema.fieldNames.toSeq
    require(rows.columns.toSet == tableCols.toSet,
      s"replaceByKey rows columns ${rows.columns.mkString("(", ", ", ")")} " +
        s"must be exactly the table's ${tableCols.mkString("(", ", ", ")")}")
    require(keyCols.nonEmpty && keyCols.forall(tableCols.contains),
      s"key columns ${keyCols.mkString(", ")} must be table columns")
    require(deleteKeys.columns.toSet == keyCols.toSet,
      s"deleteKeys columns ${deleteKeys.columns.mkString("(", ", ", ")")} " +
        s"must be exactly the keys ${keyCols.mkString("(", ", ", ")")}")
    val aligned = rows.select(tableCols.map(col): _*)
    st.schema.fields.zip(aligned.schema.fields).foreach { case (t, b) =>
      require(t.dataType == b.dataType,
        s"column ${t.name}: rows type ${b.dataType} != table type ${t.dataType}")
    }
    val keyIds = keyCols.map(c => FieldIds.requireId(st.schema, c))
    val conf = RowFiles.sessionConf()
    val props = st.properties
    val writeSchema = st.schema
    val writeCols = FieldIds.writeColsFor(st.schema, writeSchema)
    val partitionCols = st.partitionCols
    val transforms = st.partitionTransforms
    // The spec the partition routing above is SHAPED by — stamped into the
    // descriptors; the commit validates it (spec-evolution race guard).
    val specId = st.currentSpecId
    val dataDir = st.dataDir
    val tag = java.util.UUID.randomUUID.toString.take(8)
    val keySchema = StructType(keyCols.zipWithIndex.map { case (c, i) =>
      StructField(s"k$i", st.schema(c).dataType, nullable = true)
    })
    val keyOrds = keyCols.map(tableCols.indexOf).toArray
    val ext = DataFiles.extensionOf(DataFiles.formatOf(props))

    // One pass per task over `rows`: data files + that task's key file
    // (same no-divergence argument as upsertBatch). The rows pass and the
    // retraction-key pass below are INDEPENDENT Spark jobs feeding one
    // atomic commit — run them concurrently (guide §2.6: overlap
    // independent jobs) so the small retraction write hides inside the
    // restate write's runtime; either failure aborts before the commit.
    def rowsPass(): Vector[(Array[SnapshotStore.DataFile], SnapshotStore.DeleteFile)] =
      aligned.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val attempt = java.util.UUID.randomUUID.toString.take(8)
          val w = MemWriters.writer(writeSchema, partitionCols, dataDir,
            s"rpl-$tag-p$pid-$attempt", conf.value, props, writeCols, transforms,
            specId)
          val keyPath = s"$dataDir/rpl-$tag-eq-p$pid-$attempt$ext"
          val keyProj = UnsafeProjection.create(
            keyOrds.toIndexedSeq.map(o =>
              org.apache.spark.sql.catalyst.expressions.BoundReference(
                o, writeSchema.fields(o).dataType, nullable = true)))
          val kw = DataFiles.writer(keyPath, keySchema, conf.value, props)
          var n = 0L
          it.foreach { r => w.write(r); kw.write(keyProj(r)); n += 1 }
          val keyMeta = kw.close()
          Iterator.single((w.commit().asInstanceOf[MemCommitMessage].files,
            SnapshotStore.DeleteFile(keyPath, "", n, "eq", keyIds,
              stats = SnapshotUpsert.keyStats(keyMeta, keyIds))))
        }
      }.collect().toVector

    // The retraction keys, as their own equality-delete files.
    def deletesPass(): Vector[SnapshotStore.DeleteFile] = {
      val delAligned = deleteKeys.select(keyCols.map(col): _*)
        .toDF(keySchema.fieldNames: _*)
      delAligned.queryExecution.toRdd
        .mapPartitionsWithIndex { (pid, it) =>
          if (it.isEmpty) Iterator.empty
          else {
            val attempt = java.util.UUID.randomUUID.toString.take(8)
            val path = s"$dataDir/rpl-$tag-del-p$pid-$attempt$ext"
            val proj = UnsafeProjection.create(keySchema)
            val w = DataFiles.writer(path, keySchema, conf.value, props)
            var n = 0L
            it.foreach { r => w.write(proj(r)); n += 1 }
            val meta = w.close()
            Iterator.single(SnapshotStore.DeleteFile(path, "", n, "eq", keyIds,
              stats = SnapshotUpsert.keyStats(meta, keyIds)))
          }
        }.collect().toVector
    }
    val (results, extraDeletes) = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      val fr = Future(rowsPass())
      val fd = Future(deletesPass())
      val rr = scala.util.Try(Await.result(fr, Duration.Inf))
      val rd = scala.util.Try(Await.result(fd, Duration.Inf))
      (rr.get, rd.get)
    }

    val files = results.flatMap(_._1)
    val eqFiles = results.map(_._2) ++ extraDeletes
    if (files.isEmpty && eqFiles.isEmpty) return // nothing to commit
    if (sinkId.nonEmpty && epochId >= 0L)
      SnapshotStore.commitEpochDelta(k, sinkId, epochId, files, eqFiles)
    else
      SnapshotStore.commitDelta(k, files, eqFiles, expectedBase = None)
  }

  /** Epoch-guarded TRUNCATE-OVERWRITE of `table` with `batch` — the
    * exactly-once building block for maintained state a trigger REWRITES
    * (e.g. an incremental connected-components assignment). A replayed
    * epoch no-ops via the table's durable per-query watermark and its
    * already-written files are deleted as orphans, so the pre-epoch
    * snapshot remains the replay's readable base. */
  def overwriteEpoch(table: String, batch: DataFrame, sinkId: String,
      epochId: Long): Unit = {
    require(sinkId.nonEmpty && epochId >= 0L,
      "overwriteEpoch needs a sink id and a non-negative epoch")
    val parts = table.split('.').toSeq
    require(parts.length >= 3,
      s"overwrite needs a catalog-qualified table (catalog.db.t), got '$table'")
    val k = SnapshotStore.keyOf(parts.head, parts.tail)
    val st = SnapshotStore.stateOf(k)
    val tableCols = st.schema.fieldNames.toSeq
    require(batch.columns.toSet == tableCols.toSet,
      s"batch columns ${batch.columns.mkString("(", ", ", ")")} must be " +
        s"exactly the table's ${tableCols.mkString("(", ", ", ")")}")
    val aligned = batch.select(tableCols.map(col): _*)
    val conf = RowFiles.sessionConf()
    val props = st.properties
    val writeSchema = st.schema
    val writeCols = FieldIds.writeColsFor(st.schema, writeSchema)
    val partitionCols = st.partitionCols
    val transforms = st.partitionTransforms
    // The spec the partition routing above is SHAPED by — stamped into the
    // descriptors; the commit validates it (spec-evolution race guard).
    val specId = st.currentSpecId
    val dataDir = st.dataDir
    val tag = java.util.UUID.randomUUID.toString.take(8)
    val files = aligned.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val attempt = java.util.UUID.randomUUID.toString.take(8)
        val w = MemWriters.writer(writeSchema, partitionCols, dataDir,
          s"ovr-$tag-p$pid-$attempt", conf.value, props, writeCols, transforms,
          specId)
        it.foreach(w.write)
        Iterator.single(w.commit().asInstanceOf[MemCommitMessage].files)
      }
    }.collect().flatten.toVector
    SnapshotStore.commitEpochReplace(k, sinkId, epochId, files)
  }

  /** Epoch-guarded plain APPEND of `batch` into `table` — the exactly-once
    * building block a `foreachBatch` body needs when it maintains a table
    * incrementally (a retried epoch must not double-append; the table's
    * durable per-query epoch watermark swallows the replay and the
    * replay's files are deleted as orphans). Column handling mirrors
    * [[upsertBatch]]. */
  def appendEpoch(table: String, batch: DataFrame, sinkId: String,
      epochId: Long): Unit = {
    require(sinkId.nonEmpty && epochId >= 0L,
      "appendEpoch needs a sink id and a non-negative epoch")
    val parts = table.split('.').toSeq
    require(parts.length >= 3,
      s"append needs a catalog-qualified table (catalog.db.t), got '$table'")
    val k = SnapshotStore.keyOf(parts.head, parts.tail)
    val st = SnapshotStore.stateOf(k)
    val tableCols = st.schema.fieldNames.toSeq
    require(batch.columns.toSet == tableCols.toSet,
      s"batch columns ${batch.columns.mkString("(", ", ", ")")} must be " +
        s"exactly the table's ${tableCols.mkString("(", ", ", ")")}")
    val aligned = batch.select(tableCols.map(col): _*)
    val conf = RowFiles.sessionConf()
    val props = st.properties
    val writeSchema = st.schema
    val writeCols = FieldIds.writeColsFor(st.schema, writeSchema)
    val partitionCols = st.partitionCols
    val transforms = st.partitionTransforms
    // The spec the partition routing above is SHAPED by — stamped into the
    // descriptors; the commit validates it (spec-evolution race guard).
    val specId = st.currentSpecId
    val dataDir = st.dataDir
    val tag = java.util.UUID.randomUUID.toString.take(8)
    val files = aligned.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        // Per-attempt uuid: retries must not collide on create-exclusive.
        val attempt = java.util.UUID.randomUUID.toString.take(8)
        val w = MemWriters.writer(writeSchema, partitionCols, dataDir,
          s"app-$tag-p$pid-$attempt", conf.value, props, writeCols, transforms,
          specId)
        it.foreach(w.write)
        Iterator.single(w.commit().asInstanceOf[MemCommitMessage].files)
      }
    }.collect().flatten.toVector
    SnapshotStore.commitEpoch(k, sinkId, epochId, files)
  }
}
