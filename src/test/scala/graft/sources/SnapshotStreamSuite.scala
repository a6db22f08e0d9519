package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The versioned catalog as a streaming source: snapshot versions are the
  * offsets, micro-batches carry exactly the appended rows (history replay
  * on first start, incremental afterwards, exactly once), and rewrite
  * commits fail the stream loudly with a pointer at the CDF read.
  */
class SnapshotStreamSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def freshTable(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.stream")
    spark.sql(s"DROP TABLE IF EXISTS $cat.stream.$name")
    s"$cat.stream.$name"
  }

  test("appends arrive per commit, history replays once, no duplicates") {
    val t = freshTable("feed")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')") // pre-stream history
    val name = s"snap_stream_${System.nanoTime()}"
    val q = spark.readStream.table(t)
      .writeStream.format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 2L, "history must replay on first start")
      spark.sql(s"INSERT INTO $t VALUES (3, 'c')")
      spark.sql(s"INSERT INTO $t VALUES (4, 'd'), (5, 'e')")
      q.processAllAvailable()
      val got = spark.table(name).orderBy("id").collect().toSeq
      assert(got === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c"),
        Row(4L, "d"), Row(5L, "e")))
      // Re-processing with no new commits adds nothing (exactly once).
      q.processAllAvailable()
      assert(spark.table(name).count() === 5L)
    } finally q.stop()
  }

  test("a rewrite commit fails the stream loudly, pointing at the CDF read") {
    val t = freshTable("rw")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)")
    val name = s"snap_stream_${System.nanoTime()}"
    val q = spark.readStream.table(t)
      .writeStream.format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      spark.sql(s"DELETE FROM $t WHERE id = 1") // row-level rewrite commit
      val e = intercept[StreamingQueryException](q.processAllAvailable())
      val msg = e.getCause match { case null => e.getMessage; case c => c.getMessage }
      assert(msg.contains("rewrite") && msg.contains("ChangeDataFeed"),
        s"unexpected failure message: $msg")
    } finally q.stop()
  }

  test("streaming SINK: writeStream.toTable appends one snapshot per epoch, " +
    "and a replayed epoch is a no-op (exactly once)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = freshTable("sink")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-snap-sink").toString
    val q = input.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckpt).toTable(t)
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L), Row(2L), Row(3L)))
    // One snapshot per non-empty epoch; each is append-marked + time-travelable.
    val hist = SnapshotCatalog.history(cat, Seq("stream", "sink"))
    assert(hist.map(_._3) === Seq(2L, 3L), s"history: $hist")
    // Replay guard: re-committing an old epoch of the SAME query must not
    // double-append; a NEW query's epoch 0 commits normally (per-query
    // watermark, not per-table).
    val key = ("graft_snap" +: Seq("stream", "sink")).mkString("\u0000")
    val qid = SnapshotStore.stateOf(key).epochs.keys.head
    SnapshotStore.commitEpoch(key, qid, 0L, Vector.empty)
    assert(SnapshotCatalog.history(cat, Seq("stream", "sink")).size === hist.size)
    SnapshotStore.commitEpoch(key, "another-query", 0L, Vector.empty)
    assert(SnapshotCatalog.history(cat, Seq("stream", "sink")).size === hist.size + 1,
      "a new query's epoch 0 must commit, not read as a replay")
  }

  test("streaming sink on a PARTITIONED table routes each epoch's rows into " +
    "per-partition files") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = freshTable("psink")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region)")
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-psink").toString
    val q = input.toDF().toDF("id", "region").writeStream
      .option("checkpointLocation", ckpt).toTable(t)
    try {
      input.addData((1L, "a"), (2L, "b"), (3L, "a"))
      q.processAllAvailable()
      input.addData((4L, "b"))
      q.processAllAvailable()
    } finally q.stop()
    val k = SnapshotStore.keyOf("graft_snap", Seq("stream", "psink"))
    val v1Parts = SnapshotStore.filesAt(k, 1L)
      .map(_.partitionValues.map(String.valueOf(_))).toSet
    assert(v1Parts === Set(Seq("a"), Seq("b")),
      "epoch 1's rows must land in per-partition files")
    assert(spark.sql(s"SELECT id FROM $t WHERE region = 'b' ORDER BY id")
      .collect().toSeq === Seq(Row(2L), Row(4L)))
    // Partition-pruned read opens only region b's files.
    val plan = spark.sql(s"SELECT id FROM $t WHERE region = 'b'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("2 files"), plan)
  }

  test("epoch-watermark eviction is least-recently-ACTIVE, not first-inserted") {
    val t = freshTable("lru")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    val key = ("graft_snap" +: Seq("stream", "lru")).mkString("\u0000")
    // 128 distinct writers fill the watermark map in insertion order q0..q127.
    (0 until 128).foreach(i => SnapshotStore.commitEpoch(key, s"q$i", 0L, Vector.empty))
    // q0 — the FIRST-inserted — commits again: still active, must be protected.
    SnapshotStore.commitEpoch(key, "q0", 1L, Vector.empty)
    // A 129th writer forces one eviction: the least-recently-active is q1.
    SnapshotStore.commitEpoch(key, "q-new", 0L, Vector.empty)
    val epochs = SnapshotStore.stateOf(key).epochs
    assert(epochs.contains("q0"), "still-active q0 evicted (FIFO, not LRU)")
    assert(!epochs.contains("q1"), "expected idle q1 to be the evicted entry")
    // q0's replay guard survived: a replayed old epoch still no-ops.
    val before = SnapshotCatalog.history(cat, Seq("stream", "lru")).size
    SnapshotStore.commitEpoch(key, "q0", 1L, Vector.empty)
    assert(SnapshotCatalog.history(cat, Seq("stream", "lru")).size === before)
  }

  test("the full loop: stream INTO the catalog, stream OUT, maintain a view") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = freshTable("loop_src")
    val mv = freshTable("loop_mv")
    spark.sql(s"CREATE TABLE $src (grp STRING, amt DOUBLE)")
    spark.sql(s"CREATE TABLE $mv (group_key STRING, n_rows BIGINT, total DECIMAL(38,4))")

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Double)]
    val inCkpt = java.nio.file.Files.createTempDirectory("graft-loop-in").toString
    val qIn = input.toDF().toDF("grp", "amt").writeStream
      .option("checkpointLocation", inCkpt).toTable(src)
    // Reading the stream of appends back OUT of the catalog, folding each
    // micro-batch into the stored view by MERGE — commit → feed → refresh
    // with no batch job anywhere.
    val qOut = spark.readStream.table(src).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        import org.apache.spark.sql.functions._
        val deltas = batch.groupBy(col("grp").as("group_key"))
          .agg(count(lit(1)).as("dn"),
            sum(col("amt").cast("decimal(18,4)")).cast("decimal(38,4)").as("dx"))
        graft.operators.IncrementalMaintenance.maintainInto(
          batch.sparkSession, mv, deltas)
      }.start()
    try {
      input.addData(("a", 1.5), ("b", 2.0))
      qIn.processAllAvailable()
      qOut.processAllAvailable()
      input.addData(("a", 0.5))
      qIn.processAllAvailable()
      qOut.processAllAvailable()
      spark.catalog.refreshTable(mv)
      val got = spark.sql(
        s"SELECT group_key, n_rows, CAST(total AS DOUBLE) AS total FROM $mv ORDER BY group_key")
        .collect().toSeq
      assert(got === Seq(Row("a", 2L, 2.0), Row("b", 1L, 2.0)))
    } finally { qIn.stop(); qOut.stop() }
  }

  test("maxVersionsPerTrigger bounds each micro-batch to N commits " +
    "(no unbounded first-batch history replay)") {
    val t = freshTable("paced")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    (1 to 5).foreach(i => spark.sql(s"INSERT INTO $t VALUES ($i)")) // 5 commits
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "2")
      .table(t)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        batchSizes.synchronized { batchSizes += n }
        ()
      }.start()
    try {
      q.processAllAvailable()
      val sizes = batchSizes.synchronized(batchSizes.filter(_ > 0).toSeq)
      // 5 one-row commits under a 2-commit cap: paced as 2, 2, 1 — never
      // the whole history at once.
      assert(sizes === Seq(2L, 2L, 1L), s"batch sizes: $sizes")
    } finally q.stop()
  }

  test("interleave: a sink epoch landing MID-MERGE is a loud conflict — " +
    "no lost update, and the rerun MERGE sees the epoch's rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = freshTable("ilv")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'base')")
    // A real streaming sink feeds the table first (epoch 0)…
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ilv").toString
    val q = input.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckpt).toTable(t)
    try {
      input.addData((2L, "epoch"))
      q.processAllAvailable()
    } finally q.stop()
    // …then a batch MERGE races the sink's NEXT epoch: the MERGE's source
    // fires the epoch commit (the sink's exact commit path) from a task,
    // i.e. strictly AFTER the rewrite captured its base version at scan
    // planning and strictly BEFORE its replacing write commits. replay
    // dedup makes the multi-task UDF commit exactly one version.
    val key = SnapshotStore.keyOf("graft_snap", Seq("stream", "ilv"))
    val race = org.apache.spark.sql.functions.udf { (id: Long) =>
      SnapshotStore.commitEpoch(key, "racing-sink", 0L, Vector.empty); id
    }
    spark.udf.register("graft_race_commit", race)
    val merge =
      s"""MERGE INTO $t u
         |USING (SELECT graft_race_commit(CAST(1 AS BIGINT)) AS id, 'merged' AS v) s
         |ON u.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin
    val e = intercept[Exception](spark.sql(merge))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(msgs.contains("concurrent commit") && msgs.contains("rerun"), msgs)
    // No lost update: the base row is un-merged, the sink's row survived,
    // and the racing epoch's version is in the history.
    assert(spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "base"), Row(2L, "epoch")))
    // The rerun (Iceberg's documented remedy, quoted in the error) now
    // reads the post-epoch base and commits cleanly.
    spark.sql(merge)
    assert(spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "merged"), Row(2L, "epoch")))
  }

  test("streamed aggregation: the catalog feeds a stateful query") {
    import spark.implicits._
    val t = freshTable("agg")
    spark.sql(s"CREATE TABLE $t (k STRING, n BIGINT)")
    val name = s"snap_stream_${System.nanoTime()}"
    val q = spark.readStream.table(t)
      .groupBy("k").sum("n")
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      spark.sql(s"INSERT INTO $t VALUES ('a', 1), ('b', 10)")
      q.processAllAvailable()
      spark.sql(s"INSERT INTO $t VALUES ('a', 2)")
      q.processAllAvailable()
      val got = spark.table(name).as[(String, Long)].collect().toMap
      assert(got === Map("a" -> 3L, "b" -> 10L))
    } finally q.stop()
  }
}
