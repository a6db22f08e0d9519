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
