package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Data-file formats + per-file column stats: parquet is the default data
  * plane (column-pruned decode, snappy, readable by any parquet reader),
  * `write.format=grf` keeps the UnsafeRow stream, mixed histories read per
  * file — and scans SKIP files whose (min, max, nullCount) cannot satisfy a
  * pushed data predicate, Iceberg's manifest-stats pruning. */
class DataFileFormatSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.fmt")
    spark.sql(s"DROP TABLE IF EXISTS $cat.fmt.$name")
    s"$cat.fmt.$name"
  }

  private def files(name: String): Vector[SnapshotStore.DataFile] =
    SnapshotStore.stateOf(SnapshotStore.keyOf(cat, Seq("fmt", name))).currentFiles

  /** The scan node's "(N rows, M files)" description after pushdown. */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    val m = """graft-snapshot scan \((\d+) rows, (\d+) files\)""".r
      .findFirstMatchIn(plan)
      .getOrElse(fail(s"no snapshot scan in plan:\n$plan"))
    m.group(2).toInt
  }

  test("parquet is the default format; files are plain parquet any reader opens") {
    val t = fresh("pq")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    val fs = files("pq")
    assert(fs.nonEmpty && fs.forall(_.path.endsWith(".parquet")), fs.map(_.path))
    // Interop: Spark's own parquet source reads the data files directly.
    val direct = spark.read.parquet(fs.map(_.path): _*).orderBy("id").collect().toSeq
    assert(direct === Seq(Row(1L, "a"), Row(2L, "b")))
  }

  test("write.format=grf keeps the UnsafeRow stream; mixed histories read per file") {
    val t = fresh("mixed")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.format'='grf')")
    spark.sql(s"INSERT INTO $t VALUES (1, 'grf')")
    assert(files("mixed").forall(_.path.endsWith(".grf")))
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('write.format'='parquet')")
    spark.sql(s"INSERT INTO $t VALUES (2, 'parquet')")
    val exts = files("mixed").map(_.path.split('.').last).sorted
    assert(exts === Vector("grf", "parquet"), exts)
    assert(spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, "grf"), Row(2L, "parquet")))
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('write.format'='orc')"))
    assert(e.getMessage.contains("write.format"), e.getMessage)
  }

  test("column stats skip files on data predicates — unpartitioned table, " +
      "fewer files opened, same answer") {
    val t = fresh("skip")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    // Three commits with DISJOINT id ranges → three files with tight stats.
    spark.sql(s"INSERT INTO $t SELECT id, concat('a', id) FROM range(0, 100, 1, 1)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('b', id) FROM range(100, 200, 1, 1)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('c', id) FROM range(200, 300, 1, 1)")
    assert(files("skip").size === 3)

    val pointQ = spark.sql(s"SELECT v FROM $t WHERE id = 150")
    assert(scannedFiles(pointQ) === 1, "point lookup must open one file")
    assert(pointQ.collect().toSeq === Seq(Row("b150")))

    val rangeQ = spark.sql(s"SELECT count(*) AS n FROM $t WHERE id >= 100")
    assert(scannedFiles(rangeQ) === 2, "range scan must skip the low file")
    assert(rangeQ.collect().head.getLong(0) === 200L)

    // String stats skip too.
    val strQ = spark.sql(s"SELECT count(*) AS n FROM $t WHERE v > 'c'")
    assert(scannedFiles(strQ) === 1, "string range must open one file")
    assert(strQ.collect().head.getLong(0) === 100L)

    // An unskippable predicate still opens everything and still answers.
    val allQ = spark.sql(s"SELECT count(*) AS n FROM $t WHERE id % 7 = 0")
    assert(scannedFiles(allQ) === 3)
    assert(allQ.collect().head.getLong(0) === 43L)
  }

  test("stats skipping narrows a copy-on-write rewrite's file set") {
    val t = fresh("cowskip")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t SELECT id, 'lo' FROM range(0, 50, 1, 1)")
    spark.sql(s"INSERT INTO $t SELECT id, 'hi' FROM range(50, 100, 1, 1)")
    val before = files("cowskip").map(_.path).toSet
    assert(before.size === 2)
    spark.sql(s"UPDATE $t SET v = 'HI' WHERE id >= 90")
    val after = files("cowskip").map(_.path).toSet
    // The low file survives BY PATH IDENTITY — it was never scanned or
    // rewritten; only the high file was replaced.
    assert((before intersect after).size === 1)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE v = 'HI'")
      .collect().head.getLong(0) === 10L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE v = 'lo'")
      .collect().head.getLong(0) === 50L)
  }

  test("null-count stats: IS NULL skips all-non-null files, IS NOT NULL " +
      "skips all-null files") {
    val t = fresh("nulls")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('x', id) FROM range(0, 10, 1, 1)")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(NULL AS STRING) FROM range(10, 20, 1, 1)")
    val isNull = spark.sql(s"SELECT count(*) AS n FROM $t WHERE v IS NULL")
    assert(scannedFiles(isNull) === 1)
    assert(isNull.collect().head.getLong(0) === 10L)
    val notNull = spark.sql(s"SELECT count(*) AS n FROM $t WHERE v IS NOT NULL")
    assert(scannedFiles(notNull) === 1)
    assert(notNull.collect().head.getLong(0) === 10L)
  }

  test("stats survive the metadata log: skipping still works after restart") {
    val t = fresh("durskip")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id FROM range(0, 100, 1, 1)")
    spark.sql(s"INSERT INTO $t SELECT id FROM range(100, 200, 1, 1)")
    SnapshotStore.tables.clear() // "restart"
    val q = spark.sql(s"SELECT count(*) AS n FROM $t WHERE id < 50")
    assert(scannedFiles(q) === 1)
    assert(q.collect().head.getLong(0) === 50L)
  }

  test("schema evolution reads through both formats: pre-ALTER files pad NULL") {
    for ((fmt, name) <- Seq("parquet" -> "evo_pq", "grf" -> "evo_grf")) {
      val t = fresh(name)
      spark.sql(s"CREATE TABLE $t (id BIGINT) " +
        s"TBLPROPERTIES ('write.format'='$fmt')")
      spark.sql(s"INSERT INTO $t VALUES (1)")
      spark.sql(s"ALTER TABLE $t ADD COLUMN v STRING")
      spark.sql(s"INSERT INTO $t VALUES (2, 'x')")
      assert(spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq ===
        Seq(Row(1L, null), Row(2L, "x")), fmt)
    }
  }
}
