package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** PARTITION-SCOPED compaction — `rewrite_data_files(table, where =>
  * '<pred>')`: at 100 TB nobody compacts the whole table; the nightly
  * job compacts yesterday's partition. The predicate must be decidable
  * from identity-partition values; selected partitions' files reshape
  * into one file per partition, every OTHER partition's files survive
  * BY PATH IDENTITY, the commit is the same content-neutral `replace`
  * the change feed skips, and NULL-partition rows are untouched (the
  * retire set and the re-insert set agree exactly). */
class RewriteWhereSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.rw")
    spark.sql(s"DROP TABLE IF EXISTS $cat.rw.$name")
    s"$cat.rw.$name"
  }
  private def files(name: String): Vector[SnapshotStore.DataFile] =
    SnapshotStore.stateOf(SnapshotStore.keyOf(cat, Seq("rw", name)))
      .currentFiles

  test("where-scoped rewrite compacts ONE partition; others survive by " +
      "path identity; answers unchanged; the change feed skips it") {
    val t = fresh("scoped")
    spark.sql(s"CREATE TABLE $t (p INT, v BIGINT) PARTITIONED BY (p)")
    // Three commits → 3 small files PER partition.
    for (i <- 0 until 3)
      spark.sql(s"INSERT INTO $t SELECT p, id * 10 + $i AS v FROM " +
        "range(0, 20, 1, 1) LATERAL VIEW explode(array(1, 2, 3)) AS p")
    val before = files("scoped")
    assert(before.count(_.partitionValues == Seq(1)) === 3)
    val expect = spark.sql(s"SELECT p, v FROM $t ORDER BY p, v").collect().toSeq

    val res = spark.sql(s"CALL $cat.system.rewrite_data_files('rw.scoped', " +
      "1000000, where => 'p = 1')").collect().head
    val after = files("scoped")
    assert(after.count(_.partitionValues == Seq(1)) === 1,
      "the selected partition must compact to one file")
    // Untouched partitions: the SAME file paths (never rewritten).
    val beforeOther = before.filter(_.partitionValues != Seq(1)).map(_.path).toSet
    val afterOther = after.filter(_.partitionValues != Seq(1)).map(_.path).toSet
    assert(beforeOther === afterOther,
      "non-selected partitions must survive by path identity")
    assert(res.getInt(0) === 9 && res.getInt(1) === 7)
    assert(spark.sql(s"SELECT p, v FROM $t ORDER BY p, v").collect().toSeq
      === expect, "a compaction must not change the answer")
    // The commit is a content-neutral replace: history names it, the
    // change feed has nothing in its range.
    val top = spark.sql(s"SELECT operation FROM $t.history " +
      "ORDER BY version DESC LIMIT 1").collect().head.getString(0)
    assert(top === "replace", top)
    val v = spark.sql(s"SELECT max(version) FROM $t.history")
      .collect().head.getLong(0)
    assert(spark.read.option("startingVersion", v.toString)
      .table(s"$t.changes").isEmpty, "the change feed must skip a replace")
  }

  test("NULL-partition rows are untouched: the predicate evaluates NULL " +
      "on them — neither filtered in nor retired") {
    val t = fresh("nullpart")
    spark.sql(s"CREATE TABLE $t (p INT, v BIGINT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10), (1, 11)")
    spark.sql(s"INSERT INTO $t VALUES (NULL, 90), (NULL, 91)")
    spark.sql(s"INSERT INTO $t VALUES (1, 12)")
    val nullFiles = files("nullpart")
      .filter(_.partitionValues == Seq(null)).map(_.path).toSet
    assert(nullFiles.nonEmpty)
    spark.sql(s"CALL $cat.system.rewrite_data_files('rw.nullpart', " +
      "1000000, where => 'p = 1')")
    assert(files("nullpart").filter(_.partitionValues == Seq(null))
      .map(_.path).toSet === nullFiles,
      "NULL-partition files must survive by path identity")
    assert(spark.sql(s"SELECT v FROM $t WHERE p IS NULL ORDER BY v")
      .collect().toSeq === Seq(Row(90L), Row(91L)))
    assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) === 5L)
  }

  test("where-scoped rewrite restores the declared sort order inside the " +
      "selected partition (stamped files)") {
    val t = fresh("sorted")
    spark.sql(s"""CREATE TABLE $t (p INT, k BIGINT) PARTITIONED BY (p)
      TBLPROPERTIES ('write.sort-order' = 'k')""")
    spark.sql(s"INSERT INTO $t SELECT 1 AS p, id AS k FROM range(0, 100)")
    spark.sql(s"INSERT INTO $t SELECT 1 AS p, id + 100 AS k FROM range(0, 100)")
    spark.sql(s"CALL $cat.system.rewrite_data_files('rw.sorted', " +
      "1000000, where => 'p = 1')")
    val fs = files("sorted").filter(_.partitionValues == Seq(1))
    assert(fs.size === 1 && fs.head.sortKey.nonEmpty,
      s"the compacted file must carry the sort stamp: $fs")
  }

  test("merge-on-read deletes: a scoped rewrite APPLIES and sheds the " +
      "selected partition's delete structures; other partitions keep theirs") {
    val t = fresh("mor")
    spark.sql(s"""CREATE TABLE $t (p INT, v BIGINT) PARTITIONED BY (p)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""")
    spark.sql(s"INSERT INTO $t SELECT p, id AS v FROM range(0, 100, 1, 1) " +
      "LATERAL VIEW explode(array(1, 2)) AS p")
    spark.sql(s"DELETE FROM $t WHERE p = 1 AND v < 10")
    spark.sql(s"DELETE FROM $t WHERE p = 2 AND v < 5")
    def deletesByPart: Map[Any, Int] = {
      val st = SnapshotStore.stateOf(SnapshotStore.keyOf(cat, Seq("rw", "mor")))
      val partOf = st.currentFiles.map(f => f.path -> f.partitionValues.head).toMap
      st.currentDeletes.groupBy(d => partOf(d.dataPath)).map { case (p, ds) => p -> ds.size }
    }
    assert(deletesByPart.keySet === Set(1, 2), s"fixture: $deletesByPart")
    val expect = spark.sql(s"SELECT p, v FROM $t ORDER BY p, v").collect().toSeq
    spark.sql(s"CALL $cat.system.rewrite_data_files('rw.mor', 1000000, " +
      "where => 'p = 1')")
    val after = deletesByPart
    assert(!after.contains(1),
      s"the rewritten partition's deletes must be applied and shed: $after")
    assert(after.contains(2),
      s"the untouched partition must keep its delete structures: $after")
    assert(spark.sql(s"SELECT p, v FROM $t ORDER BY p, v").collect().toSeq
      === expect)
  }

  test("loud on a non-partition predicate and on an unpartitioned table") {
    val t = fresh("bad")
    spark.sql(s"CREATE TABLE $t (p INT, v BIGINT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10)")
    val e1 = intercept[Exception](spark.sql(
      s"CALL $cat.system.rewrite_data_files('rw.bad', 1000000, " +
        "where => 'v > 5')").collect())
    assert(e1.getMessage.contains("identity") ||
      e1.getMessage.contains("partition"), e1.getMessage)
    val u = fresh("badu")
    spark.sql(s"CREATE TABLE $u (v BIGINT)")
    spark.sql(s"INSERT INTO $u VALUES (1)")
    val e2 = intercept[Exception](spark.sql(
      s"CALL $cat.system.rewrite_data_files('rw.badu', 1000000, " +
        "where => 'v > 5')").collect())
    assert(e2.getMessage.contains("unpartitioned"), e2.getMessage)
  }
}
