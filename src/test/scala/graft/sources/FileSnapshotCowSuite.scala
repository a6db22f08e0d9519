package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.catalog.{CatalogAutomation, CatalogProfile, ColumnSpec, TableSpec}

/** The file-backed snapshot store: partitioned tables, file-grained
  * copy-on-write row-level rewrites (static partition pruning + runtime
  * `_file` group filtering), metadata-only deletes, partition-scoped
  * overwrite, physical expire-GC — and the Iceberg-dialect DDL executing
  * against this catalog end-to-end (the reference's `USING iceberg` +
  * `PARTITIONED BY (CountryRegion, PostalCode)` shape,
  * `customers.yml:5-7` / `create_iceberg_tables.py:51-54`).
  */
class FileSnapshotCowSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def fresh(name: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cow")
    spark.sql(s"DROP TABLE IF EXISTS $cat.cow.$name")
    s"$cat.cow.$name"
  }
  private def filesOf(name: String, version: Long): Vector[SnapshotStore.DataFile] =
    SnapshotStore.filesAt(SnapshotStore.keyOf(cat, Seq("cow", name)), version)
  private def liveVersion(name: String): Long =
    SnapshotCatalog.history(cat, Seq("cow", name)).last._1
  private def parts(f: SnapshotStore.DataFile): Seq[String] =
    f.partitionValues.map(String.valueOf(_))

  test("partitioned create: rows land in per-partition data files on disk, " +
    "driver metadata holds only descriptors") {
    val t = fresh("pt")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING, v DOUBLE) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',1.0),(2,'a',2.0),(3,'b',3.0)")
    val files = filesOf("pt", 1L)
    assert(files.map(_.rowCount).sum === 3L)
    assert(files.map(parts).toSet === Set(Seq("a"), Seq("b")))
    files.foreach(f =>
      assert(new java.io.File(f.path).isFile, s"data file missing: ${f.path}"))
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L), Row(2L), Row(3L)))
  }

  test("MERGE is file-grained copy-on-write: untouched files survive by " +
    "PATH identity (runtime _file group filtering)") {
    val t = fresh("cowm")
    spark.sql(s"CREATE TABLE $t (k BIGINT, region STRING, v BIGINT) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',10),(2,'a',20)") // v1
    spark.sql(s"INSERT INTO $t VALUES (10,'b',100),(11,'b',110)") // v2
    spark.sql("SELECT * FROM VALUES (1, CAST(999 AS BIGINT)) AS s(k, v)")
      .createOrReplaceTempView("cow_src")
    spark.sql(
      s"""MERGE INTO $t t USING cow_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
    assert(liveVersion("cowm") === 3L)
    val before = filesOf("cowm", 2L)
    val after = filesOf("cowm", 3L)
    val afterPaths = after.map(_.path).toSet
    // The `_file` metadata column names each row's file — the rewrite group
    // that must be replaced is exactly the file holding the matched key.
    val matchedFile = spark.sql(
      s"SELECT _file FROM $t VERSION AS OF 2 WHERE k = 1").collect().head.getString(0)
    assert(!afterPaths.contains(matchedFile),
      "the file containing the matched key must be replaced")
    val untouched = before.map(_.path).toSet - matchedFile
    assert(untouched.nonEmpty && untouched.subsetOf(afterPaths),
      s"files with no matching rows were rewritten:\n" +
        s"untouched=$untouched\nafter=$afterPaths")
    val beforeB = before.filter(parts(_) == Seq("b")).map(_.path).toSet
    assert(beforeB.nonEmpty && beforeB.subsetOf(afterPaths),
      "region-b files must carry over by path")
    assert(spark.sql(s"SELECT k, v FROM $t ORDER BY k").collect().toSeq ===
      Seq(Row(1L, 999L), Row(2L, 20L), Row(10L, 100L), Row(11L, 110L)))
  }

  test("file-grained even WITHOUT partitions: a commit's file untouched by " +
    "the merge condition carries over by path") {
    val t = fresh("cowu")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10)") // v1: file1
    spark.sql(s"INSERT INTO $t VALUES (2, 20)") // v2: file2
    spark.sql("SELECT * FROM VALUES (1, CAST(11 AS BIGINT)) AS s(k, v)")
      .createOrReplaceTempView("cowu_src")
    spark.sql(
      s"""MERGE INTO $t t USING cowu_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
    val before = filesOf("cowu", 2L)
    val after = filesOf("cowu", 3L)
    val file2 = before.filter(_.path != before.head.path) // the k=2 commit's file
    val keyOfFile1 = spark.sql(s"SELECT k FROM $t VERSION AS OF 1").collect()
      .head.getLong(0)
    assert(keyOfFile1 === 1L)
    val untouched = before.drop(1).map(_.path).toSet // v2's appended file
    assert(untouched.subsetOf(after.map(_.path).toSet),
      s"file containing only unmatched keys was rewritten:\nbefore=$before\nafter=$after")
    assert(!after.map(_.path).contains(before.head.path),
      "the matched file must be replaced")
    assert(spark.sql(s"SELECT v FROM $t WHERE k = 1").collect() === Array(Row(11L)))
    assert(file2.nonEmpty)
  }

  test("UPDATE with a partition predicate prunes statically; DELETE on a " +
    "partition predicate is metadata-only (no files read or written)") {
    val t = fresh("meta")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1,'a'),(2,'b'),(3,'c')") // v1
    val v1 = filesOf("meta", 1L)

    // UPDATE pruned by the pushed partition predicate: only region-a files
    // are rewritten, b/c carry over by path.
    spark.sql(s"UPDATE $t SET id = id + 100 WHERE region = 'a'")
    val v2 = filesOf("meta", 2L)
    val v1NotA = v1.filter(parts(_) != Seq("a")).map(_.path).toSet
    assert(v1NotA.subsetOf(v2.map(_.path).toSet),
      s"non-matching partitions rewritten by UPDATE:\nv1=$v1\nv2=$v2")
    assert(!v2.map(_.path).contains(v1.filter(parts(_) == Seq("a")).head.path))

    // DELETE by partition: pure metadata — the new snapshot is exactly the
    // old file list minus region b; nothing new is written.
    spark.sql(s"DELETE FROM $t WHERE region = 'b'")
    val v3 = filesOf("meta", 3L)
    assert(v3.map(_.path).toSet ===
      v2.filterNot(parts(_) == Seq("b")).map(_.path).toSet)
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(3L), Row(101L)))
    // The deleted partition's file is still on disk (older snapshots
    // reference it) until expire() collects it.
    assert(v2.filter(parts(_) == Seq("b")).forall(f => new java.io.File(f.path).isFile))
  }

  test("mixed partition/data predicates are NOT metadata-decidable: DELETE " +
    "takes the rewrite path and actually deletes") {
    import spark.implicits._
    val t = fresh("mixed")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1,'a'),(7,'a'),(9,'b')")
    // A three-valued eval on an all-null probe row would short-circuit
    // `region IS NOT NULL AND id > 5` to decidable-false and route this
    // down the metadata path, where no file fully matches — a DELETE that
    // silently deletes nothing. The structural check must refuse, forcing
    // the copy-on-write rewrite.
    spark.sql(s"DELETE FROM $t WHERE region IS NOT NULL AND id > 5")
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L)), "mixed-predicate DELETE must actually delete")
    // Same trap through the null-safe comparator.
    spark.sql(s"INSERT INTO $t VALUES (8, 'a')")
    spark.sql(s"DELETE FROM $t WHERE region <=> 'a' AND id > 5")
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L)))
    // Overwrite cannot scope a mixed predicate to whole files: loud
    // failure, never an overwrite that behaves as an append.
    val e = intercept[Exception](
      Seq((30L, "a")).toDF("id", "region").writeTo(t)
        .overwrite($"region".isNotNull && $"id" > 5))
    assert(e.getMessage != null, e.toString)
  }

  test("scans open only the partitions the predicate selects") {
    val t = fresh("prune")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1,'a'),(2,'b'),(3,'c')")
    val all = spark.sql(s"SELECT id FROM $t")
    val one = spark.sql(s"SELECT id FROM $t WHERE region = 'b'")
    val allPlan = all.queryExecution.executedPlan.toString
    val onePlan = one.queryExecution.executedPlan.toString
    assert(allPlan.contains("3 files"), allPlan)
    assert(onePlan.contains("1 files"), onePlan)
    assert(one.collect() === Array(Row(2L)))
  }

  test("partition-scoped overwrite: static predicate and dynamic mode " +
    "retire exactly the overwritten partitions") {
    import spark.implicits._
    val t = fresh("ow")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1,'a'),(2,'b')") // v1

    // Static: overwrite region a only.
    Seq((10L, "a")).toDF("id", "region").writeTo(t).overwrite($"region" === "a")
    val v2 = filesOf("ow", 2L)
    val v1b = filesOf("ow", 1L).filter(parts(_) == Seq("b")).map(_.path).toSet
    assert(v1b.subsetOf(v2.map(_.path).toSet), "region-b files must survive")
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(2L), Row(10L)))

    // Dynamic: new data only touches region b → only b is replaced.
    Seq((20L, "b")).toDF("id", "region").writeTo(t).overwritePartitions()
    val v3 = filesOf("ow", 3L)
    val v2a = v2.filter(parts(_) == Seq("a")).map(_.path).toSet
    assert(v2a.subsetOf(v3.map(_.path).toSet), "region-a files must survive")
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(10L), Row(20L)))

    // A non-partition overwrite predicate fails loudly instead of silently
    // rewriting rows it cannot scope to files.
    val e = intercept[Exception](
      Seq((30L, "a")).toDF("id", "region").writeTo(t).overwrite($"id" === 10L))
    assert(e.getMessage.contains("identity") || e.getMessage.contains("overwrite"),
      e.getMessage)
  }

  test("write.distribution-mode=hash clusters writes to one file per partition") {
    import spark.implicits._
    val t = fresh("dist")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region) " +
      "TBLPROPERTIES ('write.distribution-mode'='hash')")
    // 8 input partitions × 3 regions would write up to 24 files unclustered;
    // the requested hash distribution must land each region in one task.
    (1L to 90L).map(i => (i, s"r${i % 3}")).toDF("id", "region")
      .repartition(8)
      .writeTo(t).append()
    val files = filesOf("dist", 1L)
    assert(files.size === 3, s"expected one file per partition, got:\n$files")
    assert(files.map(parts).toSet === Set(Seq("r0"), Seq("r1"), Seq("r2")))
    assert(spark.sql(s"SELECT count(*) AS c FROM $t").collect() === Array(Row(90L)))

    // Contrast: without the property the same write fans out per task.
    val u = fresh("dist_u")
    spark.sql(s"CREATE TABLE $u (id BIGINT, region STRING) PARTITIONED BY (region)")
    (1L to 90L).map(i => (i, s"r${i % 3}")).toDF("id", "region")
      .repartition(8)
      .writeTo(u).append()
    assert(filesOf("dist_u", 1L).size > 3,
      "unclustered write should produce per-(task, partition) files")
  }

  test("expire physically deletes files no live snapshot references; " +
    "live and tagged files survive") {
    val t = fresh("gc")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)") // v1: fileA
    spark.sql(s"INSERT OVERWRITE $t VALUES (2)") // v2: fileB (fileA retired)
    val fileA = filesOf("gc", 1L).head.path
    val fileB = filesOf("gc", 2L).head.path
    assert(new java.io.File(fileA).isFile && new java.io.File(fileB).isFile)
    assert(SnapshotCatalog.expire(cat, Seq("cow", "gc"), keepLast = 1) === 1)
    assert(!new java.io.File(fileA).isFile, "expired snapshot's file must be GC'd")
    assert(new java.io.File(fileB).isFile, "live snapshot's file must survive")
    assert(spark.sql(s"SELECT id FROM $t").collect() === Array(Row(2L)))
    intercept[Exception](spark.sql(s"SELECT * FROM $t VERSION AS OF 1").collect())
  }

  test("compact rewrites small files to one per partition, preserving " +
    "history and answers") {
    val t = fresh("cmp")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region)")
    // Six append commits → at least six files across two partitions.
    (1 to 6).foreach(i =>
      spark.sql(s"INSERT INTO $t VALUES ($i, '${if (i % 2 == 0) "a" else "b"}')"))
    val answer = spark.sql(s"SELECT id, region FROM $t ORDER BY id").collect().toSeq
    val (before, after) = SnapshotCatalog.compact(spark, cat, Seq("cow", "cmp"))
    assert(before >= 6 && after === 2, s"$before -> $after")
    assert(spark.sql(s"SELECT id, region FROM $t ORDER BY id").collect().toSeq ===
      answer)
    // History intact: the pre-compaction version still reads (files are only
    // retired, not deleted) until expire() collects it.
    assert(spark.sql(s"SELECT count(*) AS c FROM $t VERSION AS OF 6").collect() ===
      Array(Row(6L)))
    SnapshotCatalog.expire(cat, Seq("cow", "cmp"), keepLast = 1)
    assert(filesOf("cmp", liveVersion("cmp")).forall(f =>
      new java.io.File(f.path).isFile))
    intercept[Exception](spark.sql(s"SELECT * FROM $t VERSION AS OF 6").collect())
  }

  test("rollback re-references files (no data copy); drop deletes the data dir") {
    val t = fresh("rb")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)") // v1
    spark.sql(s"INSERT OVERWRITE $t VALUES (2)") // v2
    SnapshotCatalog.rollback(cat, Seq("cow", "rb"), toVersion = 1L) // v3
    assert(filesOf("rb", 3L).map(_.path) === filesOf("rb", 1L).map(_.path),
      "rollback must re-reference, not copy")
    val dir = new java.io.File(filesOf("rb", 1L).head.path).getParentFile
    spark.sql(s"DROP TABLE $t")
    assert(!dir.exists, s"dropped table's data dir must be deleted: $dir")
  }

  test("ALTER TABLE ADD COLUMN: old files pad NULL, time travel keeps each " +
    "version's own schema, rewrites cross the boundary") {
    val t = fresh("evo")
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')") // v1: 2-field files
    spark.sql(s"ALTER TABLE $t ADD COLUMN score DOUBLE")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b', 0.5)") // v2: 3-field files
    assert(spark.sql(s"SELECT id, score FROM $t ORDER BY id").collect().toSeq ===
      Seq(Row(1L, null), Row(2L, 0.5)))
    // Time travel reads v1 under the schema it was written with.
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 1").columns.toSeq ===
      Seq("id", "region"))
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 2").columns.toSeq ===
      Seq("id", "region", "score"))
    // A row-level rewrite across the evolution boundary reads padded rows
    // and writes full-width ones.
    spark.sql(s"UPDATE $t SET score = 9.9 WHERE id = 1")
    assert(spark.sql(s"SELECT score FROM $t WHERE id = 1").collect() ===
      Array(Row(9.9)))
    // Unsupported evolutions fail loudly instead of corrupting layouts:
    // a PARTITION column cannot drop (its values are file identity), and
    // non-widening retypes stay rejected (TypeWideningSuite covers the
    // safe promotions; SchemaEvolutionSuite the rename/drop paths).
    val e = intercept[Exception](spark.sql(s"ALTER TABLE $t DROP COLUMN region"))
    assert(e.getMessage.contains("partition column"), e.getMessage)
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ALTER COLUMN score TYPE STRING"))
    assert(e2.getMessage.contains("WIDENING"), e2.getMessage)
    // Table properties evolve through the same path.
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('write.distribution-mode'='hash')")
    val k = SnapshotStore.keyOf(cat, Seq("cow", "evo"))
    assert(SnapshotStore.stateOf(k).properties
      .get("write.distribution-mode") === Some("hash"))
  }

  test("unknown partition transforms are rejected loudly (the supported " +
      "days/hours/months/years/bucket/truncate live in PartitionTransformSuite)") {
    val t = fresh("badpt")
    val e = intercept[Exception](
      spark.sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP) PARTITIONED BY (foo(ts))"))
    assert(e.getMessage.toLowerCase.contains("transform"), e.getMessage)
  }

  test("the reference's Iceberg-dialect DDL executes against this catalog: " +
    "USING iceberg + PARTITIONED BY + TBLPROPERTIES land as a real, " +
    "writable, row-level-capable table") {
    val spec = TableSpec(
      database = "bronze", table = "customers",
      location = Some("s3://glue-bucket-graft/warehouse/bronze/customers"),
      formatVersion = "2",
      partitionedBy = Seq("CountryRegion", "PostalCode"),
      columns = Seq("CustomerID", "FirstName", "LastName", "CountryRegion",
        "PostalCode").map(ColumnSpec(_, "string")))
    val profile = CatalogProfile.Iceberg(catalog = cat)
    val auto = new CatalogAutomation(spark, profile)
    spark.sql(s"DROP TABLE IF EXISTS $cat.bronze.customers")
    val ddl = auto.createTable(spec)
    assert(ddl.contains("USING iceberg") && ddl.contains("'format-version'='2'"), ddl)
    auto.createTable(spec) // idempotent (IF NOT EXISTS)

    // The provider, format properties, location and identity partitioning
    // all surface on the created table.
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    val tbl = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("bronze"), "customers"))
    assert(tbl.partitioning().toSeq.map(_.references()(0).fieldNames()(0)) ===
      Seq("CountryRegion", "PostalCode"))
    assert(tbl.properties().get("format-version") === "2")
    assert(Option(tbl.properties().get("provider")).map(_.toLowerCase) ===
      Some("iceberg"))
    assert(Option(tbl.properties().get("location")).exists(_.startsWith("s3://")))

    // And it is a full member of the engine: writes route per partition,
    // MERGE rewrites only the touched partition's files.
    val fq = s"$cat.bronze.customers"
    spark.sql(s"INSERT INTO $fq VALUES ('1','Ann','Ames','US','98101')," +
      "('2','Bo','Beck','US','98101'),('3','Cy','Cole','DE','10115')")
    spark.sql("SELECT * FROM VALUES ('1','Anne') AS s(CustomerID, FirstName)")
      .createOrReplaceTempView("cust_updates")
    spark.sql(
      s"""MERGE INTO $fq t USING cust_updates s ON t.CustomerID = s.CustomerID
         |WHEN MATCHED THEN UPDATE SET t.FirstName = s.FirstName""".stripMargin)
    val k = SnapshotStore.keyOf(cat, Seq("bronze", "customers"))
    val before = SnapshotStore.filesAt(k, 1L)
    val after = SnapshotStore.filesAt(k, 2L)
    val de = before.filter(parts(_) == Seq("DE", "10115")).map(_.path).toSet
    assert(de.nonEmpty && de.subsetOf(after.map(_.path).toSet),
      "the untouched DE partition must carry over by path")
    assert(spark.sql(s"SELECT FirstName FROM $fq WHERE CustomerID = '1'")
      .collect() === Array(Row("Anne")))
    assert(auto.tableExists("bronze", "customers"))
  }
}
