package graft.sources

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SQL VIEWS on the snapshot catalog (`ViewCatalog` + the parse-time
  * intercept in graft.plans.GraftSqlExtensions): definitions persist in
  * the metadata log one immutable `view-v<N>.json` per version, reads
  * re-parse + re-analyze the stored SQL, `CREATE OR REPLACE` appends the
  * next version, and `VERSION AS OF n` reads a view under its
  * then-current definition. Plus the `ALTER TABLE … ADD/DROP PARTITION
  * FIELD` dialect routing to the same spec-evolution mechanism as the
  * procedure. */
class CatalogViewSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val cat = "graft_snap"

  private def freshNs(): Unit =
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.views")

  private def fresh(name: String): String = {
    freshNs()
    spark.sql(s"DROP VIEW IF EXISTS $cat.views.$name")
    spark.sql(s"DROP TABLE IF EXISTS $cat.views.$name")
    s"$cat.views.$name"
  }

  private def baseTable(name: String, n: Int = 100): String = {
    val t = fresh(name)
    spark.range(0, n).selectExpr("id", "id * 2 AS v", "concat('s', id % 5) AS s")
      .writeTo(t).create()
    t
  }

  test("query through a view is identical to the inline SQL") {
    val t = baseTable("base1")
    val v = fresh("v1")
    spark.sql(s"CREATE VIEW $v AS SELECT s, sum(v) AS total FROM $t GROUP BY s")
    val through = spark.sql(s"SELECT * FROM $v ORDER BY s").collect()
    val inline = spark.sql(
      s"SELECT s, sum(v) AS total FROM $t GROUP BY s ORDER BY s").collect()
    assert(through.map(_.toString).toSeq === inline.map(_.toString).toSeq)
  }

  test("CREATE OR REPLACE versions the definition; VERSION AS OF reads history") {
    val t = baseTable("base2")
    val v = fresh("v2")
    spark.sql(s"CREATE VIEW $v AS SELECT count(*) AS n FROM $t")
    spark.sql(s"CREATE OR REPLACE VIEW $v AS SELECT sum(v) AS n FROM $t")
    assert(spark.sql(s"SELECT * FROM $v").head().getLong(0) ===
      (0L until 100L).map(_ * 2).sum)
    // Time travel over the DEFINITION history: v1 was the count.
    assert(spark.sql(s"SELECT * FROM $v VERSION AS OF 1").head().getLong(0) === 100L)
    assert(spark.sql(s"SELECT * FROM $v VERSION AS OF 2").head().getLong(0) ===
      (0L until 100L).map(_ * 2).sum)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $v VERSION AS OF 9").collect()
    }
    assert(e.getMessage.contains("no version 9"))
  }

  test("views survive restart (durable metadata log)") {
    val t = baseTable("base3")
    val v = fresh("v3")
    spark.sql(s"CREATE VIEW $v AS SELECT max(id) AS m FROM $t")
    SnapshotStore.tables.clear()
    SnapshotStore.namespaces.clear()
    assert(spark.sql(s"SELECT * FROM $v").head().getLong(0) === 99L)
  }

  test("view over a dropped column fails loudly at read time") {
    val t = baseTable("base4")
    val v = fresh("v4")
    spark.sql(s"CREATE VIEW $v AS SELECT id, v FROM $t")
    spark.sql(s"ALTER TABLE $t DROP COLUMN v")
    val e = intercept[AnalysisException] {
      spark.sql(s"SELECT * FROM $v").collect()
    }
    assert(e.getMessage.toLowerCase.contains("v") ||
      e.getMessage.contains("UNRESOLVED"))
  }

  test("explicit column aliases apply by position") {
    val t = baseTable("base5")
    val v = fresh("v5")
    spark.sql(s"CREATE VIEW $v (key, doubled) AS SELECT id, v FROM $t")
    val df = spark.sql(s"SELECT key, doubled FROM $v WHERE key = 3")
    assert(df.head().getLong(1) === 6L)
    assert(df.columns.toSeq === Seq("key", "doubled"))
  }

  test("create/drop semantics: duplicates loud, IF EXISTS quiet, " +
      "table/view identifiers never collide") {
    val t = baseTable("base6")
    val v = fresh("v6")
    spark.sql(s"CREATE VIEW $v AS SELECT * FROM $t")
    assert(intercept[Exception] {
      spark.sql(s"CREATE VIEW $v AS SELECT * FROM $t")
    }.getMessage.nonEmpty)
    // A view's name is taken for tables, and vice versa.
    assert(intercept[Exception] {
      spark.sql(s"CREATE TABLE $v (id BIGINT)")
    }.getMessage.nonEmpty)
    assert(intercept[Exception] {
      spark.sql(s"CREATE VIEW $t AS SELECT 1 AS one")
    }.getMessage.nonEmpty)
    spark.sql(s"DROP VIEW $v")
    assert(intercept[Exception] {
      spark.sql(s"DROP VIEW $v")
    }.getMessage.nonEmpty)
    spark.sql(s"DROP VIEW IF EXISTS $v") // quiet
  }

  test("nested views expand; a definition cycle is a loud error") {
    val t = baseTable("base7")
    val a = fresh("v7a")
    val b = fresh("v7b")
    spark.sql(s"CREATE VIEW $a AS SELECT id, v FROM $t WHERE id < 50")
    spark.sql(s"CREATE VIEW $b AS SELECT sum(v) AS total FROM $a")
    assert(spark.sql(s"SELECT * FROM $b").head().getLong(0) ===
      (0L until 50L).map(_ * 2).sum)
    // REPLACE a to read b: now a -> b -> a.
    spark.sql(s"CREATE OR REPLACE VIEW $a AS SELECT total AS id, total AS v FROM $b")
    val e = intercept[Exception] { spark.sql(s"SELECT * FROM $a").collect() }
    assert(e.getMessage.contains("cycle"),
      s"expected a cycle error, got: ${e.getMessage}")
  }

  test("bare names in a definition resolve under the creation-time catalog") {
    val t = baseTable("base8")
    val v = fresh("v8")
    // Create under USE graft_snap with a catalog-bare body; read it back
    // from a DIFFERENT current catalog — the STORED context must supply
    // the catalog, or the bare name would resolve against the reader's.
    spark.sql(s"USE $cat")
    try spark.sql(s"CREATE VIEW $v AS SELECT count(*) AS n FROM views.base8")
    finally spark.sql("USE spark_catalog")
    assert(spark.sql(s"SELECT * FROM $v").head().getLong(0) === 100L)
    val _ = t
  }

  test("views with CTEs in the body expand correctly") {
    val t = baseTable("base9")
    val v = fresh("v9")
    spark.sql(s"""CREATE VIEW $v AS
      WITH big AS (SELECT * FROM $t WHERE v >= 100)
      SELECT count(*) AS n FROM big""")
    assert(spark.sql(s"SELECT * FROM $v").head().getLong(0) === 50L)
  }

  test("ALTER TABLE ADD/DROP PARTITION FIELD == the evolve procedure") {
    freshNs()
    spark.sql(s"DROP TABLE IF EXISTS $cat.views.alter1")
    spark.sql(s"DROP TABLE IF EXISTS $cat.views.alter2")
    val sql1 = s"$cat.views.alter1"
    val call2 = s"$cat.views.alter2"
    Seq(sql1, call2).foreach { t =>
      spark.sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP, v DOUBLE)")
      spark.range(0, 100).selectExpr("id",
        "timestamp_micros(1700000000000000 + id * 86400000000) AS ts",
        "CAST(id AS DOUBLE) AS v").writeTo(t).append()
    }
    spark.sql(s"ALTER TABLE $sql1 ADD PARTITION FIELD days(ts)")
    spark.sql(s"ALTER TABLE $sql1 ADD PARTITION FIELD bucket(4, id)")
    spark.sql(s"CALL $cat.system.evolve_partition_spec('views.alter2', 'days(ts)')")
    spark.sql(s"CALL $cat.system.evolve_partition_spec('views.alter2', 'days(ts), bucket(4, id)')")
    def state(n: String) = SnapshotStore.stateOf(
      SnapshotStore.keyOf(cat, Seq("views", n)))
    assert(state("alter1").partitionCols === state("alter2").partitionCols)
    assert(state("alter1").transformsOrIdentity ===
      state("alter2").transformsOrIdentity)
    // Writes after the ALTER land under the evolved spec and prune.
    spark.range(100, 200).selectExpr("id",
      "timestamp_micros(1700000000000000 + id * 86400000000) AS ts",
      "CAST(id AS DOUBLE) AS v").writeTo(sql1).append()
    assert(spark.table(sql1).count() === 200)
    // DROP removes exactly the named field.
    spark.sql(s"ALTER TABLE $sql1 DROP PARTITION FIELD bucket(4, id)")
    assert(state("alter1").partitionCols === Seq("ts"))
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $sql1 DROP PARTITION FIELD bucket(4, id)")
    }
    assert(e.getMessage.contains("no partition field"))
  }

  test("renameTable refuses a target identifier held by a view") {
    val t = baseTable("base11")
    val v = fresh("v11")
    spark.sql(s"CREATE VIEW $v AS SELECT * FROM $t")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t RENAME TO $cat.views.v11")
    }
    assert(e.getMessage.nonEmpty)
    // Both objects intact after the refused rename.
    assert(spark.table(t).count() === 100)
    assert(spark.sql(s"SELECT count(*) FROM $v").head().getLong(0) === 100)
  }

  test("view-level and per-column COMMENTs persist in the definition") {
    val t = baseTable("base12")
    val v = fresh("v12")
    spark.sql(s"""CREATE VIEW $v (key COMMENT 'the id', doubled)
      COMMENT 'daily rollup' AS SELECT id, v FROM $t""")
    val cm = spark.sessionState.catalogManager
    val snap = cm.catalog(cat).asInstanceOf[SnapshotCatalog]
    val view = snap.loadView(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("views"), "v12"))
    assert(view.properties().get("comment") === "daily rollup")
    assert(view.columnComments().toSeq === Seq("the id", null))
    assert(view.columnAliases().toSeq === Seq("key", "doubled"))
  }

  test("SHOW VIEWS lists catalog views, honoring the LIKE pattern") {
    freshNs()
    val t = baseTable("base13")
    val a = fresh("report_daily")
    val b = fresh("report_weekly")
    val c = fresh("audit_v13")
    Seq(a, b, c).foreach(v => spark.sql(s"CREATE VIEW $v AS SELECT * FROM $t"))
    val all = spark.sql(s"SHOW VIEWS IN $cat.views")
      .collect().map(_.getString(1)).toSet
    assert(Set("report_daily", "report_weekly", "audit_v13").subsetOf(all))
    val like = spark.sql(s"SHOW VIEWS IN $cat.views LIKE 'report*'")
      .collect().map(_.getString(1)).toSet
    assert(like === all.filter(_.startsWith("report")))
    Seq(a, b, c).foreach(v => spark.sql(s"DROP VIEW $v"))
  }

  test("DESCRIBE serves a view's schema, comments, and definition") {
    val t = baseTable("base14")
    val v = fresh("v14")
    spark.sql(s"""CREATE VIEW $v (key COMMENT 'pk', total)
      COMMENT 'rollup' AS SELECT id, v FROM $t""")
    val basic = spark.sql(s"DESCRIBE $v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(basic.toSeq === Seq(("key", "bigint", "pk"), ("total", "bigint", null)))
    val ext = spark.sql(s"DESCRIBE EXTENDED $v").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(ext("View Text").contains("SELECT id, v FROM"))
    assert(ext("Comment") === "rollup")
    // DESCRIBE of a TABLE is untouched by the intercept.
    assert(spark.sql(s"DESCRIBE $t").collect().nonEmpty)
  }

  test("listViews surfaces persisted views; dropView prunes them") {
    freshNs()
    val v = fresh("v10")
    val t = baseTable("base10")
    spark.sql(s"CREATE VIEW $v AS SELECT * FROM $t")
    val cm = spark.sessionState.catalogManager
    val snap = cm.catalog(cat).asInstanceOf[SnapshotCatalog]
    val listed = snap.listViews("views").map(_.name()).toSet
    assert(listed.contains("v10"))
    spark.sql(s"DROP VIEW $v")
    assert(!snap.listViews("views").map(_.name()).toSet.contains("v10"))
  }

  test("ALTER VIEW ... AS appends the next definition version; the old " +
      "one stays time-travelable") {
    val t = baseTable("base11")
    val v = fresh("v11")
    spark.sql(s"CREATE VIEW $v AS SELECT count(*) AS n FROM $t")
    spark.sql(s"ALTER VIEW $v AS SELECT sum(v) AS total FROM $t")
    assert(spark.sql(s"SELECT * FROM $v").columns.toSeq === Seq("total"))
    assert(spark.sql(s"SELECT * FROM $v").head().getLong(0) ===
      (0L until 100L).map(_ * 2).sum)
    assert(spark.sql(s"SELECT * FROM $v VERSION AS OF 1").columns.toSeq ===
      Seq("n"))
    // Altering a view that does not exist is loud.
    val e = intercept[Exception] {
      spark.sql(s"ALTER VIEW $cat.views.absent11 AS SELECT 1 AS x")
    }
    assert(e.getMessage.toLowerCase.contains("view"))
  }

  test("ALTER VIEW SET/UNSET TBLPROPERTIES version the properties; " +
      "UNSET without IF EXISTS is loud on missing keys") {
    val t = baseTable("base12")
    val v = fresh("v12")
    spark.sql(s"CREATE VIEW $v AS SELECT s FROM $t")
    spark.sql(s"ALTER VIEW $v SET TBLPROPERTIES ('team' = 'etl', 'tier' = 'gold')")
    val (snap, ident) = viewIdent(v)
    assert(snap.loadView(ident).properties().get("team") === "etl")
    spark.sql(s"ALTER VIEW $v UNSET TBLPROPERTIES ('tier')")
    assert(!snap.loadView(ident).properties().containsKey("tier"))
    val e = intercept[Exception] {
      spark.sql(s"ALTER VIEW $v UNSET TBLPROPERTIES ('nope')")
    }
    assert(e.getMessage.contains("nope"))
    spark.sql(s"ALTER VIEW $v UNSET TBLPROPERTIES IF EXISTS ('nope')")
    // Property history is versioned like definitions.
    assert(snap.loadViewVersion(ident, Some(1L)).properties().isEmpty)
  }

  private def viewIdent(v: String): (SnapshotCatalog, org.apache.spark.sql
      .connector.catalog.Identifier) = {
    val parts = v.split('.')
    val snap = spark.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[SnapshotCatalog]
    (snap, org.apache.spark.sql.connector.catalog.Identifier.of(
      Array(parts(1)), parts(2)))
  }

  test("SHOW CREATE VIEW/TABLE round-trips: the rendered DDL re-executes " +
      "to an identical definition") {
    val t = baseTable("base13")
    val v = fresh("v13")
    spark.sql(s"""CREATE VIEW $v (grp COMMENT 'group key', total)
      COMMENT 'rollup' TBLPROPERTIES ('owner' = 'etl')
      AS SELECT s, sum(v) FROM $t GROUP BY s""")
    val ddl = spark.sql(s"SHOW CREATE VIEW $v").head().getString(0)
    assert(ddl.contains("CREATE VIEW") && ddl.contains("rollup") &&
      ddl.contains("'owner' = 'etl'") && ddl.contains("COMMENT 'group key'"),
      s"rendered DDL missing pieces:\n$ddl")
    // Spark's spelling (SHOW CREATE TABLE over a view) serves the same.
    assert(spark.sql(s"SHOW CREATE TABLE $v").head().getString(0) === ddl)
    val before = spark.sql(s"SELECT * FROM $v ORDER BY grp").collect()
      .map(_.toString).toSeq
    val describeBefore = spark.sql(s"DESCRIBE $v").collect()
      .map(_.toString).toSeq
    spark.sql(s"DROP VIEW $v")
    spark.sql(ddl)
    assert(spark.sql(s"SELECT * FROM $v ORDER BY grp").collect()
      .map(_.toString).toSeq === before)
    assert(spark.sql(s"DESCRIBE $v").collect().map(_.toString).toSeq ===
      describeBefore)
    // Graft TABLES render through Spark's native v2 SHOW CREATE TABLE.
    val tddl = spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)
    assert(tddl.contains("CREATE TABLE"), tddl)
  }

  test("a CREATE TABLE and CREATE VIEW racing one identifier contend on " +
      "ONE claim file (the round-14 cross-session gap)") {
    val v = fresh("raced")
    val t = baseTable("base14")
    spark.sql(s"CREATE VIEW $v AS SELECT s FROM $t")
    // The view holds the TABLE claim: a cross-session CREATE TABLE that
    // bypassed every in-JVM guard still loses the v1.json claim.
    val (snap, _) = viewIdent(v)
    val dataDir = MetadataLog.tableDir(
      warehouseOf(snap), Seq(cat, "views", "raced"))
    val claimed = MetadataLog.createInitial(SnapshotStore.TableState(
      new org.apache.spark.sql.types.StructType()
        .add("x", org.apache.spark.sql.types.LongType),
      Nil, dataDir, Map.empty, Vector.empty))
    assert(claimed.isEmpty,
      "a view's identifier must hold the table-namespace claim")
    // …and the view's directory never lists as a table.
    assert(!MetadataLog.listDiskTables(warehouseOf(snap), Seq(cat, "views"))
      .contains("raced"))
    // Converse: a live TABLE's identifier refuses a view's FIRST-version
    // claim at the same file.
    val tDef = ViewLog.load(warehouseOf(snap), Seq(cat, "views", "raced")).get
    assert(!ViewLog.create(warehouseOf(snap), Seq(cat, "views", "base14"),
      tDef, replace = false),
      "a table's identifier must refuse the view claim")
    // Dropping the view releases the claim; a table can then take the name.
    spark.sql(s"DROP VIEW $v")
    spark.sql(s"CREATE TABLE $cat.views.raced (x BIGINT)")
    spark.sql(s"DROP TABLE $cat.views.raced")
  }

  private def warehouseOf(snap: SnapshotCatalog): String =
    SnapshotStore.warehouses.get(cat).get

  test("a creation crashed between its two writes leaves an orphaned " +
      "claim marker — DROP VIEW clears it and CREATE reclaims") {
    freshNs()
    spark.sql(s"DROP TABLE IF EXISTS $cat.views.orphaned")
    spark.sql(s"DROP VIEW IF EXISTS $cat.views.orphaned")
    val (snap, _) = viewIdent(s"$cat.views.orphaned")
    val wh = warehouseOf(snap)
    // Plant the crash residue: the table-namespace claim without any
    // view-v<N>.json definition.
    val marker = new org.apache.hadoop.fs.Path(
      MetadataLog.tableDir(wh, Seq(cat, "views", "orphaned")),
      "metadata/v1.json")
    val fs = marker.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.mkdirs(marker.getParent)
    val out = fs.create(marker, false)
    out.write(ViewLog.TableClaimMarker.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    // The orphan must not read as a table, a view, or a listed anything.
    assert(!snap.viewExists(org.apache.spark.sql.connector.catalog
      .Identifier.of(Array("views"), "orphaned")))
    assert(!MetadataLog.listDiskTables(wh, Seq(cat, "views"))
      .contains("orphaned"))
    // A YOUNG marker is indistinguishable from a creation in flight
    // between its two writes: auto-reclaim must refuse it.
    val tEarly = baseTable("base15")
    val eYoung = intercept[Exception] {
      spark.sql(s"CREATE VIEW $cat.views.orphaned AS SELECT s FROM $tEarly")
    }
    assert(eYoung.getMessage.nonEmpty)
    // Age it past the reclaim floor — now it is provably crash residue.
    fs.setTimes(marker, System.currentTimeMillis() - 11L * 60 * 1000, -1)
    // CREATE VIEW reclaims it in place (no definition ever landed, so
    // nothing can be reading it)...
    val t = tEarly
    spark.sql(s"CREATE VIEW $cat.views.orphaned AS SELECT s FROM $t")
    assert(spark.sql(s"SELECT count(*) FROM $cat.views.orphaned")
      .head().getLong(0) === 100L)
    spark.sql(s"DROP VIEW $cat.views.orphaned")
    // ...and DROP VIEW clears a bare orphan too (the explicit recovery).
    val out2 = fs.create(marker, false)
    out2.write(ViewLog.TableClaimMarker.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    out2.close()
    spark.sql(s"DROP VIEW $cat.views.orphaned")
    assert(!fs.exists(marker))
    spark.sql(s"CREATE TABLE $cat.views.orphaned (x BIGINT)")
    spark.sql(s"DROP TABLE $cat.views.orphaned")
  }

  test("identity partitioning over BINARY is refused at the seam (values " +
      "are not log-serializable and compare by reference); bucket(n, " +
      "binary) is the supported path and dynamic-overwrites exactly") {
    freshNs()
    spark.sql(s"DROP TABLE IF EXISTS $cat.views.binpart")
    val t = s"$cat.views.binpart"
    // CREATE-time rejection — previously this failed at FIRST WRITE with
    // an opaque serialization error deep in the manifest writer.
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $t (k BINARY, v BIGINT) PARTITIONED BY (k)")
    }
    assert(e.getMessage.contains("does not accept"), e.getMessage)
    // ...and at the evolve seam.
    spark.sql(s"CREATE TABLE $t (k BINARY, v BIGINT)")
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ADD PARTITION FIELD k")
    }
    assert(e2.getMessage.contains("does not accept"), e2.getMessage)
    // bucket over binary hashes CONTENT: dynamic overwrite replaces the
    // row's partition instead of appending a duplicate.
    spark.sql(s"DROP TABLE $t")
    spark.sql(s"CREATE TABLE $t (k BINARY, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $t VALUES (X'AA', 1), (X'BB', 2)")
    spark.table(t).filter("v = 1").withColumn("v",
      org.apache.spark.sql.functions.lit(10L))
      .writeTo(t).overwritePartitions()
    val rows = spark.sql(s"SELECT hex(k) AS k, v FROM $t ORDER BY k, v")
      .collect().map(_.toString).toSeq
    // X'AA' and X'BB' may share a bucket: overwrite replaces the whole
    // bucket's rows with the new frame's — either way NO duplicates.
    assert(!rows.exists(_ == "[AA,1]") && rows.contains("[AA,10]"),
      rows.toString)
  }
}
