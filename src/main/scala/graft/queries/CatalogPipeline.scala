package graft.queries

import org.apache.spark.sql.functions._

import graft.catalog.{CatalogAutomation, CatalogProfile, ColumnSpec, TableSpec}

/** The reference's core workflow as ONE oracle-gated query: declarative
  * spec → generated DDL → idempotent provision → INSERT OVERWRITE from the
  * raw source → `spark.table` scan — the full catalog loop a user of the
  * reference runs (`create_iceberg_tables.py:24-57,140-156` followed by a
  * read), previously exercised only in sbt suites.
  *
  * The curated table is partitioned by `o_orderpriority` (the reference's
  * identity-transform partitioning, `customers.yml:5-7`), so the final
  * filtered aggregate exercises partition pruning through the catalog
  * table — at 100 TB the filter selects 2 of 5 partitions before any IO.
  * The table lives at an explicit LOCATION (the reference's `location:`
  * key): the in-memory catalog forgets metadata between sessions while the
  * warehouse files survive, and re-CREATEing a *managed* table over its
  * leftover non-empty directory is an error — external + full INSERT
  * OVERWRITE makes every rerun converge to the same state.
  */
object CatalogPipeline {

  private val spec = TableSpec(
    database = "graft_e2e",
    table = "orders_curated",
    location = Some(s"${System.getProperty("java.io.tmpdir")}/graft_e2e/orders_curated"),
    formatVersion = "2",
    partitionedBy = Seq("o_orderpriority"),
    columns = Seq(
      ColumnSpec("o_orderkey", "bigint"),
      ColumnSpec("o_custkey", "bigint"),
      ColumnSpec("o_totalprice", "double"),
      ColumnSpec("o_orderpriority", "string")))

  val r01CatalogRoundtrip = Q(
    "r01_catalog_roundtrip",
    (s, dir) => {
      // Pre-create the external location: CREATE TABLE lists it for schema
      // discovery and logs a FileNotFound on the very first provision.
      spec.location.foreach(l =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(l)))
      val auto = new CatalogAutomation(s, CatalogProfile.Builtin())
      auto.createTable(spec)
      val name = s"${spec.database}.${spec.table}"
      // insertInto resolves positionally and `PARTITIONED BY` moves the
      // partition column to the end of the on-disk schema — feed columns
      // in the table's own declared order.
      Tables.orders(s, dir)
        .select(s.table(name).columns.map(col): _*)
        .write.mode("overwrite").insertInto(name)
      s.table(name)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          Q.dsum(col("o_totalprice")).as("total_price"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
      count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""))

  /** Schema evolution without rewrite: generation-1 files carry the
    * original column set, generation-2 files add `o_orderpriority`, and a
    * single `mergeSchema` read serves both — old files surface the new
    * column as NULL at scan time, exactly how a columnar table format
    * evolves a 100 TB table by touching only metadata, never the data
    * files. (Iceberg resolves by column id rather than name, but the
    * read-time semantics this query pins — additive column, NULL backfill,
    * no file rewrite — are the same.) The aggregate routes the NULL-backed
    * legacy rows to a sentinel bucket, proving pre-evolution files stay
    * queryable next to post-evolution ones.
    */
  val v01SchemaEvolution = Q(
    "v01_schema_evolution",
    (s, dir) => {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_e2e/orders_evolved"
      val orders = Tables.orders(s, dir)
      orders.filter(col("o_orderdate") < "1996-01-01")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$base/gen1")
      orders.filter(col("o_orderdate") >= "1996-01-01")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$base/gen2")
      s.read.option("mergeSchema", "true").parquet(s"$base/gen1", s"$base/gen2")
        .groupBy(coalesce(col("o_orderpriority"), lit("LEGACY")).as("priority"))
        .agg(
          count(lit(1)).as("n_orders"),
          Q.dsum(col("o_totalprice")).as("total_price"))
        .orderBy("priority")
    },
    Some("""SELECT
        CASE WHEN o_orderdate >= DATE '1996-01-01' THEN o_orderpriority
             ELSE 'LEGACY' END AS priority,
        count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      FROM orders GROUP BY 1 ORDER BY priority"""))

  /** FIELD-ID schema evolution as an oracle-gated query (the Iceberg
    * mechanism the snapshot catalog implements — see
    * [[graft.sources.FieldIds]]): generation-1 rows land under the
    * original column names, then the table RENAMES `o_totalprice` to
    * `price` and DROPS `note`, and generation-2 rows land under the new
    * shape. The live read serves BOTH vintages under the renamed column
    * (files resolve requested columns by immutable field id, not name),
    * while `VERSION AS OF 1` still reads the dropped/pre-rename columns
    * under their own names — rename + drop + time travel, each hash-gated
    * against DuckDB over the raw fixture. */
  val v02FieldIdEvolution = Q(
    "v02_field_id_evolution",
    (s, dir) => {
      val t = "graft_snap.evo.orders_fid"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.evo")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"CREATE TABLE $t (o_orderkey BIGINT, o_custkey BIGINT, " +
        "o_totalprice DOUBLE, note STRING)")
      val orders = Tables.orders(s, dir)
      orders.filter(col("o_orderdate") < "1996-01-01")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority").as("note"))
        .writeTo(t).append() // v1: pre-evolution shape
      s.sql(s"ALTER TABLE $t RENAME COLUMN o_totalprice TO price")
      s.sql(s"ALTER TABLE $t DROP COLUMN note")
      orders.filter(col("o_orderdate") >= "1996-01-01")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").as("price"))
        .writeTo(t).append() // v2: post-evolution shape
      val live = s.table(t).agg(
        count(lit(1)).as("n_orders"),
        Q.dsum(col("price")).as("total_price"))
        .select(lit("live").as("epoch"), col("n_orders"),
          lit(0L).as("n_priorities"), col("total_price")) // dropped col: none
      val v1 = s.sql(s"SELECT * FROM $t VERSION AS OF 1").agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("note")).as("n_priorities"),
        Q.dsum(col("o_totalprice")).as("total_price"))
        .select(lit("v1").as("epoch"), col("n_orders"),
          col("n_priorities"), col("total_price"))
      live.unionAll(v1).orderBy("epoch")
    },
    Some("""SELECT 'live' AS epoch, count(*) AS n_orders,
        CAST(0 AS BIGINT) AS n_priorities,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      FROM orders
      UNION ALL
      SELECT 'v1', count(*), count(DISTINCT o_orderpriority),
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
      FROM orders WHERE o_orderdate < DATE '1996-01-01'
      ORDER BY epoch"""))

  /** TYPE WIDENING as an oracle-gated query ([[graft.sources.TypeWidening]],
    * Iceberg's safe promotions): generation-1 rows land as (INT, FLOAT,
    * DECIMAL(12,2)), the table widens all three columns (int→bigint,
    * float→double, decimal(12,2)→decimal(22,2) — metadata-only, no file
    * rewritten), and generation-2 rows land in the widened types. The live
    * read aggregates BOTH vintages under the widened schema (readers
    * decode each file's write-time types through its data sequence number
    * and up-cast); `VERSION AS OF 1` still reads generation 1 in its OWN
    * narrow types. Aggregates chosen order-independent (count / integral
    * and decimal sums / float min-max) so the DuckDB hash compare is
    * exact. */
  val v03TypeWidening = Q(
    "v03_type_widening",
    (s, dir) => {
      val t = "graft_snap.evo.orders_widen"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.evo")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"CREATE TABLE $t (o_orderkey BIGINT, cust INT, price FLOAT, " +
        "total DECIMAL(12,2))")
      val orders = Tables.orders(s, dir)
      orders.filter(col("o_orderdate") < "1996-01-01")
        .select(col("o_orderkey"), col("o_custkey").cast("int").as("cust"),
          col("o_totalprice").cast("float").as("price"),
          col("o_totalprice").cast("decimal(12,2)").as("total"))
        .writeTo(t).append() // v1: narrow vintage
      s.sql(s"ALTER TABLE $t ALTER COLUMN cust TYPE BIGINT")
      s.sql(s"ALTER TABLE $t ALTER COLUMN price TYPE DOUBLE")
      s.sql(s"ALTER TABLE $t ALTER COLUMN total TYPE DECIMAL(22,2)")
      orders.filter(col("o_orderdate") >= "1996-01-01")
        .select(col("o_orderkey"), col("o_custkey").as("cust"),
          col("o_totalprice").as("price"),
          col("o_totalprice").cast("decimal(22,2)").as("total"))
        .writeTo(t).append() // v2: widened vintage
      val live = s.table(t).agg(
        count(lit(1)).as("n_orders"),
        sum(col("cust")).as("sum_cust"),
        sum(col("total")).cast("decimal(28,2)").as("sum_total"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price"))
        .select(lit("live").as("epoch"), col("n_orders"), col("sum_cust"),
          col("sum_total"), col("min_price"), col("max_price"))
      val v1 = s.sql(s"SELECT * FROM $t VERSION AS OF 1").agg(
        count(lit(1)).as("n_orders"),
        sum(col("cust")).as("sum_cust"),
        sum(col("total")).cast("decimal(28,2)").as("sum_total"),
        min(col("price")).cast("double").as("min_price"),
        max(col("price")).cast("double").as("max_price"))
        .select(lit("v1").as("epoch"), col("n_orders"), col("sum_cust"),
          col("sum_total"), col("min_price"), col("max_price"))
      live.unionAll(v1).orderBy("epoch")
    },
    Some("""SELECT 'live' AS epoch, count(*) AS n_orders,
        CAST(sum(o_custkey) AS BIGINT) AS sum_cust,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS sum_total,
        -- generation 1 landed as FLOAT (and reads back up-cast); generation
        -- 2 landed as full DOUBLE — replicate the per-vintage rounding
        min(CASE WHEN o_orderdate < DATE '1996-01-01'
            THEN CAST(CAST(o_totalprice AS REAL) AS DOUBLE)
            ELSE o_totalprice END) AS min_price,
        max(CASE WHEN o_orderdate < DATE '1996-01-01'
            THEN CAST(CAST(o_totalprice AS REAL) AS DOUBLE)
            ELSE o_totalprice END) AS max_price
      FROM orders
      UNION ALL
      SELECT 'v1', count(*), CAST(sum(o_custkey) AS BIGINT),
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)),
        CAST(min(CAST(o_totalprice AS REAL)) AS DOUBLE),
        CAST(max(CAST(o_totalprice AS REAL)) AS DOUBLE)
      FROM orders WHERE o_orderdate < DATE '1996-01-01'
      ORDER BY epoch"""))

  val all: Seq[Q] = Seq(r01CatalogRoundtrip, v01SchemaEvolution,
    v02FieldIdEvolution, v03TypeWidening)
}
