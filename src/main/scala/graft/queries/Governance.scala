package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{MergeInto, ZOrder}

/** Data-management operators a table-automation platform grows into once
  * tables exist: row-level MERGE (the point of the reference's
  * `format_version: 2` spec, `customers.yml:4`), pre-ingest data-quality
  * validation, and multi-dimensional layout (Z-ordering) — each as an
  * oracle-gated query.
  */
object Governance {

  /** MERGE INTO (upsert): apply a change batch to the customer dimension.
    *
    * The batch carries two kinds of rows, exercising all three MERGE
    * branches: per-customer revenue deltas from urgent orders (matched →
    * acctbal update), and supplier-sourced new accounts under a shifted key
    * range (not-matched-by-target → insert, `c_mktsegment = 'NEW'`).
    * Customers with no urgent orders are not matched by source → kept.
    *
    * Scale: one equi-join on the merge key — the change batch (≪ target)
    * broadcasts; a big-big merge would shuffle both sides once, exactly the
    * join a copy-on-write MERGE plans internally.
    */
  val m01MergeUpsert = Q(
    "m01_merge_upsert",
    (s, dir) => {
      val deltas = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(Q.dsum(col("o_totalprice")).as("rev"))
        .select(col("c_custkey"), col("rev"),
          lit(null).cast("string").as("new_name"),
          lit(null).cast("int").as("new_nationkey"),
          lit(null).cast("double").as("new_acctbal"))
      val inserts = Tables.supplier(s, dir)
        .select((col("s_suppkey") + 1000000L).as("c_custkey"),
          lit(null).cast("double").as("rev"),
          col("s_name").as("new_name"),
          col("s_nationkey").as("new_nationkey"),
          col("s_acctbal").as("new_acctbal"))
      MergeInto.merge(
        target = Tables.customer(s, dir),
        source = deltas.unionAll(inserts),
        key = "c_custkey",
        whenMatched = Map(
          "c_acctbal" -> (col("t.c_acctbal") + coalesce(col("s.rev"), lit(0.0)))),
        whenNotMatched = Some(Map(
          "c_custkey" -> col("s.c_custkey"),
          "c_name" -> col("s.new_name"),
          "c_nationkey" -> col("s.new_nationkey"),
          "c_acctbal" -> col("s.new_acctbal"),
          "c_mktsegment" -> lit("NEW"))))
        .orderBy("c_custkey")
    },
    Some("""WITH delta AS (
        SELECT o_custkey,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
        FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey)
      SELECT c.c_custkey, c.c_name, c.c_nationkey,
        CASE WHEN d.o_custkey IS NOT NULL THEN c.c_acctbal + d.rev
             ELSE c.c_acctbal END AS c_acctbal,
        c.c_mktsegment
      FROM customer c LEFT JOIN delta d ON c.c_custkey = d.o_custkey
      UNION ALL
      SELECT s_suppkey + 1000000, s_name, s_nationkey, s_acctbal, 'NEW'
      FROM supplier
      ORDER BY c_custkey"""))

  /** Data-quality audit (Deequ-style constraint suite): one row per check
    * with its measured metric and pass verdict. The six lineitem-local
    * metrics come from ONE single-pass aggregate (a 100 TB audit costs one
    * scan); referential integrity is a separate anti-join count and the
    * freshness-mix check a separate orders aggregate — both narrow.
    */
  val a01QualityAudit = Q(
    "a01_quality_audit",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = li.agg(
        count(lit(1)).cast("double").as("row_count"),
        sum(when(col("l_discount").isNull, 1).otherwise(0)).cast("double")
          .as("null_discount"),
        (count(lit(1)) - count_distinct(col("l_orderkey"), col("l_linenumber")))
          .cast("double").as("dup_line_keys"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1).otherwise(0))
          .cast("double").as("qty_range_violations"),
        sum(when(!col("l_discount").between(0.0, 0.1), 1).otherwise(0))
          .cast("double").as("discount_range_violations"),
        sum(when(col("l_extendedprice") <= 0, 1).otherwise(0)).cast("double")
          .as("nonpositive_price"))
      val local = m.select(explode(array(
        struct(lit("row_count").as("check_name"), col("row_count").as("metric"),
          (col("row_count") > 0).as("pass")),
        struct(lit("null_discount").as("check_name"), col("null_discount").as("metric"),
          (col("null_discount") === 0).as("pass")),
        struct(lit("dup_line_keys").as("check_name"), col("dup_line_keys").as("metric"),
          (col("dup_line_keys") === 0).as("pass")),
        struct(lit("qty_range_violations").as("check_name"),
          col("qty_range_violations").as("metric"),
          (col("qty_range_violations") === 0).as("pass")),
        struct(lit("discount_range_violations").as("check_name"),
          col("discount_range_violations").as("metric"),
          (col("discount_range_violations") === 0).as("pass")),
        struct(lit("nonpositive_price").as("check_name"),
          col("nonpositive_price").as("metric"),
          (col("nonpositive_price") === 0).as("pass")))).as("c"))
        .select(col("c.check_name"), col("c.metric"), col("c.pass"))
      val orphans = li.join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).cast("double").as("metric"))
        .select(lit("orphan_lineitems").as("check_name"), col("metric"),
          (col("metric") === 0).as("pass"))
      val urgentShare = Tables.orders(s, dir)
        .agg((sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
          .cast("double") / count(lit(1))).as("metric"))
        .select(lit("urgent_share_min_25pct").as("check_name"), col("metric"),
          (col("metric") >= 0.25).as("pass"))
      local.unionAll(orphans).unionAll(urgentShare).orderBy("check_name")
    },
    Some("""WITH m AS (
        SELECT count(*) AS row_count,
          sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS null_discount,
          count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS dup_line_keys,
          sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
            AS qty_range_violations,
          sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.1) THEN 1 ELSE 0 END)
            AS discount_range_violations,
          sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS nonpositive_price
        FROM lineitem)
      SELECT * FROM (
        SELECT 'row_count' AS check_name, CAST(row_count AS DOUBLE) AS metric,
          row_count > 0 AS pass FROM m
        UNION ALL SELECT 'null_discount', CAST(null_discount AS DOUBLE),
          null_discount = 0 FROM m
        UNION ALL SELECT 'dup_line_keys', CAST(dup_line_keys AS DOUBLE),
          dup_line_keys = 0 FROM m
        UNION ALL SELECT 'qty_range_violations', CAST(qty_range_violations AS DOUBLE),
          qty_range_violations = 0 FROM m
        UNION ALL SELECT 'discount_range_violations',
          CAST(discount_range_violations AS DOUBLE),
          discount_range_violations = 0 FROM m
        UNION ALL SELECT 'nonpositive_price', CAST(nonpositive_price AS DOUBLE),
          nonpositive_price = 0 FROM m
        UNION ALL SELECT 'orphan_lineitems',
          CAST((SELECT count(*) FROM lineitem l LEFT JOIN orders o
                ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS DOUBLE),
          (SELECT count(*) FROM lineitem l LEFT JOIN orders o
           ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) = 0
        UNION ALL SELECT 'urgent_share_min_25pct',
          (SELECT CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) FROM orders),
          (SELECT CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) FROM orders) >= 0.25)
      ORDER BY check_name"""))

  /** Z-order layout audit: Morton keys over (l_partkey, l_suppkey), rows
    * grouped by the top-12-bit z-prefix. Each bucket's min/max on BOTH
    * dimensions stay tight simultaneously — the property that makes
    * z-sorted parquet prunable on either column (OPTIMIZE ZORDER BY).
    * The key is pure integer shift/mask algebra (codegen'd built-ins);
    * `ZOrder.zSql` emits the identical formula for the DuckDB oracle.
    */
  val z01ZorderLayout = Q(
    "z01_zorder_layout",
    (s, dir) => {
      val zv = ZOrder.zKey(col("l_partkey"), col("l_suppkey"), 12)
      Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"), zv.as("zval"))
        .groupBy(shiftright(col("zval"), 12).as("z_bucket"))
        .agg(
          count(lit(1)).as("n_rows"),
          min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
          min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
        .orderBy("z_bucket")
    },
    Some(s"""WITH z AS (
        SELECT l_partkey, l_suppkey,
          ${ZOrder.zSql("l_partkey", "l_suppkey", 12)} AS zval
        FROM lineitem)
      SELECT zval >> 12 AS z_bucket, count(*) AS n_rows,
        min(l_partkey) AS min_part, max(l_partkey) AS max_part,
        min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
      FROM z GROUP BY 1 ORDER BY 1"""))

  /** SCD Type-2 dimension build: each customer's order history becomes a
    * versioned slowly-changing dimension — one row per (customer, order)
    * with `valid_from` = that order's date, `valid_to` = the next order's
    * date (null while current), and an `is_current` flag.
    *
    * One window over (key ORDER BY date) — a single hash-partitioned sort
    * per customer, no self-join. This is how a 100 TB dimension history is
    * rebuilt: partition by the business key, never by global order.
    * Ties on (customer, date) are broken by o_orderkey so version numbers
    * are total and both engines agree.
    *
    * Output surfaces are representation-exact by construction: the price
    * rides as integer cents (`floor(x*100 + 0.5)` — identical IEEE double
    * arithmetic in both engines, no decimal rounding-mode tie hazard),
    * validity columns are DATE (not timestamp), and the open row carries
    * the SCD2 sentinel 9999-12-31 instead of NULL so no engine-specific
    * NULL rendering exists to diverge.
    */
  val m02Scd2History = Q(
    "m02_scd2_history",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(
          col("o_custkey"), col("o_orderkey"),
          floor(col("o_totalprice") * 100 + 0.5).as("attr_price_cents"),
          to_date(col("o_orderdate")).as("valid_from"),
          coalesce(to_date(lead(col("o_orderdate"), 1).over(w)),
            lit("9999-12-31").cast("date")).as("valid_to"),
          row_number().over(w).as("version"),
          lead(col("o_orderdate"), 1).over(w).isNull.as("is_current"))
        .orderBy("o_custkey", "version")
    },
    Some("""SELECT o_custkey, o_orderkey,
        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS attr_price_cents,
        CAST(o_orderdate AS DATE) AS valid_from,
        COALESCE(CAST(lead(o_orderdate, 1) OVER w AS DATE),
                 DATE '9999-12-31') AS valid_to,
        CAST(row_number() OVER w AS INT) AS version,
        lead(o_orderdate, 1) OVER w IS NULL AS is_current
      FROM orders WHERE o_orderstatus = 'F'
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, version"""))

  /** Incremental aggregate refresh: maintain a per-customer revenue rollup
    * as new data arrives WITHOUT rescanning history. The historical
    * partition's agg is a materialized partial state; the fresh partition
    * aggregates alone; the refreshed view is a groupBy-merge of the two
    * partial states (sums add, counts add) — never `history ∪ fresh` re-
    * aggregated from raw rows.
    *
    * The oracle aggregates the full table directly, proving
    * merge-of-partials ≡ full recompute — the algebraic property (decimal
    * sums are associative-exact) that makes incremental refresh and
    * map-side combine correct at any scale.
    */
  val m03IncrementalRefresh = Q(
    "m03_incremental_refresh",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      val cutoff = "1997-01-01"
      def partial(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("o_custkey")
        .agg(Q.dsum(col("o_totalprice")).as("rev"), count(lit(1)).as("n"))
      val history = partial(orders.filter(col("o_orderdate") < cutoff))
      val fresh   = partial(orders.filter(col("o_orderdate") >= cutoff))
      history.unionAll(fresh)
        .groupBy("o_custkey")
        .agg(
          sum(col("rev").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .cast("double").as("rev"),
          sum(col("n")).as("n"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev,
        count(*) AS n
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  /** Snapshot diff / change-data-capture: compare two deterministic states
    * of the orders table — snapshot A (orders before 1997-07-01) and
    * snapshot B (orders before 1998-01-01, urgent pre-A-cutoff orders
    * repriced +10%, pre-1993 finished orders archived out) — and emit one
    * row per changed key classified INSERT / DELETE / UPDATE.
    *
    * One full outer join on the snapshot key; the change classification is
    * a row-local CASE. This is the diff an Iceberg `changes` read or a
    * CDC-to-downstream feed computes between snapshots: at 100 TB both
    * sides hash-partition on the key once, and unchanged rows (the vast
    * majority) are filtered before the sort/sink. Prices ride as exact
    * integers in units of 10^-4 currency: base cents from
    * `floor(x*100 + 0.5)` (identical IEEE double arithmetic in both
    * engines), then ×100 for the unchanged path and ×110 for the +10%
    * reprice — pure BIGINT algebra, so "changed" is exact and no decimal
    * rounding mode or decimal rendering ever enters the output surface.
    */
  val m04SnapshotDiff = Q(
    "m04_snapshot_diff",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      val cents = floor(col("o_totalprice") * 100 + 0.5)
      val snapA = orders
        .filter(col("o_orderdate") < "1997-07-01")
        .select(col("o_orderkey"), (cents * 100).as("price_c4"))
      val snapB = orders
        .filter(col("o_orderdate") < "1998-01-01" &&
          !(col("o_orderstatus") === "F" && col("o_orderdate") < "1993-01-01"))
        .select(col("o_orderkey"),
          when(col("o_orderpriority") === "1-URGENT" &&
              col("o_orderdate") < "1997-07-01", cents * 110)
            .otherwise(cents * 100).as("price_c4"))
      val a = snapA.as("a")
      val b = snapB.as("b")
      a.join(b, col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
        .withColumn("change_type",
          when(col("a.o_orderkey").isNull, "INSERT")
            .when(col("b.o_orderkey").isNull, "DELETE")
            .when(col("a.price_c4") =!= col("b.price_c4"), "UPDATE"))
        .filter(col("change_type").isNotNull)
        .select(
          coalesce(col("a.o_orderkey"), col("b.o_orderkey")).as("o_orderkey"),
          col("change_type"),
          col("a.price_c4").as("old_price_c4"),
          col("b.price_c4").as("new_price_c4"))
        .orderBy("o_orderkey")
    },
    Some("""WITH base AS (
        SELECT *, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders),
      snap_a AS (
        SELECT o_orderkey, cents * 100 AS price_c4
        FROM base WHERE o_orderdate < DATE '1997-07-01'),
      snap_b AS (
        SELECT o_orderkey,
          CASE WHEN o_orderpriority = '1-URGENT'
                 AND o_orderdate < DATE '1997-07-01'
            THEN cents * 110 ELSE cents * 100 END AS price_c4
        FROM base
        WHERE o_orderdate < DATE '1998-01-01'
          AND NOT (o_orderstatus = 'F' AND o_orderdate < DATE '1993-01-01'))
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        CASE WHEN a.o_orderkey IS NULL THEN 'INSERT'
             WHEN b.o_orderkey IS NULL THEN 'DELETE'
             WHEN a.price_c4 <> b.price_c4 THEN 'UPDATE' END AS change_type,
        a.price_c4 AS old_price_c4, b.price_c4 AS new_price_c4
      FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
      WHERE CASE WHEN a.o_orderkey IS NULL THEN 'INSERT'
             WHEN b.o_orderkey IS NULL THEN 'DELETE'
             WHEN a.price_c4 <> b.price_c4 THEN 'UPDATE' END IS NOT NULL
      ORDER BY o_orderkey"""))

  /** Statement-level `MERGE INTO` — m01's exact semantics, but planned by
    * Spark SQL itself: the change batch merges into a table of the engine's
    * versioned V2 catalog ([[graft.sources.SnapshotCatalog]]), so the
    * statement goes through Catalyst's group-based row-level rewrite
    * (`RewriteMergeIntoTable` → `ReplaceData`) — the planning path the
    * reference's Iceberg `format_version: 2` tables exist to serve
    * (`create_iceberg_tables.py:121-128`). Oracle is m01's, byte-identical:
    * the operator form and the SQL statement must agree.
    *
    * Scale: the rewrite is ONE outer equi-join between target and source —
    * identical to m01's plan; with a file-grouped catalog the same
    * statement rewrites only matched groups. The snapshot table here is
    * dimension-sized (the statement's natural target), not a fact table.
    */
  val m05SqlMerge = Q(
    "m05_sql_merge",
    (s, dir) => {
      val t = "graft_snap.gov.customer_m05"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        c_custkey BIGINT, c_name STRING, c_nationkey INT,
        c_acctbal DOUBLE, c_mktsegment STRING)""")
      Tables.customer(s, dir).createOrReplaceTempView("m05_customer_src")
      s.sql(s"INSERT INTO $t SELECT * FROM m05_customer_src")
      val deltas = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(Q.dsum(col("o_totalprice")).as("rev"))
        .select(col("c_custkey"), col("rev"),
          lit(null).cast("string").as("new_name"),
          lit(null).cast("int").as("new_nationkey"),
          lit(null).cast("double").as("new_acctbal"))
      val inserts = Tables.supplier(s, dir)
        .select((col("s_suppkey") + 1000000L).as("c_custkey"),
          lit(null).cast("double").as("rev"),
          col("s_name").as("new_name"),
          col("s_nationkey").as("new_nationkey"),
          col("s_acctbal").as("new_acctbal"))
      deltas.unionAll(inserts).createOrReplaceTempView("m05_changes")
      s.sql(s"""MERGE INTO $t t USING m05_changes s ON t.c_custkey = s.c_custkey
        WHEN MATCHED THEN UPDATE SET
          t.c_acctbal = t.c_acctbal + coalesce(s.rev, CAST(0 AS DOUBLE))
        WHEN NOT MATCHED THEN INSERT
          (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
          VALUES (s.c_custkey, s.new_name, s.new_nationkey, s.new_acctbal, 'NEW')""")
      s.sql(s"SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment " +
        s"FROM $t ORDER BY c_custkey")
    },
    m01MergeUpsert.oracle)

  /** Statement-level `UPDATE` and `DELETE` through the same group-based
    * rewrite: stale finished orders get cancelled (UPDATE), one customer
    * decile is purged (DELETE — a GDPR-style erasure), and the survivors
    * are audited per priority. Exact-decimal sums keep the cross-engine
    * compare bit-exact. Each statement commits one snapshot, so the audit
    * reads the third version of the table.
    */
  val m06SqlUpdateDelete = Q(
    "m06_sql_update_delete",
    (s, dir) => {
      val t = "graft_snap.gov.orders_m06"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING)""")
      Tables.orders(s, dir).createOrReplaceTempView("m06_orders_src")
      s.sql(s"INSERT INTO $t SELECT * FROM m06_orders_src")
      s.sql(s"""UPDATE $t SET o_orderpriority = '9-CANCELLED'
        WHERE o_orderstatus = 'F' AND o_orderdate < TIMESTAMP '1993-01-01 00:00:00'""")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 7")
      s.sql(s"""SELECT o_orderpriority, count(*) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM $t GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    Some("""WITH upd AS (
        SELECT o_custkey, o_totalprice,
          CASE WHEN o_orderstatus = 'F' AND o_orderdate < TIMESTAMP '1993-01-01 00:00:00'
               THEN '9-CANCELLED' ELSE o_orderpriority END AS o_orderpriority
        FROM orders)
      SELECT o_orderpriority, count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM upd WHERE o_custkey % 10 <> 7
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Iceberg-style time travel: three commits build three snapshots (bulk
    * load of the 1993-and-earlier book, append of the rest, row-level
    * DELETE of still-open orders), then `VERSION AS OF 1/2/3` reads each
    * immutable state and audits it — the `VERSION AS OF` surface
    * `TableCatalog.loadTable(ident, version)` exists for. The oracle
    * reconstructs each version's state relationally, so a snapshot that
    * leaked rows across versions would hash-mismatch.
    */
  val m07TimeTravel = Q(
    "m07_time_travel",
    (s, dir) => {
      val t = "graft_snap.gov.orders_m07"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING)""")
      Tables.orders(s, dir).createOrReplaceTempView("m07_orders_src")
      s.sql(s"""INSERT INTO $t SELECT * FROM m07_orders_src
        WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"""INSERT INTO $t SELECT * FROM m07_orders_src
        WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"DELETE FROM $t WHERE o_orderstatus = 'O'")
      (1 to 3).map { v =>
        s.sql(s"""SELECT CAST($v AS BIGINT) AS version, count(*) AS n_orders,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
          FROM $t VERSION AS OF $v""")
      }.reduce(_.unionAll(_)).orderBy("version")
    },
    Some("""SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM orders WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*),
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
      FROM orders
      UNION ALL
      SELECT CAST(3 AS BIGINT), count(*),
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
      FROM orders WHERE o_orderstatus <> 'O'
      ORDER BY version"""))

  /** Change-data-feed over the versioned catalog: the table's whole history
    * (bulk load → late append → row-level UPDATE → GDPR-style DELETE, four
    * commits) replayed as row-level changes by
    * [[graft.operators.ChangeDataFeed.tableChanges]] — the incremental-read
    * surface Iceberg/Delta consumers use instead of re-scanning snapshots,
    * and the feed m03-style incremental refresh would consume. The oracle
    * reconstructs each version's state relationally and diffs adjacent
    * states, so a feed that missed a change, emitted an unchanged carry-over
    * row, or attributed a change to the wrong commit would hash-mismatch.
    *
    * Scale: each adjacent diff is one key-equi full-outer join (shuffle on
    * o_orderkey only); no snapshot is ever collected. See the operator's
    * scale contract for the manifest-based short-circuit a file catalog adds.
    */
  val m08ChangeFeed = Q(
    "m08_change_feed",
    (s, dir) => {
      val t = "graft_snap.gov.orders_m08"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_orderpriority STRING, o_totalprice DOUBLE)""")
      Tables.orders(s, dir).createOrReplaceTempView("m08_orders_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM m08_orders_src WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM m08_orders_src WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"""UPDATE $t SET o_orderpriority = '9-CANCELLED'
        WHERE o_orderstatus = 'F' AND o_custkey % 7 = 3""")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 7")
      graft.operators.ChangeDataFeed
        .tableChanges(s, t, Seq("o_orderkey"), fromVersion = 0L, toVersion = 4L)
        .orderBy("_commit_version", "o_orderkey")
    },
    Some("""WITH v2 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
          o_totalprice, o_orderdate
        FROM orders),
      v3 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderstatus = 'F' AND o_custkey % 7 = 3
               THEN '9-CANCELLED' ELSE o_orderpriority END AS o_orderpriority,
          o_totalprice
        FROM v2)
      SELECT o_orderkey, 'INSERT' AS _change_type,
        CAST(1 AS BIGINT) AS _commit_version,
        CAST(NULL AS BIGINT) AS old_o_custkey, o_custkey AS new_o_custkey,
        CAST(NULL AS VARCHAR) AS old_o_orderstatus,
        o_orderstatus AS new_o_orderstatus,
        CAST(NULL AS VARCHAR) AS old_o_orderpriority,
        o_orderpriority AS new_o_orderpriority,
        CAST(NULL AS DOUBLE) AS old_o_totalprice, o_totalprice AS new_o_totalprice
      FROM v2 WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'
      UNION ALL
      SELECT o_orderkey, 'INSERT', CAST(2 AS BIGINT),
        CAST(NULL AS BIGINT), o_custkey,
        CAST(NULL AS VARCHAR), o_orderstatus,
        CAST(NULL AS VARCHAR), o_orderpriority,
        CAST(NULL AS DOUBLE), o_totalprice
      FROM v2 WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      UNION ALL
      SELECT o_orderkey, 'UPDATE', CAST(3 AS BIGINT),
        o_custkey, o_custkey,
        o_orderstatus, o_orderstatus,
        o_orderpriority, '9-CANCELLED',
        o_totalprice, o_totalprice
      FROM v2 WHERE o_orderstatus = 'F' AND o_custkey % 7 = 3
        AND o_orderpriority <> '9-CANCELLED'
      UNION ALL
      SELECT o_orderkey, 'DELETE', CAST(4 AS BIGINT),
        o_custkey, CAST(NULL AS BIGINT),
        o_orderstatus, CAST(NULL AS VARCHAR),
        o_orderpriority, CAST(NULL AS VARCHAR),
        o_totalprice, CAST(NULL AS DOUBLE)
      FROM v3 WHERE o_custkey % 10 = 7
      ORDER BY _commit_version, o_orderkey"""))

  /** Incremental materialized-view maintenance driven by the change feed:
    * a per-priority (count, exact-decimal revenue) rollup is built once from
    * snapshot v1, then folded forward commit by commit using ONLY each
    * commit's CDF deltas ([[graft.operators.IncrementalMaintenance]]) —
    * never re-scanning the table. The history deliberately includes the two
    * cases naive maintenance gets wrong: the UPDATE commit moves rows
    * BETWEEN groups (priority is the group key and it changes, even birthing
    * a brand-new '9-CANCELLED' group), and the DELETE commit shrinks groups.
    * The oracle recomputes the rollup from scratch on the final state;
    * decimal delta-addition is associative, so the incremental view must be
    * hash-identical — any missed/double-counted delta fails the gate.
    *
    * Scale: each fold is one group-key outer join of |view| + |changed
    * groups| rows; the fact table is touched only by the CDF's own key-equi
    * diffs. This is how a 100 TB table's rollups stay fresh per commit.
    */
  val m09IncrementalMaint = Q(
    "m09_incremental_maint",
    (s, dir) => {
      import graft.operators.{ChangeDataFeed, IncrementalMaintenance => IM}
      val t = "graft_snap.gov.orders_m09"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_orderpriority STRING, o_totalprice DOUBLE)""")
      Tables.orders(s, dir).createOrReplaceTempView("m09_orders_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM m09_orders_src WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM m09_orders_src WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"""UPDATE $t SET o_orderpriority = '9-CANCELLED'
        WHERE o_orderstatus = 'F' AND o_custkey % 7 = 3""")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 7")

      val v1 = s.sql(s"SELECT * FROM $t VERSION AS OF 1")
      val maintained = (2L to 4L).foldLeft(
        IM.initial(v1, col("o_orderpriority"), col("o_totalprice"))) { (mv, v) =>
        val feed = ChangeDataFeed.tableChanges(s, t, Seq("o_orderkey"), v - 1, v)
        IM.applyDeltas(mv, IM.aggDeltas(feed,
          col("old_o_orderpriority"), col("old_o_totalprice"),
          col("new_o_orderpriority"), col("new_o_totalprice")))
      }
      maintained
        .select(col("group_key").as("o_orderpriority"), col("n_rows"),
          col("total").cast("double").as("total"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH v3 AS (
        SELECT o_custkey,
          CASE WHEN o_orderstatus = 'F' AND o_custkey % 7 = 3
               THEN '9-CANCELLED' ELSE o_orderpriority END AS o_orderpriority,
          o_totalprice
        FROM orders)
      SELECT o_orderpriority, count(*) AS n_rows,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM v3 WHERE o_custkey % 10 <> 7
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Partitioned copy-on-write governance: the table is identity-partitioned
    * by priority (the reference's `PARTITIONED BY` shape, `customers.yml:5-7`),
    * and each statement takes the CHEAPEST path its predicate allows —
    * `DELETE` on a partition predicate is a metadata-only commit (whole
    * files retire, nothing is read or written), `UPDATE` on a partition
    * predicate statically prunes its copy-on-write rewrite to that
    * partition's files, and `INSERT OVERWRITE ... PARTITION` swaps exactly
    * one partition's file set. FileSnapshotCowSuite pins the file-identity
    * mechanics (untouched files carry over by path); this gate pins the
    * cross-engine semantics of the composed statements.
    *
    * Scale: partition-decidable statements are the difference between an
    * O(partition) commit and an O(table) rewrite at 100 TB; the final audit
    * reads a live file set already pruned of the deleted partition.
    */
  val m10PartitionedCow = Q(
    "m10_partitioned_cow",
    (s, dir) => {
      val t = "graft_snap.gov.orders_m10"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE,
        o_orderpriority STRING) PARTITIONED BY (o_orderpriority)""")
      Tables.orders(s, dir).createOrReplaceTempView("m10_orders_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM m10_orders_src""")
      // Metadata-only: the partition predicate retires whole files.
      s.sql(s"DELETE FROM $t WHERE o_orderpriority = '5-LOW'")
      // Statically pruned rewrite: only the 1-URGENT partition's files are
      // scanned and replaced (decimal arithmetic keeps the oracle bit-exact).
      s.sql(s"""UPDATE $t SET o_totalprice =
          CAST(CAST(o_totalprice AS DECIMAL(18,4)) + CAST(100 AS DECIMAL(18,4)) AS DOUBLE)
        WHERE o_orderpriority = '1-URGENT'""")
      // Partition-scoped overwrite: 2-HIGH is republished from source with a
      // flat 10% discount; every other partition's files carry over.
      s.sql(s"""INSERT OVERWRITE $t PARTITION (o_orderpriority = '2-HIGH')
        SELECT o_orderkey, o_custkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(0.9 AS DECIMAL(2,1)) AS DOUBLE)
        FROM m10_orders_src WHERE o_orderpriority = '2-HIGH'""")
      s.sql(s"""SELECT o_orderpriority, count(*) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM $t GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    Some("""WITH kept AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderpriority <> '5-LOW'),
      cur AS (
        SELECT o_orderpriority,
          CASE WHEN o_orderpriority = '1-URGENT'
                 THEN CAST(CAST(o_totalprice AS DECIMAL(18,4)) + CAST(100 AS DECIMAL(18,4)) AS DOUBLE)
               WHEN o_orderpriority = '2-HIGH'
                 THEN CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(0.9 AS DECIMAL(2,1)) AS DOUBLE)
               ELSE o_totalprice END AS o_totalprice
        FROM kept)
      SELECT o_orderpriority, count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM cur GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** m08's feed computed the way a lake-scale consumer actually reads it:
    * [[graft.operators.ChangeDataFeed.tableChangesPruned]] diffs each
    * commit's MANIFEST (files added vs retired — copy-on-write guarantees a
    * file present in both versions holds identical rows) and scans only the
    * changed files, O(changed) per commit instead of O(table). Same table
    * history as m08, same relational oracle — the pruned and full feeds
    * must hash-identically agree, which is exactly the claim that file
    * pruning loses no change and invents none.
    */
  val m11ChangeFeedPruned = Q(
    "m11_change_feed_pruned",
    (s, dir) => {
      val t = "graft_snap.gov.orders_m11"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_orderpriority STRING, o_totalprice DOUBLE)""")
      Tables.orders(s, dir).createOrReplaceTempView("m11_orders_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM m11_orders_src WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM m11_orders_src WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"""UPDATE $t SET o_orderpriority = '9-CANCELLED'
        WHERE o_orderstatus = 'F' AND o_custkey % 7 = 3""")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 7")
      graft.operators.ChangeDataFeed
        .tableChangesPruned(s, "graft_snap", Seq("gov", "orders_m11"),
          Seq("o_orderkey"), fromVersion = 0L, toVersion = 4L)
        .orderBy("_commit_version", "o_orderkey")
    },
    m08ChangeFeed.oracle)

  /** The `history` METADATA TABLE as a relation (`SELECT … FROM t.history`
    * — Iceberg's `db.table.history` surface, served by the catalog's
    * metadata-suffix fallback as a driver-local scan): commit lineage
    * (version, kind, live row count) of a deterministic three-commit
    * script over the orders fixture. The oracle reconstructs each
    * version's expected lineage row from the SAME fixture predicates, so
    * a history that misnumbered versions, misclassified a commit
    * (append vs copy-on-write overwrite), or miscounted a snapshot's live
    * rows would hash-mismatch. `committed_at` and file counts are excluded: wall
    * clock and write-task parallelism are not cross-engine-deterministic
    * (they are sbt-gated in SnapshotMetaSuite instead).
    *
    * Scale: the relation is |snapshots|-bounded metadata — a LocalScan by
    * design (the catalog's driver-holds-metadata-only contract), so there
    * is nothing to distribute.
    */
  val m12MetadataHistory = Q(
    "m12_metadata_history",
    (s, dir) => {
      val t = "graft_snap.gov.orders_m12"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE)""")
      Tables.orders(s, dir).createOrReplaceTempView("m12_orders_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM m12_orders_src WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM m12_orders_src WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"DELETE FROM $t WHERE o_orderstatus = 'O'")
      s.sql(s"""SELECT version, operation, total_rows
        FROM $t.history ORDER BY version""")
    },
    Some("""SELECT CAST(1 AS BIGINT) AS version, 'append' AS operation,
        count(*) AS total_rows
      FROM orders WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'append', count(*) FROM orders
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'overwrite', count(*)
      FROM orders WHERE o_orderstatus <> 'O'
      ORDER BY version"""))

  /** m06's UPDATE + DELETE under MERGE-ON-READ (`write.update.mode` /
    * `write.delete.mode` = merge-on-read, Iceberg v2's delta mode): the
    * statements append position-delete files and new data files instead of
    * rewriting groups — every original data file survives byte-identical —
    * and the audit reads through the delete-applying scan. Same oracle as
    * m06, so the MOR read/write path is gated hash-exact against the
    * copy-on-write semantics it must match. The in-query assertion pins
    * that the mode actually engaged (v1's data files all carried into v3):
    * without it a silently-COW run would pass the oracle too.
    *
    * Scale: THIS is the fast-write mode for a 100 TB table — a k-row
    * DELETE writes O(k) position bytes instead of rewriting every touched
    * file; reads pay a per-file delete-set union until
    * `rewrite_data_files` folds the deletes in (MergeOnReadSuite pins the
    * compaction purge).
    */
  val m13MergeOnRead = Q(
    "m13_mor_update_delete",
    (s, dir) => {
      val t = "graft_snap.gov.orders_m13"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING)
        TBLPROPERTIES (
          'write.update.mode'='merge-on-read',
          'write.delete.mode'='merge-on-read')""")
      Tables.orders(s, dir).createOrReplaceTempView("m13_orders_src")
      s.sql(s"INSERT INTO $t SELECT * FROM m13_orders_src")
      s.sql(s"""UPDATE $t SET o_orderpriority = '9-CANCELLED'
        WHERE o_orderstatus = 'F' AND o_orderdate < TIMESTAMP '1993-01-01 00:00:00'""")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 7")
      val k = graft.sources.SnapshotStore.keyOf("graft_snap", Seq("gov", "orders_m13"))
      val v1 = graft.sources.SnapshotStore.filesAt(k, 1L).map(_.path).toSet
      val v3 = graft.sources.SnapshotStore.filesAt(k, 3L).map(_.path).toSet
      require(v1.subsetOf(v3) &&
        graft.sources.SnapshotStore.deletesAt(k, 3L).nonEmpty,
        "merge-on-read did not engage: expected carried data files + delete files")
      s.sql(s"""SELECT o_orderpriority, count(*) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM $t GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    m06SqlUpdateDelete.oracle)

  /** Star join against a PARTITIONED catalog table under DYNAMIC partition
    * pruning: suppliers land partitioned by nation in the snapshot
    * catalog, the nation dim carries a selective region filter, and the
    * fact scan's file list is pruned at execution by the dim's actual
    * keys (`SupportsRuntimeV2Filtering`; the in-query assertion pins the
    * dynamic-pruning runtime filter is IN the executed plan, so a
    * silently-unpruned run cannot pass). Oracle: the same join over the
    * raw parquet — DPP must be invisible in the answer.
    *
    * Scale: this is the 100 TB star-join pattern — the fact side opens
    * only the partitions the dimension selects, with no static predicate
    * anywhere in the query text.
    */
  val m14DppStar = Q(
    "m14_dpp_star",
    (s, dir) => {
      val t = "graft_snap.gov.supplier_m14"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        s_suppkey BIGINT, s_name STRING, s_acctbal DOUBLE, nk INT)
        PARTITIONED BY (nk)""")
      Tables.supplier(s, dir)
        .selectExpr("s_suppkey", "s_name", "s_acctbal",
          "CAST(s_nationkey AS INT) AS nk")
        .writeTo(t).append()
      Tables.nation(s, dir).createOrReplaceTempView("m14_nation_src")
      // The fact scan reports HONEST manifest statistics (hundreds of
      // rows at fixture scale), so DPP's benefit heuristic — ratio ×
      // fact bytes > dim bytes — would rightly skip pruning a fact
      // smaller than its dimension. Production facts dwarf dims by
      // 10^6×; pin the ratio so the gate keeps proving the mechanism
      // (see m21 for the full rationale).
      val ratioKey =
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"
      val prev = s.conf.getOption(ratioKey)
      s.conf.set(ratioKey, "1000000")
      try {
        val q = s.sql(
          s"""SELECT n.n_name, count(*) AS n_supp,
             |  CAST(sum(CAST(f.s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
             |FROM $t f JOIN m14_nation_src n ON f.nk = n.n_nationkey
             |WHERE n.n_regionkey IN (1, 2)
             |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
        require(q.queryExecution.executedPlan.toString
            .contains("RuntimeFilters: [dynamicpruning"),
          "dynamic partition pruning did not engage on the fact scan")
        q
      } finally {
        prev.fold(s.conf.unset(ratioKey))(s.conf.set(ratioKey, _))
      }
    },
    Some("""SELECT n.n_name, count(*) AS n_supp,
        CAST(sum(CAST(s.s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_regionkey IN (1, 2)
      GROUP BY n.n_name ORDER BY n.n_name"""))

  /** The `.changes` RELATION (Delta's `table_changes` / Iceberg's changelog
    * surface, served by the catalog's metadata-suffix fallback as a
    * DISTRIBUTED scan): the whole commit history replayed as row-level
    * changes computed exactly from the catalog's own metadata — manifest
    * diffs for appends, position-delete files for merge-on-read commits —
    * with NO key columns and NO joins, unlike the m08 operator feed. The
    * script runs under merge-on-read modes so every rewrite is row-exact:
    * the UPDATE surfaces as DELETE (old image, read from the delete file's
    * positions) + INSERT (new image), the DELETE as row-exact DELETEs
    * against the live v3 state. The oracle reconstructs all five change
    * blocks relationally from the same fixture predicates — a feed that
    * leaked a carried row, missed a position, or misnumbered a commit
    * hash-mismatches.
    *
    * Scale: this is the CDC story for a 100 TB table — each commit's feed
    * reads only the files that commit touched (O(changes), never O(table)),
    * and the same relation streams (`readStream.table("t.changes")`), so
    * downstream view maintenance tails rewrites the append-only source must
    * refuse. ChangeFeedSuite pins streaming, rollback-restore, compaction
    * transparency, and expired-history loudness.
    */
  val m15ChangesRelation = Q(
    "m15_changes_relation",
    (s, dir) => {
      val t = "graft_snap.gov.orders_m15"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP)
        TBLPROPERTIES (
          'write.update.mode'='merge-on-read',
          'write.delete.mode'='merge-on-read')""")
      Tables.orders(s, dir).createOrReplaceTempView("m15_orders_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        FROM m15_orders_src WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        FROM m15_orders_src WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"""UPDATE $t SET o_totalprice =
          CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(0.9 AS DECIMAL(2,1)) AS DOUBLE)
        WHERE o_orderstatus = 'F' AND o_custkey % 7 = 3""")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 7")
      s.sql(s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
          _change_type, _commit_version
        FROM $t.changes
        ORDER BY _commit_version, _change_type, o_orderkey""")
    },
    Some("""WITH v3 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate,
          o_totalprice AS orig,
          CASE WHEN o_orderstatus = 'F' AND o_custkey % 7 = 3
            THEN CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(0.9 AS DECIMAL(2,1)) AS DOUBLE)
            ELSE o_totalprice END AS updated
        FROM orders),
      feed AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, orig AS o_totalprice,
          'INSERT' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
        FROM v3 WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, orig, 'INSERT', 2
        FROM v3 WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, orig, 'DELETE', 3
        FROM v3 WHERE o_orderstatus = 'F' AND o_custkey % 7 = 3
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, updated, 'INSERT', 3
        FROM v3 WHERE o_orderstatus = 'F' AND o_custkey % 7 = 3
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, updated, 'DELETE', 4
        FROM v3 WHERE o_custkey % 10 = 7)
      SELECT * FROM feed
      ORDER BY _commit_version, _change_type, o_orderkey"""))

  /** WRITE-AUDIT-PUBLISH via branches (Iceberg's branch refs +
    * `fast_forward`): the 1994+ order cohort is staged on a branch —
    * committed data files, ZERO visibility on main — audited through the
    * branch read, then published by splicing the staged commits onto the
    * main log as ordinary time-travelable versions. The in-query pins make
    * the isolation load-bearing: a catalog that leaked staged rows to main
    * (or served the branch read from main) fails BEFORE the oracle runs,
    * and the final audit over published main must hash-match the plain
    * full-fixture aggregate — publish is exactly append, nothing lost or
    * doubled.
    *
    * Scale: staging is O(new data) file writes + one metadata splice to
    * publish — the pattern that lets a 100 TB table take hours-long
    * validated ingest without readers ever seeing half a load.
    */
  val m16WapPublish = Q(
    "m16_wap_publish",
    (s, dir) => {
      val t = "graft_snap.gov.orders_m16"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE,
        o_orderdate TIMESTAMP)""")
      Tables.orders(s, dir).createOrReplaceTempView("m16_orders_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_orderpriority, o_totalprice, o_orderdate
        FROM m16_orders_src WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql("CALL graft_snap.system.create_branch('gov.orders_m16', 'ingest')")
      // WRITE: stage the new cohort on the branch.
      s.sql(s"""INSERT INTO $t.branch_ingest
        SELECT o_orderkey, o_orderpriority, o_totalprice, o_orderdate
        FROM m16_orders_src WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'""")
      // AUDIT: staged rows visible on the branch, invisible on main.
      val mainN = s.sql(s"SELECT count(*) FROM $t").head().getLong(0)
      val branchN =
        s.sql(s"SELECT count(*) FROM $t.branch_ingest").head().getLong(0)
      val oldN = s.sql("""SELECT count(*) FROM m16_orders_src
        WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'""").head().getLong(0)
      val allN = s.sql("SELECT count(*) FROM m16_orders_src").head().getLong(0)
      require(mainN == oldN && branchN == allN,
        s"WAP isolation broke: main=$mainN (want $oldN), branch=$branchN (want $allN)")
      // PUBLISH.
      s.sql("CALL graft_snap.system.fast_forward('gov.orders_m16', 'ingest')")
      s.sql(s"""SELECT o_orderpriority, count(*) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM $t GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** m09's incremental view maintenance re-driven from the `.changes`
    * RELATION instead of the key-joined operator feed: the relation carries
    * no old/new images and no keys — just signed INSERT/DELETE rows — and
    * under DEFAULT copy-on-write modes its rewrites surface at FILE grain,
    * so every carried row of a rewritten file arrives as a DELETE+INSERT
    * pair. The sign-fold is exact anyway (equal decimal contributions
    * cancel; group-moving updates split into −old-group/+new-group rows
    * naturally), so the maintained view must hash-match the from-scratch
    * recompute — m09's own oracle. This is the claim that a CDC consumer
    * needs NO key knowledge and NO net-changes view to maintain exact
    * distributive rollups.
    *
    * Scale: deltas aggregate O(changed files)' rows (the feed never scans
    * unchanged files — CdfProbe's flat curve), then one |view|-sized fold.
    */
  val m17ChangesMaint = Q(
    "m17_changes_maint",
    (s, dir) => {
      import graft.operators.{IncrementalMaintenance => IM}
      val t = "graft_snap.gov.orders_m17"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_orderpriority STRING, o_totalprice DOUBLE)""")
      Tables.orders(s, dir).createOrReplaceTempView("m17_orders_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM m17_orders_src WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM m17_orders_src WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'""")
      s.sql(s"""UPDATE $t SET o_orderpriority = '9-CANCELLED'
        WHERE o_orderstatus = 'F' AND o_custkey % 7 = 3""")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 7")

      val v1 = s.sql(s"SELECT * FROM $t VERSION AS OF 1")
      val feed = s.read.option("startingVersion", "2").table(s"$t.changes")
      val maintained = IM.applyDeltas(
        IM.initial(v1, col("o_orderpriority"), col("o_totalprice")),
        IM.aggDeltasFromChanges(feed,
          col("o_orderpriority"), col("o_totalprice")))
      maintained
        .select(col("group_key").as("o_orderpriority"), col("n_rows"),
          col("total").cast("double").as("total"))
        .orderBy("o_orderpriority")
    },
    m09IncrementalMaint.oracle)

  /** STREAMING UPSERT over EQUALITY-DELETE files (Iceberg v2's second
    * merge-on-read flavor, [[graft.sources.SnapshotUpsert]]): three
    * upsert batches land as delta commits that never read the target —
    * each commits its rows as appends plus its keys as one equality-delete
    * file applying to strictly-older data files. The final table must be
    * exactly last-batch-wins MERGE semantics, which the oracle reproduces
    * with a CASE over the deterministic batch membership. */
  val m18EqualityUpsert = Q(
    "m18_equality_upsert",
    (s, dir) => {
      val t = "graft_snap.gov.orders_m18"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"CREATE TABLE $t (o_orderkey BIGINT, o_custkey BIGINT, " +
        "price DOUBLE)")
      val src = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").as("price"))
      // Batch 1: keys ≡ 0,1 (mod 4); batch 2 REVISES ≡ 1 and adds ≡ 2;
      // batch 3 revises ≡ 2 and adds ≡ 3. Winners: 0→b1, 1→b2, 2→b3(×3
      // via b2's ×2? no: b3 covers ≡2,3 at ×3), see the oracle CASE.
      import graft.sources.SnapshotUpsert
      SnapshotUpsert.upsertBatch(t,
        src.filter(col("o_orderkey") % 4 <= 1), Seq("o_orderkey"))
      SnapshotUpsert.upsertBatch(t,
        src.filter(col("o_orderkey") % 4 === 1)
          .withColumn("price", col("price") * 2)
          .unionAll(src.filter(col("o_orderkey") % 4 === 2)
            .withColumn("price", col("price") * 2)),
        Seq("o_orderkey"))
      SnapshotUpsert.upsertBatch(t,
        src.filter(col("o_orderkey") % 4 >= 2)
          .withColumn("price", col("price") * 3), Seq("o_orderkey"))
      s.table(t)
        .groupBy((col("o_orderkey") % 4).as("bucket"))
        .agg(count(lit(1)).as("n"), Q.dsum(col("price")).as("total"))
        .orderBy("bucket")
    },
    Some("""SELECT o_orderkey % 4 AS bucket, count(*) AS n,
        CAST(sum(CAST(o_totalprice *
          CASE WHEN o_orderkey % 4 >= 2 THEN 3
               WHEN o_orderkey % 4 = 1 THEN 2
               ELSE 1 END AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM orders
      GROUP BY 1 ORDER BY bucket"""))

  /** The CHANGE FEED over an equality-delete history: an upsert commit
    * records only key tuples, so its row-level DELETEs are RECONSTRUCTED
    * by probing each older file with the commit's key sets, minus rows
    * already dead (earlier upserts' keys, position deletes) — Iceberg's
    * changelog semantics for eq deletes, here oracle-gated: the whole
    * 3-upsert feed aggregated by (change_type, bucket) must match the
    * closed-form membership algebra of the batches. */
  val m19UpsertChanges = Q(
    "m19_upsert_changes",
    (s, dir) => {
      val t = "graft_snap.gov.orders_m19"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"CREATE TABLE $t (o_orderkey BIGINT, o_custkey BIGINT, " +
        "price DOUBLE)")
      val src = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").as("price"))
      import graft.sources.SnapshotUpsert
      SnapshotUpsert.upsertBatch(t,
        src.filter(col("o_orderkey") % 4 <= 1), Seq("o_orderkey"))
      SnapshotUpsert.upsertBatch(t,
        src.filter(col("o_orderkey") % 4 === 1)
          .withColumn("price", col("price") * 2)
          .unionAll(src.filter(col("o_orderkey") % 4 === 2)
            .withColumn("price", col("price") * 2)),
        Seq("o_orderkey"))
      SnapshotUpsert.upsertBatch(t,
        src.filter(col("o_orderkey") % 4 >= 2)
          .withColumn("price", col("price") * 3), Seq("o_orderkey"))
      s.read.option("startingVersion", 1).option("endingVersion", 3)
        .table(s"$t.changes")
        .select(col("_change_type").as("change_type"),
          (col("o_orderkey") % 4).as("bucket"), col("price"))
        .groupBy("change_type", "bucket")
        .agg(count(lit(1)).as("n"), Q.dsum(col("price")).as("total"))
        .orderBy("change_type", "bucket")
    },
    // Batch membership: b1 inserts ≡0,1 (×1); b2 revises ≡1 and adds ≡2
    // (×2); b3 revises ≡2 and adds ≡3 (×3). Deletes: v2 kills b1's ≡1
    // rows (×1), v3 kills b2's ≡2 rows (×2) — ≡3 had nothing older.
    Some("""WITH base AS (
        SELECT o_orderkey % 4 AS bucket, o_totalprice AS p FROM orders),
      ev AS (
        SELECT 'INSERT' AS change_type, bucket, p * 1 AS v FROM base WHERE bucket <= 1
        UNION ALL SELECT 'INSERT', bucket, p * 2 FROM base WHERE bucket IN (1, 2)
        UNION ALL SELECT 'INSERT', bucket, p * 3 FROM base WHERE bucket >= 2
        UNION ALL SELECT 'DELETE', bucket, p * 1 FROM base WHERE bucket = 1
        UNION ALL SELECT 'DELETE', bucket, p * 2 FROM base WHERE bucket = 2)
      SELECT change_type, bucket, count(*) AS n,
        CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM ev GROUP BY 1, 2
      ORDER BY change_type, bucket"""))

  /** HIDDEN PARTITIONING (Iceberg partition transforms,
    * [[graft.sources.PTransform]]): a table `PARTITIONED BY (days(ts),
    * bucket(4, user_id))` — queries filter on the DATA columns (`ts`
    * BETWEEN, `user_id =`) and never name a partition column; the engine
    * routes writes through the transforms and prunes day/bucket files by
    * pushing the data predicates THROUGH them (PartitionTransformSuite
    * pins the scan volume: the range below opens only its days' files).
    * The oracle runs the identical filter over the raw parquet — results
    * must be hash-exact, proving transform routing + pruning lose and
    * invent nothing. */
  val m20HiddenPartitioning = Q(
    "m20_hidden_partitioning",
    (s, dir) => {
      val t = "graft_snap.gov.events_m20"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"CREATE TABLE $t (event_id BIGINT, user_id BIGINT, " +
        "event_type STRING, ts TIMESTAMP, value DOUBLE) " +
        "PARTITIONED BY (days(ts), bucket(4, user_id))")
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), col("value"))
        .writeTo(t).append()
      s.table(t)
        .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("total"),
          countDistinct(col("user_id")).as("users"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total,
        count(DISTINCT user_id) AS users
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        AND ts < TIMESTAMP '2024-01-16 00:00:00'
      GROUP BY event_type ORDER BY event_type"""))

  /** Star join where BOTH sides live in the snapshot catalog — the shape
    * the catalog's `SupportsReportStatistics` surface exists for. Without
    * reported statistics a V2 relation costs `spark.sql.defaultSizeInBytes`
    * (≈ infinite), so a 25-row catalog dimension could never STATICALLY
    * plan as the broadcast side and dynamic partition pruning (which
    * reuses that broadcast) never engages; m14 only passed because its
    * dimension was a raw-parquet temp view. Here the dimension is a
    * catalog table: the in-query asserts pin (a) the dim side planned
    * BroadcastHashJoin from manifest-reported sizes alone and (b) the
    * fact scan carrying the dynamic-pruning runtime filter. The oracle is
    * the same join over raw parquet — stats must be invisible in the
    * answer.
    *
    * The fallbackFilterRatio pin models production selectivity: DPP's
    * benefit heuristic compares `ratio × fact-scan bytes` against the
    * dim's scan bytes, and at fixture scale the honest fact estimate
    * (hundreds of rows) is SMALLER than the dim's parquet footprint —
    * at 100 TB the fact dwarfs the dim by 10^6×. Pinning the ratio for
    * the gate keeps the MECHANISM proven while the cost model stays
    * honest for real scans. */
  val m21CatalogDimStar = Q(
    "m21_catalog_dim_star",
    (s, dir) => {
      val fact = "graft_snap.gov.supplier_m21"
      val dim = "graft_snap.gov.nation_m21"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP TABLE IF EXISTS $fact")
      s.sql(s"DROP TABLE IF EXISTS $dim")
      s.sql(s"""CREATE TABLE $fact (
        s_suppkey BIGINT, s_name STRING, s_acctbal DOUBLE, nk INT)
        PARTITIONED BY (nk)""")
      Tables.supplier(s, dir)
        .selectExpr("s_suppkey", "s_name", "s_acctbal",
          "CAST(s_nationkey AS INT) AS nk")
        .writeTo(fact).append()
      s.sql(s"CREATE TABLE $dim (n_nationkey INT, n_name STRING, n_regionkey BIGINT)")
      Tables.nation(s, dir)
        .selectExpr("CAST(n_nationkey AS INT) AS n_nationkey", "n_name",
          "n_regionkey")
        .writeTo(dim).append()
      val ratioKey =
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"
      val prev = s.conf.getOption(ratioKey)
      s.conf.set(ratioKey, "1000000")
      try {
        val q = s.sql(
          s"""SELECT n.n_name, count(*) AS n_supp,
             |  CAST(sum(CAST(f.s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
             |FROM $fact f JOIN $dim n ON f.nk = n.n_nationkey
             |WHERE n.n_regionkey IN (1, 2)
             |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
        val plan = q.queryExecution.executedPlan.toString
        require(plan.contains("RuntimeFilters: [dynamicpruning"),
          "dynamic partition pruning did not engage on the catalog fact scan")
        require(plan.contains("BroadcastHashJoin"),
          "the catalog dimension did not plan as the broadcast side")
        q
      } finally {
        prev.fold(s.conf.unset(ratioKey))(s.conf.set(ratioKey, _))
      }
    },
    Some("""SELECT n.n_name, count(*) AS n_supp,
        CAST(sum(CAST(s.s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_regionkey IN (1, 2)
      GROUP BY n.n_name ORDER BY n.n_name"""))

  /** SQL VIEWS on the catalog (round 14): the derived-dataset surface —
    * a versioned view DEFINITION persisted in the metadata log
    * (`view-v<N>.json`), read back by re-parsing + re-analyzing the
    * stored SQL under its creation-time name context. The gate CREATEs,
    * REPLACEs (so the log holds two definition versions), reads the
    * CURRENT definition for the oracle answer, and asserts in-query that
    * `VERSION AS OF 1` still serves the original definition — the
    * "views version like schemas" contract. Oracle: the view body
    * inlined over raw parquet — the view layer must be invisible in the
    * answer. CatalogViewSuite pins restart reload, dropped-column
    * loudness, aliases, nesting, and cycles. */
  val r02ViewQuery = Q(
    "r02_view_query",
    (s, dir) => {
      val t = "graft_snap.gov.orders_r02"
      val v = "graft_snap.gov.orders_r02_v"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP VIEW IF EXISTS $v")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE)""")
      Tables.orders(s, dir)
        .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .writeTo(t).append()
      s.sql(s"CREATE VIEW $v AS SELECT o_orderstatus, count(*) AS n FROM $t GROUP BY o_orderstatus")
      s.sql(s"""CREATE OR REPLACE VIEW $v AS
        SELECT o_orderstatus, count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM $t GROUP BY o_orderstatus""")
      // Definition history is time-travelable: v1 had no `total` column.
      require(s.sql(s"SELECT * FROM $v VERSION AS OF 1").columns.length == 2,
        "VERSION AS OF 1 must serve the ORIGINAL view definition")
      s.sql(s"SELECT * FROM $v ORDER BY o_orderstatus")
    },
    Some("""SELECT o_orderstatus, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** DECLARATIVE MATERIALIZED VIEWS (round 15,
    * [[graft.sources.MaterializedViews]]): m09/m17's maintenance algebra
    * promoted to a STATEMENT — `CREATE MATERIALIZED VIEW` validates the
    * body is incrementally maintainable and materializes it with a base-
    * version watermark; `CALL system.refresh_mv` folds the base's
    * `.changes` since the watermark into the stored table with one MERGE.
    * The history is the adversarial one (a group-MOVING update that
    * births a brand-new priority, then deletes), over a MULTI-column key
    * and a nullable decimal measure with its count(col) witness. In-query
    * pins: reads before refresh serve the STORED (stale) rows without
    * recomputation — that is the point of materializing — and the CALL
    * reports the exact watermark movement. Oracle: the body recomputed
    * from scratch on the final state; decimal folding is associative, so
    * the refreshed view must be hash-identical.
    *
    * Scale: refresh aggregates O(changed rows) and merges |view| +
    * |changed groups| — the 100 TB dashboard rollup stays fresh per
    * commit without ever rescanning the fact table. */
  val r03MaterializedView = Q(
    "r03_materialized_view",
    (s, dir) => {
      val t = "graft_snap.gov.orders_r03"
      val v = "graft_snap.gov.orders_r03_mv"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP MATERIALIZED VIEW IF EXISTS $v")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_orderpriority STRING, price DECIMAL(12,2))""")
      Tables.orders(s, dir).createOrReplaceTempView("r03_orders_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
          CAST(o_totalprice AS DECIMAL(12,2))
        FROM r03_orders_src WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'""")
      s.sql(s"""CREATE MATERIALIZED VIEW $v AS
        SELECT o_orderstatus AS st, o_orderpriority AS pri, count(*) AS n,
          sum(price) AS total, count(price) AS np, avg(o_custkey) AS ac
        FROM $t WHERE o_custkey % 3 <> 1
        GROUP BY o_orderstatus, o_orderpriority""")
      val atV1 = s.sql(s"SELECT sum(n) FROM $v").head().getLong(0)
      // Commits 2..4: the rest of the inserts, a group-moving update
      // (priority is half the key and it CHANGES, birthing 9-CANCELLED),
      // and deletes.
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
          CAST(o_totalprice AS DECIMAL(12,2))
        FROM r03_orders_src WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'""")
      s.sql(s"""UPDATE $t SET o_orderpriority = '9-CANCELLED'
        WHERE o_orderstatus = 'F' AND o_custkey % 7 = 3""")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 7")
      // Reads serve the STORED rows — stale until refreshed, by design.
      require(s.sql(s"SELECT sum(n) FROM $v").head().getLong(0) == atV1,
        "an unrefreshed materialized view must serve its stored snapshot")
      val r = s.sql(
        "CALL graft_snap.system.refresh_mv(table => 'gov.orders_r03_mv')").head()
      require(r.getLong(0) == 1L && r.getLong(1) == 4L && r.getBoolean(2),
        s"refresh_mv must move the watermark 1 -> 4, got $r")
      s.sql(s"""SELECT st, pri, n, CAST(total AS DOUBLE) AS total, np, ac
        FROM $v ORDER BY st, pri""")
    },
    Some("""WITH src AS (
        SELECT o_custkey, o_orderstatus,
          CASE WHEN o_orderstatus = 'F' AND o_custkey % 7 = 3
               THEN '9-CANCELLED' ELSE o_orderpriority END AS pri,
          CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders)
      SELECT o_orderstatus AS st, pri, count(*) AS n,
        CAST(sum(price) AS DOUBLE) AS total, count(price) AS np,
        avg(o_custkey) AS ac
      FROM src WHERE o_custkey % 10 <> 7 AND o_custkey % 3 <> 1
      GROUP BY o_orderstatus, pri ORDER BY st, pri"""))

  /** AUTOMATIC MV-BASED QUERY REWRITE (round 16,
    * [[graft.sources.MvQueryRewrite]]): an aggregate over the BASE table
    * is transparently served from a FRESH materialized view of it — the
    * warehouse optimization MVs exist for. The gate builds the r03-style
    * scenario (MV at commit 1, three more base commits, refresh), then
    * runs the dashboard query against the BASE table:
    *
    *   - in-query pin 1: while the MV is STALE, the base query's plan
    *     scans the base, never the view (a wrong answer served fast is
    *     still wrong);
    *   - in-query pin 2: after refresh_mv, the EXACT body shape plans as
    *     a scan of the view's files — the base is not read at all;
    *   - the RETURNED frame is a COARSER aggregate (GROUP BY status
    *     only) — the subsumption path: the rule re-aggregates the stored
    *     partials (count(*) → sum(n), sum/count → sums of partials), and
    *     its plan is pinned in-query to scan the view, not the base.
    *
    * Oracle: DuckDB recomputes the coarser aggregate from the raw
    * parquet — the rewrite chain (fold-refreshed MV + partial re-add)
    * must be hash-identical to a from-scratch recompute.
    *
    * Scale: the rewritten query reads |groups| stored rows instead of
    * the 100 TB fact table — plan-time matching is metadata-only (one
    * table listing + property probes). */
  val r04MvRewrite = Q(
    "r04_mv_rewrite",
    (s, dir) => {
      val t = "graft_snap.gov.orders_r04"
      val v = "graft_snap.gov.r04_rollup_mv"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP MATERIALIZED VIEW IF EXISTS $v")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_orderpriority STRING, price DECIMAL(12,2))""")
      Tables.orders(s, dir).createOrReplaceTempView("r04_orders_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
          CAST(o_totalprice AS DECIMAL(12,2))
        FROM r04_orders_src WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""")
      s.sql(s"""CREATE MATERIALIZED VIEW $v AS
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          sum(price) AS total, count(price) AS np, avg(o_custkey) AS ac
        FROM $t WHERE o_custkey % 3 <> 1
        GROUP BY o_orderstatus, o_orderpriority""")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
          CAST(o_totalprice AS DECIMAL(12,2))
        FROM r04_orders_src WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'""")
      s.sql(s"""UPDATE $t SET o_orderpriority = '9-CANCELLED'
        WHERE o_orderstatus = 'F' AND o_custkey % 7 = 3""")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 7")
      def scansOf(df: DataFrame): Seq[String] =
        "BatchScan ([^\\[ ]+)".r
          .findAllMatchIn(df.queryExecution.executedPlan.toString)
          .map(_.group(1)).toSeq
      val body = s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        sum(price) AS total, count(price) AS np, avg(o_custkey) AS ac
        FROM $t WHERE o_custkey % 3 <> 1
        GROUP BY o_orderstatus, o_orderpriority"""
      // While the MV is STALE: with the top-up disabled the stored rows
      // must never serve (a wrong answer served fast is still wrong) —
      // the base is scanned, the view is not. (With it enabled the stale
      // view serves view ∪ fold(.changes) — r07's gate.)
      s.conf.set(graft.sources.MvQueryRewrite.TopUpKey, "false")
      val stale =
        try scansOf(s.sql(body))
        finally s.conf.unset(graft.sources.MvQueryRewrite.TopUpKey)
      require(stale.exists(_.contains("orders_r04")) &&
        !stale.exists(_.contains("r04_rollup_mv")),
        s"a STALE materialized view must never serve its stored rows: $stale")
      s.sql("CALL graft_snap.system.refresh_mv(table => 'gov.r04_rollup_mv')")
      val exact = scansOf(s.sql(body))
      require(exact.exists(_.contains("r04_rollup_mv")) &&
        !exact.exists(_.contains("orders_r04")),
        s"the fresh MV must serve the exact body shape, base unread: $exact")
      // The returned frame: COARSER groups (subsumption — re-aggregated
      // stored partials), still written as a query over the BASE table.
      val df = s.sql(s"""SELECT o_orderstatus AS st, count(*) AS n,
        CAST(sum(price) AS DOUBLE) AS total, count(price) AS np,
        avg(o_custkey) AS ac
        FROM $t WHERE o_custkey % 3 <> 1
        GROUP BY o_orderstatus ORDER BY st""")
      val sub = scansOf(df)
      require(sub.exists(_.contains("r04_rollup_mv")) &&
        !sub.exists(_.contains("orders_r04")),
        s"the coarser aggregate must re-aggregate the MV, base unread: $sub")
      df
    },
    Some("""WITH src AS (
        SELECT o_custkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders)
      SELECT o_orderstatus AS st, count(*) AS n,
        CAST(sum(price) AS DOUBLE) AS total, count(price) AS np,
        avg(o_custkey) AS ac
      FROM src WHERE o_custkey % 10 <> 7 AND o_custkey % 3 <> 1
      GROUP BY o_orderstatus ORDER BY st"""))

  /** STAR-SCHEMA (join) MATERIALIZED VIEWS (round 16,
    * [[graft.sources.MaterializedViews]] star bodies): the dashboard
    * norm — `fact ⋈ dim + GROUP BY dim attribute` — maintained
    * incrementally when only the FACT advances. Refresh joins the
    * bounded fact `.changes` to the dimension PINNED `AS OF` its
    * recorded watermark and folds one MERGE, exactly like r03's
    * single-table algebra (the join only widens the delta rows).
    *
    * The history is adversarial for a JOIN fold: plain inserts, a JOIN-
    * KEY-moving update (`o_custkey` changes, moving rows across customer
    * segments — the group lives on the DIM side), then deletes. In-query
    * pins: a DIMENSION commit + a fact insert fold together in ONE
    * incremental refresh (round 18's dim-delta fold — the joined delta
    * telescopes into one signed term per advanced input), and a second
    * refresh is a no-op. Oracle: DuckDB recomputes the join-aggregate
    * from raw parquet with the same update/delete applied — the folded
    * view must be hash-identical.
    *
    * Scale: each refresh is O(fact changed rows) joined to a broadcast
    * dimension plus O(dim changed rows) joined to the key-pruned fact —
    * the fact is never rescanned wholesale (r09 pins the scan volume). */
  val r05StarMv = Q(
    "r05_star_mv",
    (s, dir) => {
      val t = "graft_snap.gov.orders_r05"
      val d = "graft_snap.gov.cust_r05"
      val v = "graft_snap.gov.r05_seg_mv"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP MATERIALIZED VIEW IF EXISTS $v")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"DROP TABLE IF EXISTS $d")
      s.sql(s"CREATE TABLE $t (o_orderkey BIGINT, o_custkey BIGINT, price DECIMAL(12,2))")
      s.sql(s"CREATE TABLE $d (c_custkey BIGINT, c_mktsegment STRING)")
      Tables.orders(s, dir).createOrReplaceTempView("r05_orders_src")
      Tables.customer(s, dir).createOrReplaceTempView("r05_cust_src")
      s.sql(s"INSERT INTO $d SELECT c_custkey, c_mktsegment FROM r05_cust_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
        FROM r05_orders_src WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""")
      s.sql(s"""CREATE MATERIALIZED VIEW $v AS
        SELECT d.c_mktsegment AS seg, count(*) AS n, sum(f.price) AS total,
          count(f.price) AS np
        FROM $t f JOIN $d d ON f.o_custkey = d.c_custkey
        GROUP BY d.c_mktsegment""")
      // Fact-only commits: inserts, a JOIN-KEY-moving update, deletes.
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
        FROM r05_orders_src WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'""")
      s.sql(s"UPDATE $t SET o_custkey = o_custkey % 50 WHERE o_custkey % 7 = 3")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 7")
      val r = s.sql(
        "CALL graft_snap.system.refresh_mv(table => 'gov.r05_seg_mv')").head()
      require(r.getLong(0) == 1L && r.getLong(1) == 4L && r.getBoolean(2),
        s"star refresh must fold fact commits 2..4, got $r")
      // A DIM commit (a customer no fact row references) plus another
      // fact insert: since round 18 BOTH fold incrementally in one
      // refresh (the dim-delta fold) — no full rebuild.
      s.sql(s"INSERT INTO $d VALUES (99999999, 'ZZ-NEW')")
      s.sql(s"INSERT INTO $t VALUES (900000001, 1, 10.00)")
      val r2 = s.sql(
        "CALL graft_snap.system.refresh_mv(table => 'gov.r05_seg_mv')").head()
      require(r2.getBoolean(2),
        s"a dim + fact advance must fold incrementally, got $r2")
      val r3 = s.sql(
        "CALL graft_snap.system.refresh_mv(table => 'gov.r05_seg_mv')").head()
      require(!r3.getBoolean(2),
        s"both watermarks current: a second refresh must be a no-op, got $r3")
      s.sql(s"""SELECT seg, n, CAST(total AS DOUBLE) AS total, np
        FROM $v ORDER BY seg""")
    },
    Some("""WITH f0 AS (
        SELECT CASE WHEN o_custkey % 7 = 3 THEN o_custkey % 50
                    ELSE o_custkey END AS ck,
          CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders),
      f AS (
        SELECT * FROM f0 WHERE ck % 10 <> 7
        UNION ALL SELECT 1 AS ck, CAST(10.00 AS DECIMAL(12,2)) AS price)
      SELECT c.c_mktsegment AS seg, count(*) AS n,
        CAST(sum(f.price) AS DOUBLE) AS total, count(f.price) AS np
      FROM f JOIN customer c ON f.ck = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY seg"""))

  /** STAR-MV QUERY REWRITE (round 17, [[graft.sources.MvQueryRewrite]]
    * over star specs): the dashboard norm — `fact ⋈ dim GROUP BY
    * dim.attr` — served TRANSPARENTLY from the star MV r05 builds,
    * closing round 16's gap (star MVs existed but never served a
    * rewrite). Matching destructures the query's inner-equi-join tree,
    * requires the table set to equal {fact} ∪ dims and the ON conjuncts
    * to equal the stored spec as a multiset (canonicalized under the
    * refresh aliases `f`/`d0`/…, equality commuted), and gates on BOTH
    * the fact watermark AND every dimension watermark. In-query pins:
    *
    *   - the dashboard query's plan scans ONLY the view — neither the
    *     100 TB fact nor the dimension appears;
    *   - a DIMENSION commit vetoes the rewrite (stored rows joined the
    *     OLD dim snapshot) until the demanded full rebuild re-stamps;
    *   - an extra join conjunct vetoes (the query joins fewer rows than
    *     the MV materialized);
    *   - a fact-only aggregate is NEVER served by the star MV (its rows
    *     are post-join — dim fan-out would corrupt the counts).
    *
    * Oracle: DuckDB recomputes the join-aggregate from raw parquet with
    * the same update/delete applied — the served view must be
    * hash-identical to a from-scratch recompute.
    *
    * Scale: the rewritten plan reads |segments| stored rows; plan-time
    * matching is metadata-only. This is the 100 TB dashboard path: the
    * fact is touched only by refresh's bounded change folds, never by
    * the queries. */
  val r06StarMvRewrite = Q(
    "r06_star_mv_rewrite",
    (s, dir) => {
      val t = "graft_snap.gov.orders_r06"
      val d = "graft_snap.gov.cust_r06"
      val v = "graft_snap.gov.r06_seg_mv"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP MATERIALIZED VIEW IF EXISTS $v")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"DROP TABLE IF EXISTS $d")
      s.sql(s"CREATE TABLE $t (o_orderkey BIGINT, o_custkey BIGINT, price DECIMAL(12,2))")
      s.sql(s"CREATE TABLE $d (c_custkey BIGINT, c_mktsegment STRING)")
      Tables.orders(s, dir).createOrReplaceTempView("r06_orders_src")
      Tables.customer(s, dir).createOrReplaceTempView("r06_cust_src")
      s.sql(s"INSERT INTO $d SELECT c_custkey, c_mktsegment FROM r06_cust_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
        FROM r06_orders_src WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""")
      s.sql(s"""CREATE MATERIALIZED VIEW $v AS
        SELECT d.c_mktsegment AS seg, count(*) AS n, sum(f.price) AS total,
          count(f.price) AS np
        FROM $t f JOIN $d d ON f.o_custkey = d.c_custkey
        GROUP BY d.c_mktsegment""")
      // Fact-only commits: inserts, a JOIN-KEY-moving update, deletes —
      // then the incremental fold brings the view current.
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
        FROM r06_orders_src WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'""")
      s.sql(s"UPDATE $t SET o_custkey = o_custkey % 50 WHERE o_custkey % 7 = 3")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 7")
      s.sql("CALL graft_snap.system.refresh_mv(table => 'gov.r06_seg_mv')")
      def scansOf(df: DataFrame): Seq[String] =
        "BatchScan ([^\\[ ]+)".r
          .findAllMatchIn(df.queryExecution.executedPlan.toString)
          .map(_.group(1)).toSeq
      val dash = s"""SELECT d.c_mktsegment AS seg, count(*) AS n,
        CAST(sum(f.price) AS DOUBLE) AS total, count(f.price) AS np
        FROM $t f JOIN $d d ON f.o_custkey = d.c_custkey
        GROUP BY d.c_mktsegment ORDER BY seg"""
      val served = scansOf(s.sql(dash))
      require(served.exists(_.contains("r06_seg_mv")) &&
        !served.exists(_.contains("orders_r06")) &&
        !served.exists(_.contains("cust_r06")),
        s"the star MV must serve the dashboard join — neither fact nor " +
          s"dim scanned, got $served")
      // An EXTRA join conjunct joins fewer rows than the MV holds: veto.
      val extra = scansOf(s.sql(s"""SELECT d.c_mktsegment AS seg, count(*) AS n
        FROM $t f JOIN $d d
        ON f.o_custkey = d.c_custkey AND f.o_orderkey = d.c_custkey
        GROUP BY d.c_mktsegment"""))
      require(extra.exists(_.contains("orders_r06")) &&
        !extra.exists(_.contains("r06_seg_mv")),
        s"an extra join condition must veto the star rewrite, got $extra")
      // A fact-only aggregate must not be served by post-join rows.
      val factOnly = scansOf(s.sql(
        s"SELECT o_custkey, count(*) AS n FROM $t GROUP BY o_custkey"))
      require(!factOnly.exists(_.contains("r06_seg_mv")),
        s"a star MV must never serve a single-table aggregate, got $factOnly")
      // A DIM commit (a customer no fact row references): stored rows
      // joined the OLD dim snapshot — the rewrite must veto until the
      // demanded full rebuild re-stamps every watermark.
      s.sql(s"INSERT INTO $d VALUES (99999999, 'ZZ-NEW')")
      val dimStale = scansOf(s.sql(dash))
      require(dimStale.exists(_.contains("orders_r06")) &&
        !dimStale.exists(_.contains("r06_seg_mv")),
        s"a moved dimension must veto the star rewrite, got $dimStale")
      s.sql("CALL graft_snap.system.refresh_mv(table => 'gov.r06_seg_mv', " +
        "full => true)").collect()
      val df = s.sql(dash)
      val rearmed = scansOf(df)
      require(rearmed.exists(_.contains("r06_seg_mv")) &&
        !rearmed.exists(_.contains("orders_r06")) &&
        !rearmed.exists(_.contains("cust_r06")),
        s"the rebuilt star MV must serve again, got $rearmed")
      df
    },
    Some("""WITH f0 AS (
        SELECT CASE WHEN o_custkey % 7 = 3 THEN o_custkey % 50
                    ELSE o_custkey END AS ck,
          CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders),
      f AS (SELECT * FROM f0 WHERE ck % 10 <> 7)
      SELECT c.c_mktsegment AS seg, count(*) AS n,
        CAST(sum(f.price) AS DOUBLE) AS total, count(f.price) AS np
      FROM f JOIN customer c ON f.ck = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY seg"""))

  /** STALE-MV DELTA TOP-UP (round 17, [[graft.sources.MvQueryRewrite]] +
    * [[graft.sources.MaterializedViews.topUpFrame]]): when the ONLY gate
    * a candidate MV fails is its watermark, the rewrite serves
    * `view ∪ signed-fold(.changes (b, c])` re-aggregated INLINE — the
    * read-only form of the refresh fold — so dashboards stay on the
    * |groups| + |changed rows| path BETWEEN refreshes instead of
    * rescanning the 100 TB base. The gate never refreshes the MV: the
    * returned frame is served from a view that stays stale throughout.
    *
    * In-query pins:
    *
    *   - the served plan scans the PINNED view and the base's bounded
    *     `.changes` relation — the base's data files are ABSENT;
    *   - with the top-up conf off, the same stale state falls back to a
    *     base-only plan (the round-16 behavior);
    *   - the served aggregate is the SUBSUMPTION shape (coarser GROUP
    *     BY) — top-up composes with partial re-aggregation.
    *
    * Oracle: DuckDB recomputes the aggregate from the FINAL parquet
    * state — the inline fold (insert + group-moving update + delete
    * commits, exactly r03's adversarial history) must be hash-identical
    * to a from-scratch recompute.
    *
    * Scale: the top-up reads |groups| stored rows + the pruned file
    * diffs of the missed commits — O(changed rows), the same cost the
    * refresh itself would pay, but without writing anything. */
  val r07MvTopUp = Q(
    "r07_mv_topup",
    (s, dir) => {
      val t = "graft_snap.gov.orders_r07"
      val v = "graft_snap.gov.r07_rollup_mv"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP MATERIALIZED VIEW IF EXISTS $v")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_orderpriority STRING, price DECIMAL(12,2))""")
      Tables.orders(s, dir).createOrReplaceTempView("r07_orders_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
          CAST(o_totalprice AS DECIMAL(12,2))
        FROM r07_orders_src WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""")
      s.sql(s"""CREATE MATERIALIZED VIEW $v AS
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          sum(price) AS total, count(price) AS np, avg(o_custkey) AS ac
        FROM $t WHERE o_custkey % 3 <> 1
        GROUP BY o_orderstatus, o_orderpriority""")
      // Three missed commits: the rest of the inserts, a group-moving
      // update, deletes — the MV stays STALE for the whole gate.
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
          CAST(o_totalprice AS DECIMAL(12,2))
        FROM r07_orders_src WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'""")
      s.sql(s"""UPDATE $t SET o_orderpriority = '9-CANCELLED'
        WHERE o_orderstatus = 'F' AND o_custkey % 7 = 3""")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 7")
      def scansOf(df: DataFrame): Seq[String] =
        "BatchScan ([^\\[ ]+)".r
          .findAllMatchIn(df.queryExecution.executedPlan.toString)
          .map(_.group(1)).toSeq
      val dash = s"""SELECT o_orderstatus AS st, count(*) AS n,
        CAST(sum(price) AS DOUBLE) AS total, count(price) AS np,
        avg(o_custkey) AS ac
        FROM $t WHERE o_custkey % 3 <> 1
        GROUP BY o_orderstatus ORDER BY st"""
      val df = s.sql(dash)
      val served = scansOf(df)
      require(served.exists(_.contains("r07_rollup_mv")),
        s"the stale MV must serve via top-up, got $served")
      require(served.exists(_.contains("orders_r07.changes")),
        s"the top-up must read the bounded change range, got $served")
      require(!served.exists(_.endsWith("orders_r07")),
        s"the base's data files must NOT be scanned, got $served")
      // Conf-off: the same stale state plans base-only.
      s.conf.set(graft.sources.MvQueryRewrite.TopUpKey, "false")
      val off =
        try scansOf(s.sql(dash))
        finally s.conf.unset(graft.sources.MvQueryRewrite.TopUpKey)
      require(off.exists(_.endsWith("orders_r07")) &&
        !off.exists(_.contains("r07_rollup_mv")),
        s"topup-off must fall back to the base, got $off")
      df
    },
    Some("""WITH src AS (
        SELECT o_custkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders)
      SELECT o_orderstatus AS st, count(*) AS n,
        CAST(sum(price) AS DOUBLE) AS total, count(price) AS np,
        avg(o_custkey) AS ac
      FROM src WHERE o_custkey % 10 <> 7 AND o_custkey % 3 <> 1
      GROUP BY o_orderstatus ORDER BY st"""))

  /** ROLLUP served from an MV (round 17, [[graft.sources.MvQueryRewrite]]
    * over grouping analytics): `GROUP BY ROLLUP/CUBE/GROUPING SETS` plans
    * as `Aggregate → Expand` — the rewrite keeps the Expand but feeds it
    * |groups| STORED rows instead of the base: every grouping set's
    * aggregate is the same distributive re-aggregation of partials the
    * flat subsumption path serves (the MV holds EVERY group), and the
    * grouping-id column keeps telling an Expand-null subtotal from a
    * REAL NULL group value exactly as it does over the base. In-query
    * pins: the rollup's plan scans ONLY the view; max() under a rollup
    * falls back to the base. Oracle: DuckDB recomputes the ROLLUP from
    * raw parquet (grouping keys coalesced to sentinels — Spark sorts
    * NULLS FIRST, DuckDB LAST — with grouping() columns carried so
    * subtotals stay distinguishable), hash-exact.
    *
    * Scale: the served rollup expands |groups| stored rows × sets,
    * never the 100 TB base — the subtotal dashboard without a scan. */
  val r08MvRollup = Q(
    "r08_mv_rollup",
    (s, dir) => {
      val t = "graft_snap.gov.orders_r08"
      val v = "graft_snap.gov.r08_rollup_mv"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP MATERIALIZED VIEW IF EXISTS $v")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_orderpriority STRING, price DECIMAL(12,2))""")
      Tables.orders(s, dir).createOrReplaceTempView("r08_orders_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
          CAST(o_totalprice AS DECIMAL(12,2))
        FROM r08_orders_src""")
      s.sql(s"""CREATE MATERIALIZED VIEW $v AS
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          sum(price) AS total, count(price) AS np
        FROM $t WHERE o_custkey % 3 <> 1
        GROUP BY o_orderstatus, o_orderpriority""")
      def scansOf(df: DataFrame): Seq[String] =
        "BatchScan ([^\\[ ]+)".r
          .findAllMatchIn(df.queryExecution.executedPlan.toString)
          .map(_.group(1)).toSeq
      val df = s.sql(s"""SELECT coalesce(o_orderstatus, '~') AS st,
        coalesce(o_orderpriority, '~') AS pri,
        grouping(o_orderstatus) AS gst, grouping(o_orderpriority) AS gpri,
        count(*) AS n, CAST(sum(price) AS DOUBLE) AS total,
        count(price) AS np
        FROM $t WHERE o_custkey % 3 <> 1
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        ORDER BY st, pri, gst, gpri""")
      val served = scansOf(df)
      require(served.exists(_.contains("r08_rollup_mv")) &&
        !served.exists(_.endsWith("orders_r08")),
        s"the ROLLUP must serve from the view, base unread: $served")
      // max() under a rollup is not stored — base plan, never wrong rows.
      val veto = scansOf(s.sql(s"""SELECT o_orderstatus, max(o_custkey) AS m
        FROM $t GROUP BY ROLLUP(o_orderstatus)"""))
      require(veto.exists(_.endsWith("orders_r08")) &&
        !veto.exists(_.contains("r08_rollup_mv")),
        s"max() under ROLLUP must plan against the base, got $veto")
      df
    },
    Some("""SELECT coalesce(o_orderstatus, '~') AS st,
        coalesce(o_orderpriority, '~') AS pri,
        CAST(grouping(o_orderstatus) AS TINYINT) AS gst,
        CAST(grouping(o_orderpriority) AS TINYINT) AS gpri,
        count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        count(CAST(o_totalprice AS DECIMAL(12,2))) AS np
      FROM orders WHERE o_custkey % 3 <> 1
      GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      ORDER BY st, pri, gst, gpri"""))

  /** INCREMENTAL STAR-MV DIM REFRESH (round 18,
    * [[graft.sources.MaterializedViews]] dim-delta fold): the last
    * O(fact) rebuild on the MV hot path, removed. Dimensions churn daily
    * in production (SCD attribute updates, key corrections, row
    * retirements); before this round ANY dim commit forced
    * `refresh_mv(full => true)` — an O(100 TB) fact rescan. Now the
    * joined delta telescopes: `Δ(f ⋈ d) = Δf ⋈ d@old + f@new ⋈ Δd`, and
    * every star aggregate (count/sum/avg) is linear in signed
    * multiplicities, so the dim term folds EXACTLY — attribute-only
    * updates, join-key moves, and deletes alike.
    *
    * In-query pins (against engine instrumentation, like the DV-fold
    * counter):
    *
    *   - the dim fold's fact scan is KEY-PRUNED: with the fact
    *     range-clustered on the join key, a dim update touching a narrow
    *     key range opens only the files holding those keys
    *     ([[graft.sources.MaterializedViews.lastDimFoldFactPartitions]]
    *     stays at a fraction of the file count);
    *   - a dim update touching only a column the view never reads
    *     CANCELS in the reduced delta — the fact is not scanned AT ALL
    *     (counter == 0), yet the watermark advances (next refresh no-op).
    *
    * Oracle: DuckDB recomputes the join-aggregate from raw parquet with
    * the same dim update + delete applied — the incrementally-folded
    * view must be hash-identical to the from-scratch recompute.
    *
    * Scale: the dim term's work is O(changed dim rows) reduced + a fact
    * scan bounded by the files holding the affected join keys + one
    * |groups|-row MERGE — at 100 TB the fact's manifest min/max (range
    * clustering) is what turns "join the fact" into "open two files". */
  val r09StarMvDimRefresh = Q(
    "r09_star_mv_dim_refresh",
    (s, dir) => {
      val t = "graft_snap.gov.orders_r09"
      val d = "graft_snap.gov.cust_r09"
      val v = "graft_snap.gov.r09_seg_mv"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP MATERIALIZED VIEW IF EXISTS $v")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"DROP TABLE IF EXISTS $d")
      // The fact lands RANGE-CLUSTERED on the join key (declared sort
      // order + range distribution), so each file covers a disjoint
      // o_custkey range — the layout that makes dim-fold pruning real.
      s.sql(s"""CREATE TABLE $t (o_orderkey BIGINT, o_custkey BIGINT,
        price DECIMAL(12,2))
        TBLPROPERTIES ('write.sort-order' = 'o_custkey',
          'write.distribution-mode' = 'range')""")
      s.sql(s"CREATE TABLE $d (c_custkey BIGINT, c_mktsegment STRING, " +
        "c_comment STRING)")
      Tables.orders(s, dir).createOrReplaceTempView("r09_orders_src")
      Tables.customer(s, dir).createOrReplaceTempView("r09_cust_src")
      s.sql(s"INSERT INTO $d SELECT c_custkey, c_mktsegment, 'c' FROM r09_cust_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
        FROM r09_orders_src""")
      s.sql(s"""CREATE MATERIALIZED VIEW $v AS
        SELECT d.c_mktsegment AS seg, count(*) AS n, sum(f.price) AS total,
          count(f.price) AS np
        FROM $t f JOIN $d d ON f.o_custkey = d.c_custkey
        GROUP BY d.c_mktsegment""")
      // DIM commits: an attribute UPDATE over a NARROW key range (the
      // fact rows of custkeys 10..25 move to a new segment) and a dim
      // row DELETE (custkey 40's fact rows leave the inner join).
      s.sql(s"UPDATE $d SET c_mktsegment = 'Z-MOVED' " +
        "WHERE c_custkey BETWEEN 10 AND 25")
      s.sql(s"DELETE FROM $d WHERE c_custkey = 40")
      val r = s.sql(
        "CALL graft_snap.system.refresh_mv(table => 'gov.r09_seg_mv')").head()
      require(r.getBoolean(2), s"the dim advance must fold incrementally, got $r")
      val files = graft.sources.SnapshotStore.stateOf(
        graft.sources.SnapshotStore.keyOf("graft_snap", Seq("gov", "orders_r09")))
        .currentFiles.size
      val scanned = graft.sources.MaterializedViews.lastDimFoldFactPartitions.get()
      require(scanned >= 0L, "the refresh must have taken the dim-fold path")
      require(files < 4 || scanned <= math.max(2L, files.toLong / 4),
        s"the dim fold must open only the files holding the affected keys " +
          s"(scanned $scanned of $files)")
      // An update touching only a column the view never reads: the
      // reduced delta CANCELS — no fact scan at all, watermark advances.
      s.sql(s"UPDATE $d SET c_comment = 'seen' WHERE c_custkey % 3 = 0")
      val r2 = s.sql(
        "CALL graft_snap.system.refresh_mv(table => 'gov.r09_seg_mv')").head()
      require(r2.getBoolean(2), s"the watermark adoption is a refresh, got $r2")
      require(graft.sources.MaterializedViews.lastDimFoldFactPartitions.get() == 0L,
        "an unreferenced-column dim update must not scan the fact")
      val r3 = s.sql(
        "CALL graft_snap.system.refresh_mv(table => 'gov.r09_seg_mv')").head()
      require(!r3.getBoolean(2), s"watermarks current: must be a no-op, got $r3")
      s.sql(s"""SELECT seg, n, CAST(total AS DOUBLE) AS total, np
        FROM $v ORDER BY seg""")
    },
    Some("""WITH c AS (
        SELECT c_custkey,
          CASE WHEN c_custkey BETWEEN 10 AND 25 THEN 'Z-MOVED'
               ELSE c_mktsegment END AS seg
        FROM customer WHERE c_custkey <> 40),
      f AS (SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders)
      SELECT c.seg AS seg, count(*) AS n,
        CAST(sum(f.price) AS DOUBLE) AS total, count(f.price) AS np
      FROM f JOIN c ON f.o_custkey = c.c_custkey
      GROUP BY c.seg ORDER BY seg"""))

  /** APPROX-DISTINCT MATERIALIZED VIEWS (round 18,
    * [[graft.sources.MaterializedViews]] kind `approx_distinct` +
    * [[graft.sources.MvQueryRewrite]] sketch serving): distinct-user
    * counts are the most common dashboard aggregate after sum, and
    * counts of distincts are NOT summable — the stored form must be a
    * mergeable sketch. The MV stores per-group datasketches-HLL partials
    * next to the visible estimate: inserts UNION partial sketches
    * (O(changed rows)), a delete of a counted value recomputes only the
    * AFFECTED groups (sketches are not invertible — the extrema
    * machinery's shape), and the query rewrite serves
    * `approx_count_distinct` both exact-shape (stored estimate) and
    * COARSER (hll_union_agg of stored sketches, then estimate) — the
    * re-aggregation BigQuery/Snowflake sketch MVs exist for.
    *
    * No DuckDB oracle is POSSIBLE (the sketch estimator has no SQL
    * twin — q13/q49's no_oracle shape); the gate instead pins in-query:
    * estimates within 5% of the exact distinct counts after an
    * adversarial history (inserts, deletes, group moves), the stored
    * estimate EQUAL to a from-scratch sketch of the final state
    * (union-losslessness), and the rewrite's plan serving the coarser
    * aggregate from the view with the base unread. sbt twins:
    * MaterializedViewSuite + MvRewriteSuite sketch cases.
    *
    * Scale: refresh cost is O(changed rows) sketch building + a
    * |groups|-row MERGE; the 100 TB fact is touched only by the
    * affected-group recompute, pruned to the files holding suspect
    * groups. Serving a coarser distinct count reads |groups| sketches —
    * never the fact. */
  val r10MvApproxDistinct = Q(
    "r10_mv_approx_distinct",
    (s, dir) => {
      val t = "graft_snap.gov.orders_r10"
      val v = "graft_snap.gov.r10_dist_mv"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.gov")
      s.sql(s"DROP MATERIALIZED VIEW IF EXISTS $v")
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"""CREATE TABLE $t (o_orderkey BIGINT, o_custkey BIGINT,
        o_orderstatus STRING, price DECIMAL(12,2))""")
      Tables.orders(s, dir).createOrReplaceTempView("r10_orders_src")
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(12,2))
        FROM r10_orders_src WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""")
      s.sql(s"""CREATE MATERIALIZED VIEW $v AS
        SELECT o_orderstatus, count(*) AS n,
          approx_count_distinct(o_custkey) AS dc
        FROM $t GROUP BY o_orderstatus""")
      // Adversarial history: inserts, a group-moving update, deletes.
      s.sql(s"""INSERT INTO $t
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(12,2))
        FROM r10_orders_src WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'""")
      s.sql(s"UPDATE $t SET o_orderstatus = 'Z' WHERE o_custkey % 7 = 3")
      s.sql(s"DELETE FROM $t WHERE o_custkey % 10 = 7")
      s.sql("CALL graft_snap.system.refresh_mv(table => 'gov.r10_dist_mv')")
        .collect()
      // 5% bound vs the exact distinct count, per group.
      val exact = s.sql(s"""SELECT o_orderstatus, count(DISTINCT o_custkey)
        FROM $t GROUP BY o_orderstatus""").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val served = s.sql(s"SELECT o_orderstatus, dc FROM $v").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      require(exact.keySet == served.keySet,
        s"group sets must match: $exact vs $served")
      exact.foreach { case (g, e) =>
        require(math.abs(served(g) - e) <= math.max(1L, (e * 0.05).toLong),
          s"group $g: served ${served(g)} vs exact $e")
      }
      // Union-losslessness: the folded sketch estimate equals a
      // from-scratch sketch of the final state.
      val direct = s.sql(
        s"""SELECT o_orderstatus,
          coalesce(hll_sketch_estimate(hll_sketch_agg(o_custkey)), 0)
          FROM $t GROUP BY o_orderstatus""").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      require(served == direct,
        s"stored estimates must equal a fresh sketch: $served vs $direct")
      // The rewrite serves the COARSER global distinct from the view —
      // the base unread (the sketch union is the whole point).
      def scansOf(df: DataFrame): Seq[String] =
        "BatchScan ([^\\[ ]+)".r
          .findAllMatchIn(df.queryExecution.executedPlan.toString)
          .map(_.group(1)).toSeq
      val dash = s.sql(s"""SELECT o_orderstatus,
        approx_count_distinct(o_custkey) AS dc
        FROM $t GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      val pl = scansOf(dash)
      require(pl.exists(_.contains("r10_dist_mv")) &&
        !pl.exists(_.contains("orders_r10")),
        s"approx_count_distinct must serve from the sketch MV, got $pl")
      dash
    },
    None)

  val all: Seq[Q] = Seq(
    m01MergeUpsert, m02Scd2History, m03IncrementalRefresh, m04SnapshotDiff,
    m05SqlMerge, m06SqlUpdateDelete, m07TimeTravel, m08ChangeFeed,
    m09IncrementalMaint, m10PartitionedCow, m11ChangeFeedPruned,
    m12MetadataHistory, m13MergeOnRead, m14DppStar, m15ChangesRelation,
    m16WapPublish, m17ChangesMaint, m18EqualityUpsert, m19UpsertChanges,
    m20HiddenPartitioning, m21CatalogDimStar, r02ViewQuery,
    r03MaterializedView, r04MvRewrite, r05StarMv, r06StarMvRewrite,
    r07MvTopUp, r08MvRollup, r09StarMvDimRefresh, r10MvApproxDistinct,
    a01QualityAudit, z01ZorderLayout)
}
