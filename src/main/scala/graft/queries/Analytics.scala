package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q.{dec2, dsum}

/** Second relational wave — subquery surfaces, statistical aggregates, and
  * the range-join rewrite (SURVEY §2.4–§2.5 depth beyond the first 31
  * queries).
  *
  * Scale posture matches [[Relational]]: broadcast hints on provably-small
  * frames only (scalar aggregates, per-group stats), binned equi-joins
  * instead of nested-loop theta joins, exact decimal moments so the oracle
  * hashes match bit-for-bit.
  */
object Analytics {

  /** Correlation / covariance / stddev per group from exact decimal moments.
    *
    * Spark's built-in `corr`/`covar_samp` stream doubles in partition order,
    * so their low bits are run-dependent — unusable under a hash-exact
    * oracle. The five raw moments (n, Σx, Σy, Σx², Σy², Σxy) aggregated in
    * DECIMAL are exact and order-free; the closed-form combination back in
    * DOUBLE is a fixed operation sequence both engines execute identically
    * (same trick as q26's z-scores). One scan, one shuffle on the group key,
    * map-side partial aggregation — the stats frame is |groups| rows.
    */
  val q32CorrStats = Q(
    "q32_corr_stats",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val m = l.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sx"),
        dsum(col("l_extendedprice")).as("sy"),
        sum(dec2(col("l_quantity")) * dec2(col("l_quantity"))).cast("double").as("sxx"),
        sum(dec2(col("l_extendedprice")) * dec2(col("l_extendedprice"))).cast("double").as("syy"),
        sum(dec2(col("l_quantity")) * dec2(col("l_extendedprice"))).cast("double").as("sxy"))
      val covar = (col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1)
      val varX = (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)
      val varY = (col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1)
      m.select(
          col("l_returnflag"),
          col("n"),
          round(covar, 6).as("covar_qty_price"),
          round(covar / (sqrt(varX) * sqrt(varY)), 6).as("corr_qty_price"),
          round(sqrt(varX), 6).as("stddev_qty"),
          round(sqrt(varY), 6).as("stddev_price"))
        .orderBy("l_returnflag")
    },
    Some("""WITH m AS (
      SELECT l_returnflag, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
      round((sxy - sx * sy / n) / (n - 1), 6) AS covar_qty_price,
      round(((sxy - sx * sy / n) / (n - 1)) /
            (sqrt((sxx - sx * sx / n) / (n - 1)) * sqrt((syy - sy * sy / n) / (n - 1))), 6) AS corr_qty_price,
      round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
      round(sqrt((syy - sy * sy / n) / (n - 1)), 6) AS stddev_price
    FROM m ORDER BY l_returnflag"""))

  /** TPC-H Q17 shape: revenue lost to small orders — lineitems whose
    * quantity is below 20% of the per-part average.
    *
    * Expressed as SQL with a *correlated scalar subquery* to exercise
    * Catalyst's decorrelation: the optimizer rewrites the subquery into an
    * aggregate + join (visible in explain as an Aggregate under a Join, no
    * per-row re-execution). The per-part average uses the exact decimal-sum
    * pattern so both engines compute the identical double.
    *
    * At 100 TB the rewritten plan is one shuffle of lineitem on l_partkey
    * against its own pre-aggregate — no broadcast assumption on part count.
    */
  val q33SmallQtyRevenue = Q(
    "q33_small_qty_revenue",
    (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 2)
                 AS avg_yearly
        FROM lineitem l
        WHERE l.l_quantity < (
          SELECT 0.2 * (CAST(sum(CAST(i.l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*))
          FROM lineitem i WHERE i.l_partkey = l.l_partkey)""")
    },
    Some("""SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 2)
               AS avg_yearly
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.2 * (CAST(sum(CAST(i.l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*))
      FROM lineitem i WHERE i.l_partkey = l.l_partkey)"""))

  /** TPC-H Q11 shape: nations holding an outsized revenue share — per-nation
    * order revenue filtered against a fraction of the global total (an
    * uncorrelated scalar subquery).
    *
    * The global total is a one-row frame: `crossJoin(broadcast(...))` ships
    * it to every task for free. The per-nation aggregate shuffles once on
    * the (25-value) nation key after a broadcast dimension join — at 100 TB
    * only the orders→customer join moves data, and AQE handles its skew.
    */
  val q34RevenueShare = Q(
    "q34_revenue_share",
    (s, dir) => {
      val byNation = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("o_totalprice")).as("revenue"))
      val total = byNation.agg(dsum(col("revenue")).as("total"))
      byNation.crossJoin(broadcast(total))
        .filter(col("revenue") > col("total") * 0.05)
        .select(col("n_name"), col("revenue"), round(col("revenue") / col("total"), 6).as("share"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""WITH bn AS (
      SELECT n_name, CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name),
    t AS (SELECT CAST(sum(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE) AS total FROM bn)
    SELECT n_name, revenue, round(revenue / total, 6) AS share
    FROM bn, t WHERE revenue > total * 0.05
    ORDER BY revenue DESC, n_name"""))

  /** Range join rewritten as a binned equi-join: for every part, how many
    * other parts price within ±0.05.
    *
    * The naive plan for `|a.price − b.price| ≤ 5` is a broadcast
    * nested-loop join — O(n·m) comparisons, hopeless at scale. Binning each
    * side to ⌊price/width⌋ and exploding one side to its three candidate
    * bins turns the theta join into an equi-join on the bin key (shuffle
    * hash / sort-merge, partition-local) with a cheap residual band filter;
    * cost drops to O(n·k) for k = neighbors per bin. Same trick as the LSH
    * band join. The residual compare runs in DECIMAL so band-edge ties
    * (exactly 0.05 apart) resolve identically in both engines.
    */
  val q35RangeJoinBinned = Q(
    "q35_range_join_binned",
    (s, dir) => {
      // Bin width == band width, and both derived from EXACT cents: the bin
      // key is integer arithmetic on dec2(price)·100, so a pair exactly at
      // the band edge can never land 2 bins apart through FP division
      // drift. Width must track the band — a bin much wider than the band
      // degenerates toward all-pairs (the fixture's prices are uniform on
      // [900,1000), so a ±5 band would already cover 10% of the table:
      // candidate count is O(n·band/domain), a property of the data, not
      // the plan).
      val cents = (dec2(col("p_retailprice")) * 100).cast("long")
      val p = Tables.part(s, dir).select(
        col("p_partkey"), col("p_retailprice"),
        floor(cents / 5.0).cast("long").as("bin"))
      val b = p.select(
          col("p_partkey").as("b_key"), col("p_retailprice").as("b_price"),
          explode(array(col("bin") - 1, col("bin"), col("bin") + 1)).as("bin"))
      val band = (dec2(col("p_retailprice")) - dec2(col("b_price"))).between(-0.05, 0.05)
      p.join(b, p("bin") === b("bin") && band && col("p_partkey") =!= col("b_key"), "left")
        .groupBy("p_partkey")
        .agg(count(col("b_key")).as("n_close"))
        .orderBy("p_partkey")
    },
    Some("""SELECT a.p_partkey, count(b.p_partkey) AS n_close
    FROM part a LEFT JOIN part b
      ON a.p_partkey <> b.p_partkey
     AND CAST(a.p_retailprice AS DECIMAL(12,2)) - CAST(b.p_retailprice AS DECIMAL(12,2))
         BETWEEN -0.05 AND 0.05
    GROUP BY a.p_partkey ORDER BY a.p_partkey"""))

  /** Explicit GROUPING SETS — the third grouping surface beside rollup (q08)
    * and cube (q09), through Spark 4's native `Dataset.groupingSets` API.
    * Group keys are COALESCEd to sentinels (Spark sorts NULLS FIRST, DuckDB
    * NULLS LAST) and the grouping-ID bitmask disambiguates a real 'ALL'
    * value from the aggregate rows.
    */
  val q36GroupingSets = Q(
    "q36_grouping_sets",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("gid"), col("n"), col("sum_qty"))
        .orderBy("gid", "returnflag", "linestatus")
    },
    Some("""SELECT
      coalesce(l_returnflag, 'ALL') AS returnflag,
      coalesce(l_linestatus, 'ALL') AS linestatus,
      CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
      count(*) AS n,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY gid, returnflag, linestatus"""))

  /** Sliding windows (10 min, slide 5 min) in batch mode — the batch twin
    * of the streaming sliding-window pipeline (each event lands in exactly
    * two windows; `window()` plans the expansion as a generator, so the
    * only shuffle is the (window, type) aggregation). Oracle unrolls the
    * two candidate window starts per event explicitly.
    */
  val q37SlidingWindows = Q(
    "q37_sliding_windows",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(
          unix_timestamp(col("w.start")).as("window_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")
    },
    Some("""WITH b AS (
      SELECT event_type, value,
        CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket
      FROM events),
    w AS (
      SELECT event_type, value,
        unnest([bucket, bucket - 300]) AS window_start
      FROM b)
    SELECT window_start, event_type, count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM w GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** Skew-mitigated equi-join through [[graft.operators.SaltedJoin]]: the
    * events fact salted 8 ways against a replicated per-type dimension.
    * The oracle is the PLAIN join — salting must be invisible in the
    * result, which is exactly what makes it a safe skew tool. The group-by
    * collapses the row-level output so the comparison is order-free.
    */
  val q38SaltedJoin = Q(
    "q38_salted_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val dim = ev.select("event_type").distinct()
        .withColumn("type_len", length(col("event_type")))
      graft.operators.SaltedJoin.join(ev, dim, "event_type", buckets = 8)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(dec2(col("value")) * col("type_len")).cast("double").as("weighted"))
        .orderBy("event_type")
    },
    Some("""WITH dim AS (
      SELECT DISTINCT event_type, CAST(length(event_type) AS INT) AS type_len
      FROM events)
    SELECT e.event_type, count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(12,2)) * type_len) AS DOUBLE) AS weighted
    FROM events e JOIN dim USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type"""))

  /** Approximate quantiles via the built-in sketch aggregate
    * (`percentile_approx`, Greenwald-Khanna summaries) — the mergeable
    * sketch rounding out q13's HLL and the MinHash family. Sketch results
    * are deterministic for a fixed input partitioning but not across
    * partitionings, so like q13 this is rows-only; the sbt suite bounds its
    * error against q27's exact quantiles instead.
    */
  val q39ApproxQuantiles = Q(
    "q39_approx_quantiles",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          percentile_approx(col("value"), array(lit(0.5), lit(0.95), lit(0.99)), lit(10000))
            .as("q"))
        .select(
          col("event_type"),
          round(col("q")(0), 6).as("p50"),
          round(col("q")(1), 6).as("p95"),
          round(col("q")(2), 6).as("p99"))
        .orderBy("event_type")
    },
    None)

  /** Higher-order array functions end-to-end: per-order quantity vectors
    * (deterministically ordered by line number), folded/filtered/indexed
    * with `transform`/`filter`/`element_at`/`array_max`. The array is built
    * with `array_sort(collect_list(struct(...)))` — `collect_list` alone
    * has no deterministic order under parallel aggregation; the sort key
    * travels inside the struct. The fixture's l_linenumber is NOT unique
    * within an order, so the quantity itself is part of the sort key on
    * both sides — a tie on the full key is order-irrelevant by definition.
    */
  val q40ArrayFuncs = Q(
    "q40_array_funcs",
    (s, dir) => {
      val arr = transform(
        array_sort(collect_list(struct(col("l_linenumber"), col("l_quantity")))),
        x => x.getField("l_quantity"))
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(arr.as("qtys"))
        .select(
          col("o_orderkey"),
          size(col("qtys")).as("n_items"),
          size(filter(col("qtys"), x => x >= 30)).as("n_big"),
          element_at(col("qtys"), 1).as("first_qty"),
          (array_max(col("qtys")) - array_min(col("qtys"))).as("qty_span"))
        .orderBy("o_orderkey")
    },
    Some("""WITH a AS (
      SELECT l_orderkey AS o_orderkey,
        list(l_quantity ORDER BY l_linenumber, l_quantity) AS qtys
      FROM lineitem GROUP BY l_orderkey)
    SELECT o_orderkey,
      CAST(len(qtys) AS INT) AS n_items,
      CAST(len(list_filter(qtys, x -> x >= 30)) AS INT) AS n_big,
      qtys[1] AS first_qty,
      list_max(qtys) - list_min(qtys) AS qty_span
    FROM a ORDER BY o_orderkey"""))

  /** Recursive CTE (Spark 4.1 `WITH RECURSIVE`): walk the per-source
    * document chain from its root, emitting (doc, root, depth) — the
    * lineage-walk shape (dependency chains, retry chains, thread
    * reconstruction).
    *
    * Spark's recursion supports UNION ALL only (no fixpoint dedup), so the
    * walk must be acyclic AND depth-bounded to be scale-safe: the
    * `depth < 9` guard caps the recursion at a constant 10 levels
    * regardless of data volume — without it the recursion depth would grow
    * with docs-per-source and trip the engine's recursion limit at larger
    * SFs. Identical SQL runs on both engines.
    */
  // Defined before its query: a forward val reference inside an object
  // body is null at initialization time.
  private val RecursiveChainSql = """WITH RECURSIVE e AS (
      SELECT doc_id, lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS nxt
      FROM documents),
    roots AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY source),
    chain(doc_id, root_id, depth) AS (
      SELECT doc_id, doc_id, 0 FROM roots
      UNION ALL
      SELECT e.nxt, c.root_id, c.depth + 1
      FROM chain c JOIN e ON e.doc_id = c.doc_id
      WHERE e.nxt IS NOT NULL AND c.depth < 9)
    SELECT doc_id, root_id, CAST(depth AS INT) AS depth
    FROM chain ORDER BY root_id, depth"""

  val q41RecursiveChain = Q(
    "q41_recursive_chain",
    (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql(RecursiveChainSql)
    },
    Some(RecursiveChainSql))

  /** TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning the
    * joined part dimension. The disjunction exercises the optimizer's
    * predicate decomposition: the common `l_quantity` bounds and the
    * per-branch part predicates are pushed below the join where provable,
    * and the join stays a broadcast hash join on partkey — disjunctive
    * filters must not degrade the join strategy.
    */
  val q42DisjunctivePredicates = Q(
    "q42_disjunctive_predicates",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      val cond =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 21)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 40))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .agg(
          count(lit(1)).as("n"),
          sum(dec2(col("l_extendedprice")) * (Q.one2 - dec2(col("l_discount"))))
            .cast("double").as("revenue"))
    },
    Some("""SELECT count(*) AS n,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
               (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 40)"""))

  /** Conditional aggregation via the SQL FILTER clause — one scan, many
    * differently-filtered aggregates (the idiomatic alternative to N
    * self-joins or N CASE pyramids). */
  val q43FilteredAgg = Q(
    "q43_filtered_agg",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      s.sql("""SELECT
        CAST(year(o_orderdate) AS INT) AS yr,
        count(*) AS n_orders,
        count(*) FILTER (WHERE o_orderstatus = 'F') AS n_final,
        count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
          FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_revenue
      FROM orders GROUP BY year(o_orderdate) ORDER BY yr""")
    },
    Some("""SELECT
      CAST(year(o_orderdate) AS INT) AS yr,
      count(*) AS n_orders,
      count(*) FILTER (WHERE o_orderstatus = 'F') AS n_final,
      count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
        FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_revenue
    FROM orders GROUP BY year(o_orderdate) ORDER BY yr"""))

  // Defined before its query (forward object vals are null at init).
  private val IdleCustomersSql = """WITH avgbal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS a
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_mktsegment, count(*) AS n_cust,
      CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM customer, avgbal
    WHERE c_acctbal > avgbal.a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** TPC-H Q22 shape: well-funded customers with no urgent orders (every
    * fixture customer has SOME order, so the classic never-ordered form
    * would be vacuously empty) — a NOT
    * EXISTS (planned as a left-anti join after decorrelation, never a
    * per-row probe) against an uncorrelated scalar average. Identical SQL
    * runs as the oracle.
    */
  val q44IdleCustomers = Q(
    "q44_idle_customers",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      s.sql(IdleCustomersSql)
    },
    Some(IdleCustomersSql))

  /** Map-typed columns end-to-end: `events.props` JSON parsed into a
    * `map<string,int>`, then `map_keys`/`element_at`/`map_contains_key`
    * drive per-event features and a per-type aggregate. DuckDB has no
    * JSON→MAP cast, so the oracle derives the identical scalars through
    * its JSON functions — the comparison is on the derived values, which
    * is what makes a map column oracle-checkable at all.
    */
  val q45MapFuncs = Q(
    "q45_map_funcs",
    (s, dir) => {
      val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.IntegerType))
      Tables.events(s, dir)
        .select(col("event_type"), m.as("pm"))
        .select(
          col("event_type"),
          size(map_keys(col("pm"))).as("n_keys"),
          element_at(col("pm"), "k").as("k_val"),
          map_contains_key(col("pm"), "k").as("has_k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("has_k"), 1).otherwise(0)).as("n_with_k"),
          sum(col("k_val")).as("sum_k"),
          max(col("n_keys")).as("max_keys"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
      CAST(sum(CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_with_k,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      CAST(max(len(json_keys(props))) AS INT) AS max_keys
    FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Equi-width histogram with data-driven bounds: 20 buckets over
    * l_extendedprice between its observed min/max. Two narrow passes — a
    * scalar min/max aggregate broadcast via cross join (the q34 pattern),
    * then one groupBy over the bucket index; no row leaves the executors.
    * The bucket formula `least(floor((x-mn)*20/(mx-mn)), 19)` is identical
    * IEEE double arithmetic in both engines, so bucketing is exact.
    */
  val q46Histogram = Q(
    "q46_histogram",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val bounds = li.agg(
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
      li.select(col("l_extendedprice"), col("l_quantity"))
        .crossJoin(bounds)
        .select(
          least(floor((col("l_extendedprice") - col("mn")) * lit(20.0) /
            (col("mx") - col("mn"))), lit(19L)).cast("int").as("bucket"),
          col("l_extendedprice"), col("l_quantity"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_rows"),
          Q.dsum(col("l_extendedprice")).as("sum_price"),
          Q.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("bucket")
    },
    Some("""WITH b AS (
        SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        FROM lineitem)
      SELECT CAST(least(floor((l_extendedprice - mn) * CAST(20.0 AS DOUBLE) /
          (mx - mn)), 19) AS INT) AS bucket,
        count(*) AS n_rows,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      FROM lineitem, b
      GROUP BY 1 ORDER BY 1"""))

  /** Heavy-hitter detection via the Misra–Gries sketch
    * ([[graft.functions.MisraGriesAgg]], k = 128): one streaming pass
    * builds a 128-counter summary whose guarantee (undercount ≤ n/129,
    * never overcount) makes the summary a certain superset of every item
    * with frequency > n/129; the candidates are then exactly recounted
    * (a groupBy over the candidate-only semi-joined stream) and
    * thresholded at 1% of the stream — so the result equals the exact
    * answer deterministically, independent of Spark's partial-merge
    * order. Sketch-candidates-then-exact-recount is the standard two-pass
    * shape for hot-key detection at 100 TB: pass 1 ships 128 counters per
    * task instead of the full key domain, pass 2 aggregates only the ≤128
    * candidate keys.
    *
    * The fixture's keys are uniform by design, so the hot-key structure
    * is induced deterministically: bucket = ⌊√l_partkey⌋ gives bucket b a
    * population ∝ 2b+1 — a planted linear skew both engines reproduce
    * bit-exactly (hardware sqrt is correctly rounded).
    */
  /** Conversion funnel with a 6-hour step deadline: per user, the first
    * view, the first click within 6 h of that view, and the first purchase
    * within 6 h of that click — classic ordered-sequence event analytics
    * (on this fixture: 150 → 150 → 19 → 1, a real drop-off).
    *
    * Each step is one groupBy on the user key; the step joins are
    * user-keyed and co-partitioned with the aggregates, so the event
    * stream hash-partitions on user once and everything else stays in
    * place. No per-user sort and no window: step N's deadline needs only
    * step N−1's single timestamp, which rides along as a group key.
    */
  val u01ConversionFunnel = Q(
    "u01_conversion_funnel",
    (s, dir) => {
      val step = expr("INTERVAL 6 HOURS")
      val e = Tables.events(s, dir).select(
        col("user_id"), col("event_type"), col("ts"))
      val v = e.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"))
      val c = e.join(v, "user_id")
        .groupBy(col("user_id"), col("t_view"))
        .agg(min(when(col("event_type") === "click" &&
          col("ts") >= col("t_view") && col("ts") <= col("t_view") + step,
          col("ts"))).as("t_click"))
      val p = e.join(c, "user_id")
        .groupBy(col("user_id"), col("t_view"), col("t_click"))
        .agg(min(when(col("event_type") === "purchase" &&
          col("ts") >= col("t_click") && col("ts") <= col("t_click") + step,
          col("ts"))).as("t_purchase"))
      p.select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
          when(col("t_purchase").isNotNull, "purchase")
            .when(col("t_click").isNotNull, "click")
            .when(col("t_view").isNotNull, "view")
            .otherwise("none").as("furthest_step"))
        .orderBy("user_id")
    },
    Some("""WITH v AS (
        SELECT user_id, min(ts) FILTER (event_type = 'view') AS t_view
        FROM events GROUP BY user_id),
      c AS (
        SELECT e.user_id, t_view,
          min(ts) FILTER (event_type = 'click' AND ts >= t_view
            AND ts <= t_view + INTERVAL 6 HOUR) AS t_click
        FROM events e JOIN v USING (user_id) GROUP BY e.user_id, t_view),
      p AS (
        SELECT e.user_id, t_view, t_click,
          min(ts) FILTER (event_type = 'purchase' AND ts >= t_click
            AND ts <= t_click + INTERVAL 6 HOUR) AS t_purchase
        FROM events e JOIN c USING (user_id)
        GROUP BY e.user_id, t_view, t_click)
      SELECT user_id, t_view, t_click, t_purchase,
        CASE WHEN t_purchase IS NOT NULL THEN 'purchase'
             WHEN t_click IS NOT NULL THEN 'click'
             WHEN t_view IS NOT NULL THEN 'view'
             ELSE 'none' END AS furthest_step
      FROM p ORDER BY user_id"""))

  /** Weekly cohort retention: users grouped by the ISO week of their first
    * event, counted in every week they were active, keyed by week offset —
    * the cohort matrix behind every retention curve. Two user-keyed
    * aggregates and one broadcast-sized join; the event stream never
    * shuffles on anything but the user key, and the matrix is
    * |cohorts| × |weeks| rows regardless of data size. */
  val u02CohortRetention = Q(
    "u02_cohort_retention",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val cohort = e.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
      val active = e.select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("activity_week"))
        .distinct()
      cohort.join(active, "user_id")
        .groupBy(col("cohort_week"),
          (datediff(col("activity_week"), col("cohort_week")) / 7)
            .cast("int").as("week_offset"))
        .agg(count(lit(1)).as("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""WITH cohort AS (
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id),
      active AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS activity_week
        FROM events)
      SELECT cohort_week,
        CAST(date_diff('day', cohort_week, activity_week) / 7 AS INT)
          AS week_offset,
        count(*) AS n_active_users
      FROM cohort JOIN active USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  val h01HeavyHitters = Q(
    "h01_heavy_hitters",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val stream = Tables.lineitem(s, dir)
        .select(floor(sqrt(col("l_partkey"))).cast("long").as("bucket"))
      val cand = stream
        .agg(graft.functions.GraftFunctions
          .heavyHitters(col("bucket").cast("string")).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").cast("long").as("bucket"))
      val tot = stream.agg(count(lit(1)).as("n"))
      stream.join(broadcast(cand), "bucket")
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(tot))
        .filter(col("cnt") >= col("n") / lit(100.0))
        .select(col("bucket"), col("cnt"),
          round(col("cnt") / col("n"), 6).as("share"))
        .orderBy("bucket")
    },
    Some("""WITH s AS (
        SELECT CAST(floor(sqrt(l_partkey)) AS BIGINT) AS bucket FROM lineitem),
      c AS (SELECT bucket, count(*) AS cnt FROM s GROUP BY bucket),
      tot AS (SELECT count(*) AS n FROM s)
      SELECT bucket, cnt, round(cnt / (SELECT n FROM tot), 6) AS share
      FROM c WHERE cnt >= (SELECT n FROM tot) / 100.0
      ORDER BY bucket"""))

  /** Mergeable distinct-count sketches (Apache DataSketches HLL, the
    * `hll_sketch_agg` family Spark ships since 3.5): per
    * (priority, month) cells aggregate a custkey sketch, then the monthly
    * sketches UNION — register-max merge, no re-scan — into a per-priority
    * estimate.
    *
    * This is the 100 TB pre-aggregation pattern `approx_count_distinct`
    * (q13) can't give you: q13's HLL++ buffer lives and dies inside one
    * aggregate, while a DataSketches sketch is a first-class binary VALUE —
    * materialize the per-cell table once (cube-style), answer any coarser
    * distinct-count rollup later by unioning cells, never touching the
    * fact table again. The union is exact over sketches: merging the
    * monthly registers yields the identical register state as sketching
    * the whole year directly (asserted in AnalyticsSketchSuite), so the
    * two-level plan loses nothing.
    *
    * No DuckDB twin (engine-specific sketch encoding) ⇒ rows-only gate;
    * the sbt suite pins (a) union-vs-direct equality and (b) a 5% error
    * bound vs exact distinct counts.
    */
  val q49HllSketchUnion = Q(
    "q49_hll_sketch_union",
    (s, dir) => {
      val monthly = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"),
          date_trunc("month", col("o_orderdate")).as("month"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      monthly
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_months"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_customers"))
        .orderBy("o_orderpriority")
    },
    None)

  /** Correlated LATERAL derived table — the SQL-standard form of per-group
    * top-k: for each BUILDING-segment customer, its 3 highest-value
    * orders. Catalyst decorrelates the LIMIT-under-LATERAL into a
    * window/rank plan over one orders shuffle (`DecorrelateInnerQuery`) —
    * semantically the explicit row_number of q06, but arriving via the
    * optimizer from the declarative form, which is what makes LATERAL
    * usable at scale: no per-customer re-execution of the inner query.
    */
  private val LateralTopkSql = """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
    WHERE c.c_mktsegment = 'BUILDING'
    ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey"""

  val q50LateralTopk = Q(
    "q50_lateral_topk",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      s.sql(LateralTopkSql)
    },
    Some(LateralTopkSql))

  /** Frequent items via Spark 4.1's `approx_top_k` (DataSketches
    * ItemsSketch): single-pass, mergeable, bounded-memory top-k over the
    * same skewed bucket stream h01's Misra–Gries sweep measures. The two
    * differ in guarantee shape — MG bounds per-item undercount against a
    * φ·n threshold, ItemsSketch bounds |est − true| ≤ n/maxItemsTracked —
    * so the engine ships both rungs (h01 = custom
    * `TypedImperativeAggregate`, h02 = the built-in). Rows-only (sketch
    * internals have no DuckDB twin); AnalyticsSketchSuite pins the error
    * bound and that the true heavy hitters are all present.
    */
  val h02ApproxTopK = Q(
    "h02_approx_top_k",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .select(floor(sqrt(col("l_partkey"))).cast("long").as("bucket"))
        .createOrReplaceTempView("h02_stream")
      s.sql("""SELECT pos + 1 AS rank, t.item AS bucket, t.count AS est
        FROM (SELECT approx_top_k(bucket, 10, 200) AS top FROM h02_stream) s
        LATERAL VIEW posexplode(top) ex AS pos, t
        ORDER BY rank""")
    },
    None)

  /** Count–min point-frequency estimates (`count_min_sketch`, the
    * spark-sketch CMS behind `df.stat`): one distributed sketch build —
    * counter-matrix merge is additive, so the result is independent of
    * partitioning given the fixed seed — then a broadcast of the ~100 KB
    * sketch and a distributed point-probe of every distinct bucket.
    * Estimates only ever overcount (est ∈ [exact, exact + ε·n] w.h.p.),
    * which AnalyticsSketchSuite pins per bucket.
    *
    * The pattern at 100 TB: the sketch is a bounded summary built in one
    * pass (no per-key shuffle of the stream), and point lookups cost O(1)
    * against the broadcast — the frequency analogue of d16's Bloom
    * membership probe. The probe is the engine's one deliberate Scala-UDF
    * rung use in a registered query: CMS has no Catalyst probe expression
    * (unlike Bloom's `BloomFilterMightContain`, which d16 uses), and the
    * UDF gates only the |distinct buckets| probe rows, not the stream.
    */
  val h03CountMinFreq = Q(
    "h03_count_min_freq",
    (s, dir) => {
      // Scanned twice (eager sketch build, then the distinct probe) —
      // persist the one-column bucket stream so the second pass reads
      // cached blocks, the cache-the-shared-scan discipline of d14/d15.
      // The harness clears the cache between queries.
      val stream = Tables.lineitem(s, dir)
        .select(floor(sqrt(col("l_partkey"))).cast("long").as("bucket"))
        .persist()
      val cms = stream
        .agg(count_min_sketch(
          col("bucket"), lit(0.001), lit(0.99), lit(42)).as("sk"))
        .head().getAs[Array[Byte]](0)
      val sketch = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(cms))
      val skB = s.sparkContext.broadcast(sketch)
      val est = udf((b: Long) => skB.value.estimateCount(b))
      stream.distinct()
        .select(col("bucket"), est(col("bucket")).as("est"))
        .orderBy("bucket")
    },
    None)

  val all: Seq[Q] = Seq(
    q32CorrStats, q33SmallQtyRevenue, q34RevenueShare, q35RangeJoinBinned,
    q36GroupingSets, q37SlidingWindows, q38SaltedJoin, q39ApproxQuantiles,
    q40ArrayFuncs, q41RecursiveChain, q42DisjunctivePredicates, q43FilteredAgg,
    q44IdleCustomers, q45MapFuncs, q46Histogram, h01HeavyHitters,
    u01ConversionFunnel, u02CohortRetention, q49HllSketchUnion,
    q50LateralTopk, h02ApproxTopK, h03CountMinFreq)
}
