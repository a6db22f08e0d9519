package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental maintenance of a grouped count/sum materialized view from a
  * change-data-feed ([[ChangeDataFeed]] output): each change row contributes
  * `-old` and/or `+new` to its group, the contributions are pre-aggregated
  * per group, and ONE key-equi outer join folds them into the view — the
  * standard delta-propagation rule for distributive aggregates (count/sum),
  * so a 100 TB fact table's per-group rollup is maintained by touching only
  * the changed rows, never re-scanning the table.
  *
  * Correct under the two cases naive "add the inserts" maintenance gets
  * wrong:
  *   - an UPDATE that moves a row BETWEEN groups (the group key itself
  *     changed) contributes `-1/-x` to its old group and `+1/+x` to its new
  *     group;
  *   - a group whose count reaches zero is dropped from the view (it no
  *     longer exists), and a group can be born from updates alone.
  *
  * EXACTNESS CONTRACT: the measure is summed as DECIMAL(18,4) partials into
  * a DECIMAL(38,4) running total. Decimal addition is associative and
  * commutative, so folding commits one at a time lands on EXACTLY the value
  * a from-scratch recompute produces — the m09 gate hash-compares the two.
  * Doubles would drift (non-associative) and are accepted only as inputs.
  */
object IncrementalMaintenance {

  private val Partial = DecimalType(18, 4)
  private val Total = DecimalType(38, 4)

  /** Build the view's initial state from a base relation: one row per group,
    * `n_rows` count and `total` exact-decimal sum of `measure`. */
  def initial(base: DataFrame, groupKey: Column, measure: Column): DataFrame =
    base.groupBy(groupKey.as("group_key"))
      .agg(count(lit(1)).as("n_rows"),
        sum(measure.cast(Partial)).cast(Total).as("total"))

  /** Per-group (count, sum) deltas of one CDF batch. `oldGroup`/`oldMeasure`
    * read the feed's pre-image columns, `newGroup`/`newMeasure` the
    * post-image; rows absent on a side (INSERT has no pre-image, DELETE no
    * post-image) contribute nothing on that side. */
  def aggDeltas(feed: DataFrame, oldGroup: Column, oldMeasure: Column,
      newGroup: Column, newMeasure: Column): DataFrame = {
    val contributions = feed.select(array(
        struct(oldGroup.as("_k"), lit(-1L).as("_dn"),
          (-oldMeasure.cast(Partial)).as("_dx"),
          col("_change_type").isin("UPDATE", "DELETE").as("_live")),
        struct(newGroup.as("_k"), lit(1L).as("_dn"),
          newMeasure.cast(Partial).as("_dx"),
          col("_change_type").isin("UPDATE", "INSERT").as("_live"))
      ).as("sides"))
      .select(explode(col("sides")).as("s"))
      .filter(col("s._live"))
      .select(col("s._k").as("group_key"), col("s._dn").as("_dn"),
        col("s._dx").as("_dx"))
    contributions.groupBy("group_key")
      .agg(sum("_dn").as("dn"), sum("_dx").cast(Total).as("dx"))
  }

  /** Per-group (count, sum) deltas from the `.changes` RELATION (the
    * catalog's file-exact feed: separate INSERT/DELETE rows, no old/new
    * images) — each row contributes `+(1, x)` for INSERT and `−(1, x)` for
    * DELETE. Exact even at the feed's copy-on-write FILE grain: a carried
    * row of a rewritten file surfaces as a DELETE+INSERT pair of equal
    * value whose decimal contributions cancel, so maintenance from the
    * keyless relation lands on the same view as maintenance from the
    * key-joined [[ChangeDataFeed]] (the m17 gate hash-compares against a
    * from-scratch recompute). Any other `_change_type` fails the batch
    * loudly — silently skipping one would corrupt the view. */
  def aggDeltasFromChanges(changes: DataFrame, groupKey: Column,
      measure: Column): DataFrame = {
    val x = measure.cast(Partial)
    val signedN = when(col("_change_type") === "INSERT", lit(1L))
      .when(col("_change_type") === "DELETE", lit(-1L))
      .otherwise(raise_error(concat(
        lit("aggDeltasFromChanges: unexpected _change_type "),
        col("_change_type"))))
    val signedX = when(col("_change_type") === "INSERT", x).otherwise(-x)
    changes.select(groupKey.as("group_key"),
        signedN.as("_dn"), signedX.as("_dx"))
      .groupBy("group_key")
      .agg(sum("_dn").as("dn"), sum("_dx").cast(Total).as("dx"))
  }

  /** Fold one delta batch into a STORED view — a catalog table with columns
    * `(group_key, n_rows, total)` on a catalog supporting row-level
    * operations (e.g. the engine's versioned [[graft.sources
    * .SnapshotCatalog]]) — via ONE statement-level `MERGE INTO`, so each
    * maintenance step is an atomic, time-travelable commit of its own:
    *
    *   - a group whose count reaches zero is DELETEd from the view,
    *   - an existing group is UPDATEd by pure decimal addition,
    *   - a net-positive new group is INSERTed (a zero-net group that never
    *     existed — e.g. a row moved in and back out within one batch — is
    *     NOT inserted).
    *
    * This is [[applyDeltas]]'s algebra pushed through the SQL row-level
    * path: Catalyst plans the same key-equi join, and the view table's
    * history becomes an audit log of every refresh (tag/rollback apply to
    * the VIEW too). The temp-view name is caller-scoped so concurrent
    * maintainers of different views don't collide. */
  def maintainInto(spark: org.apache.spark.sql.SparkSession, viewTable: String,
      deltas: DataFrame): Unit = {
    val src = "graft_im_deltas_" + viewTable.replaceAll("[^A-Za-z0-9_]", "_")
    deltas.createOrReplaceTempView(src)
    // Null-safe ON and coalesced measures, matching applyDeltas exactly: a
    // NULL group key is a real group (plain `=` would never match it,
    // inserting a duplicate NULL row per batch), and an all-NULL-measure
    // delta batch must not null the running total.
    spark.sql(s"""MERGE INTO $viewTable t USING $src s
      ON t.group_key <=> s.group_key
      WHEN MATCHED AND t.n_rows + s.dn <= 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET
        t.n_rows = t.n_rows + s.dn,
        t.total = CAST(t.total + coalesce(s.dx, CAST(0 AS DECIMAL(38,4)))
          AS DECIMAL(38,4))
      WHEN NOT MATCHED AND s.dn > 0 THEN INSERT (group_key, n_rows, total)
        VALUES (s.group_key, s.dn, coalesce(s.dx, CAST(0 AS DECIMAL(38,4))))""")
    spark.catalog.dropTempView(src)
    ()
  }

  /** Fold one delta batch into the view: full-outer join on the group key,
    * add, drop groups whose count reached zero. The join shuffles only
    * |view| + |changed groups| rows. */
  def applyDeltas(view: DataFrame, deltas: DataFrame): DataFrame = {
    val v = view.as("v")
    val d = deltas.as("d")
    v.join(d, col("v.group_key") <=> col("d.group_key"), "full_outer")
      .select(
        coalesce(col("v.group_key"), col("d.group_key")).as("group_key"),
        (coalesce(col("v.n_rows"), lit(0L)) + coalesce(col("d.dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("v.total"), lit(0).cast(Total)) +
          coalesce(col("d.dx"), lit(0).cast(Total))).cast(Total).as("total"))
      .filter(col("n_rows") > 0)
  }
}
