package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational MERGE INTO (upsert) semantics over plain DataFrames.
  *
  * The reference declares `format_version: 2` Iceberg tables
  * (`/root/reference/iceberg_tables/customers.yml:4`,
  * `create_iceberg_tables.py:36,54`) precisely because spec v2 enables
  * row-level operations — MERGE being the flagship. Without an Iceberg
  * runtime jar (SURVEY §7) the *storage* side (delete files, commit
  * protocol) can't run here, but the relational semantics can: MERGE is a
  * full-outer join between target and source on the key, with per-branch
  * column rewrites. This operator computes the post-merge state of the
  * target as a DataFrame; a table format then makes writing it back
  * transactional.
  *
  * Branches (mirroring SQL MERGE):
  *   - matched (key in both)            → `whenMatched` rewrites, other
  *     columns carried from the target
  *   - not matched by target (source-only) → `whenNotMatched` inserts
  *     (if None, source-only rows are dropped — update-only merge)
  *   - not matched by source (target-only) → row kept unchanged
  *
  * Scale posture: one shuffle-or-broadcast equi-join on the merge key.
  * Small change batches broadcast (Catalyst decides from stats); big-big
  * merges shuffle both sides on the key — the same join a table format's
  * copy-on-write MERGE plans internally. No row ever reaches the driver.
  */
object MergeInto {

  /** Post-merge target state.
    *
    * @param target       current table state
    * @param source       change batch; must contain `key`; its keys must be
    *                     unique (a MERGE precondition — SQL raises
    *                     "multiple source rows matched" otherwise)
    * @param key          equi-merge key column present in both
    * @param whenMatched  target-column → rewrite expression; may reference
    *                     `t.<col>` / `s.<col>` qualified columns
    * @param whenNotMatched target-column → insert expression over `s.*`;
    *                     None = drop unmatched source rows
    */
  def merge(
      target: DataFrame,
      source: DataFrame,
      key: String,
      whenMatched: Map[String, Column],
      whenNotMatched: Option[Map[String, Column]]): DataFrame = {
    val joined = target.alias("t")
      .join(source.alias("s"), col(s"t.$key") === col(s"s.$key"), "full_outer")
    val matched = col(s"t.$key").isNotNull && col(s"s.$key").isNotNull
    val sourceOnly = col(s"t.$key").isNull

    val out = target.columns.map { c =>
      val keep = col(s"t.$c")
      val upd  = whenMatched.getOrElse(c, keep)
      whenNotMatched match {
        case Some(ins) =>
          when(matched, upd)
            .when(sourceOnly, ins.getOrElse(c, lit(null)))
            .otherwise(keep).as(c)
        case None =>
          when(matched, upd).otherwise(keep).as(c)
      }
    }
    val base = if (whenNotMatched.isDefined) joined else joined.filter(!sourceOnly)
    base.select(out.toIndexedSeq: _*)
  }
}
