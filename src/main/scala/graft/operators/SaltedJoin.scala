package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting.
  *
  * AQE's skew-join splitting (on by default in `SessionFactory`) handles
  * most skew at runtime; explicit salting remains the tool when one side's
  * key distribution is pathological and known in advance (e.g. a null-ish
  * default key holding 30% of a 100 TB fact table), or when the build side
  * must be replicated deterministically.
  *
  * Mechanics: the skewed (large) side gets a uniform random salt in
  * [0, buckets); the small side is exploded `buckets`-fold, one copy per
  * salt value. The join key becomes (key, salt), splitting each hot key's
  * rows across `buckets` tasks. Row multiplication is confined to the small
  * side (cost: |small| × buckets).
  */
object SaltedJoin {

  /** Inner equi-join `large ⋈ small` on `key`, salted `buckets` ways.
    * Column sets must be disjoint apart from the key.
    */
  def join(large: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    // rand() is seeded per-partition at execution; any uniform spread works
    // for splitting — correctness doesn't depend on the salt values.
    val salted = large.withColumn("_salt", (rand(seed = 42) * buckets).cast("int"))
    val replicated = small.withColumn(
      "_salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted
      .join(replicated, Seq(key, "_salt"), "inner")
      .drop("_salt")
  }

  /** The salt expression alone, for composing into custom plans. */
  def saltCol(buckets: Int, seed: Long = 42L): Column =
    (rand(seed) * buckets).cast("int")
}
