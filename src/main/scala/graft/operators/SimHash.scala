package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting — SURVEY.md §2.12.
  *
  * 64-bit SimHash: each token votes ±1 on every bit of its xxhash64; a bit
  * of the fingerprint is set iff its vote total is non-negative. Similar
  * documents land within a small Hamming distance.
  *
  * Implemented as one nested higher-order fold (`aggregate` over bit index,
  * inner `aggregate` over token hashes) — entirely codegen'd expressions,
  * row-local, no shuffle and no UDF. At 100 TB this runs as a narrow map
  * over the scan; pairing near-dups then groups on rotated fingerprint
  * prefixes or joins on Hamming-ball buckets, never all-pairs.
  */
object SimHash {

  /** Token array of a text column (lowercased, whitespace-split). */
  def tokens(text: Column): Column = split(trim(lower(text)), """\s+""")

  /** 64-bit SimHash of an array<string> token column. */
  def simhash64(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    // For each bit i: sum(±1 votes) ≥ 0 ⇒ set bit i. shiftright with a
    // non-literal index is only exposed in SQL, hence the expr-built lambda.
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, i) => {
        val votes = aggregate(
          hashes,
          lit(0),
          (a, h) => a + when(expr_bit(h, i) === 1, 1).otherwise(-1))
        acc + when(votes >= 0, shiftleft_col(lit(1L), i)).otherwise(lit(0L))
      })
  }

  /** (h >> i) & 1 with a column shift amount (Scala API only takes Int). */
  private def expr_bit(h: Column, i: Column): Column =
    call_function("shiftright", h, i).bitwiseAND(lit(1L))

  private def shiftleft_col(v: Column, i: Column): Column =
    call_function("shiftleft", v, i)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Relational SimHash: explode tokens → one pass of 64 vote-sum aggregates
    * (map-side combined, codegen'd) → pack bits. Same function as
    * [[simhash64]] (parity-tested) but linear and shuffle-light at scale —
    * the per-row nested fold above doesn't codegen at 64 bits wide.
    *
    * Documents with zero tokens produce no row.
    */
  def simhashFrame(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val exploded = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val votes = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"_v$i")
    }
    val packed = (0 until 64).map { i =>
      when(col(s"_v$i") >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    exploded
      .groupBy("id")
      .agg(votes.head, votes.tail: _*)
      .select(col("id"), packed.as("simhash"))
  }
}
