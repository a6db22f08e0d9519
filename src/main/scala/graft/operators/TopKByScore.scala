package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate (top-level for Encoder derivation). */
final case class ScoredId(id: Long, score: Double)

/** Typed Aggregator keeping the k best (score desc, id asc) candidates.
  *
  * Versus a window `row_number` top-k, this aggregates with *partial
  * combine*: each map task reduces its partition to ≤ k candidates before
  * the shuffle, so the exchange carries O(k · partitions) rows per group
  * instead of every candidate — the difference between shuffling 5 rows and
  * shuffling the corpus at 100 TB fan-in. (SURVEY §2.11's Aggregator slot.)
  *
  * Buffers stay sorted best-first and bounded at k, so reduce is O(k) per
  * row and merge O(k).
  */
final class TopKByScore(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive: $k")

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (buf.sizeIs >= k && ord.gteq(a, buf.last)) buf
    else ((buf :+ a).sorted(ord)).take(k)

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r.sorted(ord).take(k)

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
}
