package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-prefilter scaling probe on a REALISTIC vocabulary — the
  * measurement the fixture cannot provide: `documents.parquet` draws from
  * a 31-word vocabulary, so every train bigram also occurs in the holdout
  * set and d16's Bloom filter passes ~everything by construction (the
  * filter is semantics-neutral either way; only its *selectivity* is
  * degenerate there).
  *
  * Here the corpus is synthesized with a 50k-token vocabulary (bigram
  * space ≈ 2.5·10⁹), a FIXED 500-doc holdout side (the benchmark-suite
  * shape: holdout stays constant while the corpus grows), and a train
  * side that scales with the factor; every 10th holdout doc (the
  * position-8 doc of every 5th decade — 50 of 500, the `pairs` column)
  * is planted as an exact copy of a train doc so the containment answer
  * is non-trivial at every factor. Token streams derive from `xxhash64(doc_id, pos)` —
  * deterministic, executor-local generation, no RNG state.
  *
  * Measured per factor: exact containment join (d10 regime) vs the
  * Bloom-prefiltered form (d16 regime, same `containmentPairs` body),
  * plus the filter's measured selectivity (surviving fraction of the
  * train shingle stream). On a realistic corpus nearly every train
  * shingle is absent from the holdout set, so the stream drops at the
  * scan-adjacent filter INSTEAD of being shuffled into the join — the
  * structural 100 TB claim d16's fixture row cannot show.
  *
  * Usage: `runMain graft.BloomProbe [factors…]` (default 1 10 30).
  * Timings are min-of-3 (the project's quiet-median discipline — ambient
  * host load distorts single runs by multiples, see BASELINE.md). Prints
  * one CSV line per factor:
  * `factor,train_docs,exact_s,bloom_s,sel_true,sel_bloom,pairs`.
  */
object BloomProbe {

  private val Vocab = 50000
  private val TokensPerDoc = 60
  private val HoldoutDocs = 500
  private val BaseTrainDocs = 4000

  /** (doc_id, text) with doc_id%10<8 = train (scaled), %10>=8 = holdout
    * (fixed). Planted containment: holdout docs with id%50 == 8 carry the
    * token stream of train doc id-8 (same decade ⇒ always present). */
  private[graft] def corpus(spark: SparkSession, factor: Int): DataFrame = {
    def tokens(seedCol: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(1), lit(TokensPerDoc)),
        i => concat(lit("t"), pmod(xxhash64(seedCol * 1000 + i), lit(Vocab)))))
    // Train ids: decades 0..(n/8)-1, positions 0..7 within each decade;
    // holdout ids: positions 8..9 of the FIRST HoldoutDocs/2 decades only.
    // Integer division must be explicit: Column./ is DOUBLE division, and a
    // fractional doc_id would leak ~20% of train docs into the %10>=8
    // holdout side (and grow the "fixed" holdout with the factor).
    val nTrain = BaseTrainDocs * factor
    val train = spark.range(nTrain)
      .select((floor(col("id") / 8).cast("long") * 10 + col("id") % 8).as("doc_id"))
    val holdout = spark.range(HoldoutDocs)
      .select((floor(col("id") / 2).cast("long") * 10 + 8 + col("id") % 2).as("doc_id"))
    train.unionAll(holdout)
      .select(col("doc_id"),
        tokens(when(col("doc_id") % 10 >= 8 && col("doc_id") % 50 === 8,
          col("doc_id") - 8).otherwise(col("doc_id"))).as("text"))
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def minOf3(f: => Unit): Double = (1 to 3).map(_ => time(f)).min

  def main(args: Array[String]): Unit = {
    val factors = if (args.isEmpty) Seq(1, 10, 30) else args.map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionFactory
      .configure(SparkSession.builder().master(s"local[$cpus]"), "graft-bloom-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warm codegen once at the smallest factor.
    sink(graft.queries.TextOps.containmentPairs(corpus(spark, 1)))
    spark.catalog.clearCache()

    println("factor,train_docs,exact_s,bloom_s,sel_true,sel_bloom,pairs")
    factors.foreach { f =>
      val docs = corpus(spark, f)
      val exactS = minOf3 {
        sink(graft.queries.TextOps.containmentPairs(docs))
        spark.catalog.clearCache()
      }
      val bloomS = minOf3 {
        sink(graft.queries.TextOps.containmentPairs(docs, bloomPrefilter = true))
        spark.catalog.clearCache()
      }
      // Measured selectivity two ways: `sel_true` is the exact fraction of
      // the train shingle stream whose shingle occurs in the holdout set
      // (a semi-join — what an ideal filter would keep); `sel_bloom` is
      // the fraction the ACTUAL d16 filter passes — built and probed via
      // the same `TextOps.bloomBuild`/`bloomProbe` machinery the timed
      // path runs (xxhash64-keyed Catalyst expressions, same sizing), so
      // the column describes the filter whose wall time `bloom_s` is.
      import graft.operators.MinHashLsh
      val g = docs.select(col("doc_id"),
          explode(MinHashLsh.shingles(col("text"), 2)).as("sh"))
      val trainSh = g.filter(col("doc_id") % 10 < 8).persist()
      val holdSh = g.filter(col("doc_id") % 10 >= 8).select("sh")
      val total = trainSh.count()
      val selTrue = trainSh.join(holdSh.distinct(), Seq("sh"), "left_semi")
        .count().toDouble / total
      val bfBytes = graft.queries.TextOps.bloomBuild(holdSh, col("sh"))
      val selBloom = trainSh
        .filter(graft.queries.TextOps.bloomProbe(bfBytes, col("sh")))
        .count().toDouble / total
      trainSh.unpersist()
      val pairs = graft.queries.TextOps.containmentPairs(docs).count()
      spark.catalog.clearCache()
      println(f"$f,${BaseTrainDocs * f},$exactS%.2f,$bloomS%.2f,$selTrue%.4f,$selBloom%.4f,$pairs")
    }
    spark.stop()
  }
}
