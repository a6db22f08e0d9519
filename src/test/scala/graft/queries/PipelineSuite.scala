package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Invariant tests for the wave-2 pipeline queries — the oracle pins the
  * values; these pin the semantics the values are supposed to have. */
class PipelineSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  import spark.implicits._

  test("c01 chunking covers every token and overlaps by size-stride") {
    val chunks = Pipeline.c01DocChunks.run(spark, dir)
      .select("doc_id", "chunk_idx", "n_tokens").as[(Long, Int, Int)].collect()
    val docLens = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(trim(col("text")), """\s+""")).as("n"))
      .as[(Long, Int)].collect().toMap
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == docLens.keySet, "every document must produce chunks")
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      val n = docLens(doc)
      // chunk idx dense from 0
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq, s"doc $doc gaps in chunk idx")
      // all chunks full-size except possibly the last; coverage reaches n
      sorted.init.foreach { case (_, _, t) => assert(t == 32, s"doc $doc short mid-chunk") }
      val (_, lastIdx, lastTok) = sorted.last
      assert(lastIdx * 24 + lastTok == n || (sorted.size == 1 && lastTok == n),
        s"doc $doc: last chunk ends at ${lastIdx * 24 + lastTok}, len $n")
      // a second-to-last chunk overlaps the last by size-stride when full
      if (sorted.size > 1) assert(lastIdx * 24 + 1 <= (lastIdx - 1) * 24 + 32,
        s"doc $doc: no overlap")
    }
  }

  test("s01 stratified rates land near their per-language targets") {
    val total = Tables.documents(spark, "/root/testdata/sf0.01")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = Pipeline.s01StratifiedSample.run(spark, "/root/testdata/sf0.01")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val target = Map("en" -> 4.0 / 16, "zh" -> 12.0 / 16).withDefaultValue(8.0 / 16)
    total.foreach { case (lang, n) =>
      val rate = kept.getOrElse(lang, 0L).toDouble / n
      // SHA-256 first hex char is uniform; fixture strata are ~100 docs, so
      // allow a generous binomial band rather than a tight tolerance.
      assert(math.abs(rate - target(lang)) < 0.2, s"$lang rate $rate vs ${target(lang)}")
    }
  }

  test("c02 tf-idf ranks at most 3 terms per doc, scores non-increasing") {
    val rows = Pipeline.c02TfidfTopTerms.run(spark, dir)
      .select("doc_id", "rk", "tfidf").as[(Long, Int, Double)].collect()
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.size <= 3)
      assert(sorted.map(_._2).toSeq == (1 to sorted.size), s"doc $doc ranks not dense")
      sorted.map(_._3).toSeq.sliding(2).foreach {
        case scala.collection.Seq(a, b) => assert(b <= a, s"doc $doc scores increase")
        case _ => ()
      }
    }
  }

  test("k01 assignment distances are exact for the centroid rows themselves") {
    val self = Pipeline.k01KmeansAssign.run(spark, dir)
      .filter(col("vec_id") < 8)
      .select("vec_id", "cluster", "dist").as[(Long, Int, Double)].collect()
    self.foreach { case (id, cl, d) =>
      assert(cl == id.toInt && d == 0.0, s"vector $id should be its own centroid")
    }
  }

  test("x01 mixture: pass-through languages kept whole, downsampled ones near target") {
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
      .as[(Long, String, Long)].collect()
    val total = docs.map(_._3).sum.toDouble
    val perLang = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val target = 0.3 * total / perLang.size

    val got = Pipeline.x01MixtureRebalance.run(spark, dir)
      .select($"doc_id", $"lang", $"n_tokens", $"p_incl")
      .as[(Long, String, Long, Double)].collect()

    // languages under budget: p = 1 and every document is included
    perLang.foreach { case (lang, toks) =>
      val sampled = got.filter(_._2 == lang)
      if (toks <= target) {
        assert(sampled.length === docs.count(_._2 == lang), s"$lang not whole")
        sampled.foreach(r => assert(r._4 === 1.0))
      } else {
        // downsampled: constant p < 1 and sampled token mass near target
        // (the coin is a deterministic hash; the bound is loose on purpose)
        assert(sampled.forall(_._4 < 1.0))
        assert(sampled.map(_._4).distinct.length === 1, s"$lang p not constant")
        val mass = sampled.map(_._3).sum.toDouble
        assert(mass > 0.5 * target && mass < 1.6 * target,
          s"$lang sampled $mass tokens vs target $target")
      }
    }
    // the corpus never gains documents
    assert(got.length <= docs.length)
  }

  test("x02 temperature sampling: per-language p constant, inversely " +
    "ordered by size, softer than x01's uniform target") {
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
      .as[(Long, String, Long)].collect()
    val perLang = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap

    val got = Pipeline.x02TemperatureSample.run(spark, dir)
      .select($"doc_id", $"lang", $"n_tokens", $"p_incl")
      .as[(Long, String, Long, Double)].collect()

    // p is a per-language constant…
    val pByLang = got.groupBy(_._2).view.mapValues(_.map(_._4).distinct).toMap
    pByLang.foreach { case (lang, ps) =>
      assert(ps.length === 1, s"$lang acceptance not constant: $ps")
    }
    // …and for unclamped languages p ∝ 1/√tok: strictly higher acceptance
    // for smaller languages (the α-sampling upsample property).
    val unclamped = pByLang.collect {
      case (lang, ps) if ps.head < 1.0 => lang -> ps.head
    }.toSeq
    unclamped.combinations(2).foreach { case Seq((la, pa), (lb, pb)) =>
      if (perLang(la) < perLang(lb)) assert(pa >= pb, s"$la/$lb violate 1/sqrt order")
      else if (perLang(lb) < perLang(la)) assert(pb >= pa, s"$la/$lb violate 1/sqrt order")
    }
    // Softer than x01: the expected sampled token mass per language,
    // tok_l·p_l, must NOT be equalized across the unclamped languages —
    // bigger languages keep a bigger (√-proportional) share.
    if (unclamped.length >= 2) {
      val masses = unclamped.map { case (l, p) => perLang(l) * p }
      assert(masses.max / masses.min > 1.01,
        s"alpha=0.5 should not equalize masses like x01: $masses")
    }
  }
}
