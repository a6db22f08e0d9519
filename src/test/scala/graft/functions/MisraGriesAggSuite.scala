package graft.functions

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MisraGriesAggSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Drive the aggregate's own update/merge/serialize path directly. */
  private def summarize(streams: Seq[Seq[String]], k: Int,
      mergeOrder: Random): Map[String, Long] = {
    val agg = MisraGriesAgg(org.apache.spark.sql.catalyst.expressions.Literal("x"), k)
    val partials = streams.map { items =>
      var buf = agg.createAggregationBuffer()
      items.foreach { it =>
        // Inline the update semantics via the public deserialize/serialize
        // pair: feed through a one-element buffer merge to avoid building
        // InternalRows by hand.
        val single = mutable.HashMap(it -> 1L)
        buf = mergeMg(buf, single, k)
      }
      agg.deserialize(agg.serialize(buf))
    }
    val shuffled = mergeOrder.shuffle(partials)
    val merged = shuffled.reduce((a, b) => agg.merge(a, b))
    merged.toMap
  }

  /** Reference MG update loop (single-item insert == one update() call). */
  private def mergeMg(buf: mutable.HashMap[String, Long],
      single: mutable.HashMap[String, Long], k: Int): mutable.HashMap[String, Long] = {
    val item = single.keys.head
    buf.get(item) match {
      case Some(c) => buf(item) = c + 1
      case None if buf.size < k => buf(item) = 1L
      case None =>
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  test("exact when distinct items fit in k counters") {
    val stream = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c")
    val got = summarize(Seq(Random.shuffle(stream)), k = 8, new Random(1))
    assert(got === Map("a" -> 50L, "b" -> 30L, "c" -> 7L))
  }

  test("undercount bounded by n/(k+1) and never overcounts, across random merges") {
    val rnd = new Random(42)
    val k = 16
    // Zipf-ish stream over 200 distinct items, split into 7 partitions.
    val items = (1 to 200).flatMap(i => Seq.fill(1 + 2000 / (i * i))(s"item$i"))
    val stream = rnd.shuffle(items)
    val n = stream.size
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val parts = stream.grouped(math.ceil(n / 7.0).toInt).toSeq
    (1 to 5).foreach { trial =>
      val est = summarize(parts, k, new Random(trial))
      est.foreach { case (item, e) =>
        assert(e <= truth(item), s"overcount for $item")
        assert(e >= truth(item) - n / (k + 1), s"bound broken for $item")
      }
      // Every item above the guarantee threshold must be present.
      truth.filter(_._2 > n / (k + 1)).keys.foreach { hot =>
        assert(est.contains(hot), s"heavy item $hot missing (trial $trial)")
      }
    }
  }

  test("SQL-registered aggregate: candidates superset + exact recount is deterministic") {
    GraftFunctions.register(spark)
    // 300 distinct keys, key i appearing i times: n = 45150, n/(k+1) ≈ 350
    // with k=128 ⇒ every key with freq > 350 is guaranteed in the summary.
    val df = (1 to 300).flatMap(i => Seq.fill(i)(i)).toDF("key")
      .repartition(13)
    val hh = df
      .agg(GraftFunctions.heavyHitters(col("key").cast("string")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").cast("int").as("key"), col("e.est"))
      .collect()
    val est = hh.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = 45150
    val bound = n / 129
    (1 to 300).filter(i => i > bound).foreach { i =>
      assert(est.contains(i), s"key $i (freq $i > $bound) missing")
    }
    est.foreach { case (key, e) =>
      assert(e <= key && e >= key - bound, s"estimate $e for true $key outside bounds")
    }
  }

  test("serialize/deserialize roundtrip preserves the summary") {
    val agg = MisraGriesAgg(org.apache.spark.sql.catalyst.expressions.Literal("x"), 4)
    val buf = mutable.HashMap("α" -> 3L, "b" -> 1L, "longer item ✓" -> 9L)
    assert(agg.deserialize(agg.serialize(buf)) === buf)
  }
}
