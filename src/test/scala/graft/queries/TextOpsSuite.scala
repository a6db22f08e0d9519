package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TextOpsSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("d16 bloom prefilter: output equals the unbounded exact audit and the filter prunes") {
    val dir = SparkTestSession.sfDir
    val viaBloom = TextOps.d16BloomContamination.run(spark, dir).collect().toSeq
    // d10's registration samples its holdout side (scale hygiene), so the
    // Bloom path's bit-identity is pinned against the unbounded pipeline
    // body directly — same semantics d10 had before the bound.
    val exact = TextOps.containmentPairs(Tables.documents(spark, dir))
      .select(col("holdout_doc"), col("train_doc"), col("n_shared"),
        round(col("containment"), 6).as("containment"))
      .orderBy("holdout_doc", "train_doc").collect().toSeq
    assert(viaBloom === exact)
    // The prefilter must drop train shingles absent from the holdout set —
    // rebuild both sides and count. (On the fixture's tiny vocabulary most
    // bigrams ARE shared, so assert strict reduction, not a ratio.)
    import graft.operators.MinHashLsh
    val g = Tables.documents(spark, dir)
      .withColumn("split",
        when(col("doc_id") % 10 < 8, "train").otherwise("holdout"))
      .select(col("doc_id"), col("split"),
        explode(MinHashLsh.shingles(col("text"), 2)).as("sh"))
    val train = g.filter(col("split") === "train")
    val bloom = g.filter(col("split") === "holdout")
      .select("sh").stat.bloomFilter("sh", 1L << 20, 0.01)
    val kept = train.filter(
      udf((x: String) => bloom.mightContainString(x)).apply(col("sh"))).count()
    assert(kept < train.count())
  }

  test("d10 bounded audit: the holdout id bound is pushed to a parquet scan") {
    val plan = TextOps.d10Contamination.run(spark, SparkTestSession.sfDir)
      .queryExecution.executedPlan.toString
    // Loose regex (exact PushedFilters rendering is engine-version-specific):
    // the sampled holdout side must read O(1) row groups at any corpus size.
    assert("""PushedFilters: \[[^\]]*LessThan\(doc_id,200\)""".r
      .findFirstIn(plan).isDefined,
      s"expected pushed doc_id<200 bound on the holdout scan in:\n$plan")
  }

  test("d17 stop-shingle cap engages: stop set non-empty, streams shrink, fan-out bounded") {
    val dir = SparkTestSession.sfDir
    val docs = Tables.documents(spark, dir)
    // The fractional cap (df > nTrain/20) must actually bind on the fixture
    // corpus — an inert cutoff would make d17 a re-registration of d10.
    import graft.operators.MinHashLsh
    val g = docs
      .withColumn("split",
        when(col("doc_id") % 10 < 8, "train").otherwise("holdout"))
      .select(col("doc_id"), col("split"),
        explode(MinHashLsh.shingles(col("text"), 2)).as("sh"))
    val nTrain = docs.filter(col("doc_id") % 10 < 8).count()
    val dfs = g.filter(col("split") === "train").groupBy("sh")
      .agg(count(lit(1)).as("df"))
    val nStop = dfs.filter(col("df") * 20 > nTrain).count()
    assert(nStop > 0, "fractional df cutoff never engaged on the fixture")
    // Capped streams must be strictly smaller than d10's, and the per-
    // shingle fan-out bound must hold: every surviving shingle's train df
    // is ≤ nTrain/20 by construction.
    // getAs boxes to null on an empty survivor set — assert that case
    // explicitly rather than NPE-ing in getLong.
    val maxSurvivingDf = Option(dfs.filter(col("df") * 20 <= nTrain)
      .agg(max("df")).head().getAs[java.lang.Long](0))
    assert(maxSurvivingDf.isDefined,
      "cutoff stopped EVERY shingle — cap degenerated on this fixture")
    assert(maxSurvivingDf.get * 20 <= nTrain)
    // And the registered query still returns rows (the cap must not
    // degenerate to an empty result on the fixture).
    val n = TextOps.d17ContaminationCapped.run(spark, dir).count()
    assert(n > 0)
    // Plan audit: the stop-set prune rides a broadcast anti-join, never a
    // shuffled one — the stop set is Zipf-small by construction.
    val plan = TextOps.containmentPairs(docs,
        stopDfCap = Some(TextOps.FractionalDf(20)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join in plan:\n$plan")
  }

  test("d17 cap semantics: an inert cutoff reproduces d10's uncapped output exactly") {
    val dir = SparkTestSession.sfDir
    val docs = Tables.documents(spark, dir)
    // AbsoluteDf(MaxValue) drops nothing, so the capped pipeline — stop-set
    // aggregation, anti-joins, gram-count recomputation and all — must be a
    // value-exact identity over the uncapped one. Pins that the cap changes
    // ONLY which shingles participate, never the containment arithmetic.
    // (hn is INT via size() uncapped but LONG via count() capped — a
    // representation difference by construction; normalize before compare.)
    def norm(d: org.apache.spark.sql.DataFrame) = d
      .select(col("holdout_doc"), col("train_doc"), col("n_shared"),
        col("hn").cast("long").as("hn"), col("containment"))
      .orderBy("holdout_doc", "train_doc").collect().toSeq
    val capped = norm(TextOps.containmentPairs(docs,
      stopDfCap = Some(TextOps.AbsoluteDf(Long.MaxValue))))
    val uncapped = norm(TextOps.containmentPairs(docs))
    assert(capped === uncapped)
  }

  test("d15 DSIR importance: en documents score higher than non-en on average") {
    val dir = SparkTestSession.sfDir
    val byLang = TextOps.d15DsirImportance.run(spark, dir)
      .groupBy("lang").agg(avg("log_weight").as("w"))
      .as[(String, Double)].collect().toMap
    // The target model is the en slice: its own documents must look more
    // target-like than every other language's, per-token smoothing aside.
    val en = byLang("en")
    byLang.filterNot(_._1 == "en").foreach { case (l, w) =>
      assert(en > w, s"en avg $en should exceed $l avg $w")
    }
    // And the per-doc keep flag mirrors the sign of the rounded weight.
    val bad = TextOps.d15DsirImportance.run(spark, dir)
      .filter((col("log_weight") >= 0) =!= col("keep")).count()
    assert(bad === 0L)
  }

  test("PII scrub redacts planted emails and phone numbers") {
    val docs = Seq(
      (1L, "contact me at alice.smith+spam@example.co.uk or 555-123-4567 thanks"),
      (2L, "no pii here just plain words"),
      (3L, "two mails a@b.io c@d.org and phone 111.222.3333")).toDF("doc_id", "text")
    val scrubbed = regexp_replace(
      regexp_replace(col("text"), TextOps.emailRe, "<EMAIL>"), TextOps.phoneRe, "<PHONE>")
    val out = docs.select(col("doc_id"), scrubbed.as("s"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "contact me at <EMAIL> or <PHONE> thanks")
    assert(out(2L) === "no pii here just plain words")
    assert(out(3L) === "two mails <EMAIL> <EMAIL> and phone <PHONE>")
  }

  test("PII scrub is an exact no-op on the clean fixture corpus") {
    val dir = SparkTestSession.sfDir
    val row = TextOps.d08PiiScrub.run(spark, dir)
      .agg(sum("n_emails"), sum("n_phones")).head()
    assert(row.getLong(0) === 0L)
    assert(row.getLong(1) === 0L)
  }

  test("d14 repeated-ngram fractions: every doc scored, bounds hold, generator-route replay agrees") {
    import org.apache.spark.sql.functions._
    val dir = SparkTestSession.sfDir
    val got = TextOps.d14RepeatedNgrams.run(spark, dir)
    assert(got.count() === Tables.documents(spark, dir).count())
    assert(got.filter($"n_repeated" > $"n_grams" || $"n_repeated" < 0 ||
      $"dup_fraction" < 0.0 || $"dup_fraction" > 1.0).count() === 0)

    // Independent route: stream shingles out of the custom Generator
    // (graft_shingles) instead of the array pipeline, recompute df + per-doc
    // counts, and require identical rows.
    graft.functions.GraftFunctions.register(spark)
    val g = Tables.documents(spark, dir)
      .select($"doc_id", expr("graft_shingles(text, 5)").as("sh"))
    val df = g.groupBy("sh").agg(count_distinct($"doc_id").as("n_docs"))
    val replay = g.join(df, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"n_docs" >= 2, 1L).otherwise(0L)).as("n_repeated"))
      .select($"doc_id", $"n_grams", $"n_repeated",
        round($"n_repeated".cast("double") / $"n_grams", 6).as("dup_fraction"))
    assert(got.exceptAll(replay).count() === 0 &&
      replay.exceptAll(got).count() === 0)

    // The pipeline groups document frequency by xxhash64(shingle) (8-byte
    // shuffle keys instead of 5-gram strings — the 100 TB posture the d14
    // registration documents). The replay equality above already fails on
    // any collision; this pins the collision-freeness explicitly.
    val grams = g.select($"sh").distinct()
    assert(grams.count() ===
      grams.select(xxhash64($"sh")).distinct().count(),
      "xxhash64 collision among fixture shingles — hashed df grouping unsound")
  }

  test("language-id scores are deterministic and argmax picks the max") {
    val dir = SparkTestSession.sfDir
    val rows = TextOps.d05LangId.run(spark, dir)
      .select("s_de", "s_en", "s_es", "s_fr", "s_zh", "predicted_lang")
      .collect()
    rows.foreach { r =>
      val scores = Map(
        "de" -> r.getInt(0), "en" -> r.getInt(1), "es" -> r.getInt(2),
        "fr" -> r.getInt(3), "zh" -> r.getInt(4))
      val best = scores.maxBy { case (l, s) => (s, -l.head.toInt) } // max score, lex-smallest tie
      val maxScore = scores.values.max
      val lexFirstMax = scores.filter(_._2 == maxScore).keys.min
      assert(r.getString(5) === lexFirstMax, s"scores=$scores")
      assert(best._2 === maxScore)
    }
  }

  test("d18 dup-span coverage: hand-computed islands, gaps, and within-doc-only exclusion") {
    // doc 1/2 share windows at pos {1,2} → one merged island of length 6.
    // doc 3 repeats a 5-gram only WITHIN itself → min=max owner, not
    // duplicated. doc 4 carries the shared gram at pos 1 and pos 12 —
    // delta 11 > 5 splits two islands of 5, exercising the gap branch.
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f x y"),
      (3L, "z z z z z z"),
      (4L, "a b c d e 1 2 3 4 5 6 a b c d e")).toDF("doc_id", "text")
    val got = TextOps.dupSpanCoverage(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got === Seq(
      (1L, 8L, 2L, 6L, 6L, 0.75),
      (2L, 8L, 2L, 6L, 6L, 0.75),
      (3L, 6L, 0L, 0L, 0L, 0.0),
      (4L, 16L, 2L, 10L, 5L, 0.625)))
    // Registered plan: gram-keyed equi-joins only — a cartesian/BNLJ here
    // would mean the join-back degenerated.
    val plan = TextOps.d18DupSpans.run(spark, SparkTestSession.sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("d19 span removal: hand-computed cuts, and removed == d18's covered") {
    // Same planted corpus as the d18 test: doc 1/2 lose positions 1–6,
    // doc 3 keeps everything (within-doc repeat is not cross-doc dup),
    // doc 4 loses two 5-token islands (pos 1–5 and 12–16).
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f x y"),
      (3L, "z z z z z z"),
      (4L, "a b c d e 1 2 3 4 5 6 a b c d e")).toDF("doc_id", "text")
    val got = TextOps.dupSpanRemoval(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got === Seq(
      (1L, 8L, 2L, 6L, "g h"),
      (2L, 8L, 2L, 6L, "x y"),
      (3L, 6L, 6L, 0L, "z z z z z z"),
      (4L, 16L, 6L, 10L, "1 2 3 4 5 6")))
    // Score/cut consistency on the real fixture: d19's removed_tokens
    // must equal d18's covered_tokens doc-for-doc — one island
    // definition feeding both (the refactor this guards).
    val covered = TextOps.dupSpanCoverage(
        Tables.documents(spark, SparkTestSession.sfDir))
      .select("doc_id", "covered_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val removed = TextOps.dupSpanRemoval(
        Tables.documents(spark, SparkTestSession.sfDir))
      .select("doc_id", "removed_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(removed === covered)
    assert(removed.values.sum > 0L, "fixture has planted dups; removal must cut something")
  }
}
