package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Source/sink coverage (SURVEY §2.2): CSV and JSON round-trips with
  * explicit schemas, and partitioned parquet writes with partition pruning.
  */
class SourcesSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("CSV round-trip preserves rows under an explicit schema") {
    val out = tmp("graft-csv")
    val src = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    src.write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType), StructField("c_mktsegment", StringType)))
    val back = spark.read.option("header", "true").schema(schema).csv(out)
    assert(back.count() === src.count())
    val (sumBack, sumSrc) = (
      back.agg(sum("c_acctbal")).head.getDouble(0),
      src.agg(sum("c_acctbal")).head.getDouble(0))
    assert(math.abs(sumBack - sumSrc) < 1e-6)
  }

  test("JSON lines round-trip preserves nested structs") {
    val out = tmp("graft-json")
    val src = Tables.events(spark, dir)
      .select(
        col("event_id"), col("event_type"),
        struct(col("user_id"), col("value")).as("payload"))
    src.write.mode("overwrite").json(out)
    val back = spark.read
      .schema("event_id BIGINT, event_type STRING, payload STRUCT<user_id: BIGINT, value: DOUBLE>")
      .json(out)
    assert(back.count() === src.count())
    val a = back.select("event_id", "payload.user_id").as[(Long, Long)].collect().toMap
    val b = src.select("event_id", "payload.user_id").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("XML round-trip (Spark 4 built-in source) preserves nested structs") {
    val out = tmp("graft-xml")
    val src = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"),
        struct(col("n_regionkey")).as("region"))
    src.write.mode("overwrite").option("rowTag", "nation").xml(out)
    val back = spark.read
      .schema("n_nationkey BIGINT, n_name STRING, region STRUCT<n_regionkey: BIGINT>")
      .option("rowTag", "nation").xml(out)
    assert(back.count() === src.count())
    val a = back.select($"n_nationkey", $"n_name", $"region.n_regionkey")
      .as[(Long, String, Long)].collect().toSet
    val b = src.select($"n_nationkey", $"n_name", $"region.n_regionkey")
      .as[(Long, String, Long)].collect().toSet
    assert(a === b)
  }

  test("state-store reader: a streaming aggregation's checkpointed state " +
    "is queryable as a batch DataFrame (observability surface)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = tmp("graft-state-ckpt")
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val name = s"statestore_${System.nanoTime()}"
    val q = input.toDF().toDF("k", "v")
      .groupBy("k").agg(sum("v").as("total"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    try {
      input.addData(("a", 1L), ("a", 2L), ("b", 10L))
      q.processAllAvailable()
      input.addData(("b", 5L))
      q.processAllAvailable()
    } finally q.stop()
    // The state data source reads the operator's keyed state offline from
    // the checkpoint — how a production debugger inspects a stuck query's
    // state without replaying it.
    val state = spark.read.format("statestore").load(ckpt)
    // The store holds the AGGREGATION BUFFER, so the value field carries
    // the buffer schema (`sum`), not the query's output alias.
    val totals = state.select(col("key.k"), col("value.sum"))
      .as[(String, Long)].collect().toMap
    assert(totals === Map("a" -> 3L, "b" -> 15L))
  }

  test("ORC round-trip preserves rows and pushes filters") {
    val out = tmp("graft-orc")
    val src = Tables.orders(spark, dir)
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() === src.count())
    val f = back.filter(col("o_orderstatus") === "F")
    val scan = f.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters") && scan.contains("o_orderstatus"),
      s"expected pushed ORC filter:\n$scan")
    assert(f.count() === src.filter(col("o_orderstatus") === "F").count())
  }

  test("binaryFile source reads opaque payloads with path/length metadata") {
    // The multimodal ingestion path (SURVEY §2.12): media lands as files,
    // `binaryFile` lifts them to (path, modificationTime, length, content)
    // rows whose `content` feeds MediaOps' decode stage. pathGlobFilter
    // prunes non-media files at the LISTING, before any read.
    val out = tmp("graft-bin")
    val payloads = Seq(
      ("a.img", Array[Byte](1, 2, 3, 4)),
      ("b.img", Array[Byte](9, 8, 7)),
      ("skip.txt", Array[Byte](0)))
    payloads.foreach { case (name, bytes) =>
      Files.write(java.nio.file.Paths.get(out, name), bytes)
    }
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img")
      .load(out)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("length"), col("content"))
    val got = df.as[(String, Long, Array[Byte])].collect()
      .map(r => (r._1, r._2, r._3.toSeq)).sortBy(_._1)
    assert(got === Seq(
      ("a.img", 4L, Seq[Byte](1, 2, 3, 4)),
      ("b.img", 3L, Seq[Byte](9, 8, 7))))
  }

  test("text source reads lines; wholetext reads one row per file") {
    val out = tmp("graft-text")
    Files.write(java.nio.file.Paths.get(out, "doc.txt"),
      "line one\nline two\n".getBytes("UTF-8"))
    val lines = spark.read.text(out).as[String].collect().sorted
    assert(lines === Array("line one", "line two"))
    val whole = spark.read.option("wholetext", "true").text(out)
      .as[String].collect()
    assert(whole === Array("line one\nline two\n"))
  }

  test("partitioned parquet write prunes partitions on read") {
    val out = tmp("graft-part")
    Tables.documents(spark, dir)
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("lang") === "en")
    // Partition pruning shows as PartitionFilters on the file scan (the
    // directory-level filter; inputFiles would report the pre-pruning index).
    val scan = pruned.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PartitionFilters") && scan.contains("(lang"),
      s"expected a lang partition filter on the scan:\n$scan")
    val expected = Tables.documents(spark, dir).filter(col("lang") === "en").count()
    assert(pruned.count() === expected)
  }

  test("dynamic partition overwrite replaces only the partitions in the batch") {
    val out = tmp("graft-dyn-overwrite")
    val docs = Tables.documents(spark, dir)
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    val before = spark.read.parquet(out).count()

    // Rewrite ONLY lang=en with a one-row batch. In dynamic mode the other
    // language partitions survive; static mode (the default) would have
    // dropped the whole table — the difference between a partition-level
    // upsert and a truncate-and-reload at 100 TB.
    val batch = docs.filter(col("lang") === "en").limit(1)
    batch.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").partitionBy("lang").parquet(out)

    val after = spark.read.parquet(out)
    val enCount = before - docs.filter(col("lang") === "en").count() + 1
    assert(after.filter(col("lang") === "en").count() === 1L,
      "en partition must contain exactly the new batch")
    assert(after.count() === enCount,
      "non-en partitions must be untouched")
    assert(after.filter(col("lang") =!= "en").count() ===
      docs.filter(col("lang") =!= "en").count())
  }

  test("sortWithinPartitions + partitioned write produces files sorted on disk") {
    // The layout that makes downstream merge-reads and min/max-stat
    // skipping effective: repartition by the partition column so each
    // output file covers one value, sort inside, verify each physical
    // parquet file is actually ordered.
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-sorted-write").toString
    // lang leads the sort key: the partitionBy writer REQUIRES ordering on
    // the partition column and would insert its own SortExec(lang) above a
    // doc_id-only sort — doc_id order would then survive only by
    // unguaranteed sort stability. Leading with lang satisfies the
    // writer's required ordering, so the user's sort is the one on disk.
    Tables.documents(spark, dir)
      .repartition(col("lang"))
      .sortWithinPartitions("lang", "doc_id")
      .write.partitionBy("lang").mode("overwrite").parquet(out)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .filter(p => p.toString.endsWith(".parquet"))
      .toArray.map(_.toString)
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.parquet(f).select("doc_id").as[Long].collect()
      assert(ids.sameElements(ids.sorted), s"file $f not sorted on doc_id")
    }
    // And the partitioned layout is intact: one lang per directory.
    val langs = Tables.documents(spark, dir).select("lang").distinct().count()
    assert(files.map(_.split("/").takeWhile(!_.endsWith(".parquet")).last).toSet.size === langs.toInt)
  }
}
