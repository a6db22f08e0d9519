package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.MinHashLsh
import graft.queries.Tables

/** A/B measurement for the MinHash signature aggregation forms (both
  * bit-identical per MinHashSketchAggSuite):
  *   - relational: 64 separate `min(xxhash64(...))` aggregate columns
  *     (codegen'd HashAggregate, wide buffers, ~1 MB task binaries)
  *   - sketch: one TypedImperativeAggregate buffer (ObjectHashAggregate)
  * plus the downstream pair generation over each. Usage:
  * `SPARK_GRAFT_SF_DIR=... runMain graft.SigProbe [passes]`. */
object SigProbe {
  def main(args: Array[String]): Unit = {
    val passes = args.headOption.flatMap(_.toIntOption).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionFactory
      .configure(SparkSession.builder().master(s"local[$cpus]"),
        appName = "graft-sig-probe", shufflePartitions = cpus.toIntOption.getOrElse(32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val P = MinHashLsh.Params(shingleSize = 2, nPerms = 64, bands = 16,
      jaccardThreshold = 0.5)
    def sh() = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"),
        MinHashLsh.shingles(col("text"), P.shingleSize).as("shingles"))
    def time(name: String)(mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val walls = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sigprobe] $name%-28s min=${walls.min}%.3f " +
        walls.map(w => f"$w%.2f").mkString("[", ", ", "]"))
    }
    time("relational-sigs")(() => MinHashLsh.signaturesFromShingles(sh(), P))
    time("sketch-sigs")(() => MinHashLsh.signaturesSketch(sh(), P))
    time("relational-bands")(() =>
      MinHashLsh.bandFrame(MinHashLsh.signaturesFromShingles(sh(), P), P))
    time("sketch-bands")(() =>
      MinHashLsh.bandFrame(MinHashLsh.signaturesSketch(sh(), P), P))
    time("pairs-relational")(() =>
      MinHashLsh.nearDupPairs(Tables.documents(spark, sfDir), "doc_id", "text", P))
    spark.stop()
  }
}
