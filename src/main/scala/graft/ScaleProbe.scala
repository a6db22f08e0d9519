package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe: re-runs flagship shapes on N×-replicated inputs to
  * measure how wall time grows with data volume (the 100 TB question in
  * miniature). Usage: `runMain graft.ScaleProbe <sfDir> [factor]`.
  * Prints one line per shape: base seconds, scaled seconds, ratio.
  */
object ScaleProbe {

  private def amplify(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("_dup", explode(sequence(lit(1), lit(factor)))).drop("_dup")

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionFactory
      .configure(SparkSession.builder().master(s"local[$cpus]"), "graft-scale-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = graft.queries.Tables.lineitem(spark, sfDir)
    val docs = graft.queries.Tables.documents(spark, sfDir)

    def q01(d: DataFrame): DataFrame =
      d.groupBy("l_returnflag", "l_linestatus")
        .agg(graft.queries.Q.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

    def topk(d: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_suppkey").orderBy(col("l_extendedprice").desc, col("l_orderkey"))
      d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    }

    val emb = graft.queries.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

    // Replicated vec_ids collapse in the argmin groupBy, but the dominant
    // cost — |rows|·k distance folds feeding a map-side partial argmin —
    // still scales with the amplification, which is what's being measured.
    def kmeansAssign(d: DataFrame): DataFrame = {
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cluster"), col("emb").as("cvec"))
      graft.operators.KMeans.assign(d, cents, "vec_id", "emb")
    }

    def tfidfTerms(d: DataFrame): DataFrame = {
      val (tf, _, dfreq) = graft.queries.Pipeline.termStats(d)
      tf.join(dfreq, "token")
    }

    val shapes: Seq[(String, DataFrame => DataFrame, DataFrame)] = Seq(
      ("agg_q01", q01 _, li),
      ("window_topk", topk _, li),
      ("minhash_sigs",
        (d: DataFrame) => graft.operators.MinHashLsh.signatures(d, "doc_id", "text",
          graft.operators.MinHashLsh.Params()),
        docs),
      ("tfidf_join", tfidfTerms _, docs),
      ("kmeans_assign", kmeansAssign _, emb))

    // Warm codegen/scan once.
    shapes.foreach { case (_, f, base) => sink(f(base)) }
    println(f"shape,base_s,x${factor}_s,ratio")
    shapes.foreach { case (name, f, base) =>
      val b = time(sink(f(base)))
      val s = time(sink(f(amplify(base, factor))))
      println(f"$name,$b%.2f,$s%.2f,${s / b}%.1f")
    }
    spark.stop()
  }
}
