package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, CatalogBench, CatalogPipeline, Governance, Linkage, Multimodal, NearDup, Pipeline, Q, Relational, Similarity, TextOps, TimeSeries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every registered engine query (SURVEY.md §2 inventory). */
  def registry: Seq[Q] =
    Relational.all ++ Analytics.all ++ TextOps.all ++ Similarity.all ++
      NearDup.all ++ Multimodal.all ++ Pipeline.all ++ CatalogPipeline.all ++
      Governance.all ++ Linkage.all ++ TimeSeries.all ++ CatalogBench.all

  /** Flagship query on the smallest fixtures; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03RevenueByNation.run(spark, Fixtures.sf0001)

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
