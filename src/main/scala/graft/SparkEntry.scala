package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.plans.TemplateQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator lives in a category object under
  * `graft.operators` (or `graft.plans` for the template compiler), each
  * exposing a `queries` map and a matching `oracle` (DuckDB SQL) map.
  * Queries without an oracle entry (approx sketches, procedural state) get
  * the driver's weaker rows-only check, as allowed by the contract.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary (scan → partial agg → shuffle →
    * final agg → sort). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Scalars.queries ++ StreamShapes.queries ++
      TextOps.queries ++ VectorOps.queries ++ Custom.queries ++
      TemplateQueries.queries ++ Extended.queries ++ Multimodal.queries ++
      Skew.queries ++ Breadth.queries ++ Quality.queries ++
      Packing.queries ++ Corpus.queries ++ EventAnalytics.queries ++
      Sketches.queries ++ Tpch.queries ++ StatsTests.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q_agg_approx_distinct, q_stateful_sessionize). */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Scalars.oracle ++ StreamShapes.oracle ++
      TextOps.oracle ++ VectorOps.oracle ++ Custom.oracle ++
      TemplateQueries.oracle ++ Extended.oracle ++ Multimodal.oracle ++
      Skew.oracle ++ Breadth.oracle ++ Quality.oracle ++
      Packing.oracle ++ Corpus.oracle ++ EventAnalytics.oracle ++
      Sketches.oracle ++ Tpch.oracle ++ StatsTests.oracle
}
