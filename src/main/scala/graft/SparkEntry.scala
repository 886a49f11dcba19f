package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AlgoQueries, CurationQueries, GraphQueries, PipelineQueries, RelationalQueries, StreamQueries, TemporalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module operator packs; every key has a
  * matching DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (graph algorithms, LSH, …), in which case the
  * driver records a weaker rows-only check and a ScalaTest golden
  * fixture covers exact semantics.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.all("j1_join_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ GraphQueries.all ++ AlgoQueries.all ++
      PipelineQueries.all ++ StreamQueries.all ++ TemporalQueries.all ++
      CurationQueries.all

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ GraphQueries.oracles ++ AlgoQueries.oracles ++
      PipelineQueries.oracles ++ StreamQueries.oracles ++
      TemporalQueries.oracles ++ CurationQueries.oracles
}
