package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.registry.{CoreQueries, EventQueries, ExtQueries, ModelQueries, RelationalQueries, SqlQueries, SubqueryQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries/oracles live in graft.registry.*; this object only aggregates.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    graft.runtime.Sources.bootstrap(spark)
    CoreQueries.queries("q_a1_dual_count")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ModelQueries.queries ++ ExtQueries.queries ++
      RelationalQueries.queries ++ SqlQueries.queries ++ EventQueries.queries ++
      SubqueryQueries.queries

  /** Per-row measurement-family tags for Bench's canary normalization
    * (rows tagged `"media"` additionally normalize on the decode axis;
    * untagged rows use the host cpu/io factor only). Explicit registry,
    * not name matching — see [[graft.registry.ExtQueries.families]].
    */
  def queryFamilies: Map[String, String] = ExtQueries.families

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ ModelQueries.oracle ++ ExtQueries.oracle ++
      RelationalQueries.oracle ++ SqlQueries.oracle ++ EventQueries.oracle ++
      SubqueryQueries.oracle
}
