package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface; every entry with a
  * matching key in `oracleSql` is hash-checked against DuckDB at sf0.01.
  * Entries without an oracle (approximate / not SQL-expressible) get a
  * rows-only check and are covered by ScalaTest specs instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The region star join exercises scan → broadcast joins → agg end-to-end.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q05_region_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ScalarQueries.queries ++ EventQueries.queries ++
      TextQueries.queries ++ VectorQueries.queries ++ GraphQueries.queries ++ StreamingQueries.queries ++ CoverageQueries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables (registered under their bare table names).
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ ScalarQueries.oracles ++ EventQueries.oracles ++
      TextQueries.oracles ++ VectorQueries.oracles ++ GraphQueries.oracles ++ StreamingQueries.oracles ++ CoverageQueries.oracles
}
