package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.entry._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the SURVEY §2 operator inventory (plus the training-data
  * pipeline extensions) expressed over the driver test tables; each entry
  * with a key in `oracleSql` is hash-checked against DuckDB at sf0.01.
  * The per-operator mapping is documented in each Queries object.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ RangeQueries.queries ++
      TextQueries.queries ++ VectorQueries.queries ++
      AnalyticQueries.queries ++ WorkloadQueries.queries ++
      StatsQueries.queries ++ CurationQueries.queries ++
      SearchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ RangeQueries.oracleSql ++
      TextQueries.oracleSql ++ VectorQueries.oracleSql ++
      AnalyticQueries.oracleSql ++ WorkloadQueries.oracleSql ++
      StatsQueries.oracleSql ++ CurationQueries.oracleSql ++
      SearchQueries.oracleSql
}
