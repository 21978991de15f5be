package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory names (SURVEY.md §2) to DataFrame
  * builders over a testdata dir; `oracleSql` holds the DuckDB-equivalent SQL
  * the driver hash-compares against. Column aliases and row order are kept
  * identical on both sides (see graft.util.Tables for the precision rules).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full MergeExtractor lineage: chunk -> header cascade -> hybrid
    * rank -> top-1 -> window assembly -> validate/enrich (every one of the
    * 500 synthesized filings extracts by construction — the padded
    * narrative clears the >200 promotion gate, and the invariant oracle's
    * got_ok column enforces exactly that coverage). */
  def entry(spark: SparkSession): DataFrame =
    queries("pipeline_extract")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ExprQueries.queries ++ PipelineQueries.queries ++ DataPipelineQueries.queries ++ FlowQueries.queries ++ SinkQueries.queries ++ IncrementalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ ExprQueries.oracles ++ PipelineQueries.oracles ++ DataPipelineQueries.oracles ++ FlowQueries.oracles ++ SinkQueries.oracles ++ IncrementalQueries.oracles
}
