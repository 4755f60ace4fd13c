package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-area modules under graft.queries;
  * each entry pairs a Spark implementation with (where SQL-expressible) a
  * DuckDB oracle over the same parquet tables.
  */
object SparkEntry {
  private def modules: Seq[Q] =
    RelationalQueries.all ++ EtlParityQueries.all ++ TextQueries.all ++
      VectorQueries.all ++ PipelineQueries.all ++ IoQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.all.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
