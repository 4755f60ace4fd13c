package graft.io

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}

/** The `graft` SQL data source — the unified self-pruning table read
  * ([[graft.operators.GraftTable]]) surfaced through Spark's standard
  * source API, so a PURE-SQL user gets pointer resolution + manifest
  * file skipping with no Scala call at all:
  *
  * {{{
  *   spark.read.format("graft").load(path)                   // programmatic
  *   CREATE TEMPORARY VIEW t USING graft OPTIONS (path '…')  -- SQL
  *   SELECT … FROM t WHERE n_chars BETWEEN 450 AND 10000     -- prunes files
  * }}}
  *
  * The returned relation IS the GraftFileIndex-backed parquet relation,
  * so pushed-down predicates prune files at scan planning exactly as in
  * `GraftTable.read`. Options: `path` (required), `version` (optional
  * snapshot pin — time travel). Registered via
  * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister.
  * Merge-on-read tables return a [[GraftMarkerRelation]] that the
  * [[graft.plans.GraftTableRewrite]] resolution rule (injected by
  * `GraftExtensions` — wire the session with
  * `spark.sql.extensions=graft.functions.GraftExtensions`) expands into
  * the full read plan: pruned scan + broadcast delete anti-join.
  */
class GraftDataSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "the graft source needs a path: .load(path) or OPTIONS (path '…')"))
    val version = parameters.get("version").map(_.toLong)
    graft.operators.GraftTable.pruningRelation(
      sqlContext.sparkSession, path, version)
  }
}
