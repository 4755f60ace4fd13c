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
  * snapshot pin — time travel), `changesFrom`/`changesTo` (optional,
  * together — the view is the CHANGE FEED over `(from, to]` exactly as
  * `Scale.readChangesBetween`: data columns under current logical
  * names + `_change_type` + `_commit_version`, served from feed
  * checkpoints when the range is anchored at one; read-only — DML on a
  * changes view is a loud error). Registered via
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
    val changes =
      (parameters.get("changesFrom"), parameters.get("changesTo")) match {
        case (Some(f), Some(t)) => Some((f.toLong, t.toLong))
        case (None, None) => None
        case _ => throw new IllegalArgumentException(
          "changesFrom and changesTo come together: " +
            "OPTIONS (path '…', changesFrom '<v>', changesTo '<v>')")
      }
    changes match {
      case Some((f, t)) =>
        require(version.isEmpty,
          "a changes read spans versions — it cannot also pin one " +
            "(drop the version option)")
        // validates the range (fromV < toV, toV committed, no feed
        // holes) and yields the read's schema — loud at CREATE VIEW,
        // not first SELECT
        val schema = graft.operators.Scale.readChangesBetween(
          sqlContext.sparkSession, path, f, t).schema
        new GraftMarkerRelation(sqlContext.sparkSession, path, None,
          schema, changes)
      case None =>
        graft.operators.GraftTable.pruningRelation(
          sqlContext.sparkSession, path, version)
    }
  }
}
