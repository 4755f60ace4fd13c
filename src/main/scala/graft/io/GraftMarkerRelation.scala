package graft.io

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType

/** Placeholder relation the `USING graft` SQL source returns whenever
  * the table's read semantics cannot be a bare V1 leaf:
  *
  *   - MERGE-ON-READ tables — the read IS a join (base minus the
  *     delete keys);
  *   - snapshot tables with a non-empty `_colmap` — the read must
  *     alias physical storage names to current LOGICAL names, or SQL
  *     users would see (and predicate against) physical names that
  *     renames left behind;
  *   - version-pinned reads of such tables (SQL time travel via
  *     `OPTIONS (version '<n>')`);
  *   - CHANGE-FEED reads (`OPTIONS (changesFrom 'F', changesTo 'T')`,
  *     `changes` = Some((F, T))) — the read is
  *     `Scale.readChangesBetween`: checkpoint-anchored feed union with
  *     column-mapping aliases, never a single parquet leaf.
  *
  * The analyzer rule [[graft.plans.GraftTableRewrite]] (injected by
  * [[graft.functions.GraftExtensions]]) replaces the marker during
  * resolution with the FULL `GraftTable.read(path, version)` plan:
  * pointer resolution, manifest file skipping from pushed-down
  * predicates, column-mapping aliases, and (for MoR) the broadcast
  * delete anti-join — binding the table generation wherever the marker
  * is analyzed (for a temp view: at CREATE, the same
  * generation-at-creation contract as the snapshot views).
  *
  * If the session was built WITHOUT the extensions, planning reaches
  * [[buildScan]], which fails with the wiring instruction instead of
  * silently returning rows that ignore deletes or surface stale names.
  */
final class GraftMarkerRelation(
    @transient val session: SparkSession,
    val path: String,
    val version: Option[Long],
    override val schema: StructType,
    val changes: Option[(Long, Long)] = None) extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = session.sqlContext

  override def buildScan(): RDD[Row] =
    throw new IllegalStateException(
      s"$path is a graft table whose SQL read needs the graft extensions " +
        "(merge-on-read delete anti-join, column-mapping aliases, or a " +
        "version pin). Build the session with " +
        ".config(\"spark.sql.extensions\", \"graft.functions.GraftExtensions\") " +
        "(or .withExtensions(new GraftExtensions)), or read programmatically " +
        "via GraftTable.read(spark, path).")
}
