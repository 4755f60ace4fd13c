package graft.io

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType

/** Placeholder relation the `USING graft` SQL source returns for a
  * MERGE-ON-READ table. A V1 `BaseRelation` is a leaf — it cannot carry
  * the delete-reconciliation anti-join the table's semantics need — so
  * the source plants this marker and the analyzer rule
  * [[graft.plans.MorTableRewrite]] (injected by
  * [[graft.functions.GraftExtensions]]) replaces it during resolution
  * with the FULL `GraftTable.read` plan: pointer resolution, manifest
  * file skipping from pushed-down predicates, and the broadcast
  * left-anti delete join — binding the table generation wherever the
  * marker is analyzed (for a temp view: at CREATE, the same
  * generation-at-creation contract as the snapshot views).
  *
  * If the session was built WITHOUT the extensions, planning reaches
  * [[buildScan]], which fails with the wiring instruction instead of
  * silently returning rows that ignore deletes.
  */
final class MorMarkerRelation(
    @transient val session: SparkSession,
    val path: String,
    override val schema: StructType) extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = session.sqlContext

  override def buildScan(): RDD[Row] =
    throw new IllegalStateException(
      s"$path is a merge-on-read graft table: SQL reads need the graft " +
        "extensions to plant its delete anti-join. Build the session with " +
        ".config(\"spark.sql.extensions\", \"graft.functions.GraftExtensions\") " +
        "(or .withExtensions(new GraftExtensions)), or read programmatically " +
        "via GraftTable.read(spark, path).")
}
