package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Resolution rule completing the `USING graft` SQL surface for tables
  * a bare V1 leaf cannot express (the Delta/Iceberg pattern: the source
  * hands the analyzer a marker, the extension rewrites it into the real
  * read plan). A [[graft.io.GraftMarkerRelation]] leaf becomes the
  * analyzed plan of `GraftTable.read(path, version)` — the
  * GraftFileIndex-backed parquet relation (so predicates the caller
  * stacks on the VIEW push down through the planted Project and prune
  * files at scan planning) plus, per table kind, the broadcast
  * left-anti delete join (merge-on-read) and/or the physical→logical
  * column-mapping aliases (renamed snapshot tables, any pinned
  * version — SQL time travel surfaces CURRENT logical names exactly
  * like the programmatic read). A Project of aliases pins the inner
  * plan's columns to the view's original attribute ids, so every
  * downstream reference stays bound.
  *
  * Binding time: the rewrite fires wherever the marker is ANALYZED. A
  * `CREATE TEMPORARY VIEW … USING graft` analyzes (and therefore
  * binds deletes + file listing) at CREATE — the same
  * generation-at-creation contract the snapshot views already have,
  * since the V1 relation's listing is resolved then too; re-create the
  * view or use `spark.read.format("graft")` to see later commits.
  * Converges in one pass — the rewrite leaves no marker behind.
  */
case class GraftTableRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, MergeIntoTable, UpdateTable}

  /** DML statements keep their TARGET marker un-rewritten: the marker
    * carries the explicit time-travel pin [[GraftDmlRule]] must see
    * (DML through a pinned view is a loud error), and the DML commands
    * rebase onto the current generation themselves. Markers anywhere
    * else — a MERGE source, an INSERT query, any read — rewrite as
    * usual; so does the target once the command re-analyzes it at
    * execution.
    */
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable =>
      m.copy(sourceTable = rewriteMarkers(m.sourceTable))
    case _: DeleteFromTable | _: UpdateTable => plan
    case i: InsertIntoStatement => i.copy(query = rewriteMarkers(i.query))
    case _ => rewriteMarkers(plan)
  }

  private def rewriteMarkers(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case lr: LogicalRelation if lr.relation.isInstanceOf[graft.io.GraftMarkerRelation] =>
      val m = lr.relation.asInstanceOf[graft.io.GraftMarkerRelation]
      val inner = (m.changes match {
        // change-feed marker: the view IS readChangesBetween's plan —
        // checkpoint-anchored feed union, logical-name aliases, the
        // `_change_type`/`_commit_version` stamps
        case Some((f, t)) =>
          graft.operators.Scale.readChangesBetween(spark, m.path, f, t)
        case None =>
          graft.operators.GraftTable.read(spark, m.path, m.version)
      }).queryExecution.analyzed
      // Count, names AND types: a same-arity rename/reorder of the base
      // would otherwise bind view attributes to the wrong table columns
      // positionally, and a same-name RETYPE (long → string) would reuse
      // the view attribute's exprId while carrying the new type —
      // downstream operators bound to the old attribute's type then get
      // a type-mismatched plan (runtime cast errors or silently wrong
      // semantics) instead of this loud error. Nullability is NOT
      // compared: parquet reads surface every column nullable, so a
      // view created from an in-memory schema would false-positive on
      // legitimate same-type tables.
      require(inner.output.length == lr.output.length &&
          inner.output.zip(lr.output).forall { case (n, o) =>
            n.name == o.name && n.dataType == o.dataType },
        s"graft table rewrite: schema drift at ${m.path} — the view binds " +
          s"[${lr.output.map(a => s"${a.name}: ${a.dataType.simpleString}").mkString(", ")}], " +
          s"the table now has " +
          s"[${inner.output.map(a => s"${a.name}: ${a.dataType.simpleString}").mkString(", ")}]; " +
          "re-create the view")
      val proj = Project(inner.output.zip(lr.output).map { case (n, o) =>
        Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
      }, inner)
      // keep the explicit time-travel pin visible to GraftDmlRule even
      // after the marker is gone (temp views store the ANALYZED plan,
      // so the rewrite has already run by the time a DML statement
      // resolves the view): DML through a pinned view must stay a loud
      // error, never a silent write to the current version
      m.version.foreach(v =>
        proj.setTagValue(GraftTableRewrite.versionPinTag, v))
      proj
  }
}

object GraftTableRewrite {
  /** Set on the rewritten plan of an explicitly version-pinned marker;
    * read by [[GraftDmlRule]] to reject writes through time travel. */
  val versionPinTag: org.apache.spark.sql.catalyst.trees.TreeNodeTag[Long] =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Long]("graft.versionPin")
}
