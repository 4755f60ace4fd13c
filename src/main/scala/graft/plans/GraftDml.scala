package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import graft.operators.Scale

/** SQL DML over graft tables — `MERGE INTO`, `UPDATE`, `DELETE FROM`,
  * `INSERT INTO` against a `USING graft` view, routed through the SAME
  * commit protocol as the library calls (round-19 task #2: the SQL
  * surface was read-only, a SQL-first user hit the gap immediately).
  *
  * Spark's stock analyzer RESOLVES all four statements against a V1
  * relation (conditions bound, star actions expanded into aligned
  * assignments) and only rejects them later — at checkAnalysis for
  * MERGE/UPDATE/DELETE ("only supported with v2 tables"), and for
  * INSERT by converting to `InsertIntoHadoopFsRelationCommand`, which
  * would APPEND PARQUET FILES STRAIGHT INTO the committed `v=<n>` dir:
  * data outside any commit, a stale index, and a broken snapshot. This
  * resolution rule (injected by
  * [[graft.functions.GraftExtensions]], so it runs BEFORE both) swaps
  * each resolved statement whose target is a graft table for a command
  * that executes the equivalent table mutation:
  *
  *   - snapshot lineage: REBASE the target onto the current committed
  *     version (statement semantics — see [[GraftDml.rebase]]), compute
  *     the post-statement table, and commit it via
  *     [[Scale.writeSnapshotCdf]] — so the change feed records the
  *     row-level effect of the statement — with
  *     `expectedVersion` = the rebased version: a writer interleaving
  *     DURING the statement raises [[Scale.CommitConflictException]],
  *     the same OCC contract as the programmatic writers. Tables never
  *     committed through the CDF writer (no `_cdf_key`) commit via
  *     plain [[Scale.writeSnapshot]]. Views with an explicit
  *     time-travel pin reject DML loudly.
  *   - merge-on-read lineage: `DELETE FROM` appends an equality-delete
  *     file ([[Scale.appendDeletes]] — O(deleted keys), no base
  *     rewrite) and `INSERT INTO` appends a row commit
  *     ([[Scale.appendMorRows]]); UPDATE/MERGE on MoR stay loud errors
  *     (their natural spelling is delete+append, which the caller
  *     should issue deliberately).
  */
case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftDml._
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable).map { t =>
        GraftMergeCommand(t, m.targetTable, m.sourceTable, m.mergeCondition,
          m.matchedActions, m.notMatchedActions, m.notMatchedBySourceActions)
          : LogicalPlan
      }.getOrElse(plan)
    case d: DeleteFromTable if d.resolved =>
      graftTarget(d.table).map { t =>
        GraftDeleteCommand(t, d.table, d.condition): LogicalPlan
      }.getOrElse(plan)
    case u: UpdateTable if u.resolved =>
      graftTarget(u.table).map { t =>
        GraftUpdateCommand(t, u.table, u.assignments, u.condition): LogicalPlan
      }.getOrElse(plan)
    case i: InsertIntoStatement if i.table.resolved && i.query.resolved =>
      graftTarget(i.table).map { t =>
        require(i.partitionSpec.isEmpty && i.userSpecifiedCols.isEmpty,
          "graft INSERT supports neither PARTITION specs nor column lists yet")
        GraftInsertCommand(t, i.table, i.query, i.overwrite, i.byName): LogicalPlan
      }.getOrElse(plan)
    case _ => plan
  }
}

object GraftDml {
  /** A resolved DML target: the table root, plus whether the view
    * carries an EXPLICIT time-travel pin (`OPTIONS (version '<n>')`) —
    * writes through a pin are rejected. The generation a view happened
    * to bind at CREATE is deliberately NOT a write pin: DML REBASES to
    * the current committed version at execution (see [[rebase]]), the
    * Delta/Iceberg statement semantics, with the commit CAS guarding
    * the execution window.
    */
  case class Target(root: String, explicitPin: Option[Long])

  /** Find the graft leaf under a resolved DML target subtree. Direct
    * V1 relations carry the generation in their file-index root path
    * (`<root>/v=<n>`, `<root>/base_v=<n>`, or a plain dir); a marker
    * ([[graft.io.GraftMarkerRelation]]) carries path + explicit pin
    * (explicitly pinned views are ALWAYS markers).
    */
  def graftTarget(plan: LogicalPlan): Option[Target] = {
    // explicit pins survive the marker rewrite as a plan tag (the temp
    // view stores the ANALYZED plan, so the marker may be long gone)
    val taggedPin = plan.collectFirst {
      case p if p.getTagValue(GraftTableRewrite.versionPinTag).isDefined =>
        p.getTagValue(GraftTableRewrite.versionPinTag).get
    }
    plan.collectFirst {
      case lr: LogicalRelation if lr.relation.isInstanceOf[graft.io.GraftMarkerRelation] =>
        val m = lr.relation.asInstanceOf[graft.io.GraftMarkerRelation]
        // a change-feed view is a READ of the commit log, not a table:
        // DML through it must never reach the underlying table
        require(m.changes.isEmpty,
          s"${m.path}: this view is a change feed " +
            s"(changesFrom/changesTo ${m.changes.get}) — change feeds " +
            "are read-only; run DML against a table view of the path")
        Target(m.path, m.version)
      case lr: LogicalRelation
          if lr.relation.isInstanceOf[HadoopFsRelation] &&
            lr.relation.asInstanceOf[HadoopFsRelation].location
              .isInstanceOf[graft.operators.GraftFileIndex] =>
        val dir = lr.relation.asInstanceOf[HadoopFsRelation]
          .location.rootPaths.head
        val name = dir.getName
        if (name.startsWith("v=") || name.startsWith("base_v="))
          Target(dir.getParent.toString, taggedPin)
        else Target(dir.toString, taggedPin) // plain dir — commands reject loudly
    }
  }

  /** Rebase a DML target plan onto the CURRENT committed generation,
    * preserving the original attribute ids (so the statement's resolved
    * condition/assignment expressions keep binding): statement
    * semantics operate on the table as of execution start, not on
    * whatever generation the temp view bound at CREATE — otherwise the
    * second of two sequential statements through one view would always
    * conflict. Returns the rebased plan and, for snapshot lineage, the
    * version it reads — the commit's `expectedVersion`, so a writer
    * interleaving DURING the statement still conflicts loudly. Schema
    * drift between view and table stays a loud error (same contract as
    * GraftTableRewrite).
    */
  def rebase(spark: SparkSession, t: Target, plan: LogicalPlan)
      : (LogicalPlan, Option[Long]) = {
    require(t.explicitPin.isEmpty,
      s"cannot write through a time-travel pinned view of ${t.root} " +
        s"(version ${t.explicitPin.get}) — create an unpinned view")
    val latest =
      if (isMor(spark, t.root)) None
      else Some(Scale.latestSnapshot(spark, t.root).getOrElse(
        throw new IllegalStateException(
          s"graft DML needs a committed snapshot or merge-on-read table; " +
            s"${t.root} is a plain directory — write it with the parquet APIs")))
    val fresh = graft.operators.GraftTable.read(spark, t.root, latest)
      .queryExecution.analyzed
    val byName = fresh.output.map(a => a.name -> a).toMap
    require(fresh.output.length == plan.output.length &&
        plan.output.forall(o => byName.get(o.name).exists(_.dataType == o.dataType)),
      s"graft DML: schema drift at ${t.root} — the view binds " +
        s"[${plan.output.map(a => s"${a.name}: ${a.dataType.simpleString}").mkString(", ")}], " +
        s"the table now has " +
        s"[${fresh.output.map(a => s"${a.name}: ${a.dataType.simpleString}").mkString(", ")}]; " +
        "re-create the view")
    (Project(plan.output.map(o => Alias(byName(o.name), o.name)(
      exprId = o.exprId, qualifier = o.qualifier)), fresh), latest)
  }

  private[plans] def condCol(c: Option[Expression]): Column =
    c.map(bridge.column).getOrElse(lit(true))

  /** SQL predicate semantics for row selection: NULL never selects. */
  private[plans] def isTrue(c: Column): Column = coalesce(c, lit(false))

  private[plans] def assignmentValues(assigns: Seq[Assignment])
      : Map[ExprId, Expression] =
    assigns.map { a =>
      a.key match {
        case attr: Attribute => attr.exprId -> a.value
        case other => throw new IllegalArgumentException(
          s"graft DML: unsupported assignment key ${other.sql} — only " +
            "top-level columns can be assigned")
      }
    }.toMap

  private[plans] def isMor(spark: SparkSession, root: String): Boolean =
    Scale.morPointer(spark, root).nonEmpty

  /** Commit the post-statement snapshot contents: through the CDF
    * writer when the table has a recorded key (or the statement brings
    * one), plain versioned commit otherwise; either way with
    * `expectedVersion` = the version [[rebase]] read, so a writer
    * interleaving during the statement conflicts loudly.
    */
  private[plans] def commitSnapshot(spark: SparkSession, t: Target,
                                    readVersion: Option[Long],
                                    merged: DataFrame,
                                    keyHint: Option[String]): Long =
    Scale.snapshotCdfKey(spark, t.root).orElse(keyHint) match {
      case Some(k) =>
        Scale.writeSnapshotCdf(spark, t.root, merged, k, readVersion)
      case None =>
        Scale.writeSnapshot(spark, t.root, merged, readVersion)
    }

  private[plans] def morKeyCol(spark: SparkSession, root: String): String = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keyPath = new org.apache.hadoop.fs.Path(root, "_graft_key")
    if (!fs.exists(keyPath)) throw new IllegalStateException(
      s"merge-on-read table $root has no recorded key (_graft_key) — run " +
        "GraftTable.buildIndex(..., morKey = Some(<col>)) once, or use " +
        "Scale.appendDeletes/appendMorRows directly")
    val in = fs.open(keyPath)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }
}

/** `MERGE INTO <graft view> USING <source> ON <cond> WHEN …` — the
  * full three-clause merge (matched / not-matched / not-matched-by-
  * source, each with optional conditions, first-match-wins like
  * Delta): the post-merge table is computed with ONE full-outer join
  * on the resolved condition and committed through the CDF writer, so
  * the feed records exactly the row-level upserts/deletes the MERGE
  * caused. The ON condition must contain an equality pinning one
  * target column to the source (the CDF key); sources that are not
  * unique on that key fail loudly (a target row matching two source
  * rows is non-deterministic — Delta's MERGE cardinality error).
  */
case class GraftMergeCommand(
    target: GraftDml.Target,
    targetPlan: LogicalPlan,
    sourcePlan: LogicalPlan,
    cond: Expression,
    matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction])
  extends LeafRunnableCommand with PredicateHelper {
  import GraftDml._

  override def run(spark: SparkSession): Seq[Row] = {
    require(!isMor(spark, target.root),
      s"MERGE INTO a merge-on-read graft table (${target.root}) is not " +
        "supported — spell the change as DELETE FROM + INSERT INTO (the MoR " +
        "commit shapes), or use the snapshot lineage")
    val (rebased, readVersion) = rebase(spark, target, targetPlan)
    val tset = targetPlan.outputSet
    val srefs = AttributeSet(sourcePlan.output)
    val (keyAttr, srcKey) = splitConjunctivePredicates(cond).collectFirst {
      case EqualTo(a: AttributeReference, b)
          if tset.contains(a) && b.references.subsetOf(srefs) => (a, b)
      case EqualTo(b, a: AttributeReference)
          if tset.contains(a) && b.references.subsetOf(srefs) => (a, b)
    }.getOrElse(throw new IllegalArgumentException(
      "graft MERGE needs an equality between one target column and the " +
        s"source in the ON condition (it is the table key); got ${cond.sql}"))

    val t0 = bridge.ofRows(spark, rebased)
    val s0 = bridge.ofRows(spark, sourcePlan)
    val nDup = s0.groupBy(bridge.column(srcKey).as("__k")).count()
      .filter(col("count") > 1).limit(1).count()
    require(nDup == 0L,
      s"graft MERGE source is not unique on ${srcKey.sql} — a target row " +
        "would match several source rows (non-deterministic merge)")

    val t = t0.withColumn("__t_ex", lit(true))
    val s = s0.withColumn("__s_ex", lit(true))
    val j = t.join(s, bridge.column(cond), "full_outer")
    val tEx = col("__t_ex").isNotNull
    val sEx = col("__s_ex").isNotNull
    val outAttrs = targetPlan.output

    // first-match-wins: fold the action list right-to-left so the head
    // action's WHEN sits outermost
    def chain(actions: Seq[MergeAction], f: MergeAction => Column,
              default: Column): Column =
      actions.foldRight(default) { (a, acc) =>
        when(isTrue(condCol(a.condition)), f(a)).otherwise(acc)
      }
    def branch(rows: DataFrame, actions: Seq[MergeAction],
               keepDefault: Boolean, default: Attribute => Column): DataFrame = {
      if (actions.isEmpty) {
        if (keepDefault)
          rows.select(outAttrs.map(a => bridge.column(a).as(a.name)): _*)
        else rows.limit(0).select(outAttrs.map(a => bridge.column(a).as(a.name)): _*)
      } else {
        val keep = chain(actions, {
          case _: DeleteAction => lit(false)
          case _ => lit(true)
        }, lit(keepDefault))
        val cols = outAttrs.map { attr =>
          chain(actions, {
            case u: UpdateAction =>
              assignmentValues(u.assignments).get(attr.exprId)
                .map(bridge.column).getOrElse(default(attr))
            case i: InsertAction =>
              assignmentValues(i.assignments).get(attr.exprId)
                .map(bridge.column).getOrElse(default(attr))
            case _: DeleteAction => default(attr)
            case other => throw new IllegalArgumentException(
              s"graft MERGE: unsupported action $other")
          }, default(attr)).as(attr.name)
        }
        rows.filter(keep).select(cols: _*)
      }
    }

    val fromTarget: Attribute => Column = a => bridge.column(a)
    val fromNull: Attribute => Column = a => lit(null).cast(a.dataType)
    val merged =
      branch(j.filter(tEx && sEx), matchedActions, keepDefault = true, fromTarget)
        .unionByName(branch(j.filter(tEx && !sEx), notMatchedBySourceActions,
          keepDefault = true, fromTarget))
        .unionByName(branch(j.filter(!tEx && sEx), notMatchedActions,
          keepDefault = false, fromNull))
    commitSnapshot(spark, target, readVersion, merged, Some(keyAttr.name))
    Seq.empty
  }
}

/** `DELETE FROM <graft view> [WHERE <cond>]`: snapshot lineage commits
  * the complement (feed records the deletes); merge-on-read lineage
  * appends an equality-delete file with the matching keys — O(deleted
  * keys), no base rewrite, the same file a programmatic
  * [[Scale.appendDeletes]] writes.
  */
case class GraftDeleteCommand(
    target: GraftDml.Target,
    targetPlan: LogicalPlan,
    cond: Expression) extends LeafRunnableCommand {
  import GraftDml._

  override def run(spark: SparkSession): Seq[Row] = {
    val (rebased, readVersion) = rebase(spark, target, targetPlan)
    val t = bridge.ofRows(spark, rebased)
    if (isMor(spark, target.root)) {
      val key = morKeyCol(spark, target.root)
      val keys = t.filter(isTrue(bridge.column(cond))).select(key).distinct()
      Scale.appendDeletes(spark, target.root, keys)
    } else {
      commitSnapshot(spark, target, readVersion,
        t.filter(!isTrue(bridge.column(cond))), None)
    }
    Seq.empty
  }
}

/** `UPDATE <graft view> SET … [WHERE <cond>]` — snapshot lineage only
  * (an in-place MoR update is delete+append; keep that explicit).
  */
case class GraftUpdateCommand(
    target: GraftDml.Target,
    targetPlan: LogicalPlan,
    assignments: Seq[Assignment],
    cond: Option[Expression]) extends LeafRunnableCommand {
  import GraftDml._

  override def run(spark: SparkSession): Seq[Row] = {
    require(!isMor(spark, target.root),
      s"UPDATE on a merge-on-read graft table (${target.root}) is not " +
        "supported — spell it as DELETE FROM + INSERT INTO")
    val (rebased, readVersion) = rebase(spark, target, targetPlan)
    val t = bridge.ofRows(spark, rebased)
    val hit = isTrue(condCol(cond))
    val m = assignmentValues(assignments)
    val cols = targetPlan.output.map { attr =>
      m.get(attr.exprId) match {
        case Some(v) => when(hit, bridge.column(v))
          .otherwise(bridge.column(attr)).as(attr.name)
        case None => bridge.column(attr).as(attr.name)
      }
    }
    commitSnapshot(spark, target, readVersion, t.select(cols: _*), None)
    Seq.empty
  }
}

/** `INSERT INTO / INSERT OVERWRITE <graft view> <query>` — positional
  * (or byName) store-assignment to the view's logical schema, then a
  * versioned commit (snapshot: union or replace; merge-on-read: an
  * append commit under the shared sequence). Intercepting this one is
  * correctness-critical: Spark's default for a V1 file relation writes
  * parquet files STRAIGHT INTO the bound `v=<n>` directory — rows
  * outside any commit and a stale skipping index.
  */
case class GraftInsertCommand(
    target: GraftDml.Target,
    targetPlan: LogicalPlan,
    query: LogicalPlan,
    overwrite: Boolean,
    byName: Boolean) extends LeafRunnableCommand {
  import GraftDml._

  override def run(spark: SparkSession): Seq[Row] = {
    val rows = bridge.ofRows(spark, query)
    val outAttrs = targetPlan.output
    require(rows.columns.length == outAttrs.length,
      s"graft INSERT arity mismatch: table has ${outAttrs.length} columns " +
        s"(${outAttrs.map(_.name).mkString(", ")}), query produces " +
        s"${rows.columns.length}")
    val aligned =
      if (byName) rows.select(outAttrs.map(a =>
        col(a.name).cast(a.dataType).as(a.name)): _*)
      else rows.select(rows.columns.zip(outAttrs).toIndexedSeq.map {
        case (c, a) => col(c).cast(a.dataType).as(a.name) }: _*)
    if (isMor(spark, target.root)) {
      require(target.explicitPin.isEmpty,
        s"cannot write through a time-travel pinned view of ${target.root}")
      require(!overwrite,
        "INSERT OVERWRITE a merge-on-read graft table is a base replace — " +
          "use Scale.writeMorBase deliberately")
      Scale.appendMorRows(spark, target.root, aligned)
    } else {
      val (rebased, readVersion) = rebase(spark, target, targetPlan)
      val merged =
        if (overwrite) aligned
        else bridge.ofRows(spark, rebased).unionByName(aligned)
      commitSnapshot(spark, target, readVersion, merged, None)
    }
    Seq.empty
  }
}
