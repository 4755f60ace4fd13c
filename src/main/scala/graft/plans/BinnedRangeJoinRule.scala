package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule turning a point-in-interval inner join into the binned
  * equijoin of [[graft.operators.Scale.rangeJoin]] — transparently.
  *
  * Catalyst plans a join whose only cross-side predicates are range
  * comparisons (`p >= lo AND p < hi`) as a BroadcastNestedLoopJoin (or a
  * cartesian product): O(|points| × |intervals|) comparisons, the classic
  * interval-join scale cliff. When this rule is active and
  * `spark.graft.rangeJoin.binWidth` is set (LONG, same units as the point
  * column), the join is rewritten to the bin shape: intervals explode
  * into the fixed-width bins they overlap, points compute their single
  * bin, and the join becomes a hash EQUIJOIN on the bin with the
  * ORIGINAL condition kept as a residual filter — so the rewrite is
  * semantics-preserving by construction (r45 hash-matches the same
  * oracle as the un-rewritten join; ExtensionsSpec pins plan shape and
  * result equality).
  *
  * Scope guards, in order:
  *  - rule is a no-op unless the width conf is set and positive;
  *  - only INNER joins with a condition;
  *  - skipped when any cross-side equality conjunct exists (Catalyst
  *    already hash-joins those — this also makes the rewrite
  *    non-reentrant, since the rewritten join gains a bin equality);
  *  - point and bound expressions must be integral types (bin arithmetic
  *    is exact `div`, matching Scale.rangeJoin);
  *  - an interval spanning ≥ `spark.graft.rangeJoin.maxBins` (default
  *    2^20) bins raises rather than exploding quietly — same loud-failure
  *    contract as Scale.rangeJoin's `maxBinsPerInterval`.
  *
  * Wire-up: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * (the extension injects this rule) or imperatively on a live session via
  * `spark.experimental.extraOptimizations :+= BinnedRangeJoinRule(spark)`.
  */
case class BinnedRangeJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import BinnedRangeJoinRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = spark.conf.getOption(WidthConf).flatMap(w => w.toLongOption).filter(_ > 0)
    if (width.isEmpty) return plan
    val maxBins = spark.conf.getOption(MaxBinsConf)
      .flatMap(_.toLongOption).filter(_ > 0).getOrElse(1L << 20)
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, left, right, cond, hint, width.get, maxBins).getOrElse(j)
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def fromSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** (point, bound, pointOnLeft) oriented so point and bound sit on
    * opposite join sides and both are integral.
    */
  private def orient(left: LogicalPlan, right: LogicalPlan)(
      p: Expression, b: Expression): Option[(Expression, Expression, Boolean)] =
    if (fromSide(p, left) && fromSide(b, right) && integral(p) && integral(b))
      Some((p, b, true))
    else if (fromSide(p, right) && fromSide(b, left) && integral(p) && integral(b))
      Some((p, b, false))
    else None

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint,
                      width: Long, maxBins: Long): Option[LogicalPlan] = {
    val cs = conjuncts(cond)
    val hasCrossEquality = cs.exists {
      case EqualTo(a, b) =>
        (fromSide(a, left) && fromSide(b, right)) ||
          (fromSide(a, right) && fromSide(b, left))
      case _ => false
    }
    if (hasCrossEquality) return None

    val o = orient(left, right) _
    // x >= y reads as lower bound (point=x, lo=y) or upper bound
    // (point=y, hi=x) — orientation resolves which side each lives on.
    val lowers = cs.flatMap {
      case GreaterThanOrEqual(x, y) => o(x, y)
      case GreaterThan(x, y) => o(x, y)
      case LessThanOrEqual(y, x) => o(x, y)
      case LessThan(y, x) => o(x, y)
      case _ => None
    }
    val uppers = cs.flatMap {
      case LessThanOrEqual(x, y) => o(x, y)
      case LessThan(x, y) => o(x, y)
      case GreaterThanOrEqual(y, x) => o(x, y)
      case GreaterThan(y, x) => o(x, y)
      case _ => None
    }
    val pair = (for {
      (p, lo, onLeft) <- lowers
      (p2, hi, onLeft2) <- uppers
      if onLeft == onLeft2 && p.semanticEquals(p2)
    } yield (p, lo, hi, onLeft)).headOption

    pair.map { case (point, lo, hi, pointOnLeft) =>
      val (pointPlan, boundPlan) = if (pointOnLeft) (left, right) else (right, left)
      def binOf(e: Expression): Expression =
        IntegralDivide(Cast(e, LongType), Literal(width))
      val loBin = binOf(lo)
      val guardedHiBin = If(
        GreaterThanOrEqual(Subtract(binOf(hi), loBin), Literal(maxBins)),
        Cast(RaiseError(Literal.create(
          s"graft.rangeJoinRule: interval spans >= $maxBins bins of width " +
            s"$width — raise $WidthConf or $MaxBinsConf", StringType)), LongType),
        binOf(hi))
      val binAttr = AttributeReference("__graft_bin", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: without a timezone id it
      // reports unresolved even over longs, and the optimizer rejects the
      // rewritten plan (PLAN_VALIDATION_FAILED_RULE_IN_BATCH).
      val seq = new Sequence(loBin, guardedHiBin, Literal(1L))
        .withTimeZone(conf.sessionLocalTimeZone)
      val gen = Generate(
        Explode(seq),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binAttr), child = boundPlan)
      val pbinAlias = Alias(binOf(point), "__graft_pbin")()
      val proj = Project(pointPlan.output :+ pbinAlias, pointPlan)
      val (newLeft, newRight) = if (pointOnLeft) (proj, gen) else (gen, proj)
      val newCond = And(EqualTo(pbinAlias.toAttribute, binAttr), cond)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}

object BinnedRangeJoinRule {
  /** Bin width (LONG, units of the point column). Unset ⇒ rule no-ops. */
  val WidthConf = "spark.graft.rangeJoin.binWidth"
  /** Per-interval bin-count ceiling before the plan raises (default 2^20). */
  val MaxBinsConf = "spark.graft.rangeJoin.maxBins"
}
