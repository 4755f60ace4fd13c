package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot vector kernels. The portable
  * forms in graft.vector.VectorOps (`aggregate(zip_with(...))`) are
  * higher-order functions, which Spark evaluates INTERPRETED — a
  * measured 1M-candidate blocked join spent ~5 s on 64-dim dot products
  * alone. These compute the IDENTICAL values (same sequential
  * left-to-right double fold, same null semantics as the
  * zip_with/aggregate composition: any null element or length mismatch
  * nulls the result) in one JVM call inside whole-stage codegen.
  */
object VectorAlgos {
  /** Sequential left-to-right Σ a(i)·b(i); null boxed result on any null
    * element or length mismatch (zip_with pads the shorter side with
    * null, and null poisons the running sum).
    */
  def dotD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Sequential left-to-right Σ (a(i)−b(i))²; same null contract. */
  def dist2D(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorAlgos.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh name: two kernel calls can be inlined into ONE generated
      // function (e.g. the v11 per-subspace dot sum), where a fixed
      // local would collide and kick the whole stage to interpreted
      val r = ctx.freshName("dotR")
      s"""
      java.lang.Double $r = graft.functions.VectorAlgos.dotD($a, $b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
    """
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

case class L2Dist2D(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorAlgos.dist2D(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("distR")
      s"""
      java.lang.Double $r = graft.functions.VectorAlgos.dist2D($a, $b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
    """
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Dist2D =
    copy(left = newLeft, right = newRight)
}
