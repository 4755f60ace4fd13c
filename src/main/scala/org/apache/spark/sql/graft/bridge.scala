package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the classic
  * bridge lives behind `private[sql]`. This shim (the standard pattern for
  * Spark extension libraries) re-exports the two conversions our native
  * Catalyst expressions need. Nothing else from the private API is used.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER ColumnNode → Expression conversion. `expression` above wraps
    * the node in a lazy `ColumnNodeExpression` placeholder that only the
    * session's plan-construction path unwraps — fine as a child of a
    * native expression inside a DataFrame transform, but Unevaluable if
    * returned directly from a FunctionRegistry builder (analysis keeps
    * the placeholder and codegen throws). SQL function builders that
    * expose Column-composed operators use this conversion instead, so
    * the registered function IS the resolved expression tree.
    */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Replays what session construction does with a `spark.sql.extensions`
    * class: drain the extensions object's injected functions into a
    * registry. Lets a shared-session test suite prove the
    * `SparkSessionExtensions => Unit` wiring end-to-end without tearing
    * down the session (extensions only apply at session CREATION).
    */
  def registerInjectedFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(reg)

  /** The session's lifetime-unique UUID when the concrete classic session
    * exposes one (`private[sql]` in the API, hence this shim), else an
    * identity-hash fallback. Cache keys use it so entries from two
    * session generations can never collide the way identityHashCode can.
    */
  def sessionUUID(s: org.apache.spark.sql.SparkSession): String = s match {
    case c: org.apache.spark.sql.classic.SparkSession => c.sessionUUID
    case other => s"idh${System.identityHashCode(other)}"
  }
}
