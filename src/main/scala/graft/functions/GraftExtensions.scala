package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook exposing the native expressions to SQL:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)            // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * ...
  * spark.sql("SELECT graft_simhash32(tokens), graft_minhash(sh, 0) FROM t")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type FnDesc =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val simhash32: FnDesc = (
    FunctionIdentifier("graft_simhash32"),
    new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
    (args: Seq[Expression]) => SimHash32(args.head))

  val minhash: FnDesc = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHash].getName, "graft_minhash"),
    (args: Seq[Expression]) => args match {
      case Seq(arr, org.apache.spark.sql.catalyst.expressions.Literal(seed: Int, _)) =>
        MinHash(arr, seed)
      case Seq(arr) => MinHash(arr, 0)
      case other => throw new IllegalArgumentException(
        s"graft_minhash(array, [int seed]) — got ${other.length} args")
    })

  val yyyymmddToDate: FnDesc = (
    FunctionIdentifier("graft_yyyymmdd_to_date"),
    new ExpressionInfo(classOf[YyyymmddToDate].getName, "graft_yyyymmdd_to_date"),
    // widen any integral SQL argument to the expression's int domain
    (args: Seq[Expression]) => args match {
      case Seq(one) => YyyymmddToDate(
        org.apache.spark.sql.catalyst.expressions.Cast(
          one, org.apache.spark.sql.types.IntegerType))
      case other => throw new IllegalArgumentException(
        s"graft_yyyymmdd_to_date(int) — got ${other.length} args")
    })

  /** Every injectable function — the single list both the extensions
    * class and imperative registration drain.
    */
  val all: Seq[FnDesc] = Seq(simhash32, minhash, yyyymmddToDate)

  /** Imperative registration for an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
