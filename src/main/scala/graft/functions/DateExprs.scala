package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType}

/** Calendar math for the int-yyyyMMdd repair, kept in ONE static method
  * so the generated code per column is a single call. The first
  * arithmetic version of this repair inlined ~50 expression nodes per
  * column into the plan; in e9's fused project+join stage that pushed
  * the whole-stage-codegen method past HotSpot's ~8 KB JIT threshold
  * (DontCompileHugeMethods) and the stage ran as interpreted bytecode —
  * e9 went 3.4 s → 7.1 s while the narrower e3 stage got faster. A
  * compact static call keeps every consuming stage JIT-compiled.
  */
object DateAlgos {
  /** yyyyMMdd int → days since epoch, or null when the value is not a
    * valid 8-digit calendar date (the reference's non-ANSI NULL
    * semantics). Day count via the standard civil-calendar conversion
    * (Howard Hinnant's public-domain days_from_civil), no java.time
    * objects, no exceptions on the hot path.
    */
  def yyyymmddToEpochDay(c: Int): Integer = {
    if (c < 10000000 || c > 99999999) return null
    val y = c / 10000
    val m = (c / 100) % 100
    val d = c % 100
    if (m < 1 || m > 12 || d < 1) return null
    val leap = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0
    val dim = m match {
      case 4 | 6 | 9 | 11 => 30
      case 2 => if (leap) 29 else 28
      case _ => 31
    }
    if (d > dim) return null
    val yy = if (m <= 2) y - 1 else y
    val era = yy / 400 // yy >= 1000 here, no negative-era branch needed
    val yoe = yy - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    Integer.valueOf(era * 146097 + doe - 719468)
  }
}

/** `yyyyMMdd` int column → DATE with NULL-on-invalid semantics, as a
  * native codegen expression (see [[DateAlgos.yyyymmddToEpochDay]] for
  * why this must stay one call). DateType's internal representation IS
  * days-since-epoch, so the eval returns the storage value directly.
  */
case class YyyymmddToDate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DateType
  override def nullable: Boolean = true
  override def prettyName: String = "yyyymmdd_to_date"

  override protected def nullSafeEval(input: Any): Any =
    DateAlgos.yyyymmddToEpochDay(input.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      Integer ${ev.value}Box = graft.functions.DateAlgos.yyyymmddToEpochDay($c);
      ${ev.isNull} = ${ev.value}Box == null;
      ${ev.value} = ${ev.isNull} ? -1 : ${ev.value}Box.intValue();
    """)

  override protected def withNewChildInternal(newChild: Expression): YyyymmddToDate =
    copy(child = newChild)
}
