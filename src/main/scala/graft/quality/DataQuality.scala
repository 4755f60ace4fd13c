package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality gating, string-compatible with the reference's Glue DQ
  * ruleset DSL (reference Glue-spark/scripts/bronze/crm_cust_info_bronze.py:17-21:
  * `Rules = [ ColumnCount > 0 ]`, evaluated in every script with
  * BEST_EFFORT publishing — results are reported, never fail the job).
  *
  * Supported rules: `ColumnCount <op> N`, `RowCount <op> N`,
  * `IsComplete "col"` (no nulls), `IsUnique "col"`.
  * Metric rules that need data (RowCount/IsComplete/IsUnique) run in ONE
  * aggregate job over the frame; ColumnCount is metadata-only.
  */
object DataQuality {

  sealed trait Rule { def text: String }
  private case class ColumnCount(op: String, n: Long, text: String) extends Rule
  private case class RowCount(op: String, n: Long, text: String) extends Rule
  private case class IsComplete(colName: String, text: String) extends Rule
  private case class IsUnique(colName: String, text: String) extends Rule

  case class Result(rule: String, passed: Boolean, observed: Long)
  case class Report(results: Seq[Result]) {
    def allPassed: Boolean = results.forall(_.passed)
  }

  private val rulesetRe = """(?s)\s*Rules\s*=\s*\[(.*)\]\s*""".r
  private val colCountRe = """ColumnCount\s*(>|>=|<|<=|==|=)\s*(\d+)""".r
  private val rowCountRe = """RowCount\s*(>|>=|<|<=|==|=)\s*(\d+)""".r
  private val completeRe = """IsComplete\s+"([^"]+)"""".r
  private val uniqueRe = """IsUnique\s+"([^"]+)"""".r

  def parse(ruleset: String): Seq[Rule] = {
    val body = ruleset match {
      case rulesetRe(inner) => inner
      case other            => other
    }
    body.split(",").map(_.trim).filter(_.nonEmpty).map {
      case r @ colCountRe(op, n) => ColumnCount(op, n.toLong, r)
      case r @ rowCountRe(op, n) => RowCount(op, n.toLong, r)
      case r @ completeRe(c)     => IsComplete(c, r)
      case r @ uniqueRe(c)       => IsUnique(c, r)
      case other => throw new IllegalArgumentException(s"unsupported DQ rule: $other")
    }.toSeq
  }

  private def cmp(observed: Long, op: String, n: Long): Boolean = op match {
    case ">" => observed > n
    case ">=" => observed >= n
    case "<" => observed < n
    case "<=" => observed <= n
    case "==" | "=" => observed == n
  }

  /** Evaluate a ruleset. BEST_EFFORT (the reference's publishing mode):
    * evaluation errors yield a failed result, never an exception.
    */
  def evaluate(df: DataFrame, ruleset: String): Report = {
    val rules = parse(ruleset)
    val metadataResults = rules.collect { case r: ColumnCount =>
      Result(r.text, cmp(df.schema.size.toLong, r.op, r.n), df.schema.size.toLong)
    }
    val metricRules = rules.filter(!_.isInstanceOf[ColumnCount])
    val metricResults =
      if (metricRules.isEmpty) Nil
      else try {
        val aggs = count(lit(1)).as("__rows") +: metricRules.zipWithIndex.flatMap {
          case (IsComplete(c, _), i) => Seq(count(col(c)).as(s"__m$i"))
          case (IsUnique(c, _), i)   => Seq(count_distinct(col(c)).as(s"__m$i"))
          case (_: RowCount, i)      => Seq(count(lit(1)).as(s"__m$i"))
          case _                     => Nil
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        val rows = row.getAs[Long]("__rows")
        metricRules.zipWithIndex.map {
          case (r @ RowCount(op, n, t), i) => Result(t, cmp(rows, op, n), rows)
          case (IsComplete(c, t), i) =>
            val nonNull = row.getAs[Long](s"__m$i")
            Result(t, nonNull == rows, rows - nonNull)
          case (IsUnique(c, t), i) =>
            val distinct = row.getAs[Long](s"__m$i")
            Result(t, distinct == rows, distinct)
        }
      } catch {
        case e: Exception =>
          metricRules.map(r => Result(s"${r.text} [error: ${e.getMessage}]", passed = false, -1L))
      }
    Report(metadataResults ++ metricResults)
  }
}
