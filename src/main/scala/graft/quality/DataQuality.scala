package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality gating, string-compatible with the reference's Glue DQ
  * ruleset DSL (reference Glue-spark/scripts/bronze/crm_cust_info_bronze.py:17-21:
  * `Rules = [ ColumnCount > 0 ]`, evaluated in every script with
  * BEST_EFFORT publishing — results are reported, never fail the job).
  *
  * Supported rules: `ColumnCount <op> N`, `RowCount <op> N`,
  * `IsComplete "col"` (no nulls), `IsUnique "col"`, and the row-level
  * `ColumnValues` family (Glue DQ's per-row predicate shape):
  * `ColumnValues "col" <op> N`, `ColumnValues "col" in ["a", "b"]`,
  * `ColumnValues "col" matches "regex"`. A NULL value FAILS a
  * ColumnValues rule (Glue's default null handling). Cross-dataset:
  * `ReferentialIntegrity "col" "ref.refCol"` against the named frame in
  * the `refs` map handed to [[evaluate]] (one anti-join job per rule).
  * Metric rules that need data (RowCount/IsComplete/IsUnique/dataset-level
  * ColumnValues) run in ONE aggregate job over the frame; ColumnCount is
  * metadata-only. Row-level outcomes come from [[annotate]]/[[quarantine]]
  * with zero extra jobs (pure projection + filter).
  */
object DataQuality {

  sealed trait Rule { def text: String }
  private case class ColumnCount(op: String, n: Long, text: String) extends Rule
  private case class RowCount(op: String, n: Long, text: String) extends Rule
  private case class IsComplete(colName: String, text: String) extends Rule
  private case class IsUnique(colName: String, text: String) extends Rule
  /** Row-level rule: `predicate` is the per-row PASS condition. */
  sealed private trait RowRule extends Rule {
    def predicate: org.apache.spark.sql.Column
  }
  private case class ColumnValuesCmp(colName: String, op: String, n: Long,
                                     text: String) extends RowRule {
    def predicate: org.apache.spark.sql.Column = op match {
      case ">"        => col(colName) > n
      case ">="       => col(colName) >= n
      case "<"        => col(colName) < n
      case "<="       => col(colName) <= n
      case "==" | "=" => col(colName) === n
    }
  }
  private case class ColumnValuesIn(colName: String, vals: Seq[String],
                                    text: String) extends RowRule {
    def predicate: org.apache.spark.sql.Column = col(colName).isin(vals: _*)
  }
  private case class ColumnValuesMatches(colName: String, regex: String,
                                         text: String) extends RowRule {
    def predicate: org.apache.spark.sql.Column = col(colName).rlike(regex)
  }
  /** Cross-dataset rule (Glue DQ `ReferentialIntegrity`): every value of
    * `colName` must exist in `refName.refCol` among the reference frames
    * handed to [[evaluate]]. A NULL foreign key FAILS (Glue's default
    * null handling, same as ColumnValues). `observed` is the violation
    * count — NULL or unmatched rows.
    */
  private case class RefIntegrity(colName: String, refName: String,
                                  refCol: String, text: String) extends Rule

  case class Result(rule: String, passed: Boolean, observed: Long)
  case class Report(results: Seq[Result]) {
    def allPassed: Boolean = results.forall(_.passed)
  }

  private val rulesetRe = """(?s)\s*Rules\s*=\s*\[(.*)\]\s*""".r
  private val colCountRe = """ColumnCount\s*(>|>=|<|<=|==|=)\s*(\d+)""".r
  private val rowCountRe = """RowCount\s*(>|>=|<|<=|==|=)\s*(\d+)""".r
  private val completeRe = """IsComplete\s+"([^"]+)"""".r
  private val uniqueRe = """IsUnique\s+"([^"]+)"""".r
  private val cvCmpRe = """ColumnValues\s+"([^"]+)"\s*(>|>=|<|<=|==|=)\s*(-?\d+)""".r
  private val cvInRe = """ColumnValues\s+"([^"]+)"\s+in\s+\[([^\]]*)\]""".r
  private val cvMatchRe = """ColumnValues\s+"([^"]+)"\s+matches\s+"([^"]+)"""".r
  private val refIntRe = """ReferentialIntegrity\s+"([^"]+)"\s+"([^".]+)\.([^"]+)"""".r

  /** Top-level rule split: commas inside `in [...]` value lists or inside
    * quoted strings (e.g. a regex containing `,`) are NOT separators —
    * a plain split(",") would shear `in ["a", "b"]` in half.
    */
  private def splitRules(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQ = false
    body.foreach {
      case '"'                           => inQ = !inQ; cur += '"'
      case '[' if !inQ                   => depth += 1; cur += '['
      case ']' if !inQ                   => depth -= 1; cur += ']'
      case ',' if !inQ && depth == 0     => out += cur.toString; cur.clear()
      case c                             => cur += c
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  def parse(ruleset: String): Seq[Rule] = {
    val body = ruleset match {
      case rulesetRe(inner) => inner
      case other            => other
    }
    splitRules(body).map {
      case r @ colCountRe(op, n) => ColumnCount(op, n.toLong, r)
      case r @ rowCountRe(op, n) => RowCount(op, n.toLong, r)
      case r @ completeRe(c)     => IsComplete(c, r)
      case r @ uniqueRe(c)       => IsUnique(c, r)
      case r @ cvCmpRe(c, op, n) => ColumnValuesCmp(c, op, n.toLong, r)
      // in-list values are extracted as QUOTED tokens, not by a bare
      // comma split — `in ["Washington, DC", "NYC"]` must yield two
      // values, and splitRules already guaranteed the commas survive to
      // this point; shearing them here would silently mis-evaluate
      case r @ cvInRe(c, vals)   => ColumnValuesIn(c,
        """"([^"]*)"""".r.findAllMatchIn(vals).map(_.group(1)).toSeq, r)
      case r @ cvMatchRe(c, rx)  => ColumnValuesMatches(c, rx, r)
      case r @ refIntRe(c, rn, rc) => RefIntegrity(c, rn, rc, r)
      case other => throw new IllegalArgumentException(s"unsupported DQ rule: $other")
    }
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
    *
    * `refs` names the reference frames `ReferentialIntegrity` rules may
    * cite. Each RI rule costs ONE extra job: a left-anti join of the
    * (already-projected) key column against the reference's distinct
    * keys — partial-agg distinct then a keyed anti join, so at 100 TB
    * it is one bounded shuffle per rule (AQE broadcasts the distinct
    * side when the dimension is small, the usual FK case). A NULL key
    * never matches an anti join, so NULL foreign keys are counted as
    * violations without a separate pass — exactly Glue's null handling.
    */
  def evaluate(df: DataFrame, ruleset: String,
               refs: Map[String, DataFrame] = Map.empty): Report = {
    val rules = parse(ruleset)
    val metadataResults = rules.collect { case r: ColumnCount =>
      Result(r.text, cmp(df.schema.size.toLong, r.op, r.n), df.schema.size.toLong)
    }
    // All referential rules audit in ONE pass over the fact frame
    // (round-19; was one left-anti count job PER rule — four full fact
    // scans for d5): each known rule contributes a left join against
    // its reference's DISTINCT key set (AQE broadcasts the usual
    // FK-dimension case) and one conditional sum — a NULL or unmatched
    // FK leaves the joined key NULL, exactly the rows the anti join
    // counted. Any failure falls back to the per-rule path so per-rule
    // error attribution is preserved.
    val refRules = rules.collect { case r: RefIntegrity => r }
    def refOne(r: RefIntegrity): Result = refs.get(r.refName) match {
      case None =>
        Result(s"${r.text} [error: unknown reference '${r.refName}']",
          passed = false, -1L)
      case Some(ref) =>
        try {
          val violations = df.select(col(r.colName).as("__fk"))
            .join(ref.select(col(r.refCol).as("__fk")).distinct(),
              Seq("__fk"), "left_anti")
            .count()
          Result(r.text, violations == 0L, violations)
        } catch {
          case e: Exception =>
            Result(s"${r.text} [error: ${e.getMessage}]", passed = false, -1L)
        }
    }
    val refResults: Seq[Result] =
      if (refRules.isEmpty) Nil
      else if (refRules.exists(r => !refs.contains(r.refName)) || refRules.size == 1)
        refRules.map(refOne)
      else try {
        val joined = refRules.zipWithIndex.foldLeft(
          df.select(refRules.map(_.colName).distinct.map(col): _*)) {
          case (acc, (r, i)) =>
            acc.join(refs(r.refName).select(col(r.refCol).as(s"__ref_$i")).distinct(),
              acc(r.colName) === col(s"__ref_$i"), "left")
        }
        val aggs = refRules.zipWithIndex.map { case (_, i) =>
          coalesce(sum(when(col(s"__ref_$i").isNull, 1L).otherwise(0L)),
            lit(0L)).as(s"__v_$i") }
        val row = joined.agg(aggs.head, aggs.tail: _*).head()
        refRules.zipWithIndex.map { case (r, i) =>
          val violations = row.getAs[Long](s"__v_$i")
          Result(r.text, violations == 0L, violations)
        }
      } catch { case _: Exception => refRules.map(refOne) }
    val metricRules = rules.filter(r =>
      !r.isInstanceOf[ColumnCount] && !r.isInstanceOf[RefIntegrity])
    val metricResults =
      if (metricRules.isEmpty) Nil
      else try {
        val aggs = count(lit(1)).as("__rows") +: metricRules.zipWithIndex.flatMap {
          case (r, i) => metricAggs(r, i)
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        interpret(metricRules, k => row.getAs[Long](k))
      } catch {
        case e: Exception =>
          metricRules.map(r => Result(s"${r.text} [error: ${e.getMessage}]", passed = false, -1L))
      }
    Report(metadataResults ++ refResults ++ metricResults)
  }

  /** GLUE "RECOMMENDATION RUN" twin — the other half of the reference's
    * DQ surface: profile the frame once and SYNTHESIZE a ruleset from
    * what the data actually shows, deterministically:
    *  - `RowCount > rows/2` (the half-yesterday floor Glue suggests);
    *  - `IsComplete` for columns observed null-free;
    *  - `IsUnique` for complete columns whose distinct count equals the
    *    row count;
    *  - observed `>= floor(min)` / `<= ceil(max)` bounds for NULL-FREE
    *    numeric columns (a NULL fails ColumnValues, and trunc-cast
    *    bounds would exclude fractional extremes);
    *  - an `in [...]` value-set (sorted) for null-free low-cardinality
    *    string columns (≤ `maxInList` distinct values).
    * Every rule derives from an observation, so evaluating the
    * recommendation against the SAME data passes by construction — the
    * self-consistency contract d4 pins under oracle. One profiling
    * aggregate for all statistics; the only extra job is the bounded
    * distinct-value collect for in-list columns (≤ maxInList rows per
    * qualifying column, driver-side by design like every model-sized
    * artifact here).
    */
  def recommend(df: DataFrame, cols: Seq[String], maxInList: Int = 10): Seq[String] = {
    import org.apache.spark.sql.types.NumericType
    val numeric: Set[String] = cols.filter(c => df.schema(c).dataType match {
      case _: NumericType => true
      case _              => false
    }).toSet
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__ndv_$c")) ++
        // floor/ceil, NOT cast('long') (trunc-toward-zero): an observed
        // fractional min of -3.7 must recommend ">= -4", not ">= -3"
        // which the data itself violates — the self-consistency contract
        (if (numeric(c)) Seq(floor(min(col(c))).cast("long").as(s"__mn_$c"),
          ceil(max(col(c))).cast("long").as(s"__mx_$c")) else Nil)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getAs[Long]("__rows")
    val rules = scala.collection.mutable.ArrayBuffer.empty[String]
    rules += s"RowCount > ${rows / 2}"
    cols.foreach { c =>
      val nulls = row.getAs[Long](s"__nn_$c")
      val ndv = row.getAs[Long](s"__ndv_$c")
      if (nulls == 0L) rules += s"""IsComplete "$c""""
      if (nulls == 0L && ndv == rows) rules += s"""IsUnique "$c""""
      // bounds only for null-free columns: a NULL fails ColumnValues
      // (RowRule counts NULL as violating), so recommending a bound on a
      // nullable column would fail its own evidence — same
      // passes-by-construction contract as the in-list rule below. An
      // all-null numeric column additionally has NULL min/max.
      if (numeric(c) && nulls == 0L && rows > 0L) {
        rules += s"""ColumnValues "$c" >= ${row.getAs[Long](s"__mn_$c")}"""
        rules += s"""ColumnValues "$c" <= ${row.getAs[Long](s"__mx_$c")}"""
      } else if (!numeric(c) && nulls == 0L && ndv <= maxInList) {
        val vals = df.select(col(c).cast("string")).distinct()
          .collect().map(_.getString(0)).sorted
        rules += s"""ColumnValues "$c" in [${vals.map(v => s""""$v"""").mkString(", ")}]"""
      }
    }
    rules.toSeq
  }

  /** Aggregates a metric rule needs, keyed __m$i / __nn$i. IsUnique:
    * non-null values must be unique; NULLs never break uniqueness (SQL
    * UNIQUE-constraint semantics — `count_distinct` skips NULLs, so it is
    * compared against `count(col)`, not `count(*)`; a nullable-but-unique
    * column passes).
    */
  private def metricAggs(r: Rule, i: Int): Seq[org.apache.spark.sql.Column] = r match {
    case IsComplete(c, _) => Seq(count(col(c)).as(s"__m$i"))
    case IsUnique(c, _)   => Seq(count_distinct(col(c)).as(s"__m$i"),
                                 count(col(c)).as(s"__nn$i"))
    case _: RowCount      => Seq(count(lit(1)).as(s"__m$i"))
    // dataset-level ColumnValues verdict: observed = count of VIOLATING
    // rows (NULL fails); coalesce guards the empty-frame null sum
    case rr: RowRule      => Seq(coalesce(
        sum(when(rr.predicate, 0L).otherwise(1L)), lit(0L)).as(s"__m$i"))
    // metadata / cross-dataset rules never reach the metric aggregate
    // (evaluate routes them separately)
    case _: ColumnCount | _: RefIntegrity => Nil
  }

  private def interpret(metricRules: Seq[Rule], metric: String => Long): Seq[Result] = {
    val rows = metric("__rows")
    metricRules.zipWithIndex.map {
      case (RowCount(op, n, t), _) => Result(t, cmp(rows, op, n), rows)
      case (IsComplete(_, t), i) =>
        val nonNull = metric(s"__m$i")
        Result(t, nonNull == rows, rows - nonNull)
      case (IsUnique(_, t), i) =>
        val distinct = metric(s"__m$i")
        val nonNull = metric(s"__nn$i")
        Result(t, distinct == nonNull, distinct)
      case (r: RowRule, i) =>
        val violations = metric(s"__m$i")
        Result(r.text, violations == 0L, violations)
      case (r @ (_: ColumnCount | _: RefIntegrity), _) =>
        Result(r.text, passed = false, -1L) // unreachable: filtered out
    }
  }

  /** Per-row DQ annotation: adds `out` = array of the row-level
    * (`ColumnValues`) rule texts this row VIOLATES — empty array means the
    * row is clean. Non-row-level rules in the ruleset are ignored here
    * (they have no per-row outcome; evaluate them with [[evaluate]]/
    * [[observed]]). Pure projection: zero jobs, zero shuffles, safe to
    * compose in front of any sink at any scale.
    */
  def annotate(df: DataFrame, ruleset: String, out: String = "dq_failed"): DataFrame = {
    val rowRules = parse(ruleset).collect { case r: RowRule => r }
    val marks = rowRules.map(r =>
      when(r.predicate, lit(null).cast("string")).otherwise(lit(r.text)))
    val failed =
      if (marks.isEmpty) array().cast("array<string>")
      else array_compact(array(marks: _*))
    df.withColumn(out, failed)
  }

  /** Quarantine split on the row-level rules: (clean rows — original
    * schema, violating rows + the `out` annotation column). The two
    * frames share one lineage; a caller writing both pays one scan per
    * sink, the Glue DQ "separate bad records" pattern.
    */
  def quarantine(df: DataFrame, ruleset: String,
                 out: String = "dq_failed"): (DataFrame, DataFrame) = {
    val annotated = annotate(df, ruleset, out)
    (annotated.filter(size(col(out)) === 0).drop(out),
     annotated.filter(size(col(out)) > 0))
  }

  /** A frame instrumented with observed DQ metrics plus the deferred
    * report. Call `report()` only AFTER an action has run on `df` (e.g.
    * the sink write) — the metrics ride the same job, so the stage pays
    * ONE scan instead of a separate df.agg job per frame (the reference
    * publishes DQ alongside each write, bronze/crm_cust_info_bronze.py:30-35).
    */
  case class Observed(df: DataFrame, report: () => Report)

  /** Piggyback rule evaluation on the frame's next action via
    * `Dataset.observe` (CollectMetrics → no extra job, metrics collected
    * by the driver from task results).
    *
    * `IsUnique` is a PERMANENT exception: exact uniqueness is
    * `count_distinct == count`, and observed metrics structurally cannot
    * host a distinct aggregate (CollectMetrics merges bounded per-task
    * accumulator state; a distinct needs a shuffle-sized set, and an HLL
    * sketch is approximate so it cannot certify uniqueness). All IsUnique
    * rules in the ruleset share ONE standalone aggregate job at
    * `report()` time; every other rule is job-free. BEST_EFFORT: errors
    * become failed results, never exceptions.
    */
  def observed(df: DataFrame, ruleset: String, name: String = "dq"): Observed = {
    val rules = parse(ruleset)
    val metadataResults = rules.collect { case r: ColumnCount =>
      Result(r.text, cmp(df.schema.size.toLong, r.op, r.n), df.schema.size.toLong)
    }
    val observable = rules.filter(r =>
      r.isInstanceOf[RowCount] || r.isInstanceOf[IsComplete] ||
        r.isInstanceOf[RowRule])
    val deferred = rules.collect { case r: IsUnique => r }
    val uniqueReport: () => Seq[Result] =
      if (deferred.isEmpty) () => Nil
      else () => evaluate(df, deferred.map(_.text).mkString(",")).results
    if (observable.isEmpty)
      Observed(df, () => Report(metadataResults ++ uniqueReport()))
    else {
      val obs = org.apache.spark.sql.Observation(name)
      val aggs = count(lit(1)).as("__rows") +: observable.zipWithIndex.flatMap {
        case (r, i) => metricAggs(r, i)
      }
      val instrumented = df.observe(obs, aggs.head, aggs.tail: _*)
      Observed(instrumented, () => {
        val metricResults = try {
          val m = obs.get // blocks until the first action on `instrumented`
          interpret(observable, k => m(k).asInstanceOf[Number].longValue())
        } catch {
          case e: Exception =>
            observable.map(r => Result(s"${r.text} [error: ${e.getMessage}]", passed = false, -1L))
        }
        Report(metadataResults ++ metricResults ++ uniqueReport())
      })
    }
  }

  /** Volume anomaly detection on a per-key metric SERIES (the Deequ
    * anomaly-check discipline the static d1–d5 rules can't express):
    * each (key, day) count is compared against its own trailing
    * `histDays` OBSERVED days — 'low' when cnt falls below lowBp basis
    * points of the trailing mean, 'high' above highBp, 'warmup' until
    * `minHist` days of history exist. The band test is pure integer
    * cross-multiplication (cnt·n·10000 vs sum·bp) — no division, no
    * doubles, replayable in any engine. A day with ZERO rows for a key
    * is absent from the series (compose with a gap-fill like r49 when
    * silence itself must alarm). Scale: the daily frame is
    * output-sized (keys × days, reduced by a partial-agg shuffle); the
    * window partitions by key with a bounded ROWS frame — nothing
    * corpus-sized moves.
    */
  def volumeAnomalies(daily: DataFrame, keyCol: String, dayCol: String,
                      cntCol: String, histDays: Int = 7, minHist: Int = 3,
                      lowBp: Long = 5000L, highBp: Long = 20000L): DataFrame = {
    require(histDays >= 1 && minHist >= 1 && lowBp >= 0 && highBp >= lowBp)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(dayCol).rowsBetween(-histDays, -1)
    daily
      .withColumn("hist_n", count(col(cntCol)).over(w))
      .withColumn("hist_sum", coalesce(sum(col(cntCol)).over(w), lit(0L)))
      .withColumn("status",
        when(col("hist_n") < minHist, "warmup")
          .when(col(cntCol) * col("hist_n") * 10000L < col("hist_sum") * lowBp, "low")
          .when(col(cntCol) * col("hist_n") * 10000L > col("hist_sum") * highBp, "high")
          .otherwise("ok"))
  }
}
