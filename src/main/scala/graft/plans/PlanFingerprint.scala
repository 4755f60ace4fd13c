package graft.plans

import org.apache.spark.sql.DataFrame

/** Structural fingerprint of a physical plan: the operator-name
  * multiset plus the exchange counts that decide scale behavior
  * (shuffle exchanges, broadcast exchanges, reused exchanges).
  *
  * docs/EXPLAINS.md holds the full plans for human review but drifts by
  * hand; the fingerprint is the machine-checkable core. The committed
  * artifact (docs/PLAN_FINGERPRINTS.json, written by [[graft.Explain]])
  * is diffed in CI by PlanSpec: a change that adds a shuffle to any
  * gate query fails the suite until the artifact is regenerated — i.e.
  * until the exchange growth is REVIEWED and committed, never silent.
  *
  * Parsing works off `explain("formatted")` section headers
  * (`"(12) SortMergeJoin Inner"` → `SortMergeJoin`), which also covers
  * subquery sections — scalar subqueries are real exchanges at runtime
  * and must count.
  */
object PlanFingerprint {

  final case class Fp(shuffles: Int, broadcasts: Int, reused: Int,
                      ops: Map[String, Int], codegenSpans: Int,
                      codegenOps: Int)

  private val Header = """^\(\d+\) (\S+).*$""".r
  private val CodegenStar = """\*\((\d+)\)""".r

  def ofExplain(formatted: String): Fp = ofExplain(formatted, "")

  /** `formatted` drives the operator multiset and exchange counts;
    * `simple` (the default `explain()` string, where fused operators
    * carry a `*(stageId)` prefix on the INITIAL plan even under AQE —
    * formatted mode only annotates codegen ids after execution) drives
    * the whole-stage-codegen evidence: how many fused spans the plan
    * has and how many operators sit inside one. A refactor that knocks
    * a hot operator out of codegen (an expression going non-codegen)
    * shows up as codegenOps shrinking.
    */
  def ofExplain(formatted: String, simple: String): Fp = {
    val names = formatted.linesIterator
      .collect { case Header(name) => name }.toSeq
    val ops = names.groupBy(identity).map { case (k, v) => k -> v.size }
    val stars = CodegenStar.findAllMatchIn(simple).map(_.group(1)).toSeq
    Fp(ops.getOrElse("Exchange", 0), ops.getOrElse("BroadcastExchange", 0),
      ops.getOrElse("ReusedExchange", 0), ops, stars.distinct.size, stars.size)
  }

  def of(df: DataFrame): Fp = ofExplain(
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode),
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))

  /** Full fingerprint with REAL codegen evidence. Under AQE a
    * pre-execution plan carries no WholeStageCodegen at all (stages are
    * compiled adaptively at run time — probed: CodegenMode reports
    * "Found 0 subtrees" on every adaptive plan), so the exchange half
    * comes from the production AQE plan and the codegen half from a
    * second build of the SAME query with AQE off — the static stage
    * structure AQE will compile per exchange-bounded stage.
    */
  def ofQuery(spark: org.apache.spark.sql.SparkSession,
              build: () => DataFrame): Fp = {
    val aqe = of(build())
    val key = "spark.sql.adaptive.enabled"
    val saved = spark.conf.get(key)
    val simple = try {
      spark.conf.set(key, "false")
      build().queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    } finally spark.conf.set(key, saved)
    val stars = CodegenStar.findAllMatchIn(simple).map(_.group(1)).toSeq
    aqe.copy(codegenSpans = stars.distinct.size, codegenOps = stars.size)
  }

  /** One stable JSON object per query (sorted keys throughout) — the
    * diffable artifact form.
    */
  def toJson(fps: Seq[(String, Fp)], sfDir: String): String = {
    val rows = fps.sortBy(_._1).map { case (name, fp) =>
      val ops = fp.ops.toSeq.sorted
        .map { case (k, n) => s""""$k": $n""" }.mkString("{", ", ", "}")
      s"""    "$name": {"shuffles": ${fp.shuffles}, "broadcasts": ${
        fp.broadcasts}, "reused": ${fp.reused}, "codegen_spans": ${
        fp.codegenSpans}, "codegen_ops": ${fp.codegenOps}, "ops": $ops}"""
    }.mkString(",\n")
    s"""{\n  "sf": "$sfDir",\n  "queries": {\n$rows\n  }\n}\n"""
  }
}
