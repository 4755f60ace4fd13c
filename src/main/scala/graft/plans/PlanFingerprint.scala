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
                      ops: Map[String, Int])

  private val Header = """^\(\d+\) (\S+).*$""".r

  def ofExplain(formatted: String): Fp = {
    val names = formatted.linesIterator
      .collect { case Header(name) => name }.toSeq
    val ops = names.groupBy(identity).map { case (k, v) => k -> v.size }
    Fp(ops.getOrElse("Exchange", 0), ops.getOrElse("BroadcastExchange", 0),
      ops.getOrElse("ReusedExchange", 0), ops)
  }

  def of(df: DataFrame): Fp = ofExplain(df.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode))

  /** One stable JSON object per query (sorted keys throughout) — the
    * diffable artifact form.
    */
  def toJson(fps: Seq[(String, Fp)], sfDir: String): String = {
    val rows = fps.sortBy(_._1).map { case (name, fp) =>
      val ops = fp.ops.toSeq.sorted
        .map { case (k, n) => s""""$k": $n""" }.mkString("{", ", ", "}")
      s"""    "$name": {"shuffles": ${fp.shuffles}, "broadcasts": ${
        fp.broadcasts}, "reused": ${fp.reused}, "ops": $ops}"""
    }.mkString(",\n")
    s"""{\n  "sf": "$sfDir",\n  "queries": {\n$rows\n  }\n}\n"""
  }
}
