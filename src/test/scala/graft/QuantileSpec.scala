package graft

import org.apache.spark.sql.functions._
import graft.queries.{RelationalQueries, Tables}

/** r35 (approx_percentile sketch) is the scale twin of r33 (exact
  * percentile). Since round 7 the gate row itself is self-verifying —
  * each engine bounds its own digest against its own exact quantile and
  * emits booleans the oracle CAN hash-match — so this spec (a) asserts
  * the verdict columns are all-true on real data, (b) pins the much
  * tighter 1% quantitative contract on the raw digest the gate's 10%
  * bound intentionally relaxes, and (c) pins the bounded-memory plan.
  */
class QuantileSpec extends SparkSpec {

  private def exactByFlag: Map[String, (Double, Double, Double)] =
    RelationalQueries.all.find(_.name == "r33_median").get
      .run(spark, sf001).collect().map { r =>
        r.getString(0) -> (r.get(1).toString.toDouble,
          r.get(2).toString.toDouble, r.get(3).toString.toDouble)
      }.toMap

  private def approxByFlag: Map[String, (Double, Double, Double)] =
    Tables.lineitem(spark, sf001)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(CAST(floor(l_quantity + 0.5) AS BIGINT), 0.5, 1000)").as("am"),
        expr("approx_percentile(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT), array(0.25, 0.75), 1000)").as("aq"))
      .collect().map { r =>
        val aq = r.getSeq[Long](2)
        r.getString(0) -> (r.getLong(1).toDouble, aq(0).toDouble, aq(1).toDouble)
      }.toMap

  test("r35 raw digest tracks r33 exact quantiles within 1% relative error") {
    val exact = exactByFlag
    val approx = approxByFlag
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, (m, p25, p75)) =>
      val (am, a25, a75) = approx(flag)
      def relErr(e: Double, a: Double) = math.abs(e - a) / math.max(math.abs(e), 1.0)
      assert(relErr(m, am) < 0.01, s"$flag median: exact=$m approx=$am")
      assert(relErr(p25, a25) < 0.01, s"$flag p25: exact=$p25 approx=$a25")
      assert(relErr(p75, a75) < 0.01, s"$flag p75: exact=$p75 approx=$a75")
    }
  }

  test("r35 gate verdicts are all-true (sketch within the committed 10% bound)") {
    val rows = RelationalQueries.all.find(_.name == "r35_approx_quantile").get
      .run(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (1 to 3).foreach(i => assert(r.getBoolean(i), s"row $r col $i not within bound"))
    }
  }

  test("r35 runs with bounded per-group digest state (ObjectHashAggregate)") {
    val q = RelationalQueries.all.find(_.name == "r35_approx_quantile").get
    val plan = q.run(spark, sf001).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"unexpected plan:\n$plan")
    // partial aggregation present: sketches merge map-side before the shuffle
    assert(plan.contains("partial_approx_percentile") || plan.contains("partial"),
      s"no partial aggregation in plan:\n$plan")
  }
}
