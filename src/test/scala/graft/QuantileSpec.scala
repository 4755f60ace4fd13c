package graft

import graft.queries.RelationalQueries

/** r35 (approx_percentile sketch) is the rows-only scale twin of r33
  * (exact percentile). The gate can't hash-compare a sketch across
  * engines, so this spec pins the quantitative contract instead: the
  * sketch estimate must land within the accuracy bound of the exact
  * quantile on real data.
  */
class QuantileSpec extends SparkSpec {

  private def byFlag(name: String): Map[String, (Double, Double, Double)] = {
    val q = RelationalQueries.all.find(_.name == name).get
    q.run(spark, sf001).collect().map { r =>
      r.getString(0) -> (r.get(1).toString.toDouble,
        r.get(2).toString.toDouble, r.get(3).toString.toDouble)
    }.toMap
  }

  test("r35 approx quantiles track r33 exact quantiles within 1% relative error") {
    val exact = byFlag("r33_median")
    val approx = byFlag("r35_approx_quantile")
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, (m, p25, p75)) =>
      val (am, a25, a75) = approx(flag)
      def relErr(e: Double, a: Double) = math.abs(e - a) / math.max(math.abs(e), 1.0)
      assert(relErr(m, am) < 0.01, s"$flag median: exact=$m approx=$am")
      assert(relErr(p25, a25) < 0.01, s"$flag p25: exact=$p25 approx=$a25")
      assert(relErr(p75, a75) < 0.01, s"$flag p75: exact=$p75 approx=$a75")
    }
  }

  test("r35 runs with bounded per-group state (ObjectHashAggregate, no full-sort buffer)") {
    val q = RelationalQueries.all.find(_.name == "r35_approx_quantile").get
    val plan = q.run(spark, sf001).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"unexpected plan:\n$plan")
    // partial aggregation present: sketches merge map-side before the shuffle
    assert(plan.contains("partial_approx_percentile") || plan.contains("partial"),
      s"no partial aggregation in plan:\n$plan")
  }
}
