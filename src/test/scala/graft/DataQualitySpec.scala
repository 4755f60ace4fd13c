package graft

import graft.quality.DataQuality

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("parses the reference's ruleset string form") {
    val rules = DataQuality.parse("""Rules = [ ColumnCount > 0 ]""")
    assert(rules.length == 1)
  }

  test("ColumnCount / RowCount / IsComplete / IsUnique evaluate in one pass") {
    val df = Seq((1, Some("a")), (2, Some("b")), (3, None), (3, Some("d")))
      .toDF("id", "v")
    val rep = DataQuality.evaluate(df,
      """Rules = [ ColumnCount > 1, RowCount >= 4, IsComplete "id", IsComplete "v", IsUnique "id" ]""")
    val byRule = rep.results.map(r => r.rule -> r).toMap
    assert(byRule("ColumnCount > 1").passed)
    assert(byRule("RowCount >= 4").passed)
    assert(byRule("""IsComplete "id"""").passed)
    assert(!byRule("""IsComplete "v"""").passed) // one null
    assert(!byRule("""IsUnique "id"""").passed)  // id 3 repeats
    assert(!rep.allPassed)
  }

  test("BEST_EFFORT: bad column yields failed result, not an exception") {
    val df = Seq(1).toDF("id")
    val rep = DataQuality.evaluate(df, """Rules = [ IsComplete "nope" ]""")
    assert(rep.results.nonEmpty && !rep.allPassed)
  }
}
