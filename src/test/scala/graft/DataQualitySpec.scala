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

  test("IsUnique: NULLs never break uniqueness (UNIQUE-constraint semantics)") {
    val df = Seq(Some(1), Some(2), None, None).toDF("id")
    assert(DataQuality.evaluate(df, """Rules = [ IsUnique "id" ]""").allPassed)
    val dup = Seq(Some(1), Some(1), None).toDF("id")
    assert(!DataQuality.evaluate(dup, """Rules = [ IsUnique "id" ]""").allPassed)
  }

  test("observed: metrics ride the sink action — no separate DQ job") {
    val df = Seq((1, Some("a")), (2, Some("b")), (3, None)).toDF("id", "v")
    val obs = DataQuality.observed(df,
      """Rules = [ ColumnCount > 1, RowCount == 3, IsComplete "id", IsComplete "v" ]""",
      "dq_obs_test")
    // count jobs triggered between instrumentation and report: the write
    // itself is the ONLY action (observe adds none).
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val out = java.nio.file.Files.createTempDirectory("dq_obs").toString
    obs.df.write.mode("overwrite").parquet(out)
    val rep = obs.report()
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after - before <= 1, s"observed() must not add jobs: ${after - before}")
    val byRule = rep.results.map(r => r.rule -> r).toMap
    assert(byRule("ColumnCount > 1").passed)
    assert(byRule("RowCount == 3").passed)
    assert(byRule("""IsComplete "id"""").passed)
    assert(!byRule("""IsComplete "v"""").passed)
  }

  test("observed: IsUnique falls back to one deferred job, result identical to evaluate") {
    val df = Seq((1, "x"), (1, "y"), (2, "z")).toDF("id", "v")
    val obs = DataQuality.observed(df, """Rules = [ RowCount > 0, IsUnique "id" ]""",
      "dq_obs_uni")
    obs.df.write.mode("overwrite")
      .parquet(java.nio.file.Files.createTempDirectory("dq_obs2").toString)
    val rep = obs.report()
    val byRule = rep.results.map(r => r.rule -> r).toMap
    assert(byRule("RowCount > 0").passed)
    assert(!byRule("""IsUnique "id"""").passed)
  }
}
