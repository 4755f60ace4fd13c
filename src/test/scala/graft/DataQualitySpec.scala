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

  test("ReferentialIntegrity: unmatched and NULL FKs count as violations") {
    val fact = Seq(Some(1), Some(2), Some(9), None).toDF("fk")
    val dim = Seq(1, 2, 3).toDF("k")
    val rep = DataQuality.evaluate(fact,
      """Rules = [ ReferentialIntegrity "fk" "dim.k" ]""",
      Map("dim" -> dim))
    val r = rep.results.head
    assert(!r.passed && r.observed == 2L) // fk=9 unmatched + the NULL
    val ok = DataQuality.evaluate(fact.na.drop().filter($"fk" < 9),
      """Rules = [ ReferentialIntegrity "fk" "dim.k" ]""", Map("dim" -> dim))
    assert(ok.allPassed && ok.results.head.observed == 0L)
  }

  test("ReferentialIntegrity: unknown reference is BEST_EFFORT failed, not thrown") {
    val fact = Seq(1).toDF("fk")
    val rep = DataQuality.evaluate(fact,
      """Rules = [ ReferentialIntegrity "fk" "nope.k" ]""")
    assert(rep.results.length == 1 && !rep.allPassed)
    assert(rep.results.head.rule.contains("unknown reference"))
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

  test("ColumnValues parser: commas inside in-lists and quoted regexes survive the split") {
    val rules = DataQuality.parse(
      """Rules = [ ColumnValues "n" > 10, ColumnValues "lang" in ["en", "de"], ColumnValues "t" matches "^[a-z,]+$" ]""")
    assert(rules.length == 3)
    assert(rules(1).text == """ColumnValues "lang" in ["en", "de"]""")
    assert(rules(2).text == """ColumnValues "t" matches "^[a-z,]+$"""")
  }

  test("ColumnValues at dataset level: observed = violation count, NULL fails") {
    val df = Seq((1L, Some("en")), (20L, Some("zz")), (30L, None))
      .toDF("n", "lang")
    val rep = DataQuality.evaluate(df,
      """Rules = [ ColumnValues "n" > 10, ColumnValues "lang" in ["en", "de"] ]""")
    val byRule = rep.results.map(r => r.rule -> r).toMap
    val r1 = byRule("""ColumnValues "n" > 10""")
    assert(!r1.passed && r1.observed == 1L) // the n=1 row
    val r2 = byRule("""ColumnValues "lang" in ["en", "de"]""")
    assert(!r2.passed && r2.observed == 2L) // zz and NULL both fail
  }

  test("annotate lists exactly the violated rules per row; quarantine splits cleanly") {
    val df = Seq((1L, "en", "abc"), (20L, "zz", "abc"), (30L, "en", "A!"))
      .toDF("n", "lang", "t")
    val ruleset =
      """Rules = [ ColumnValues "n" > 10, ColumnValues "lang" in ["en", "de"], ColumnValues "t" matches "^[a-z]+$" ]"""
    val ann = DataQuality.annotate(df, ruleset)
    val rows = ann.orderBy("n").collect()
    assert(rows(0).getSeq[String](3) == Seq("""ColumnValues "n" > 10"""))
    assert(rows(1).getSeq[String](3) == Seq("""ColumnValues "lang" in ["en", "de"]"""))
    assert(rows(2).getSeq[String](3) == Seq("""ColumnValues "t" matches "^[a-z]+$""""))
    val (clean, bad) = DataQuality.quarantine(df, ruleset)
    assert(clean.count() == 0L && bad.count() == 3L)
    assert(clean.columns.toSeq == df.columns.toSeq) // original schema back
    val (c2, b2) = DataQuality.quarantine(
      Seq((100L, "en", "ok")).toDF("n", "lang", "t"), ruleset)
    assert(c2.count() == 1L && b2.count() == 0L)
  }

  test("annotate with no row-level rules is a no-op empty-array column, zero jobs") {
    val df = Seq((1L, "a")).toDF("n", "v")
    val ann = DataQuality.annotate(df, """Rules = [ RowCount > 0 ]""")
    assert(ann.select("dq_failed").head().getSeq[String](0).isEmpty)
  }

  test("in-list values containing commas survive both the rule split and the value split") {
    val rules = DataQuality.parse(
      """Rules = [ ColumnValues "city" in ["Washington, DC", "NYC"] ]""")
    val df = Seq("Washington, DC", "NYC", "DC").toDF("city")
    val rep = DataQuality.evaluate(df, rules.head.text)
    assert(rep.results.head.observed == 1L) // only bare "DC" violates
    val ann = DataQuality.annotate(df, rules.head.text)
    assert(ann.filter(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("dq_failed")) > 0)
      .collect().map(_.getString(0)).toSeq == Seq("DC"))
  }
}
