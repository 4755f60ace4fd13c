package graft

import graft.queries.IoQueries

/** The j1/o1/c1 gate queries prove the format round trips on the
  * synthetic corpus — which is pure ASCII words and spaces. This spec
  * drives the same write→read path with the strings that actually break
  * format contracts: embedded delimiters, quotes, newlines, unicode
  * beyond the BMP, empty strings, and trailing whitespace. Exact
  * row-level equality, not an aggregate.
  */
class IoRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    (1L, "comma, separated, values", "en", "srcA", 24L),
    (2L, "quote \" and 'single' and \\ backslash", "en", "srcA", 36L),
    (3L, "line\nbreak inside a record", "fr", "srcB", 26L),
    (4L, "unicode: naïve café 東京 🚀", "jp", "srcB", 25L),
    (5L, "", "en", "srcC", 0L),
    (6L, "trailing space  ", "en", "srcC", 16L),
    (7L, "\ttab\tseparated\t", "de", "srcC", 15L))

  private def frame = adversarial
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq

  for (fmt <- Seq("json", "orc", "csv"))
    test(s"$fmt round trip is lossless on adversarial strings") {
      val back = rows(IoQueries.writeRead(spark, frame, fmt))
      val orig = rows(frame)
      val diffs = orig.zipAll(back, null, null).filter { case (a, b) => a != b }
        .map { case (a, b) => s"  expected $a\n  got      $b" }
      assert(diffs.isEmpty, s"$fmt round trip mutated rows:\n${diffs.mkString("\n")}")
    }

  test("jsonlWithQuarantine: bad lines route to quarantine, clean rows parse, nothing silently dropped") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("jsonlq")
    val f = dir.resolve("part-0.jsonl")
    java.nio.file.Files.writeString(f,
      """{"id": 1, "name": "ok"}
        |this is not json at all
        |{"id": 2, "name": "also ok"}
        |{"id": "NaN-ish", "name": 3}
        |{"id": 3, "name": "fine"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val (clean, quarantined) = graft.io.Sources
      .jsonlWithQuarantine(spark, dir.toString, schema)
    val cleanRows = clean.orderBy("id").collect()
    assert(clean.columns.toSeq == Seq("id", "name"))
    assert(cleanRows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val bad = quarantined.select("raw_line").collect().map(_.getString(0))
    assert(bad.length == 2, s"expected 2 quarantined lines, got ${bad.toSeq}")
    assert(bad.exists(_.contains("not json")))
    assert(bad.exists(_.contains("NaN-ish")))
    // conservation: every input line is accounted for exactly once
    assert(cleanRows.length + bad.length == 5)
  }

  test("jsonlWithQuarantine rejects a schema that claims _corrupt_record") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("_corrupt_record", StringType)))
    val e = intercept[IllegalArgumentException] {
      graft.io.Sources.jsonlWithQuarantine(spark, "/nonexistent", schema)
    }
    assert(e.getMessage.contains("_corrupt_record"))
  }

  test("jsonlWithQuarantine: blank and literal-null lines are quarantined, not phantom clean rows") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("jsonlq2")
    java.nio.file.Files.writeString(dir.resolve("part-0.jsonl"),
      "{\"id\": 1, \"name\": \"ok\"}\n\n   \nnull\n{\"id\": 2, \"name\": \"ok2\"}\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val (clean, quarantined) = graft.io.Sources
      .jsonlWithQuarantine(spark, dir.toString, schema)
    assert(clean.count() == 2L, "only the two real records are clean")
    assert(clean.filter(clean("id").isNull).count() == 0L, "no phantom all-null rows")
    assert(quarantined.count() == 3L, "blank, whitespace, and null lines quarantined")
  }
}
