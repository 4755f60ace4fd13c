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
}
