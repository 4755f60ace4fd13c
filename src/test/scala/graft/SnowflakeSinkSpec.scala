package graft

import graft.io.{MapCredentials, SnowflakeSink}

/** Contract test for the warehouse connector wiring (reference
  * gold-snowflake/dim_customers_gold.py:72-81). The connector jar cannot
  * exist in this offline build, so the test pins (a) the exact option
  * mapping the connector would receive and (b) the fail-fast behavior on
  * both missing credentials and missing jar.
  */
class SnowflakeSinkSpec extends SparkSpec {
  import spark.implicits._

  private val creds = MapCredentials(Map(
    "sfURL" -> "acct.snowflakecomputing.com", "sfUser" -> "etl",
    "sfPassword" -> "pw", "sfDatabase" -> "dwh",
    "sfSchema" -> "public", "sfWarehouse" -> "compute_wh"))

  test("fromCredentials resolves the reference's six connection keys") {
    val sink = SnowflakeSink.fromCredentials(creds)
    val opts = sink.optionsFor("sales_sch.fact_sales")
    assert(opts("sfURL") == "acct.snowflakecomputing.com")
    assert(opts("sfUser") == "etl" && opts("sfPassword") == "pw")
    assert(opts("sfDatabase") == "dwh" && opts("sfSchema") == "public")
    assert(opts("sfWarehouse") == "compute_wh")
    // table name goes through option("dbtable", t) — the evident intent of
    // the reference's `.options('dbtable', …)` misuse (fact_sales_gold.py:88)
    assert(opts("dbtable") == "sales_sch.fact_sales")
    assert(opts.size == 7)
  }

  test("missing credentials fail at construction, naming the gaps") {
    val e = intercept[IllegalArgumentException] {
      SnowflakeSink.fromCredentials(MapCredentials(Map("sfURL" -> "u")))
    }
    assert(e.getMessage.contains("sfUser") && e.getMessage.contains("sfWarehouse"))
  }

  test("write fails fast when the connector jar is absent (offline build)") {
    val df = Seq((1, "a")).toDF("id", "v")
    val e = intercept[Throwable] {
      SnowflakeSink.fromCredentials(creds).write(df, "sales_sch.fact_sales")
    }
    // Spark's missing-data-source error names the format
    assert(e.getMessage != null && e.getMessage.toLowerCase.contains("snowflake"),
      s"unexpected failure mode: $e")
  }
}
