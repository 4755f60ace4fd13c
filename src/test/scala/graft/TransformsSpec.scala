package graft

import org.apache.spark.sql.functions._
import graft.silver.Transforms

/** Unit specs for the six silver transforms — each encodes the edge cases
  * embedded in the reference corpus (SURVEY.md §5.2 / FIXTURES.md).
  */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("repairIntDate arithmetic == try_to_date string parse over the int domain") {
    // every (y, m, d) shape that exercises the calendar guard — leap
    // century (1900 no, 2000 yes), ordinary leap (2020), month 0/13,
    // day 0/29/30/31/32 — plus non-8-digit and degenerate values
    val ymd = for {
      y <- Seq(1900, 1999, 2000, 2019, 2020)
      m <- 0 to 13
      d <- Seq(0, 1, 27, 28, 29, 30, 31, 32)
    } yield y * 10000 + m * 100 + d
    val odd = Seq(0, 1, 99, -20200101, 1234567, 100000000, 20200000,
      Int.MaxValue, Int.MinValue, 10000000, 99999999)
    val df = (ymd ++ odd).toDF("c")
    val out = df.select(
        col("c"),
        Transforms.repairIntDate(col("c")).as("arith"),
        when(col("c") === 0 || length(col("c").cast("string")) =!= 8,
          lit(null).cast("date"))
          .otherwise(try_to_date(col("c").cast("string"), "yyyyMMdd")).as("parsed"))
      .collect()
    val diffs = out.filter(r => r.get(1) != r.get(2))
    assert(diffs.isEmpty,
      s"arithmetic date repair diverges: ${diffs.take(5).mkString(", ")}")
    // spot-check semantics, not just agreement
    val m = out.map(r => r.getInt(0) -> Option(r.getDate(1))).toMap
    assert(m(20200229).contains(java.sql.Date.valueOf("2020-02-29")))
    assert(m(19000229).isEmpty) // 1900 is not a leap year
    assert(m(20000229).contains(java.sql.Date.valueOf("2000-02-29")))
    assert(m(20190230).isEmpty)
    assert(m(1234567).isEmpty)
  }

  test("custInfo: code decode is case/space-insensitive, dedup keeps latest") {
    val df = Seq(
      (1, "K1", "  Ann ", " Lee  ", "s", " m ", "2020-01-01"),
      (1, "K1", "Ann", "Lee", "M", "F", "2021-01-01"),
      (2, "K2", "Bob", "Ray", "x", "", "2020-05-05")
    ).toDF("cst_id", "cst_key", "cst_firstname", "cst_lastname",
      "cst_marital_status", "cst_gndr", "cst_create_date")
      .withColumn("cst_create_date", col("cst_create_date").cast("date"))
    val out = Transforms.custInfo(df).orderBy("cst_id").collect()
    assert(out.length == 2)
    // id 1 keeps the 2021 row: Married/Female
    assert(out(0).getString(4) == "Married" && out(0).getString(5) == "Female")
    // unknown codes -> n/a; names trimmed
    assert(out(1).getString(4) == "n/a" && out(1).getString(5) == "n/a")
    assert(out(1).getString(2) == "Bob")
  }

  test("prdInfo: key split, cost default, line decode, SCD-2 end dates") {
    val df = Seq(
      (1, "CO-RF-FR-R92B-58", "name1", Some(100), "R ", "2020-01-01 00:00:00"),
      (2, "CO-RF-FR-R92B-58", "name2", None, "m", "2020-07-01 00:00:00"),
      (3, "AC-HE-HL-U509", "name3", Some(5), "x", "2019-01-01 00:00:00")
    ).toDF("prd_id", "prd_key", "prd_nm", "prd_cost", "prd_line", "prd_start_dt")
      .withColumn("prd_start_dt", col("prd_start_dt").cast("timestamp"))
    val out = Transforms.prdInfo(df).orderBy("prd_id").collect()
    assert(out(0).getString(1) == "CO_RF")           // cat_id
    assert(out(0).getString(2) == "FR-R92B-58")      // prd_key from char 7
    assert(out(0).getString(5) == "Road")            // "R " decodes
    assert(out(1).getInt(4) == 0)                    // null cost -> 0
    assert(out(1).getString(5) == "Mountain")        // "m" decodes
    assert(out(2).getString(5) == "n/a")
    // SCD-2: v1 ends the day before v2 starts; latest + singleton open
    assert(out(0).getDate(7).toString == "2020-06-30")
    assert(out(1).getDate(7) == null && out(2).getDate(7) == null)
  }

  test("salesDetails: date repair + sales/price repair chain") {
    val df = Seq(
      // (ord, prd, cust, order_dt, ship, due, sales, qty, price)
      ("SO1", "P1", 1, 0, 20200105, 20200110, Some(100), 2, Some(50)),        // clean
      ("SO2", "P1", 1, 2020010, 20200105, 20200110, Some(100), 2, Some(50)),  // 7-digit date
      ("SO3", "P1", 1, 20200101, 20200105, 20200110, None, 3, Some(-7)),      // null sales, neg price
      ("SO4", "P1", 1, 20200101, 20200105, 20200110, Some(999), 2, Some(50)), // inconsistent sales
      ("SO5", "P1", 1, 20200101, 20200105, 20200110, Some(60), 3, None),      // null price
      ("SO6", "P1", 1, 20200101, 20200105, 20200110, Some(10), 0, Some(0))    // zero qty+price
    ).toDF("sls_ord_num", "sls_prd_key", "sls_cust_id", "sls_order_dt",
      "sls_ship_dt", "sls_due_dt", "sls_sales", "sls_quantity", "sls_price")
    val out = Transforms.salesDetails(df).orderBy("sls_ord_num").collect()
    assert(out(0).getDate(3) == null)                       // 0 -> null
    assert(out(1).getDate(3) == null)                       // len!=8 -> null
    assert(out(2).getDate(3).toString == "2020-01-01")
    assert(out(2).getInt(6) == 21)                          // 3 * |-7|
    assert(out(3).getInt(6) == 100)                         // recomputed 2*50
    // null price -> repaired from already-repaired sales: 60/3 = 20
    assert(out(4).getDouble(8) == 20.0)
    // zero qty: divisor swapped to 1; sales null-safe
    assert(out(5).getDouble(8) == 0.0 || out(5).isNullAt(8))
  }

  test("custAz12: NAS strip, future birthdate nulling vs fixed clock, gender spellings") {
    val clock = Transforms.Clock.fixed("2026-01-01")
    val df = Seq(
      ("NAS123", "1980-05-05", "F"),
      ("456", "2049-01-01", " male "),
      ("NAS789", "2025-12-31", "FEMALE"),
      ("000", "1990-01-01", "")
    ).toDF("cid", "bdate", "gen").withColumn("bdate", col("bdate").cast("date"))
    val out = Transforms.custAz12(df, clock).orderBy("cid").collect()
    val byCid = out.map(r => r.getString(0) -> r).toMap
    assert(byCid.contains("123") && byCid.contains("789") && byCid.contains("456"))
    assert(byCid("456").getDate(1) == null)               // 2049 > clock
    assert(byCid("789").getDate(1).toString == "2025-12-31")
    assert(byCid("123").getString(2) == "Female")
    assert(byCid("456").getString(2) == "Male")
    assert(byCid("000").getString(2) == "n/a")
  }

  test("locA101: hyphen strip + country decode") {
    val df = Seq(
      ("AW-1", "DE"), ("AW-2", "US"), ("AW-3", "USA"),
      ("AW-4", "  Australia "), ("AW-5", ""), ("AW-6", null)
    ).toDF("cid", "cntry")
    val out = Transforms.locA101(df).orderBy("cid").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("AW1", "AW2", "AW3", "AW4", "AW5", "AW6"))
    assert(out.map(_.getString(1)).toSeq ==
      Seq("Germany", "United States", "United States", "Australia", "n/a", "n/a"))
  }
}
