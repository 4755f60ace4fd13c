package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** The six silver cleansing transforms (SURVEY.md §2.9), each a pure
  * DataFrame => DataFrame built from codegen'd built-in expressions only —
  * the whole layer stays inside WholeStageCodegen except the dedup window's
  * single hash exchange.
  *
  * Where the reference's Python would throw as written (the `.when` chained
  * onto `upper(trim(col))` at silver/crm_cust_info_silver.py:60-71, the
  * Column-length `F.substring` at crm_prd_info_silver.py:56, the
  * `select_fields` on a DataFrame at erp_px_cat_g1v2_silver.py:47), we
  * implement the evident SQL intent — each quirk has a working SQL-form
  * twin elsewhere in the reference file set (SURVEY.md §7.4.1).
  */
object Transforms {

  /** Injectable clock for the future-birthdate repair — the reference uses
    * driver wall-clock `datetime.now()`
    * (silver/erp_cust_az12_silver.py:60-64); tests pin a fixed instant.
    */
  case class Clock(now: Column)
  object Clock {
    val system: Clock = Clock(current_timestamp())
    def fixed(isoDate: String): Clock = Clock(to_timestamp(lit(isoDate)))
  }

  private def normCode(c: Column): Column = upper(trim(c))

  /** crm_cust_info (silver/crm_cust_info_silver.py:55-84): trim names,
    * decode marital/gender codes, dedup keep-latest per cst_id.
    * Note: the reference has no `cst_id IS NOT NULL` filter — null-id rows
    * collapse to one row via the window (SURVEY.md §2.9.1); we keep that
    * behavior but add a deterministic tiebreaker (cst_key) for equal dates.
    */
  def custInfo(df: DataFrame, extraTiebreak: Seq[Column] = Nil): DataFrame = {
    val cleaned = df
      .withColumn("cst_firstname", trim(col("cst_firstname")))
      .withColumn("cst_lastname", trim(col("cst_lastname")))
      .withColumn("cst_marital_status",
        when(normCode(col("cst_marital_status")) === "S", "Single")
          .when(normCode(col("cst_marital_status")) === "M", "Married")
          .otherwise("n/a"))
      .withColumn("cst_gndr",
        when(normCode(col("cst_gndr")) === "F", "Female")
          .when(normCode(col("cst_gndr")) === "M", "Male")
          .otherwise("n/a"))
    Relational.dedupLatest(cleaned, Seq("cst_id"),
        Seq(col("cst_create_date").desc_nulls_last, col("cst_key").desc) ++ extraTiebreak)
      .select("cst_id", "cst_key", "cst_firstname", "cst_lastname",
        "cst_marital_status", "cst_gndr", "cst_create_date")
  }

  /** crm_prd_info (silver/crm_prd_info_silver.py:51-80): split prd_key into
    * category id (chars 1-5, '-'→'_') and product number (chars 7+), default
    * cost 0, decode line codes, cast start to date, recompute SCD-2 end date
    * (source prd_end_dt is dirty — often < start — and is discarded).
    */
  def prdInfo(df: DataFrame): DataFrame = {
    val derived = df
      .withColumn("cat_id", regexp_replace(substring(col("prd_key"), 1, 5), "-", "_"))
      .withColumn("prd_key", expr("substring(prd_key, 7, length(prd_key))"))
      .withColumn("prd_cost", coalesce(col("prd_cost"), lit(0)))
      .withColumn("prd_line",
        when(normCode(col("prd_line")) === "M", "Mountain")
          .when(normCode(col("prd_line")) === "R", "Road")
          .when(normCode(col("prd_line")) === "S", "Other Sales")
          .when(normCode(col("prd_line")) === "T", "Touring")
          .otherwise("n/a"))
      .withColumn("prd_start_dt", col("prd_start_dt").cast("date"))
    Relational.scd2EndDate(derived, Seq("prd_key"), "prd_start_dt", "prd_end_dt",
        tiebreak = Seq(col("prd_id")))
      .select("prd_id", "cat_id", "prd_key", "prd_nm", "prd_cost", "prd_line",
        "prd_start_dt", "prd_end_dt")
  }

  /** Int yyyyMMdd -> DATE, NULL when 0, not 8 digits, or semantically
    * invalid like 20190230 (silver/crm_sales_details_silver.py:49-62) —
    * the reference's non-ANSI Spark returned NULL for invalid dates.
    *
    * One native codegen call per value ([[graft.functions.YyyymmddToDate]]),
    * not a string parse: `try_to_date(cast string)` runs a
    * DateTimeFormatter per value and dominated the three date columns of
    * the sales scan (e3 2.1 s → 1.1 s at sf0.1). A single static call
    * also keeps fused downstream stages (e9's project+joins) under
    * HotSpot's JIT method-size limit — an inlined expression-tree
    * variant of this arithmetic pushed that stage to interpreted
    * bytecode and DOUBLED e9. Byte-for-byte equivalence with the
    * try_to_date form over the full int domain is pinned by
    * TransformsSpec ("repairIntDate arithmetic").
    */
  def repairIntDate(c: Column): Column =
    graft.functions.native.yyyymmddToDate(c)

  /** crm_sales_details (silver/crm_sales_details_silver.py:49-90): repair
    * the three int dates; recompute sls_sales when null/<=0/inconsistent as
    * qty * |price|; then derive sls_price from the ALREADY-REPAIRED sales
    * when null/<=0 (withColumn chains sequentially — order matters).
    */
  def salesDetails(df: DataFrame): DataFrame =
    df.withColumn("sls_order_dt", repairIntDate(col("sls_order_dt")))
      .withColumn("sls_ship_dt", repairIntDate(col("sls_ship_dt")))
      .withColumn("sls_due_dt", repairIntDate(col("sls_due_dt")))
      .withColumn("sls_sales",
        when(col("sls_sales").isNull || col("sls_sales") <= 0 ||
             col("sls_sales") =!= col("sls_quantity") * abs(col("sls_price")),
          col("sls_quantity") * abs(col("sls_price")))
          .otherwise(col("sls_sales")))
      .withColumn("sls_price",
        when(col("sls_price").isNull || col("sls_price") <= 0,
          col("sls_sales") / when(col("sls_quantity") === 0, 1)
            .otherwise(col("sls_quantity")))
          .otherwise(col("sls_price")))
      .select("sls_ord_num", "sls_prd_key", "sls_cust_id", "sls_order_dt",
        "sls_ship_dt", "sls_due_dt", "sls_sales", "sls_quantity", "sls_price")

  /** erp_cust_az12 (silver/erp_cust_az12_silver.py:52-78): strip NAS prefix
    * from cid, null future birthdates (vs the injectable clock), normalize
    * gender spellings.
    */
  def custAz12(df: DataFrame, clock: Clock = Clock.system): DataFrame =
    df.withColumn("cid",
        when(col("cid").like("NAS%"), expr("substring(cid, 4, length(cid))"))
          .otherwise(col("cid")))
      .withColumn("bdate",
        when(col("bdate") > clock.now, lit(null).cast("date"))
          .otherwise(col("bdate")))
      .withColumn("gen",
        when(normCode(col("gen")).isin("F", "FEMALE"), "Female")
          .when(normCode(col("gen")).isin("M", "MALE"), "Male")
          .otherwise("n/a"))
      .select("cid", "bdate", "gen")

  /** erp_loc_a101 (silver/erp_loc_a101_silver.py:50-66): de-hyphenate cid,
    * decode country codes, blank/null -> n/a, else trimmed passthrough.
    */
  def locA101(df: DataFrame): DataFrame =
    df.withColumn("cid", regexp_replace(col("cid"), "-", ""))
      .withColumn("cntry",
        when(trim(col("cntry")) === "DE", "Germany")
          .when(trim(col("cntry")).isin("US", "USA"), "United States")
          .when(trim(col("cntry")) === "" || col("cntry").isNull, "n/a")
          .otherwise(trim(col("cntry"))))
      .select("cid", "cntry")

  /** erp_px_cat_g1v2 (silver/erp_px_cat_g1v2_silver.py:47): pure projection
    * (the reference's `select_fields` quirk, SURVEY.md §2.3 P2).
    */
  def pxCatG1v2(df: DataFrame): DataFrame =
    df.select("id", "cat", "subcat", "maintenance")
}
