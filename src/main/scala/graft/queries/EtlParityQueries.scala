package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.silver.Transforms
import graft.gold.Builders

/** Reference-parity queries: the full CRM/ERP medallion pipeline
  * (SURVEY.md §2.9 silver transforms + §2.4/§2.7 gold builders) exercised
  * through the REAL library code on CRM/ERP-shaped inputs derived
  * deterministically from the testdata tables — so the DuckDB oracle can
  * re-derive the identical input from the same parquet and replay the
  * transform in SQL. (The reference's own CSVs are covered separately by
  * the golden ScalaTest specs; the verify gate only sees sfDir tables.)
  *
  * Derivation rules are deliberately dirty in the same ways the reference
  * corpus is (FIXTURES.md): untrimmed names, mixed-case single-letter
  *  codes, zero/short/null int dates, null/negative prices, inconsistent
  * sales, NAS-prefixed and hyphenated ids, future birthdates.
  */
object EtlParityQueries {

  // fixed clock for the future-birthdate rule (reference uses driver
  // wall-clock, silver/erp_cust_az12_silver.py:60-64 — nondeterministic;
  // we pin it and the oracle pins the same instant)
  private val clock = Transforms.Clock.fixed("2026-01-01")

  // ---- Spark-side source derivations (dialect: Spark SQL) ----

  private def srcCustInfo(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).selectExpr(
      "o_custkey AS cst_id",
      "'AW' || CAST(o_custkey AS STRING) AS cst_key",
      "'  ' || o_orderstatus || ' ' AS cst_firstname",
      "o_orderpriority || '  ' AS cst_lastname",
      "CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'S' WHEN 1 THEN 'm ' ELSE '' END AS cst_marital_status",
      "CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'F' WHEN 1 THEN ' m' WHEN 2 THEN 'f ' ELSE '' END AS cst_gndr",
      "CAST(o_orderdate AS DATE) AS cst_create_date")

  private def srcPrdInfo(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .crossJoin(s.range(2).toDF("v"))
      .selectExpr(
        "p_partkey * 10 + v AS prd_id",
        "CASE CAST(p_partkey % 3 AS INT) WHEN 0 THEN 'AC-HE' WHEN 1 THEN 'BI-RD' ELSE 'CL-SO' END" +
          " || '-PR-' || CAST(p_partkey AS STRING) AS prd_key",
        "p_name AS prd_nm",
        "CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_size END AS prd_cost",
        "CASE CAST(p_partkey % 5 AS INT) WHEN 0 THEN 'M' WHEN 1 THEN ' r' WHEN 2 THEN 'S ' WHEN 3 THEN 't' ELSE '' END AS prd_line",
        "CAST(date_add(DATE '2019-01-01', CAST((p_partkey % 50) * 7 + v * 400 AS INT)) AS TIMESTAMP) AS prd_start_dt")

  private def srcSales(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).selectExpr(
      "l_orderkey AS lok",
      "'SO' || CAST(l_orderkey AS STRING) AS sls_ord_num",
      "'PR-' || CAST(l_partkey AS STRING) AS sls_prd_key",
      "CAST(l_orderkey % 997 AS INT) AS sls_cust_id",
      "CASE WHEN l_orderkey % 97 = 0 THEN 0 WHEN l_orderkey % 89 = 0 THEN 1234567" +
        " ELSE CAST(date_format(l_shipdate, 'yyyyMMdd') AS INT) END AS sls_order_dt",
      "CAST(date_format(date_add(CAST(l_shipdate AS DATE), 3), 'yyyyMMdd') AS INT) AS sls_ship_dt",
      "CAST(date_format(date_add(CAST(l_shipdate AS DATE), 10), 'yyyyMMdd') AS INT) AS sls_due_dt",
      "CAST(floor(l_quantity) AS INT) AS sls_quantity",
      "CASE WHEN l_orderkey % 13 = 0 THEN NULL WHEN l_orderkey % 17 = 0 THEN CAST(-5 AS INT)" +
        " ELSE CAST(floor(l_extendedprice / 100.0) AS INT) END AS sls_price")
    .selectExpr("*",
      "CASE WHEN lok % 11 = 0 THEN NULL WHEN lok % 19 = 0 THEN CAST(0 AS INT)" +
        " WHEN lok % 23 = 0 THEN sls_quantity * abs(sls_price) - 7" +
        " ELSE sls_quantity * abs(sls_price) END AS sls_sales")
    .drop("lok")
    .select("sls_ord_num", "sls_prd_key", "sls_cust_id", "sls_order_dt",
      "sls_ship_dt", "sls_due_dt", "sls_sales", "sls_quantity", "sls_price")

  private def srcCustAz12(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).selectExpr(
      "CASE WHEN c_custkey % 2 = 0 THEN 'NAS' ELSE '' END || 'AW' || CAST(c_custkey AS STRING) AS cid",
      "date_add(DATE '1910-01-01', CAST((c_custkey * 89) % 43000 AS INT)) AS bdate",
      "CASE CAST(c_custkey % 6 AS INT) WHEN 0 THEN 'F' WHEN 1 THEN 'FEMALE' WHEN 2 THEN ' male '" +
        " WHEN 3 THEN 'M' WHEN 4 THEN '' ELSE NULL END AS gen")

  private def srcLocA101(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).selectExpr(
      "'AW-' || CAST(c_custkey AS STRING) AS cid",
      "CASE CAST(c_custkey % 7 AS INT) WHEN 0 THEN 'DE' WHEN 1 THEN 'US' WHEN 2 THEN 'USA'" +
        " WHEN 3 THEN 'Germany' WHEN 4 THEN '  Australia ' WHEN 5 THEN '' ELSE NULL END AS cntry")

  private def srcPxCat(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).selectExpr(
      "CASE CAST(r_regionkey AS INT) WHEN 0 THEN 'AC_HE' WHEN 1 THEN 'BI_RD' WHEN 2 THEN 'CL_SO'" +
        " WHEN 3 THEN 'XX_01' ELSE 'XX_02' END AS id",
      "r_name AS cat",
      "'Sub ' || r_name AS subcat",
      "CASE WHEN r_regionkey % 2 = 0 THEN 'Yes' ELSE 'No' END AS maintenance")

  // full dedup tiebreak so the kept row is deterministic even when a
  // customer has two orders on the same date (reference leaves this
  // nondeterministic, SURVEY.md §7.4.2)
  private val custTiebreak = Seq(
    col("cst_firstname").desc_nulls_last, col("cst_lastname").desc_nulls_last,
    col("cst_marital_status").desc_nulls_last, col("cst_gndr").desc_nulls_last)

  private def silverCust(s: SparkSession, d: String) = Transforms.custInfo(srcCustInfo(s, d), custTiebreak)
  private def silverPrd(s: SparkSession, d: String) = Transforms.prdInfo(srcPrdInfo(s, d))
  private def silverSales(s: SparkSession, d: String) = Transforms.salesDetails(srcSales(s, d))
  private def silverAz(s: SparkSession, d: String) = Transforms.custAz12(srcCustAz12(s, d), clock)
  private def silverLoc(s: SparkSession, d: String) = Transforms.locA101(srcLocA101(s, d))
  private def silverPx(s: SparkSession, d: String) = Transforms.pxCatG1v2(srcPxCat(s, d))

  private def dimCustomers(s: SparkSession, d: String) =
    Builders.dimCustomers(silverCust(s, d), silverAz(s, d), silverLoc(s, d))
  private def dimProducts(s: SparkSession, d: String) =
    Builders.dimProducts(silverPrd(s, d), silverPx(s, d))

  // ---- Oracle-side derivations + transforms (dialect: DuckDB) ----
  // One shared WITH block; unused CTEs in a given query are pruned by
  // DuckDB's optimizer.

  private val cte = """
WITH cust_src AS (
  SELECT o_custkey AS cst_id,
         'AW' || CAST(o_custkey AS VARCHAR) AS cst_key,
         '  ' || o_orderstatus || ' ' AS cst_firstname,
         o_orderpriority || '  ' AS cst_lastname,
         CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'S' WHEN 1 THEN 'm ' ELSE '' END AS cst_marital_status,
         CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'F' WHEN 1 THEN ' m' WHEN 2 THEN 'f ' ELSE '' END AS cst_gndr,
         CAST(o_orderdate AS DATE) AS cst_create_date
  FROM orders),
cust_clean AS (
  SELECT cst_id, cst_key, trim(cst_firstname) AS cst_firstname, trim(cst_lastname) AS cst_lastname,
         CASE WHEN upper(trim(cst_marital_status)) = 'S' THEN 'Single'
              WHEN upper(trim(cst_marital_status)) = 'M' THEN 'Married' ELSE 'n/a' END AS cst_marital_status,
         CASE WHEN upper(trim(cst_gndr)) = 'F' THEN 'Female'
              WHEN upper(trim(cst_gndr)) = 'M' THEN 'Male' ELSE 'n/a' END AS cst_gndr,
         cst_create_date
  FROM cust_src),
cust_silver AS (
  SELECT cst_id, cst_key, cst_firstname, cst_lastname, cst_marital_status, cst_gndr, cst_create_date
  FROM (SELECT *, row_number() OVER (PARTITION BY cst_id
          ORDER BY cst_create_date DESC NULLS LAST, cst_key DESC NULLS LAST,
                   cst_firstname DESC NULLS LAST, cst_lastname DESC NULLS LAST,
                   cst_marital_status DESC NULLS LAST, cst_gndr DESC NULLS LAST) AS rn
        FROM cust_clean) t
  WHERE rn = 1),
prd_src AS (
  SELECT p_partkey * 10 + v.v AS prd_id,
         CASE CAST(p_partkey % 3 AS INT) WHEN 0 THEN 'AC-HE' WHEN 1 THEN 'BI-RD' ELSE 'CL-SO' END
           || '-PR-' || CAST(p_partkey AS VARCHAR) AS prd_key,
         p_name AS prd_nm,
         CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_size END AS prd_cost,
         CASE CAST(p_partkey % 5 AS INT) WHEN 0 THEN 'M' WHEN 1 THEN ' r' WHEN 2 THEN 'S ' WHEN 3 THEN 't' ELSE '' END AS prd_line,
         CAST(DATE '2019-01-01' + CAST((p_partkey % 50) * 7 + v.v * 400 AS INT) AS TIMESTAMP) AS prd_start_dt
  FROM part CROSS JOIN (SELECT 0 AS v UNION ALL SELECT 1) v),
prd_clean AS (
  SELECT prd_id,
         replace(substring(prd_key, 1, 5), '-', '_') AS cat_id,
         substring(prd_key, 7, length(prd_key)) AS prd_key,
         prd_nm,
         coalesce(prd_cost, 0) AS prd_cost,
         CASE WHEN upper(trim(prd_line)) = 'M' THEN 'Mountain'
              WHEN upper(trim(prd_line)) = 'R' THEN 'Road'
              WHEN upper(trim(prd_line)) = 'S' THEN 'Other Sales'
              WHEN upper(trim(prd_line)) = 'T' THEN 'Touring' ELSE 'n/a' END AS prd_line,
         CAST(prd_start_dt AS DATE) AS prd_start_dt
  FROM prd_src),
prd_silver AS (
  SELECT prd_id, cat_id, prd_key, prd_nm, prd_cost, prd_line, prd_start_dt,
         lead(prd_start_dt) OVER (PARTITION BY prd_key ORDER BY prd_start_dt, prd_id) - 1 AS prd_end_dt
  FROM prd_clean),
sales_src0 AS (
  SELECT l_orderkey AS lok,
         'SO' || CAST(l_orderkey AS VARCHAR) AS sls_ord_num,
         'PR-' || CAST(l_partkey AS VARCHAR) AS sls_prd_key,
         CAST(l_orderkey % 997 AS INT) AS sls_cust_id,
         CASE WHEN l_orderkey % 97 = 0 THEN 0 WHEN l_orderkey % 89 = 0 THEN 1234567
              ELSE CAST(strftime(l_shipdate, '%Y%m%d') AS INT) END AS sls_order_dt,
         CAST(strftime(CAST(l_shipdate AS DATE) + 3, '%Y%m%d') AS INT) AS sls_ship_dt,
         CAST(strftime(CAST(l_shipdate AS DATE) + 10, '%Y%m%d') AS INT) AS sls_due_dt,
         CAST(floor(l_quantity) AS INT) AS sls_quantity,
         CASE WHEN l_orderkey % 13 = 0 THEN NULL WHEN l_orderkey % 17 = 0 THEN CAST(-5 AS INT)
              ELSE CAST(floor(l_extendedprice / 100.0) AS INT) END AS sls_price
  FROM lineitem),
sales_src AS (
  SELECT sls_ord_num, sls_prd_key, sls_cust_id, sls_order_dt, sls_ship_dt, sls_due_dt,
         CAST(CASE WHEN lok % 11 = 0 THEN NULL WHEN lok % 19 = 0 THEN 0
              WHEN lok % 23 = 0 THEN sls_quantity * abs(sls_price) - 7
              ELSE sls_quantity * abs(sls_price) END AS INT) AS sls_sales,
         sls_quantity, sls_price
  FROM sales_src0),
sales_fix1 AS (
  SELECT sls_ord_num, sls_prd_key, sls_cust_id,
         CASE WHEN sls_order_dt = 0 OR length(CAST(sls_order_dt AS VARCHAR)) != 8 THEN NULL
              ELSE CAST(try_strptime(CAST(sls_order_dt AS VARCHAR), '%Y%m%d') AS DATE) END AS sls_order_dt,
         CASE WHEN sls_ship_dt = 0 OR length(CAST(sls_ship_dt AS VARCHAR)) != 8 THEN NULL
              ELSE CAST(try_strptime(CAST(sls_ship_dt AS VARCHAR), '%Y%m%d') AS DATE) END AS sls_ship_dt,
         CASE WHEN sls_due_dt = 0 OR length(CAST(sls_due_dt AS VARCHAR)) != 8 THEN NULL
              ELSE CAST(try_strptime(CAST(sls_due_dt AS VARCHAR), '%Y%m%d') AS DATE) END AS sls_due_dt,
         CAST(CASE WHEN sls_sales IS NULL OR sls_sales <= 0
                     OR sls_sales != sls_quantity * abs(sls_price)
              THEN sls_quantity * abs(sls_price) ELSE sls_sales END AS INT) AS sls_sales,
         sls_quantity, sls_price
  FROM sales_src),
sales_silver AS (
  SELECT sls_ord_num, sls_prd_key, sls_cust_id, sls_order_dt, sls_ship_dt, sls_due_dt, sls_sales,
         sls_quantity,
         CASE WHEN sls_price IS NULL OR sls_price <= 0
              THEN sls_sales / (CASE WHEN sls_quantity = 0 THEN 1 ELSE sls_quantity END)
              ELSE sls_price END AS sls_price
  FROM sales_fix1),
az_src AS (
  SELECT CASE WHEN c_custkey % 2 = 0 THEN 'NAS' ELSE '' END || 'AW' || CAST(c_custkey AS VARCHAR) AS cid,
         DATE '1910-01-01' + CAST((c_custkey * 89) % 43000 AS INT) AS bdate,
         CASE CAST(c_custkey % 6 AS INT) WHEN 0 THEN 'F' WHEN 1 THEN 'FEMALE' WHEN 2 THEN ' male '
              WHEN 3 THEN 'M' WHEN 4 THEN '' ELSE NULL END AS gen
  FROM customer),
az_silver AS (
  SELECT CASE WHEN cid LIKE 'NAS%' THEN substring(cid, 4, length(cid)) ELSE cid END AS cid,
         CASE WHEN bdate > TIMESTAMP '2026-01-01 00:00:00' THEN NULL ELSE bdate END AS bdate,
         CASE WHEN upper(trim(gen)) IN ('F', 'FEMALE') THEN 'Female'
              WHEN upper(trim(gen)) IN ('M', 'MALE') THEN 'Male' ELSE 'n/a' END AS gen
  FROM az_src),
loc_src AS (
  SELECT 'AW-' || CAST(c_custkey AS VARCHAR) AS cid,
         CASE CAST(c_custkey % 7 AS INT) WHEN 0 THEN 'DE' WHEN 1 THEN 'US' WHEN 2 THEN 'USA'
              WHEN 3 THEN 'Germany' WHEN 4 THEN '  Australia ' WHEN 5 THEN '' ELSE NULL END AS cntry
  FROM customer),
loc_silver AS (
  SELECT replace(cid, '-', '') AS cid,
         CASE WHEN trim(cntry) = 'DE' THEN 'Germany'
              WHEN trim(cntry) IN ('US', 'USA') THEN 'United States'
              WHEN trim(cntry) = '' OR cntry IS NULL THEN 'n/a'
              ELSE trim(cntry) END AS cntry
  FROM loc_src),
px_src AS (
  SELECT CASE CAST(r_regionkey AS INT) WHEN 0 THEN 'AC_HE' WHEN 1 THEN 'BI_RD' WHEN 2 THEN 'CL_SO'
              WHEN 3 THEN 'XX_01' ELSE 'XX_02' END AS id,
         r_name AS cat,
         'Sub ' || r_name AS subcat,
         CASE WHEN r_regionkey % 2 = 0 THEN 'Yes' ELSE 'No' END AS maintenance
  FROM region),
dim_customers AS (
  SELECT row_number() OVER (ORDER BY ci.cst_id ASC NULLS FIRST, ci.cst_key ASC) AS customer_key,
         ci.cst_id AS customer_id, ci.cst_key AS customer_number,
         ci.cst_firstname AS first_name, ci.cst_lastname AS last_name,
         la.cntry AS country, ci.cst_marital_status AS marital_status,
         CASE WHEN ci.cst_gndr != 'n/a' THEN ci.cst_gndr ELSE coalesce(ca.gen, 'n/a') END AS gender,
         ca.bdate AS birthdate, ci.cst_create_date AS create_date
  FROM cust_silver ci
  LEFT JOIN az_silver ca ON ci.cst_key = ca.cid
  LEFT JOIN loc_silver la ON ci.cst_key = la.cid),
dim_products AS (
  SELECT row_number() OVER (ORDER BY pn.prd_start_dt ASC NULLS FIRST, pn.prd_key ASC) AS product_key,
         pn.prd_id AS product_id, pn.prd_key AS product_number, pn.prd_nm AS product_name,
         pn.cat_id AS category_id, pc.cat AS category, pc.subcat AS subcategory,
         pc.maintenance AS maintenance, pn.prd_cost AS cost, pn.prd_line AS product_line,
         pn.prd_start_dt AS start_date
  FROM prd_silver pn LEFT JOIN px_src pc ON pn.cat_id = pc.id
  WHERE pn.prd_end_dt IS NULL)
"""

  val all: Seq[Q] = Seq(
    Q("e1_silver_cust_info",
      (s, d) => silverCust(s, d),
      Some(cte + "SELECT * FROM cust_silver ORDER BY cst_id")),

    Q("e2_silver_prd_info",
      (s, d) => silverPrd(s, d),
      Some(cte + """SELECT prd_id, cat_id, prd_key, prd_nm, prd_cost, prd_line, prd_start_dt, prd_end_dt
        FROM prd_silver ORDER BY prd_id""")),

    Q("e3_silver_sales_details",
      (s, d) => silverSales(s, d),
      Some(cte + "SELECT * FROM sales_silver ORDER BY sls_ord_num, sls_prd_key, sls_quantity")),

    Q("e4_silver_cust_az12",
      (s, d) => silverAz(s, d),
      Some(cte + "SELECT * FROM az_silver ORDER BY cid")),

    Q("e5_silver_loc_a101",
      (s, d) => silverLoc(s, d),
      Some(cte + "SELECT * FROM loc_silver ORDER BY cid")),

    Q("e6_silver_px_cat",
      (s, d) => silverPx(s, d),
      Some(cte + "SELECT * FROM px_src ORDER BY id")),

    Q("e7_dim_customers",
      (s, d) => dimCustomers(s, d),
      Some(cte + "SELECT * FROM dim_customers ORDER BY customer_key")),

    Q("e8_dim_products",
      (s, d) => dimProducts(s, d),
      Some(cte + "SELECT * FROM dim_products ORDER BY product_key")),

    Q("e9_fact_sales",
      (s, d) => Builders.factSales(silverSales(s, d), dimProducts(s, d), dimCustomers(s, d)),
      Some(cte + """
        SELECT sd.sls_ord_num AS order_number, pr.product_key, cu.customer_key,
               sd.sls_order_dt AS order_date, sd.sls_ship_dt AS shipping_date,
               sd.sls_due_dt AS due_date, sd.sls_sales AS sales_amount,
               sd.sls_quantity AS quantity, sd.sls_price AS price
        FROM sales_silver sd
        LEFT JOIN dim_products pr ON sd.sls_prd_key = pr.product_number
        LEFT JOIN dim_customers cu ON sd.sls_cust_id = cu.customer_id
        ORDER BY order_number, product_key, quantity, sales_amount"""))
  )
}
