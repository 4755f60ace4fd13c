package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the reference's 7 source tables, transcribed from
  * the authoritative DDL (reference AWS-RDS/CRM-MySQL/crmdb_tables.sql:7-51,
  * AWS-RDS/ERP-Postgres/erpdb_tables.sql:4-26). Deterministic, testable —
  * production ingest never infers schema (crawler inference in the
  * reference; an extra full scan at 100 TB for us).
  */
object Schemas {

  // CRM (MySQL) — crmdb_tables.sql:7-15
  val crmCustInfo: StructType = StructType(Seq(
    StructField("cst_id", IntegerType),
    StructField("cst_key", StringType),
    StructField("cst_firstname", StringType),
    StructField("cst_lastname", StringType),
    StructField("cst_marital_status", StringType),
    StructField("cst_gndr", StringType),
    StructField("cst_create_date", DateType)
  ))

  // crmdb_tables.sql:24-32
  val crmPrdInfo: StructType = StructType(Seq(
    StructField("prd_id", IntegerType),
    StructField("prd_key", StringType),
    StructField("prd_nm", StringType),
    StructField("prd_cost", IntegerType),
    StructField("prd_line", StringType),
    StructField("prd_start_dt", TimestampType),
    StructField("prd_end_dt", TimestampType)
  ))

  // crmdb_tables.sql:41-51 — dates deliberately stored as INT yyyyMMdd,
  // repaired in silver.
  val crmSalesDetails: StructType = StructType(Seq(
    StructField("sls_ord_num", StringType),
    StructField("sls_prd_key", StringType),
    StructField("sls_cust_id", IntegerType),
    StructField("sls_order_dt", IntegerType),
    StructField("sls_ship_dt", IntegerType),
    StructField("sls_due_dt", IntegerType),
    StructField("sls_sales", IntegerType),
    StructField("sls_quantity", IntegerType),
    StructField("sls_price", IntegerType)
  ))

  // ERP (Postgres) — erpdb_tables.sql:4-7
  val erpLocA101: StructType = StructType(Seq(
    StructField("cid", StringType),
    StructField("cntry", StringType)
  ))

  // erpdb_tables.sql:12-16
  val erpCustAz12: StructType = StructType(Seq(
    StructField("cid", StringType),
    StructField("bdate", DateType),
    StructField("gen", StringType)
  ))

  // erpdb_tables.sql:21-26
  val erpPxCatG1v2: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("cat", StringType),
    StructField("subcat", StringType),
    StructField("maintenance", StringType)
  ))

  /** name -> (csv relative path under the datasets root, schema) */
  val sourceCsv: Map[String, (String, StructType)] = Map(
    "crm_cust_info"     -> ("crm/cust_info.csv", crmCustInfo),
    "crm_prd_info"      -> ("crm/prd_info.csv", crmPrdInfo),
    "crm_sales_details" -> ("crm/sales_details.csv", crmSalesDetails),
    "erp_cust_az12"     -> ("erp/CUST_AZ12.csv", erpCustAz12),
    "erp_loc_a101"      -> ("erp/LOC_A101.csv", erpLocA101),
    "erp_px_cat_g1v2"   -> ("erp/PX_CAT_G1V2.csv", erpPxCatG1v2)
  )
}

// Gold layer typed rows (reference gold-snowflake/dim_customers_gold.py:39-52,
// dim_products_gold.py:36-51, fact_sales_gold.py:47-57) — used by tests for
// compile-time schema checks.
case class DimCustomer(
    customer_key: Long, customer_id: Option[Int], customer_number: String,
    first_name: String, last_name: String, country: String,
    marital_status: String, gender: String,
    birthdate: Option[java.sql.Date], create_date: Option[java.sql.Date])

case class DimProduct(
    product_key: Long, product_id: Int, product_number: String,
    product_name: String, category_id: String, category: String,
    subcategory: String, maintenance: String, cost: Int,
    product_line: String, start_date: Option[java.sql.Date])

case class FactSale(
    order_number: String, product_key: Option[Long], customer_key: Option[Long],
    order_date: Option[java.sql.Date], shipping_date: Option[java.sql.Date],
    due_date: Option[java.sql.Date], sales_amount: Option[Int],
    quantity: Option[Int], price: Option[Int])
