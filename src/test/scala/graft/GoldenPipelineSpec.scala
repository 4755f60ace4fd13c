package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Runner
import graft.io.LocalWarehouseSink
import graft.silver.Transforms

/** End-to-end golden test: the full bronze→silver→gold DAG over the
  * reference's own CSV corpus, pinning the row counts and invariants the
  * dirty fixtures encode (SURVEY.md §5.2; counts measured from the files —
  * cust_info has 18,494 data rows: 18,495 lines, header, no trailing
  * newline).
  */
class GoldenPipelineSpec extends SparkSpec {

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft_golden").toString
    val r = new Runner(spark, "/root/reference/datasets", dir,
      new LocalWarehouseSink(s"$dir/warehouse"),
      clock = Transforms.Clock.fixed("2026-01-01"))
    r.runAll()
    (dir, r)
  }

  private def read(t: String) = spark.read.parquet(s"${out._1}/$t")

  test("bronze row counts match the source CSVs") {
    assert(read("bronze/crm_cust_info").count() == 18494)
    assert(read("bronze/crm_prd_info").count() == 397)
    assert(read("bronze/crm_sales_details").count() == 60398)
    assert(read("bronze/erp_cust_az12").count() == 18484)
    assert(read("bronze/erp_loc_a101").count() == 18484)
    assert(read("bronze/erp_px_cat_g1v2").count() == 37)
  }

  test("silver cust_info: dup groups and null-id rows collapse (W1)") {
    val s = read("silver/crm_cust_info")
    assert(s.count() == 18485) // 18494 - 6 (dup groups 11->5) - 3 (4 null ids -> 1)
    assert(s.groupBy("cst_id").count().filter(col("count") > 1).count() == 0)
    val labels = s.select("cst_marital_status").distinct()
      .collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("Single", "Married", "n/a")))
  }

  test("silver sales: all int dates repaired or nulled, totals consistent") {
    val s = read("silver/crm_sales_details")
    assert(s.count() == 60398)
    assert(s.filter(col("sls_order_dt").isNull).count() > 0) // the 19 zero dates
    // repaired invariant: sales == qty * |price| wherever price is non-null
    val bad = s.filter(col("sls_price").isNotNull && col("sls_quantity").isNotNull &&
      col("sls_sales") =!= col("sls_quantity") * abs(col("sls_price")))
    assert(bad.count() == 0)
  }

  test("silver prd_info: SCD-2 end dates are next-start minus one day") {
    val s = read("silver/crm_prd_info")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("prd_key").orderBy("prd_start_dt")
    val check = s.withColumn("next_start", lead("prd_start_dt", 1).over(w))
      .filter(col("next_start").isNotNull)
      .filter(col("prd_end_dt") =!= date_sub(col("next_start"), 1))
    assert(check.count() == 0)
    assert(s.filter(col("prd_end_dt").isNull).count() ==
      s.select("prd_key").distinct().count())
  }

  test("gold dims: dense surrogate keys, decoded label domains") {
    val dc = read("gold/dim_customers")
    assert(dc.count() == 18485)
    val keys = dc.agg(min("customer_key"), max("customer_key"),
      countDistinct("customer_key")).head()
    assert(keys.getLong(0) == 1 && keys.getLong(1) == 18485 && keys.getLong(2) == 18485)
    val genders = dc.select("gender").distinct().collect().map(_.getString(0)).toSet
    assert(genders.subsetOf(Set("Female", "Male", "n/a")))

    val dp = read("gold/dim_products")
    assert(dp.filter(col("product_key").isNull).count() == 0)
    assert(dp.count() == dp.select("product_number").distinct().count())
  }

  test("gold fact: no orphan keys, full fact cardinality preserved") {
    val f = read("gold/fact_sales")
    assert(f.count() == 60398)
    assert(f.filter(col("product_key").isNull || col("customer_key").isNull).count() == 0)
  }

  test("fact_sales is month-partitioned and a month filter prunes the scan") {
    val f = read("gold/fact_sales")
    assert(f.columns.contains("order_month"))
    val filtered = f.filter(col("order_month") === "2013-12")
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("PartitionFilters") && s.contains("order_month"),
      s"no partition filter at the scan:\n${s.take(1500)}")
    val scans = plan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    assert(scans.nonEmpty)
    // pruning proof: the scan touches only the one selected month directory
    val months = f.select("order_month").distinct().count()
    assert(months > 12, s"expected many month partitions, got $months")
    assert(scans.head.selectedPartitions.partitionCount == 1,
      s"expected 1 of $months partitions read, got ${scans.head.selectedPartitions.partitionCount}")
  }

  test("layout maintenance on: identical fact content, pruning survives, files compacted") {
    val dir = java.nio.file.Files.createTempDirectory("graft_golden_layout").toString
    val r = new Runner(spark, new graft.io.CsvBronzeSource("/root/reference/datasets"), dir,
      new LocalWarehouseSink(s"$dir/warehouse"),
      clock = Transforms.Clock.fixed("2026-01-01"),
      layout = Some(Runner.Layout(
        zOrderCols = Seq("customer_key", "product_key"),
        compactTargetBytes = Some(128L * 1024 * 1024))))
    r.runAll()
    val plain = read("gold/fact_sales")
    val laidOut = spark.read.parquet(s"$dir/gold/fact_sales")
    // byte-identical content — layout maintenance must never change rows
    assert(laidOut.count() == 60398)
    assert(laidOut.exceptAll(plain.select(laidOut.columns.map(col): _*)).count() == 0)
    assert(plain.select(laidOut.columns.map(col): _*).exceptAll(laidOut).count() == 0)
    // partition pruning still works on the compacted tree
    val filtered = laidOut.filter(col("order_month") === "2013-12")
    filtered.collect()
    val scans = filtered.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    assert(scans.nonEmpty && scans.head.selectedPartitions.partitionCount == 1,
      s"pruning lost after layout maintenance: ${scans.headOption.map(_.selectedPartitions.partitionCount)}")
    // compaction: at this scale every month fits one target-size file
    val monthDirs = new java.io.File(s"$dir/gold/fact_sales").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("order_month="))
    assert(monthDirs.nonEmpty)
    monthDirs.foreach { m =>
      val files = m.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${m.getName}: ${files.length} files after compaction")
    }
  }

  test("warehouse sink received the three gold tables") {
    assert(read("warehouse/customer_sch/dim_customers").count() == 18485)
    assert(read("warehouse/product_sch/dim_products").count() > 0)
    assert(read("warehouse/sales_sch/fact_sales").count() == 60398)
  }
}
