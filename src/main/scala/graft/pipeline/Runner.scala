package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Catalog, Sessions, TableEntry, TableFormat}
import graft.io.{Sinks, Sources, LocalWarehouseSink, WarehouseSink}
import graft.model.Schemas
import graft.quality.DataQuality
import graft.silver.Transforms
import graft.gold.Builders

/** The reference's full job DAG as one orchestrated run (SURVEY.md §3):
  * 6 bronze 1:1 ingests → 6 silver cleanses → dim_customers +
  * dim_products → fact_sales, stages communicating only through parquet +
  * catalog (per-stage materialization = reprocessing checkpoints), with
  * the reference's `ColumnCount > 0` DQ gate and duration logging per
  * stage.
  *
  * Engine-level improvement over the reference (documented, output-
  * identical): gold frames are cached between the parquet write and the
  * warehouse write — the reference recomputes the whole join DAG for its
  * second sink (gold-snowflake/dim_customers_gold.py:56-62 then :81).
  */
class Runner(spark: SparkSession, csvRoot: String, outRoot: String,
             warehouse: WarehouseSink, clock: Transforms.Clock = Transforms.Clock.system) {

  val catalog = new Catalog(spark)
  val durations = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  val dqReports = scala.collection.mutable.LinkedHashMap.empty[String, DataQuality.Report]

  private val ruleset = """Rules = [ ColumnCount > 0 ]"""

  private def timed[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    durations(name) = (System.nanoTime() - t0) / 1e9
    r
  }

  private def stage(layer: String, name: String, df: DataFrame): DataFrame = {
    dqReports(s"$layer.$name") = DataQuality.evaluate(df, ruleset) // BEST_EFFORT
    val path = s"$outRoot/$layer/$name"
    Sinks.parquet(df, path, Some(catalog), s"$layer.$name")
    spark.read.parquet(path)
  }

  /** Bronze: 1:1 typed CSV ingest, one table per source file. */
  def runBronze(): Unit = timed("bronze") {
    Schemas.sourceCsv.foreach { case (name, (rel, schema)) =>
      stage("bronze", name, Sources.csv(spark, s"$csvRoot/$rel", schema))
    }
  }

  private def bronze(name: String) = catalog.read(s"bronze.$name")
  private def silver(name: String) = catalog.read(s"silver.$name")

  /** Silver: the six cleansing transforms (SURVEY.md §2.9). */
  def runSilver(): Unit = timed("silver") {
    stage("silver", "crm_cust_info", Transforms.custInfo(bronze("crm_cust_info")))
    stage("silver", "crm_prd_info", Transforms.prdInfo(bronze("crm_prd_info")))
    stage("silver", "crm_sales_details", Transforms.salesDetails(bronze("crm_sales_details")))
    stage("silver", "erp_cust_az12", Transforms.custAz12(bronze("erp_cust_az12"), clock))
    stage("silver", "erp_loc_a101", Transforms.locA101(bronze("erp_loc_a101")))
    stage("silver", "erp_px_cat_g1v2", Transforms.pxCatG1v2(bronze("erp_px_cat_g1v2")))
  }

  /** Gold: star-schema assembly + dual sink (parquet + warehouse). */
  def runGold(): Unit = timed("gold") {
    val dimCustomers = Builders.dimCustomers(
      silver("crm_cust_info"), silver("erp_cust_az12"), silver("erp_loc_a101")).cache()
    stage("gold", "dim_customers", dimCustomers)
    warehouse.write(dimCustomers, "customer_sch.dim_customers")

    val dimProducts = Builders.dimProducts(
      silver("crm_prd_info"), silver("erp_px_cat_g1v2")).cache()
    stage("gold", "dim_products", dimProducts)
    warehouse.write(dimProducts, "product_sch.dim_products")

    val factSales = Builders.factSales(
      silver("crm_sales_details"),
      catalog.read("gold.dim_products"), catalog.read("gold.dim_customers")).cache()
    stage("gold", "fact_sales", factSales)
    warehouse.write(factSales, "sales_sch.fact_sales")

    dimCustomers.unpersist(); dimProducts.unpersist(); factSales.unpersist()
  }

  def runAll(): Unit = { runBronze(); runSilver(); runGold() }
}

object Runner {
  /** CLI: <csvRoot> <outRoot> — runs the whole DAG against the bundled
    * reference CSVs and prints per-stage durations + DQ results.
    */
  def main(args: Array[String]): Unit = {
    val csvRoot = if (args.length > 0) args(0) else "/root/reference/datasets"
    val outRoot = if (args.length > 1) args(1) else "/tmp/graft_lake"
    val spark = Sessions.local()
    val r = new Runner(spark, csvRoot, outRoot, new LocalWarehouseSink(s"$outRoot/warehouse"))
    r.runAll()
    r.durations.foreach { case (k, v) => println(f"[pipeline] $k%-8s ${v}%8.2f s") }
    r.dqReports.foreach { case (k, rep) =>
      println(s"[dq] $k: ${if (rep.allPassed) "PASS" else "FAIL"} ${rep.results.mkString("; ")}")
    }
    spark.stop()
  }
}
