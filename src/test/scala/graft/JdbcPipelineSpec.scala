package graft

import graft.io.{CsvBronzeSource, JdbcBronzeSource, LocalWarehouseSink}
import graft.model.Schemas
import graft.pipeline.Runner
import graft.silver.Transforms

/** The reference's actual topology is RDS → bronze (S1, reference
  * bronze/crm_cust_info_bronze.py:24-27); the repo's seed data is CSV.
  * This spec runs the SAME bronze→silver→gold DAG from an embedded-Derby
  * JDBC source and asserts the gold layer is row-identical to the
  * CSV-sourced run — proving the source seam changes nothing downstream.
  */
class JdbcPipelineSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftpipe;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
  private val csvRoot = "/root/reference/datasets"
  private val clock = Transforms.Clock.fixed("2026-01-01")

  test("JDBC-sourced pipeline produces gold outputs identical to the CSV run") {
    // seed Derby with the same rows the CSV source reads
    val csvSource = new CsvBronzeSource(csvRoot)
    Schemas.sourceCsv.keys.foreach { name =>
      csvSource.read(spark, name).write.format("jdbc")
        .option("url", url).option("dbtable", name)
        .options(props).mode("overwrite").save()
    }

    val dirJ = java.nio.file.Files.createTempDirectory("graft_jdbc").toString
    val dirC = java.nio.file.Files.createTempDirectory("graft_csv").toString
    new Runner(spark, new JdbcBronzeSource(url, props), dirJ,
      new LocalWarehouseSink(s"$dirJ/warehouse"), clock).runAll()
    new Runner(spark, csvSource, dirC,
      new LocalWarehouseSink(s"$dirC/warehouse"), clock).runAll()

    Seq("dim_customers", "dim_products", "fact_sales").foreach { t =>
      val j = spark.read.parquet(s"$dirJ/gold/$t")
      val c = spark.read.parquet(s"$dirC/gold/$t")
      assert(j.schema == c.schema, s"$t schema drift")
      assert(j.count() == c.count(), s"$t row count")
      assert(j.exceptAll(c).isEmpty && c.exceptAll(j).isEmpty,
        s"$t rows differ between JDBC- and CSV-sourced runs")
    }
  }
}
