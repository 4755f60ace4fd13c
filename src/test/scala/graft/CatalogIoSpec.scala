package graft

import org.apache.spark.sql.functions._
import graft.core.{Catalog, TableEntry, TableFormat}
import graft.io.{Sinks, Sources, MapCredentials, LocalWarehouseSink}
import graft.model.Schemas

class CatalogIoSpec extends SparkSpec {

  test("catalog round-trip: sink registers, read resolves") {
    val cat = new Catalog(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_cat").toString
    val df = spark.read.parquet(s"$sf001/region.parquet")
    Sinks.parquet(df, s"$dir/region", Some(cat), "bronze.region")
    assert(cat.contains("bronze.region"))
    assert(cat.read("bronze.region").count() == df.count())
    assertThrows[NoSuchElementException](cat.read("nope"))
  }

  test("partitioned sink writes hive-style directories for pruning") {
    val cat = new Catalog(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = spark.read.parquet(s"$sf001/nation.parquet")
    Sinks.parquet(df, s"$dir/nation", Some(cat), "nation_p", partitionBy = Seq("n_regionkey"))
    val parts = new java.io.File(s"$dir/nation").listFiles().map(_.getName)
      .filter(_.startsWith("n_regionkey="))
    assert(parts.length == 5)
    // partition filter prunes: only one directory is scanned
    val pruned = spark.read.parquet(s"$dir/nation").filter(col("n_regionkey") === 2)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(scan.contains("PartitionFilters: [isnotnull(n_regionkey"), scan)
  }

  test("h6 layout: two real footer schemas on disk; merged read null-fills exactly the legacy rows") {
    val path = graft.queries.IoQueries.evolvedDocs(spark, sf001)
    // the directory must genuinely hold BOTH generations' footers —
    // a 4-column legacy schema and the 5-column current one — or the
    // query proves nothing about schema merging
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    val widths = files.map(f => spark.read.parquet(f.getAbsolutePath).schema.size).toSet
    assert(widths == Set(4, 5), s"expected 4- and 5-column footers, got $widths")
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.schema.fieldNames.contains("n_chars"))
    val docs = graft.queries.Tables.documents(spark, sf001)
    val legacy = docs.filter(col("doc_id") % 4 === 0).count()
    assert(merged.filter(col("n_chars").isNull).count() == legacy,
      "null n_chars rows must be exactly the legacy generation")
    assert(merged.count() == docs.count(), "no rows lost across generations")
  }

  test("CSV source: explicit schema, header, CRLF-safe on the reference corpus") {
    val df = Sources.csv(spark, "/root/reference/datasets/erp/LOC_A101.csv",
      Schemas.erpLocA101)
    assert(df.schema == Schemas.erpLocA101)
    assert(df.count() == 18484)
    // CRLF must not leak into the last column
    assert(df.filter(col("cntry").contains("\r")).count() == 0)
  }

  test("snowflake sink fails fast without the connector, with a clear error") {
    val sink = new graft.io.SnowflakeSink(Map("sfURL" -> "x"))
    val e = intercept[Exception] {
      sink.write(spark.read.parquet(s"$sf001/region.parquet"), "sch.t")
    }
    assert(e.getMessage.toLowerCase.contains("snowflake"))
  }

  test("credentials + local warehouse sink") {
    val creds = MapCredentials(Map("user" -> "u"))
    assert(creds.get("user").contains("u") && creds.get("nope").isEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_whs").toString
    val sink = new LocalWarehouseSink(dir)
    sink.write(spark.read.parquet(s"$sf001/region.parquet"), "sch.regions")
    assert(spark.read.parquet(s"$dir/sch/regions").count() == 5)
  }
}
