package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Readers for the source formats the reference ingests.
  *
  * The reference reads crawled RDS tables via the Glue catalog
  * (reference Glue-spark/scripts/bronze/crm_cust_info_bronze.py:24-27) and
  * bronze/silver parquet via the same catalog
  * (silver/crm_cust_info_silver.py:44-47). The in-repo authoritative data is
  * the 6 CSVs seeded by AWS-RDS/CRM-MySQL/crm_data_load.sql:1-20 — so CSV
  * ingest (explicit schema, header, CRLF-tolerant) is our primary source,
  * with a JDBC source that is option-compatible with the crawler-backed
  * original.
  */
object Sources {

  /** CSV with explicit schema. Spark's line reader already normalizes CRLF;
    * `mode=PERMISSIVE` keeps malformed rows as nulls (matches DB-loader
    * leniency). Never `inferSchema` — at 100 TB that is a full extra scan.
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** Self-describing parquet scan. Filters/projections on the result are
    * pushed into the scan by Catalyst (verify with
    * `.explain`: PushedFilters / ReadSchema).
    */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JDBC source, option-compatible with the reference's crawler-backed RDS
    * reads (bronze/crm_cust_info_bronze.py:24-27). `partitionColumn`/
    * `numPartitions` enable parallel reads — the crawler's
    * single-connection read is a scale bottleneck we do not copy.
    */
  def jdbc(spark: SparkSession, url: String, dbtable: String,
           props: Map[String, String] = Map.empty,
           partitionColumn: Option[String] = None,
           lowerBound: Option[Long] = None, upperBound: Option[Long] = None,
           numPartitions: Int = 8): DataFrame = {
    var r = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    props.foreach { case (k, v) => r = r.option(k, v) }
    partitionColumn.foreach { pc =>
      r = r.option("partitionColumn", pc)
        .option("lowerBound", lowerBound.getOrElse(0L).toString)
        .option("upperBound", upperBound.getOrElse(1L).toString)
        .option("numPartitions", numPartitions.toString)
    }
    r.load()
  }
}

/** Pluggable bronze ingest: the pipeline Runner reads each source table
  * through this seam, so the same bronze→silver→gold DAG runs off CSV
  * files or a live RDS-style database (the reference's actual topology)
  * without any stage changing.
  */
trait BronzeSource {
  /** Schema-typed frame for a bronze table name from
    * [[graft.model.Schemas.sourceCsv]].
    */
  def read(spark: SparkSession, name: String): DataFrame
}

/** CSV-backed bronze (the repo's authoritative seed data). */
class CsvBronzeSource(csvRoot: String) extends BronzeSource {
  def read(spark: SparkSession, name: String): DataFrame = {
    val (rel, schema) = graft.model.Schemas.sourceCsv(name)
    Sources.csv(spark, s"$csvRoot/$rel", schema)
  }
}

/** JDBC-backed bronze (the reference's RDS topology). Database catalogs
  * fold unquoted identifiers (Derby/Oracle upper, Postgres lower), so
  * columns are matched case-insensitively and cast back to the declared
  * ingest schema — downstream silver transforms see identical frames
  * regardless of source.
  */
class JdbcBronzeSource(url: String, props: Map[String, String] = Map.empty,
                       tableFor: String => String = identity) extends BronzeSource {
  def read(spark: SparkSession, name: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (_, schema) = graft.model.Schemas.sourceCsv(name)
    val raw = Sources.jdbc(spark, url, tableFor(name), props)
    raw.select(schema.fields.toSeq.map { f =>
      val actual = raw.columns.find(_.equalsIgnoreCase(f.name)).getOrElse(f.name)
      // empty metadata: the JDBC reader tags fields with connector details
      // (jdbcClientType etc.) that must not leak into bronze parquet schemas
      col(actual).cast(f.dataType).as(f.name, org.apache.spark.sql.types.Metadata.empty)
    }: _*)
  }
}
