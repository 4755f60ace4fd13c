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

  /** JSONL ingest with CORRUPT-RECORD QUARANTINE — the ingest half of the
    * DQ story ([[graft.quality.DataQuality.quarantine]] handles rows that
    * PARSE but violate rules; this handles lines that don't parse at
    * all). PERMISSIVE mode routes each malformed line's raw text into
    * `_corrupt_record` instead of killing the job (FAILFAST) or silently
    * dropping data (DROPMALFORMED — the mode that turns a bad producer
    * deploy into unexplained row-count drift). Returns (clean rows in the
    * declared schema, quarantined raw lines) over ONE lineage — a caller
    * writing both sinks pays one scan each, and the quarantine file is
    * the replayable evidence for the producer team. Explicit schema
    * always: inference is a second full scan at 100 TB, and a schema
    * drifted by inference IS corruption this seam is meant to catch.
    */
  def jsonlWithQuarantine(spark: SparkSession, path: String,
                          schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, from_json}
    // NOT the json file source: its corrupt-record column is load-bearing
    // for the parse, so Spark REJECTS any consumer whose pruned schema
    // touches only that column (SPARK-21610 / QUERY_ONLY_CORRUPT_RECORD_
    // COLUMN — even `.count()` on the quarantine branch trips it, and an
    // operator cannot dictate its consumers' projections). The text
    // source + from_json computes the identical PERMISSIVE parse as a
    // plain expression with no such restriction: lines are the unit of
    // parallelism (splittable, explicit schema, one scan), and the raw
    // line is carried as a normal column.
    val corrupt = "_corrupt_record"
    // the parse appends this column to the declared schema; a caller
    // whose schema already claims the name would get its field silently
    // shadowed by the parser's corrupt-line channel — fail loudly
    require(!schema.fieldNames.contains(corrupt),
      s"jsonlWithQuarantine: declared schema must not contain '$corrupt' " +
        "(reserved for the PERMISSIVE parser's corrupt-line channel)")
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(corrupt,
        org.apache.spark.sql.types.StringType, nullable = true))
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"), withCorrupt,
        new java.util.HashMap[String, String](java.util.Map.of(
          "mode", "PERMISSIVE", "columnNameOfCorruptRecord", corrupt))).as("__j"))
    val dataCols = schema.fields.toSeq.map(f => col(s"__j.${f.name}"))
    // clean rows in the declared schema; quarantine keeps the raw line
    // PLUS the partially-parsed fields (a type-mismatch line parses
    // partially — seeing which fields survived is the triage signal).
    // A NULL parse STRUCT (blank/whitespace line, a literal `null`
    // line) is quarantined too: from_json reports those as null rather
    // than via the corrupt column, and letting them through would add
    // phantom all-null rows to the clean frame — silent drop by another
    // name, which this seam exists to prevent.
    val clean = col("__j").isNotNull && col(s"__j.$corrupt").isNull
    (parsed.filter(clean).select(dataCols: _*),
     parsed.filter(!clean)
       .select((col("value").as("raw_line") +: dataCols): _*))
  }

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
