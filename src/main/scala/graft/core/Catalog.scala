package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.collection.concurrent.TrieMap

/** Format of a registered table. */
sealed trait TableFormat
object TableFormat {
  case object Parquet extends TableFormat
  case class Csv(header: Boolean = true) extends TableFormat
}

/** One registered table: logical name -> physical coordinates.
  *
  * @param path    filesystem/object-store path
  * @param format  storage format
  * @param schema  explicit schema; None = rely on the format's self-describing
  *                schema (parquet). CSV registrations should always carry an
  *                explicit schema — production paths never use inferSchema
  *                (a full extra pass over 100 TB).
  */
case class TableEntry(
    path: String,
    format: TableFormat = TableFormat.Parquet,
    schema: Option[StructType] = None)

/** Minimal metastore-free catalog: logical table name -> (path, format,
  * schema). Replaces the reference's Glue Data Catalog coordinates
  * (reference Glue-spark/scripts/bronze/crm_cust_info_bronze.py:24-27 reads
  * by `database`/`table_name`; sinks update the catalog at :42-45). Here a
  * write registers the table; a read resolves it. Thread-safe so parallel
  * pipeline stages can register concurrently.
  */
class Catalog(spark: SparkSession) {
  private val tables = TrieMap.empty[String, TableEntry]

  def register(name: String, entry: TableEntry): Unit = tables.update(name, entry)

  def entry(name: String): TableEntry =
    tables.getOrElse(name, throw new NoSuchElementException(s"table not registered: $name"))

  def path(name: String): String = entry(name).path

  def contains(name: String): Boolean = tables.contains(name)

  def list: Seq[String] = tables.keys.toSeq.sorted

  /** Resolve and read a registered table. */
  def read(name: String): DataFrame = {
    val e = entry(name)
    e.format match {
      case TableFormat.Parquet =>
        val r = spark.read
        e.schema.fold(r)(r.schema).parquet(e.path)
      case TableFormat.Csv(header) =>
        val r = spark.read.option("header", header.toString)
        e.schema.fold(r.option("inferSchema", "false"))(r.schema).csv(e.path)
    }
  }
}
