package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One verify-gate query: Spark implementation + optional DuckDB oracle SQL
  * over the same parquet tables. Conventions that make the cross-engine
  * hash compare robust (driver sorts columns by name, then hashes values):
  *
  *  - Never aggregate raw doubles (summation order differs between
  *    engines); money goes through [[Q.cents]] (exact IEEE ops + exact
  *    BIGINT sums). Pass-through doubles and single divisions are fine —
  *    identical IEEE inputs/ops give identical bits.
  *  - Every query ends in a deterministic total ORDER BY in both engines.
  *  - DuckDB `sum(BIGINT)` returns HUGEINT — oracle SQL always wraps sums
  *    in `CAST(... AS BIGINT)` to match Spark's LongType.
  *  - Events time arithmetic uses the canonical `ts_us` epoch-micros
  *    column (see [[Tables.events]]); oracle equivalent `epoch_us(ts)`.
  */
case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Exact money-to-cents: floor(x*100 + 0.5) as BIGINT. Identical IEEE
    * double ops in Spark and DuckDB — unlike round()/decimal casts whose
    * half-way rounding modes differ between engines.
    */
  def cents(c: Column): Column = floor(c * lit(100.0) + lit(0.5)).cast("long")
  /** Same for integral-valued doubles (e.g. l_quantity). */
  def asLong(c: Column): Column = floor(c + lit(0.5)).cast("long")

  val centsSql = "CAST(floor(%s * 100.0 + 0.5) AS BIGINT)"
  def sqlCents(x: String): String = centsSql.format(x)
  def sqlLong(x: String): String = s"CAST(floor($x + 0.5) AS BIGINT)"
}
