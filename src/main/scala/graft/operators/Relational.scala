package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Named reusable relational operators distilled from the reference's
  * window patterns (SURVEY.md §2.7). All are pure DataFrame => DataFrame —
  * composable, unit-testable, and plan-transparent (each is a single
  * window + filter that Catalyst compiles to Exchange+Sort+Window).
  */
object Relational {

  /** Dedup-by-recency (W1): keep the first row per key under `order`.
    * Reference: row_number() OVER (PARTITION BY cst_id ORDER BY
    * cst_create_date DESC) + filter row_num=1 + drop
    * (silver/crm_cust_info_silver.py:55,72-74).
    *
    * Callers should pass a total order (append unique tiebreakers) — the
    * reference leaves ties nondeterministic (SURVEY.md §7.4.2); we don't.
    * Scale: one hash exchange on `keys`; window sort is per-key, spill-safe.
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** SCD-2 end-dating (W2): a version's end = day before the next version's
    * start within its key; the last (current) version gets NULL.
    * Reference: lead(prd_start_dt) OVER (PARTITION BY prd_key ORDER BY
    * prd_start_dt) - INTERVAL 1 DAY (silver/crm_prd_info_silver.py:51,67-69).
    */
  def scd2EndDate(df: DataFrame, keys: Seq[String], startCol: String,
                  endCol: String, tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol) +: tiebreak: _*)
    df.withColumn(endCol, date_sub(lead(col(startCol), 1).over(w), 1))
  }

  /** Surrogate key (W3/W4): deterministic dense 1..N by sort key.
    * Reference: row_number() OVER (ORDER BY cst_id) with no partition
    * (dim_customers_gold.py:36-40) — a single-partition exchange. That is
    * the reference's semantics and is fine for dimension-sized data; do NOT
    * use for fact-sized tables.
    */
  def surrogateKey(df: DataFrame, keyCol: String, order: Seq[Column]): DataFrame =
    df.withColumn(keyCol, row_number().over(Window.orderBy(order: _*)).cast("long"))

  /** Gap-based sessionization: assign a per-key session index that
    * increments whenever the gap to the previous event exceeds
    * `gapMicros`. Batch twin of the streaming
    * flatMapGroupsWithState sessionizer — two windows over one hash
    * exchange on `key`.
    */
  def sessionize(df: DataFrame, key: String, tsMicros: String,
                 gapMicros: Long, order: Seq[Column] = Nil): DataFrame = {
    val ord = if (order.nonEmpty) order else Seq(col(tsMicros).asc)
    val w = Window.partitionBy(key).orderBy(ord: _*)
    df.withColumn("__prev", lag(col(tsMicros), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsMicros) - col("__prev") > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev", "__new")
  }

  /** Scalable surrogate key: same contract (dense 1..N following the sort
    * order) without the global single-partition sort. Range-partition +
    * local sort, then `zipWithIndex` (one counting job + one narrow map —
    * the standard pattern; no lingering cache). Survives fact-scale inputs
    * where `surrogateKey` would serialize on one task.
    */
  def surrogateKeyScalable(df: DataFrame, keyCol: String, order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val withKey = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1))
    }
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        keyCol, org.apache.spark.sql.types.LongType, nullable = false))
    spark.createDataFrame(withKey, schema)
  }
}
