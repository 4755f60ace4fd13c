package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path join strategies: what keeps the 100 TB shapes out of
  * single-hot-partition and full-shuffle territory when AQE's automatic
  * handling isn't enough.
  */
object Scale {

  /** Skew-safe equi-join: salt the skewed (large) side into `salt`
    * sub-keys and explode the compact side to match — the hot key's rows
    * spread across `salt` reducers instead of one straggler task.
    * Semantics identical to `big.join(small, keys, joinType)` for
    * inner/left joins.
    *
    * AQE's skew-join split (enabled in our sessions) handles sort-merge
    * skew automatically at runtime; explicit salting remains necessary
    * when the skew is extreme or the join is hash-partitioned upstream
    * (e.g. into a window or groupBy on the same key).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    val bigS = big.withColumn("__salt", pmod(hash(keys.map(col) :+ monotonically_increasing_id(): _*), lit(salt)))
    val smallS = small.withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Pre-aggregate-then-total pattern for skewed groupBy: partial
    * aggregation on (key, salt) first spreads a hot key over `salt`
    * reducers; the second (tiny) aggregation combines the partials.
    * `aggs` must be algebraic (sum/count/min/max style).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salt: Int, out: String = "sum"): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(salt)))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(out))
  }

  /** Write both join sides bucketed by the join key so subsequent joins
    * are co-located (zero Exchange). Bucketed tables require the session
    * catalog (`saveAsTable`); readers get bucket pruning + shuffle-free
    * joins when `spark.sql.sources.bucketing.enabled` (default true).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (plain catalog read; bucketing metadata
    * rides along and removes the Exchange under joins on the bucket key).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
