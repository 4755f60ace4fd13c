package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables
  * (/root/repo/TESTDATA.md). One parquet per table; `events.ts` is
  * nanosecond-precision INT64 which Spark's parquet reader rejects unless
  * `spark.sql.legacy.parquet.nanosAsLong=true` — sessions set that config
  * and `events` exposes `ts` as epoch-nanos LongType plus a derived
  * microsecond `ts_ts` TimestampType column for time arithmetic.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Cheap content fingerprint of one table's data files (name/length/
    * mtime, md5-folded) — the cache key component that makes per-directory
    * memos (IVF quantizer, t3 pairs) invalidate when a dir is rewritten
    * in-process instead of silently serving stale results.
    */
  def fileFingerprint(s: SparkSession, dir: String, name: String): String = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val listing =
      if (!fs.exists(p)) "absent"
      else if (fs.getFileStatus(p).isFile) {
        val st = fs.getFileStatus(p)
        s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}"
      } else fs.listStatus(p).sortBy(_.getPath.getName)
        .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .mkString(",")
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** events with `ts` = epoch nanos (LongType) and `ts_ts` = truncated-to-
    * micros TimestampType. DuckDB equivalent of `ts`: `epoch_ns(ts)`.
    * The nanos-as-long conf is runtime-settable — set defensively so the
    * read works on caller-provided sessions too, not just ours.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
  }
}
