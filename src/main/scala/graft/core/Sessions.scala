package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with scale-appropriate defaults.
  *
  * Local runs use `local[N]` (single JVM). The same config block is what we
  * would ship to a 1000-executor cluster: AQE on (runtime shuffle coalescing
  * + skew-join splitting), shuffle partitions sized to cores locally
  * (cluster deployments override via `spark.sql.shuffle.partitions`), UTC
  * session time zone for deterministic date semantics (the reference's
  * driver-side `datetime.now()` at
  * reference Glue-spark/scripts/silver/erp_cust_az12_silver.py:60-64 is
  * timezone-sensitive; we pin UTC and use an injectable clock instead).
  */
object Sessions {
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      // the library's SQL surface (graft_* functions) and the conf-gated
      // range-join rewrite ride every session built here; cluster
      // deployments get the same via spark.sql.extensions=
      // graft.functions.GraftExtensions (getOrCreate returning an
      // EXISTING session keeps that session's extensions — register
      // imperatively via GraftExtensions.register in that case)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
