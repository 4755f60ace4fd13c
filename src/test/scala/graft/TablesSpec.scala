package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `Tables.events` must present ONE downstream contract — `ts_us` =
  * canonical epoch-micros LongType, `ts_ts` = microsecond TimestampType,
  * and NO physical `ts` passthrough — whatever type the driver's testdata
  * generation stored (int64 epoch-nanos through round 8, `timestamp[us]`
  * from round 9; the switch silently broke 19 gate queries; dropping the
  * generation-dependent column from the output closed the ts_us
  * migration in round 13). These specs write the same instants in all
  * three physical representations and assert the normalized view is
  * identical.
  */
class TablesSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // Two fixed instants, µs precision (what every generation can represent).
  private val microsA = 1700000000123456L // 2023-11-14T22:13:20.123456Z
  private val microsB = 1700000999000001L

  private val base = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType)))

  private def writeRep(dir: String, tsField: StructField, tsValue: Long => Any): Unit = {
    val schema = StructType(StructField("ts", tsField.dataType) +: base.fields.toSeq)
    val rows = Seq(
      Row(tsValue(microsA), 1L, 10L),
      Row(tsValue(microsB), 2L, 20L))
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def normalized(dir: String): Seq[(Long, Long, Long)] = {
    val df = graft.queries.Tables.events(spark, dir)
    assert(!df.columns.contains("ts"),
      "contract: the generation-dependent physical ts must NOT pass through")
    assert(df.schema("ts_ts").dataType == TimestampType, "contract: ts_ts is TimestampType")
    assert(df.schema("ts_us").dataType == LongType, "contract: ts_us is epoch-micros long")
    assert(df.filter(col("ts_us") =!= unix_micros(col("ts_ts"))).count() == 0,
      "ts_us must be the µs of ts_ts's instant")
    df.select(col("event_id"), col("ts_us"), unix_micros(col("ts_ts")).as("tsm"))
      .orderBy("event_id")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_events_$tag").toString

  test("events normalizes int64-nanos, timestamp, and timestamp_ntz files identically") {
    val expected = Seq(
      (1L, microsA, microsA),
      (2L, microsB, microsB))

    val dLong = tmp("long")
    writeRep(dLong, StructField("ts", LongType), m => m * 1000L) // stored as nanos
    assert(normalized(dLong) == expected)

    val dTs = tmp("ts")
    writeRep(dTs, StructField("ts", TimestampType),
      m => java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(m, java.time.temporal.ChronoUnit.MICROS)))
    assert(normalized(dTs) == expected)

    val dNtz = tmp("ntz")
    writeRep(dNtz, StructField("ts", TimestampNTZType),
      m => java.time.LocalDateTime.ofInstant(
        java.time.Instant.EPOCH.plus(m, java.time.temporal.ChronoUnit.MICROS),
        java.time.ZoneOffset.UTC))
    assert(normalized(dNtz) == expected)
  }

  test("NTZ normalization is session-timezone-independent and mutation-free") {
    val dNtz = tmp("ntz_tz")
    writeRep(dNtz, StructField("ts", TimestampNTZType),
      m => java.time.LocalDateTime.ofInstant(
        java.time.Instant.EPOCH.plus(m, java.time.temporal.ChronoUnit.MICROS),
        java.time.ZoneOffset.UTC))
    val expected = Seq((1L, microsA, microsA), (2L, microsB, microsB))
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      // an NTZ wall time must mean the SAME instant (naive-as-UTC) under
      // any session tz — the r10 implementation got this by mutating the
      // session tz at read time; the arithmetic form must not
      spark.conf.set(tzKey, "America/New_York")
      assert(normalized(dNtz) == expected)
      assert(spark.conf.get(tzKey) == "America/New_York",
        "Tables.events must not mutate the caller session's timeZone")
    } finally spark.conf.set(tzKey, saved)
  }

  test("events rejects an unreadable ts representation instead of mis-deriving") {
    val d = tmp("bad")
    writeRep(d, StructField("ts", StringType), m => m.toString)
    val e = intercept[IllegalStateException](graft.queries.Tables.events(spark, d).collect())
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("preflight: clean testdata reports nothing; doctored dir names the drifted column") {
    assert(graft.queries.Tables.preflight(spark, sf001).isEmpty,
      "driver testdata must satisfy the expected contract")
    // doctored replica: events.ts as string (an unaccepted type), orders
    // missing o_orderpriority — both must be named
    val d = tmp("doctor")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "lineitem", "documents", "embeddings"))
      spark.read.parquet(s"$sf001/$t.parquet")
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    spark.read.parquet(s"$sf001/orders.parquet").drop("o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    graft.queries.Tables.events(spark, sf001)
      .withColumn("ts", col("ts_us").cast("string")).drop("ts_ts", "ts_us")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val drift = graft.queries.Tables.preflight(spark, d)
    assert(drift.exists(m => m.startsWith("events.ts") && m.contains("string")),
      s"must name events.ts type drift, got: $drift")
    assert(drift.exists(_.startsWith("orders.o_orderpriority")),
      s"must name the missing orders column, got: $drift")
    assert(drift.size == 2, s"no false positives expected, got: $drift")
  }

  test("the driver's current sf0.001 events file reads through the contract") {
    val df = graft.queries.Tables.events(spark, sf001)
    assert(!df.columns.contains("ts"))
    assert(df.schema("ts_ts").dataType == TimestampType)
    // ts_us is the µs of ts_ts's instant, for every row
    assert(df.filter(col("ts_us") =!= unix_micros(col("ts_ts"))).count() == 0)
    assert(df.count() > 0)
  }
}
