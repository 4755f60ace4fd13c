package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables
  * (/root/repo/TESTDATA.md). One parquet per table. `events.ts` has shipped
  * in two physical representations across driver testdata generations —
  * nanosecond-precision INT64 (read as LongType via
  * `spark.sql.legacy.parquet.nanosAsLong=true`) and `timestamp[us]` (read
  * as TimestampType/TimestampNTZType) — so `events` normalizes at read
  * time: downstream always sees `ts` = epoch-nanos LongType and `ts_ts` =
  * microsecond TimestampType, whatever the file stores. The DuckDB oracle
  * (`epoch_ns(ts)` / `epoch_us`) is representation-agnostic already.
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

  /** Testdata contract preflight: every table's required columns with the
    * set of acceptable Spark types — multi-generation columns (events.ts)
    * list every representation the loaders adapt to. The driver has
    * regenerated `/root/testdata` with a changed physical type once
    * (round 9: events.ts int64-nanos → timestamp[us]), which cost a full
    * round to diagnose; this turns the next drift into a one-line
    * stderr message naming the column. Extra columns are fine (additive
    * evolution); missing columns and unaccepted types are reported.
    */
  private val expectedContract: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int", "bigint"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int", "bigint"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int", "bigint")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int", "bigint"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int", "bigint"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int", "bigint"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> Set("timestamp", "timestamp_ntz", "date"),
      "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int", "bigint"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Set("timestamp", "timestamp_ntz", "date")),
    "events" -> Seq("event_id" -> Set("bigint"),
      "ts" -> Set("bigint", "timestamp", "timestamp_ntz"),
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint", "int")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>", "array<double>"),
      "label" -> Set("int", "bigint")))

  /** Human-readable drift report for `dir` against [[expectedContract]];
    * empty when every table conforms. Callers (Verify/Bench) print each
    * line and CONTINUE — with per-query error artifacts in place, a
    * drifted table degrades visibly per query instead of aborting the
    * whole gate.
    */
  def preflight(s: SparkSession, dir: String): Seq[String] = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    expectedContract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      try {
        val schema = t(s, dir, table).schema
        val have = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
        cols.flatMap { case (c, ok) =>
          have.get(c) match {
            case None =>
              Some(s"$table.$c: MISSING (present: ${schema.fieldNames.mkString(", ")})")
            case Some(tp) if !ok(tp) =>
              Some(s"$table.$c: type '$tp' not in accepted {${ok.toSeq.sorted.mkString(", ")}}")
            case _ => None
          }
        }
      } catch {
        case e: Throwable => Seq(s"$table: unreadable (${graft.Jsons.firstLine(e)})")
      }
    }
  }

  /** events with TWO derived time columns, regardless of the file's
    * physical `ts` type:
    *  - `ts_us` — epoch MICROS (LongType): the CANONICAL column for query
    *    defs; DuckDB equivalent `epoch_us(ts)`. Micros, not nanos,
    *    because cross-engine comparisons must be µs (DuckDB truncates).
    *  - `ts_ts` — truncated-to-micros TimestampType.
    * The physical `ts` — whose type has changed BETWEEN testdata
    * generations (int64 epoch-nanos through round 8, `timestamp[us]`
    * from round 9) — is consumed here and DROPPED from the output: no
    * downstream code reads nanos anymore (the round-13 end of the ts_us
    * migration), so the generation-dependent column cannot leak into a
    * query again. The nanos-as-long conf is runtime-settable — set
    * defensively right before the read so an int64-nanos file still
    * resolves on caller-provided sessions too, the ONLY site that needs
    * it (session builders no longer carry it).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    val normalized = raw.schema("ts").dataType match {
      case LongType => // int64 epoch-nanos generation: ts is already nanos
        raw.withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType =>
        raw.withColumn("ts_ts", col("ts"))
          .withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        // naive-as-UTC epoch micros WITHOUT touching the session timeZone
        // (a cast NTZ→Timestamp is session-tz-dependent, and mutating the
        // caller's session tz at read time would change unrelated
        // expressions for the rest of the session): date part + wall-clock
        // time parts are all tz-free on NTZ, so the epoch is exact integer
        // arithmetic — verified against the cast-under-UTC form incl.
        // pre-epoch and DST-ambiguous wall times (TablesSpec).
        val micros = expr(
          "cast(datediff(cast(ts as date), date'1970-01-01') as bigint) * 86400000000L" +
            " + (cast(hour(ts) as bigint)*3600L + cast(minute(ts) as bigint)*60L" +
            " + cast(second(ts) as bigint))*1000000L" +
            " + cast(date_format(ts, 'SSSSSS') as bigint)")
        raw.withColumn("ts_ts", timestamp_micros(micros))
          .withColumn("ts", micros * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other (expected int64 nanos or timestamp)")
    }
    normalized.withColumn("ts_us", expr("ts div 1000")).drop("ts")
  }
}
