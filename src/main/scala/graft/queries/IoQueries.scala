package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Format round-trip ingest queries — the JSONL and ORC source/sink
  * surface, gate-pinned. Each query writes the `documents` table to a
  * scratch dir in the target format, reads it back with an EXPLICIT
  * schema (no inference job — the 100 TB rule: schema is metadata, not
  * a second scan), and aggregates per source; the oracle computes the
  * identical aggregate straight from the parquet table, so any loss in
  * the round trip — integer widths, string escaping (JSONL must escape
  * arbitrary text), encoding — breaks the hash match.
  *
  * JSONL matters because it is the lingua franca of LLM training-data
  * interchange; ORC because a complete Spark engine speaks both
  * columnar formats it ships with. Writes shard across partitions and
  * reads parallelize per file, so the round trip scales like any other
  * scan — the scratch dir here stands in for the exchange bucket a real
  * pipeline would target.
  */
object IoQueries {

  /** One shared parent for all round-trip scratch dirs, reaped by ONE
    * JVM shutdown hook (the [[PipelineQueries.checkpointParent]]
    * pattern — RAM-backed when /dev/shm is writable so the bench's
    * timed runs don't amplify ambient disk I/O).
    */
  private lazy val scratchParent: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val root = java.nio.file.Files.createTempDirectory(base, "graft_io_root_")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
    root
  }

  private def roundTrip(s: SparkSession, d: String, fmt: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val out = java.nio.file.Files.createTempDirectory(scratchParent, s"${fmt}_").toString
    // CSV needs the quoting/header contract stated on BOTH sides; the
    // columnar formats carry their schema in-file
    val wo = if (fmt == "csv") Map("header" -> "true", "quoteAll" -> "true")
             else Map.empty[String, String]
    docs.write.mode("overwrite").options(wo).format(fmt).save(out)
    s.read.schema(docs.schema).options(wo).format(fmt).load(out)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"),
        sum(length(col("text")).cast("long")).as("sum_text_len"))
      .orderBy("source")
  }

  private val oracleAgg = """
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(sum(length(text)) AS BIGINT) AS sum_text_len
        FROM documents GROUP BY source ORDER BY source"""

  val all: Seq[Q] = Seq(
    Q("j1_jsonl_roundtrip", (s, d) => roundTrip(s, d, "json"), Some(oracleAgg)),
    Q("o1_orc_roundtrip", (s, d) => roundTrip(s, d, "orc"), Some(oracleAgg)),
    Q("c1_csv_roundtrip", (s, d) => roundTrip(s, d, "csv"), Some(oracleAgg)))
}
