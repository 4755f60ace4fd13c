package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 evidence harness: cost shape of the MoR delete-broadcast
  * guard's shuffle-join fallback vs the broadcast path, on a real
  * documents-table MoR layout. Test-scoped measurement tooling for
  * docs/SCALING.md, like P2DeltaProfile.
  *
  * Usage: sbt 'Test/runMain graft.MorGuardProfile [sfDir]'
  */
object MorGuardProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Scale
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val t = java.nio.file.Files.createTempDirectory("graft_morguard").toString + "/t"
    Scale.writeMorBase(spark, t, docs)
    // ~20% of keys deleted across two delete commits (read-side worst
    // case short of compaction), plus an append commit in between
    Scale.appendDeletes(spark, t, docs.filter(col("doc_id") % 10 < 1).select("doc_id"))
    Scale.appendMorRows(spark, t,
      docs.filter(col("doc_id") % 10 === 1).withColumn("n_chars", col("n_chars") + 1))
    Scale.appendDeletes(spark, t, docs.filter(col("doc_id") % 10 === 1).select("doc_id"))
    def time(tag: String)(body: => Long): Unit = {
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = body
        println(f"MORGUARD $tag rep=$rep rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    time("broadcast") {
      Scale.readMergeOnRead(spark, t, "doc_id")
        .agg(count(lit(1))).head().getLong(0)
    }
    spark.conf.set("spark.graft.mor.deleteBroadcastBytes", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("fallback") {
      Scale.readMergeOnRead(spark, t, "doc_id")
        .agg(count(lit(1))).head().getLong(0)
    }
    spark.stop()
  }
}
