package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // testdata-contract preflight: name any drifted column up front (the
    // round-9 events.ts drift cost a full round to diagnose), then
    // continue — per-query error artifacts make the damage visible.
    val drift = queries.Tables.preflight(spark, sfDir)
    drift.foreach(m => System.err.println(s"[preflight] $m"))
    // SPARK_GRAFT_ONLY="v6_ivf_neardup,..." restricts the dump — same
    // iteration loop as Bench's; tools/local_check.py compares whatever
    // subset of query dirs is present. Unknown names fail fast.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    // build the memoized gate layouts concurrently up front (round-20,
    // guide §2.6) — the full dump otherwise builds ~43 s of commit
    // chains serially on first touch; skipped for subset dumps, whose
    // one-or-two layouts build on demand faster than the full sweep
    if (only.isEmpty)
      try queries.LayoutBuild.prewarmAll(spark, sfDir)
      catch { case e: Throwable => System.err.println(s"[verify] prewarm: $e") }
    // On failure, still leave a footprint: a `<out>/<name>/_ERROR.txt`
    // marker (the dir now EXISTS, so a driver that compares whatever dirs
    // are present records an err row instead of silently shrinking the
    // gate — round 9 lost 19 queries with zero in-artifact signal) plus an
    // aggregate errors.json sidecar for human diagnosis.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val attempted = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    attempted.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        try {
          val d = Paths.get(s"$outDir/$name")
          Files.createDirectories(d)
          Files.writeString(d.resolve("_ERROR.txt"),
            s"$name\n${Option(e.getMessage).getOrElse(e.getClass.getName)}\n")
        } catch { case _: Throwable => }
      }
    }
    def q(s: String): String = Jsons.str(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // which queries this run attempted — lets a checker distinguish "a
    // subset run skipped it" from "it was attempted and left no result"
    Files.writeString(Paths.get(s"$outDir/attempted.json"),
      attempted.map(a => q(a._1)).sorted.mkString("[", ",", "]"))
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
