package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Driver tail-window budget for the final stdout line. The harness keeps
    * only the last ~2000 chars of output and sbt prefixes `[info] `
    * (7 chars); round 4's final line was 2354 chars of JSON and truncated
    * mid-line, so the JSON must stay under this (1950 + 7 + newline still
    * fits the window with margin).
    */
  val FinalLineBudget = 1950

  /** 1-minute system load average, or -1 when the platform can't say.
    * Embedded in every bench JSON so cross-round comparisons can tell an
    * idle run from one fighting 32 builder threads (round 4's 62 s vs the
    * idle 42.9 s was pure ambient load).
    */
  private def load1: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  private def jsonNum(v: Double): String = (math.round(v * 1000) / 1000.0).toString

  // per-query precision in the FINAL line only: 2 dp keeps 75+ queries
  // comfortably inside the tail-window budget (full precision is always
  // on the BENCH_JSON marker line and in bench_out.json)
  private def jsonNum2(v: Double): String = (math.round(v * 100) / 100.0).toString

  private def queriesJson(results: Map[String, Double], fmt: Double => String): String =
    results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")

  /** Full-precision JSON — persisted to bench_out.json and the marker line. */
  def renderFull(results: Map[String, Double], sfDir: String): String = {
    val total = if (results.nonEmpty) results.values.sum else 0.0
    s"""{"metric":"total","value":$total,"unit":"sec","load1":${jsonNum(load1)},"queries":${queriesJson(results, _.toString)},"sf":"$sfDir"}"""
  }

  /** The FINAL stdout line. Per-query values rounded to 2 dp keep the full
    * contract while fitting the driver's tail window; if the rounded form
    * still exceeds the budget (more queries some day), fall back to a short
    * summary that points at bench_out.json for the per-query detail.
    */
  def renderFinal(results: Map[String, Double], sfDir: String): String = {
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val totalR = jsonNum(total)
    val rounded = s"""{"metric":"total","value":$totalR,"unit":"sec","load1":${jsonNum(load1)},"queries":${queriesJson(results, jsonNum2)},"sf":"$sfDir"}"""
    if (rounded.length <= FinalLineBudget) rounded
    else s"""{"metric":"total","value":$totalR,"unit":"sec","load1":${jsonNum(load1)},"sf":"$sfDir","detail":"bench_out.json"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: initialize FS/codegen/shuffle machinery outside the timers
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    // noop sink forces full computation of every operator in the plan
    // (count() would let Catalyst drop projections and wide transforms).
    // Three timed runs per query, min reported — damps GC/codegen-compile/
    // ambient-load noise (first runs of sketch aggregates measured 5x
    // their steady state from one-time class init alone).
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      (System.nanoTime() - t0) / 1e9
    }
    // SPARK_GRAFT_ONLY="e9_fact_sales,e3_..." restricts the run — the
    // iteration loop for benchmarking one operator without the full gate
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        name -> Seq.fill(3)(timeOnce(name, fn)).min
      }.toMap
    val full = renderFull(results, sfDir)
    val finalLine = renderFinal(results, sfDir)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath: $e") }
    // after stop() so no executor/log line can land after it. Marker line
    // first (greppable, full precision), short bare JSON as the final
    // stdout line of the program.
    spark.stop()
    println("BENCH_JSON " + full)
    println(finalLine)
  }
}
