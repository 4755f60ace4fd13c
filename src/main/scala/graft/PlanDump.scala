package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-19 optimization evidence: dump `explain("formatted")` for a
  * named set of queries into per-query files (plans/r19/<q>_<tag>.txt)
  * so before/after plan diffs are reviewable without running Spark.
  *
  * Usage: sbt 'runMain graft.PlanDump <tag> <q1,q2,...> [sfDir] [outDir]'
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <tag> <q1,q2,...> [sfDir] [outDir]")
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 3) args(3) else "plans/r19"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    val unknown = names.filterNot(qs.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val plan = qs(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"[plandump] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
