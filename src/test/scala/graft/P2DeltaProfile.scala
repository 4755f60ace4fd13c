package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness for the round-18 p2 growth watch: at a FIXED
  * corpus (sf0.1 documents), vary the delta fraction (1/deltaMod) and
  * report bootstrap wall vs delta-refresh wall per stage. If the
  * O(delta) contract holds, the delta-side total tracks the delta
  * fraction while the bootstrap side stays constant; a stage whose
  * wall does NOT shrink with the delta is re-touching the corpus.
  *
  * Test-scoped on purpose: this is evidence-generation tooling for
  * docs/SCALING.md, not product surface.
  *
  * Usage: sbt 'Test/runMain graft.P2DeltaProfile [sfDir]'
  */
object P2DeltaProfile {
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
    // warm FS/codegen once so mod=4's numbers aren't cold-start noise
    spark.read.parquet(s"$sfDir/documents.parquet")
      .write.format("noop").mode("overwrite").save()
    for (mod <- Seq(4, 8, 16, 32); rep <- 1 to 2) {
      val out = java.nio.file.Files.createTempDirectory(
        graft.queries.PipelineQueries.checkpointParent, s"p2prof_").toString
      val t0 = System.nanoTime()
      val pipe = new graft.pipeline.IncrementalPipeline(
        spark, s"$sfDir/documents.parquet", out,
        graft.pipeline.TextPipeline.Config(
          minTokens = 5, minStopwordRatio = 0.05, langThreshold = 0.05),
        deltaMod = mod, deltaRes = 3)
      pipe.run().count()
      val total = (System.nanoTime() - t0) / 1e9
      val d = pipe.durations
      def part(p: String) = d.collect {
        case (k, v) if k.startsWith(p) => v }.sum
      val boot = part("hist_") + d.getOrElse("commit_v0", 0.0)
      val delta = part("delta_") + d.getOrElse("commit_v1", 0.0)
      println(f"P2PROF mod=$mod%d rep=$rep%d frac=${1.0 / mod}%.4f " +
        f"total=$total%.2f bootstrap=$boot%.2f delta=$delta%.2f " +
        d.map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    }
    spark.stop()
  }
}
