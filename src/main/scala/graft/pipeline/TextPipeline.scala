package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** End-to-end training-data curation DAG over a `documents` table — the
  * north-star twin of [[Runner]]'s ETL DAG: language/quality gate →
  * exact dedup → MinHash-LSH near-dup clustering → canonical-
  * representative filter → deterministic sample → token chunks. Stages
  * materialize to parquet (reprocessing checkpoints, same contract as
  * Runner's bronze/silver/gold) with per-stage durations and row counts.
  *
  * Every stage reuses the gate-verified operators (TextOps + the native
  * MinHash expressions), so pipeline semantics are exactly the
  * oracle-checked ones: the quality gate is t9/t10's heuristics, exact
  * dedup is t1's fingerprint, the near-dup chain is t2→t3→t6 with the
  * hot-bucket guard, sampling is t7, chunking is t16.
  *
  * 100 TB shape: every stage is a scan + hash shuffle bounded by its
  * stage's OWN output (no all-pairs, no driver-side data); the LSH
  * bucket cap bounds the worst spam bucket; each checkpoint is a plain
  * parquet dir, so a failed run resumes from the last good stage and
  * downstream consumers (packing, tokenizing) read partition-pruned
  * parquet, not a recompute.
  */
class TextPipeline(spark: SparkSession, docsPath: String, outRoot: String,
                   cfg: TextPipeline.Config = TextPipeline.Config()) {

  val durations = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]

  /** Materialize a stage to `outRoot/<name>` via temp-dir + rename swap
    * (mirroring `Scale.mergeParquet`): the stage's input DataFrame may
    * lazily read an EARLIER checkpoint of the same name under this
    * outRoot (re-running a stage, resuming a pipeline), and a direct
    * mode(overwrite) would delete the files being read mid-scan. Writing
    * to `__<name>_tmp` first means the plan fully materializes before
    * the old checkpoint is touched; the swap is then a delete + rename.
    */
  private def stage(name: String)(df: => DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    // the row count rides the stage write as an observed metric — the
    // old per-stage `back.count()` was one extra job per stage (5 per
    // run) for a number the write already knows (round-20 diet; same
    // pattern as IncrementalPipeline.tap)
    val o = org.apache.spark.sql.Observation(s"p1_${name}_n")
    val back = TextPipeline.materialize(spark, outRoot, name,
      df.observe(o, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).cast("long").as("n")))
    durations(name) = (System.nanoTime() - t0) / 1e9
    counts(name) = o.get("n").asInstanceOf[Long]
    back
  }

  private def docs(): DataFrame = spark.read.parquet(docsPath)

  /** Stage 1 — language + quality gate (t9/t10 heuristics). */
  def runQuality(): DataFrame = stage("quality")(TextPipeline.qualityGate(docs(), cfg))

  /** Stage 2 — exact dedup (t1). */
  def runExactDedup(in: DataFrame): DataFrame =
    stage("exact_dedup")(TextPipeline.exactDedup(in))

  /** Stage 3 — near-dup removal (t2→t3→t6). */
  def runNearDedup(in: DataFrame): DataFrame =
    stage("near_dedup")(TextPipeline.nearDedup(in, cfg))

  /** Stage 4 — deterministic sample (t7). */
  def runSample(in: DataFrame): DataFrame =
    stage("sample")(TextPipeline.sample(in, cfg))

  /** Stage 5 — training chunks (t16). */
  def runChunks(in: DataFrame): DataFrame =
    stage("chunks")(TextPipeline.chunks(in, cfg))

  /** The whole DAG; returns the final chunks frame. */
  def runAll(): DataFrame = {
    val out = runChunks(runSample(runNearDedup(runExactDedup(runQuality()))))
    TextPipeline.lastRunDurations = durations.toMap
    out
  }
}

object TextPipeline {

  /** Materialize a stage to `outRoot/<name>` via temp-dir + rename swap
    * (mirroring `Scale.mergeParquet`): the stage's input DataFrame may
    * lazily read an EARLIER checkpoint of the same name under this
    * outRoot (re-running a stage, resuming a pipeline), and a direct
    * mode(overwrite) would delete the files being read mid-scan. Writing
    * to `__<name>_tmp` first means the plan fully materializes before
    * the old checkpoint is touched; the swap is then a delete + rename.
    * Shared by [[TextPipeline]] and [[IncrementalPipeline]].
    */
  private[pipeline] def materialize(spark: SparkSession, outRoot: String,
                                    name: String, df: DataFrame): DataFrame = {
    val path = s"$outRoot/$name"
    val tmp = s"$outRoot/__${name}_tmp"
    df.write.mode("overwrite").parquet(tmp)
    import org.apache.hadoop.fs.Path
    val fs = new Path(outRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(path)
    fs.delete(dst, true)
    require(fs.rename(new Path(tmp), dst), s"rename failed: $tmp -> $dst")
    spark.read.parquet(path)
  }

  /** Language + quality gate (t9/t10 heuristics): keep docs that look
    * like the target language and clear the token-count and
    * stopword-ratio floors. Pure map-side filter — the same lazy plan
    * whether the input is the whole corpus (p1 bootstrap) or a delta
    * batch (p2 refresh).
    */
  def qualityGate(in: DataFrame, cfg: Config): DataFrame = in
    .withColumn("__toks", TextOps.tokens(col("text")))
    .filter(size(col("__toks")) >= cfg.minTokens &&
      TextOps.stopwordRatio(col("__toks")) >= cfg.minStopwordRatio &&
      TextOps.langIdHeuristic(col("__toks"), cfg.langThreshold) === "en")
    .drop("__toks")

  /** Exact dedup (t1): one surviving doc (min doc_id) per
    * normalized-text fingerprint. Hash shuffle on the 128-bit
    * fingerprint, never on text.
    */
  def exactDedup(in: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("__fp").orderBy(col("doc_id"))
    in.withColumn("__fp", TextOps.fingerprint(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Exploded LSH band rows `(doc_id, band_idx, band_val)` for a doc
    * frame — the shared currency of the in-batch pair join (t3), the
    * persisted dedup index (t48), and its probe. NULL bands (docs too
    * short to shingle) are dropped: they can never match, and the
    * index contract requires them absent.
    */
  def bandRows(in: DataFrame, cfg: Config): DataFrame = {
    // fused signature: one token scan assembles each shingle's bytes
    // once and digests all k seeds (no interpreted n-gram lambda, no
    // shingle strings) — byte-identical bands, HashExprsSpec-pinned
    val shingled = in
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__t"))
      .select(col("doc_id"),
        graft.functions.native.minhashSigArr(col("__t"), 3, cfg.minhashK).as("__mh"))
    val bands = graft.functions.native.lshBandsFromSig(
      col("__mh"), cfg.minhashK, cfg.rowsPerBand)
    shingled.select(col("doc_id") +: bands: _*)
      .select(col("doc_id"),
        explode(map((0 until cfg.minhashK / cfg.rowsPerBand)
          .flatMap(b => Seq(lit(b), col(s"band$b"))): _*)).as(Seq("band_idx", "band_val")))
      .filter(col("band_val").isNotNull)
  }

  /** Near-dup removal (t2→t3→t6): MinHash bands → bounded LSH
    * candidate pairs → connected components → keep only each cluster's
    * canonical representative (the min doc_id); docs in no pair
    * survive untouched.
    */
  def nearDedup(in: DataFrame, cfg: Config): DataFrame =
    nearDedupWithBands(in, bandRows(in, cfg), cfg)

  /** [[nearDedup]] with the band rows supplied by the caller — the
    * incremental pipeline computes each delta doc's bands ONCE
    * (MinHash is the expensive expression) and reuses the frame across
    * the probe, the within-delta cluster pass, and the index commit.
    */
  def nearDedupWithBands(in: DataFrame, bands: DataFrame, cfg: Config): DataFrame = {
    val pairs = TextOps.lshPairsBounded(bands, cfg.maxBucketSize)
    val reps = TextOps.clusterPairs(pairs)
    // anti-join on the non-representatives: clustered docs keep exactly
    // their min-id member, unclustered docs pass through
    val losers = reps.filter(col("doc_id") =!= col("cluster_rep")).select("doc_id")
    in.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Deterministic sample (t7): md5-bucket keep/drop, stable across
    * runs and partitionings.
    */
  def sample(in: DataFrame, cfg: Config): DataFrame =
    in.filter(TextOps.deterministicSample(col("doc_id"), cfg.samplePermille))

  /** Training chunks (t16): fixed-size token windows with overlap, the
    * unit downstream tokenization consumes.
    */
  def chunks(in: DataFrame, cfg: Config): DataFrame =
    in.select(col("doc_id"), TextOps.tokens(col("text")).as("__t"))
      .filter(size(col("__t")) > 0)
      .select(col("doc_id"), col("__t"),
        explode(sequence(lit(0), size(col("__t")) - 1, lit(cfg.chunkStride))).as("__start"))
      .select(col("doc_id"),
        (col("__start") / cfg.chunkStride).cast("long").as("chunk_idx"),
        array_join(slice(col("__t"), col("__start") + 1, lit(cfg.chunkSize)), " ").as("chunk_text"))

  /** Per-stage wall times of the most recent `runAll` in this JVM —
    * the bench's evidence channel. Two identical-code driver rounds
    * (r11: 10.42 s, r12: 7.61 s vs the builder's same-HEAD 4.0 s)
    * showed p1's single wall number alone can't distinguish ambient
    * I/O interference from a plan regression; the artifact needs to
    * say WHICH stage ate the time. Written once per runAll (not per
    * stage) so a concurrently-read snapshot is always a complete run.
    */
  @volatile private[graft] var lastRunDurations: Map[String, Double] = Map.empty

  /** Curation thresholds; defaults match the gate queries' parameters
    * (t9 language threshold, t2/t3 MinHash geometry, t16 chunk shape).
    */
  case class Config(minTokens: Int = 5,
                    minStopwordRatio: Double = 0.05,
                    langThreshold: Double = 0.15,
                    minhashK: Int = 4,
                    rowsPerBand: Int = 2,
                    maxBucketSize: Int = 1000,
                    samplePermille: Int = 800,
                    chunkSize: Int = 32,
                    chunkStride: Int = 24)

  /** CLI: <docsDir> <outRoot> [open] — runs the curation DAG and prints
    * per-stage durations + surviving row counts. `open` disables the
    * language/quality gate (the synthetic corpus is stopword-light), so
    * the dedup stages run over the full corpus — the stress shape.
    */
  def main(args: Array[String]): Unit = {
    val docsDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outRoot = if (args.length > 1) args(1) else "/tmp/graft_text_lake"
    val cfg = if (args.length > 2 && args(2) == "open")
      Config(minTokens = 1, minStopwordRatio = 0.0, langThreshold = 0.0)
    else Config()
    val spark = graft.core.Sessions.local()
    val p = new TextPipeline(spark, s"$docsDir/documents.parquet", outRoot, cfg)
    p.runAll()
    p.durations.foreach { case (k, v) => println(f"[textpipe] $k%-12s ${v}%8.2f s  ${p.counts(k)}%8d rows") }
    spark.stop()
  }
}
