package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.operators.Scale

/** Incremental curation refresh — [[TextPipeline]] composed with the
  * t48 snapshot-versioned dedup index, so batch N+1 costs O(delta),
  * not O(corpus). The reference's medallion architecture re-materializes
  * between stages precisely to enable this: history is curated once
  * (p1's job), its dedup evidence is COMMITTED as two snapshot tables
  * (the exact-dedup fingerprint set and the LSH band index,
  * `Scale.writeSnapshot`), and a later delta batch then runs the same
  * gate-verified stages scanning ONLY the delta plus index probes:
  *
  *   1. `hist_quality` / `hist_exact` — bootstrap: quality-gate and
  *      exact-dedup the history batch, commit `fp_idx` v0 and
  *      `band_idx` v0 (one band row per (kept doc, band)).
  *   2. `delta_quality` — the same map-side gate over the delta only.
  *   3. `delta_exact` — min-doc_id per fingerprint WITHIN the delta,
  *      then an anti semi-probe against fp_idx v0: a delta doc whose
  *      normalized text already exists in history is a duplicate.
  *      One hash shuffle keyed by the 128-bit fingerprint.
  *   4. `delta_probe` — [[TextOps.dedupAgainstIndex]]: LSH band
  *      left-semi probe against band_idx v0 with the occupancy cap —
  *      near-duplicates-of-history drop WITHOUT re-banding history.
  *   5. `delta_near` — the p1 cluster pass (bounded pairs → connected
  *      components → canonical representative) WITHIN the surviving
  *      delta: near-dup groups that arrived together in one batch.
  *   6. band_idx v1 commits as v0 + the survivors' bands (incremental
  *      index maintenance — t48's protocol), fp_idx v1 likewise, and
  *      the survivors flow through the same sample + chunks stages.
  *
  * Semantics note (shared with every streaming-ingest dedup): the
  * incremental result is NOT defined as equal to a full-batch rerun —
  * history is immutable, so a delta doc always loses to a history
  * near-dup even when its doc_id is smaller, whereas a one-shot p1
  * over the union could keep the delta doc instead. The p2 oracle
  * therefore replays BOTH batches under the incremental semantics in
  * one SQL statement (t48's discipline), pinning exactly what the
  * refresh path computes.
  *
  * 100 TB shape: the bootstrap is p1 (linear in history, run once);
  * every delta stage is a scan of the delta plus a hash join against
  * an index keyed by (band_idx, band_val) or fingerprint — both
  * partition-prunable snapshot tables compacted like any lakehouse
  * table — so refresh cost tracks the batch, not the corpus. The
  * per-stage durations land in [[TextPipeline.lastRunDurations]], so
  * the bench artifact itself shows delta-stage wall « bootstrap wall.
  */
class IncrementalPipeline(spark: SparkSession, docsPath: String, outRoot: String,
                          cfg: TextPipeline.Config = TextPipeline.Config(),
                          deltaMod: Int = 4, deltaRes: Int = 3) {

  val durations = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
  /** Per-stage (row count, sum(doc_id)) — the p2 gate's signatures,
    * computed EAGERLY while the stage is pinned. */
  val sigs = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
  /** The pinned stage frames (valid until [[unpersistAll]]). */
  val frames = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]

  /** Pin a stage in memory (spill-safe) instead of checkpointing it to
    * parquet: each stage feeds 2–3 consumers (the next stage, the index
    * commits, its own signature), so it must materialize exactly once —
    * but nothing ever re-reads it ACROSS runs, so a durable parquet
    * round-trip (encode + write + re-read per stage, the round-18 bench
    * finding: a ~0.3 s/stage floor × 10 stages dominating p2 at gate
    * scale) bought replay isolation no consumer used. One job per stage
    * now materializes the cache AND computes the gate signature. The
    * DURABLE artifacts of the refresh — the fingerprint + band index
    * snapshots and the training chunks — still commit to storage
    * (timedCommit / the caller); only scratch handoffs stay in memory.
    */
  private def stage(name: String)(df: => DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    val pinned = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r = pinned.agg(count(lit(1)), coalesce(sum(col("doc_id")), lit(0L))).head()
    durations(name) = (System.nanoTime() - t0) / 1e9
    counts(name) = r.getLong(0)
    sigs(name) = (r.getLong(0), r.getLong(1))
    frames(name) = pinned
    pinned
  }

  /** Release every pinned stage (call once the caller is done reading
    * [[frames]] / the returned chunks). */
  def unpersistAll(): Unit =
    frames.valuesIterator.foreach { f => f.unpersist(); () }

  /** Time a snapshot commit under its own `durations` key, so the
    * bench's per-stage artifact accounts for the FULL p2 wall (the
    * four index commits are real parquet writes, not checkpoint
    * stages — untimed they'd show up as unexplained residual).
    */
  private def timedCommit(name: String)(body: => Long): Long = {
    val t0 = System.nanoTime()
    val v = body
    durations(name) = (System.nanoTime() - t0) / 1e9
    v
  }

  def bandIdxPath: String = s"$outRoot/band_idx"
  def fpIdxPath: String = s"$outRoot/fp_idx"

  private def fingerprints(in: DataFrame): DataFrame =
    in.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))

  /** Bootstrap + O(delta) refresh; returns the delta's training chunks. */
  def run(): DataFrame = {
    val docs = spark.read.parquet(docsPath)
    val history = docs.filter(col("doc_id") % deltaMod =!= deltaRes)
    val delta = docs.filter(col("doc_id") % deltaMod === deltaRes)

    // ---- bootstrap (batch 1): curate history, commit index v0 ----
    val hq = stage("hist_quality")(TextPipeline.qualityGate(history, cfg))
    val he = stage("hist_exact")(TextPipeline.exactDedup(hq))
    timedCommit("commit_v0") {
      Scale.writeSnapshot(spark, fpIdxPath, fingerprints(he))
      Scale.writeSnapshot(spark, bandIdxPath, TextPipeline.bandRows(he, cfg))
    }
    val fpV0 = Scale.readSnapshot(spark, fpIdxPath, Some(0L))
    val bandV0 = Scale.readSnapshot(spark, bandIdxPath, Some(0L))

    // ---- refresh (batch 2): every stage scans only the delta ----
    val dq = stage("delta_quality")(TextPipeline.qualityGate(delta, cfg))
    val de = stage("delta_exact") {
      TextPipeline.exactDedup(dq)
        .withColumn("__fp", TextOps.fingerprint(col("text")))
        .join(fpV0.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
        .drop("__fp")
    }
    val dp = stage("delta_probe")(TextOps.dedupAgainstIndex(
      de, TextPipeline.bandRows(de, cfg), bandV0, cfg.maxBucketSize))
    val dn = stage("delta_near")(TextPipeline.nearDedup(dp, cfg))

    // index maintenance: v1 = v0 + the survivors' evidence (history is
    // never re-banded; the committed v0 frame is unioned lazily, so the
    // write re-reads v0's files, not its lineage)
    timedCommit("commit_v1") {
      Scale.writeSnapshot(spark, bandIdxPath,
        bandV0.unionByName(TextPipeline.bandRows(dn, cfg)))
      Scale.writeSnapshot(spark, fpIdxPath, fpV0.unionByName(fingerprints(dn)))
    }

    val ds = stage("delta_sample")(TextPipeline.sample(dn, cfg))
    val dc = stage("delta_chunks")(TextPipeline.chunks(ds, cfg))
    TextPipeline.lastRunDurations = durations.toMap
    dc
  }
}
