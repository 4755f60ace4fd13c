package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Real incremental streaming EXECUTION harness: replay a bounded frame
  * as a time-sliced file stream through an actual `StreamingQuery`
  * (file source → transform → parquet sink, `Trigger.AvailableNow`),
  * and return what the SINK contains. The s1–s6 gate entries pin
  * streaming *shapes* by running the shared transforms on batch input;
  * the s7/s8 entries run the SAME transforms through this harness, so
  * micro-batch state carry-over, watermark-driven append emission, and
  * checkpoint/sink plumbing are themselves under the DuckDB oracle.
  *
  * Mechanics:
  *   - The input is split into `slices` contiguous event-time ranges,
  *     each written as ONE parquet file with strictly ascending
  *     modification times; `maxFilesPerTrigger=1` then forces one
  *     micro-batch per slice (Spark's file source processes oldest
  *     mtime first), so entities spanning slice boundaries — a session
  *     straddling two files, an hour window fed by three — exercise
  *     cross-batch state merge for real.
  *   - Append-mode aggregation only emits state the watermark has
  *     passed. The caller's `lateness` must cover the whole replayed
  *     span (no replayed event is ever late — arrival order inside a
  *     slice is nondeterministic), and a single WATERMARK SENTINEL row
  *     — far-future timestamp, impossible key — RIDES THE LAST SLICE
  *     file (round-20; it was previously its own file and therefore its
  *     own micro-batch): the watermark is recomputed from the max event
  *     time at the END of each batch, so the final data batch advances
  *     it past every real session/window end and the trailing no-data
  *     micro-batch (`spark.sql.streaming.noDataMicroBatches.enabled`,
  *     default on) flushes the state store to the sink. The sentinel's
  *     own state never emits (nothing passes ITS end) and its key is
  *     filtered on read-back.
  *
  * 100 TB shape: this harness is a test/backfill surface, but the
  * execution it drives is the production one — per-batch work is
  * bounded by one slice plus live state, state is keyed and
  * watermark-expired (never O(stream)), and the sink is append-only
  * parquet a downstream reader partition-prunes.
  */
object StreamExec {

  /** True once a real StreamingQuery has terminated since the last
    * [[teardownStateStores]] call. A finished query (even under
    * `Trigger.AvailableNow` + `awaitTermination`) leaves its loaded
    * state-store providers and the shared store-maintenance thread
    * alive in the session — background upkeep that would otherwise be
    * silently billed to whatever the bench times NEXT (round-13 task:
    * rule out cross-query contamination from the five real streaming
    * executions).
    */
  @volatile private var streamRanSinceTeardown = false

  /** Debug/inspection hook: the last completed replay's per-batch
    * progress JSON (set by [[replayFileStream]]). */
  @volatile private[graft] var lastProgress: Seq[String] = Seq.empty

  /** Stop the state-store maintenance thread and unload every cached
    * provider. No-op unless a streaming query actually ran since the
    * last call, so callers (Bench, after every query) pay nothing on
    * the batch path. Spark restarts the maintenance machinery lazily
    * on the next streaming load, so later replays are unaffected.
    */
  def teardownStateStores(): Unit = if (streamRanSinceTeardown) {
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    streamRanSinceTeardown = false
  }

  /** Phase timer for the replay harness, enabled by
    * SPARK_GRAFT_STREAM_DEBUG=1 (stderr only — the optimization round's
    * stand-in for the streaming tab of the disabled UI).
    */
  private val streamDebug = sys.env.contains("SPARK_GRAFT_STREAM_DEBUG")
  private[streaming] def phase[T](label: String)(body: => T): T =
    if (!streamDebug) body
    else {
      val t0 = System.nanoTime()
      try body
      finally System.err.println(
        f"[stream-phase] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

  /** One shared reaped scratch parent for every replay (source files,
    * checkpoint, sink), mirroring PipelineQueries.checkpointParent:
    * /dev/shm when writable (the files are rewritten-then-discarded
    * scratch), one JVM shutdown hook.
    */
  private[graft] lazy val scratchParent: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val root = java.nio.file.Files.createTempDirectory(base, "graft_stream_")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
    root
  }

  /** Split `input` into `slices` event-time-range files plus the
    * `sentinel` file, stream them through `transform`, await
    * completion, and return the parquet sink's contents. Requires the
    * query to have actually run incrementally: at least `slices`
    * micro-batches carried input rows (a single-batch fallback would
    * silently stop exercising cross-batch state).
    */
  /** Materialize `input` as `slices` time-range parquet FILES plus the
    * sentinel under `src`: each slice is one file (write to scratch,
    * move the part file in) with strictly ascending mtimes — the file
    * source's oldest-first order is the replay order, and the sentinel
    * must be processed last or every real event goes late.
    */
  /** Replay EXPLICIT batches in the given ARRIVAL order (one micro-batch
    * each, oldest-mtime-first), run `transform`, and return the parquet
    * sink. Unlike [[replayFileStream]], the batches need not be
    * event-time slices — this is the surface for exercising LATE
    * arrivals: a batch whose event times lie behind the watermark the
    * earlier batches advanced. The caller appends its own
    * watermark-flush sentinel batch when the transform aggregates.
    */
  def replayFileSequence(batches: Seq[DataFrame], statePartitions: Int = 4)
                        (transform: DataFrame => DataFrame): DataFrame = {
    val spark = batches.head.sparkSession
    require(batches.size >= 2, s"replayFileSequence: need >= 2 batches, got ${batches.size}")
    val root = java.nio.file.Files.createTempDirectory(scratchParent, "replayseq_")
    val src = root.resolve("src")
    // all batches share one schema (one file-source reads them), so the
    // arrival sequence writes in a single partitioned pass
    val all = batches.zipWithIndex
      .map { case (b, i) => b.withColumn("__slice", lit(i.toLong)) }
      .reduce(_ unionByName _)
    writeSliceFiles(all, root, src,
      i => if (i < batches.size) Some(f"file$i%04d") else None)
    val out = root.resolve("out").toString
    val shuffleKey = "spark.sql.shuffle.partitions"
    val savedShuffle = spark.conf.get(shuffleKey)
    val q = try {
      spark.conf.set(shuffleKey, statePartitions.toString)
      spark.readStream
        .schema(batches.head.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .transform(transform)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", root.resolve("ck").toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
    } finally spark.conf.set(shuffleKey, savedShuffle)
    q.awaitTermination()
    streamRanSinceTeardown = true
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    require(dataBatches >= batches.size,
      s"replayFileSequence: expected >= ${batches.size} data micro-batches, saw " +
        s"$dataBatches - the run was not incremental")
    spark.read.parquet(out)
  }

  /** STREAMING CHANGE-DATA-FEED SOURCE — one micro-batch drain of a
    * snapshot table's CDF as a structured stream. The feed layout IS a
    * streaming source already: `_cdf/v=<n>` dirs are an append-only,
    * Hive-partitioned parquet file set (squash checkpoints live under
    * the separate `_cdf_ckpt`, invisible here), so Spark's own file
    * source over `<table>/_cdf` — with the partition column `v`
    * surfacing as `_commit_version` — gives exactly-once consumption
    * through the file-source offset log in `checkpoint`: each commit's
    * files are delivered once, across any number of query restarts.
    *
    * This runs ONE `Trigger.AvailableNow` query against the shared
    * checkpoint and returns when it drains; the caller interleaves
    * table commits with calls — every call after the first is a
    * RESTART resuming from the checkpointed offsets, which is the
    * recovery path a long-lived consumer exercises on every deploy.
    * Pair `foreach` with an idempotent sink keyed by `batchId`
    * ([[graft.operators.Scale.writeSnapshotIdempotent]]) and the whole
    * pipeline is exactly-once end to end: the source fences replays of
    * all but the last batch, the sink token fences the last one.
    *
    * The 100 TB contract matches the batch CDF consumers: per-batch
    * input is the NEW commits' change rows only — history is never
    * re-listed beyond the file-source log's own bookkeeping.
    *
    * Three storage realities the source must absorb (round-19):
    *
    *   - COLUMN MAPPING: feed files keep PHYSICAL names forever
    *     (renameSnapshotColumn is metadata-only), so the stream reads
    *     under physical names and aliases to the caller's CURRENT
    *     logical schema per batch — the streaming twin of
    *     readChangesBetween's toLogicalCols. Without it, a rename
    *     would make the file source silently NULL-fill the logical
    *     column on every batch (parquet schema-on-read): wrong data,
    *     no error.
    *   - COMMITTED-POINTER FENCE: each drain streams only the feed
    *     dirs of versions at-or-below the pointer AT DRAIN START
    *     (explicit committed-version glob, never a listing of the feed
    *     root). A crashed CDF writer's above-pointer orphan feed — the
    *     artifact the batch readers are already fenced against — thus
    *     never enters the file-source offset log, where its delivery
    *     would be both phantom and PERMANENT (and would wedge the
    *     checkpoint when the real commit later overwrites those
    *     files). In-flight writers racing a drain are invisible the
    *     same way; their commit arrives at the next drain.
    *   - CHECKPOINT-AWARE BOOTSTRAP: a FRESH stream over a table whose
    *     early per-commit feeds were squashed ([[graft.operators.Scale.squashFeed]])
    *     and swept delivers [widest covering checkpoint] once as the
    *     synthetic batch −1 (net changes — every linear CDF fold is
    *     squash-invariant), records the bootstrapped range in a
    *     `graft_bootstrap` marker inside the checkpoint dir, then
    *     follows per-commit dirs outside that range forever. Pair
    *     `foreach` with a batchId-keyed idempotent sink
    *     ([[graft.operators.Scale.writeSnapshotIdempotent]]): a crash
    *     between the bootstrap delivery and the marker write
    *     re-delivers batch −1 on retry, which the sink token fences —
    *     the same exactly-once contract as every other batch.
    *     Swept feeds NOT covered by a single anchored checkpoint stay
    *     a loud error (the consumer cannot skip history silently).
    */
  def cdfStreamOnce(spark: SparkSession, tablePath: String, checkpoint: String,
                    dataSchema: org.apache.spark.sql.types.StructType)
                   (foreach: (DataFrame, Long) => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    import graft.operators.Scale
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = Scale.latestSnapshot(spark, tablePath).getOrElse(
      throw new IllegalStateException(
        s"cdfStreamOnce: no committed snapshot table at $tablePath"))
    // physical <-> logical mapping, resolved fresh at every drain (a
    // rename between drains changes only the aliasing, never the files)
    val cmap = Scale.snapshotColMap(spark, tablePath)
    val inv = cmap.map(_.swap)
    val stale = dataSchema.fieldNames.filter(c => c != "_change_type" &&
      cmap.contains(c) && cmap(c) != c && !cmap.valuesIterator.contains(c))
    require(stale.isEmpty,
      s"cdfStreamOnce: column(s) ${stale.mkString(", ")} were renamed " +
        s"(${stale.map(c => s"$c -> ${cmap(c)}").mkString(", ")}); request " +
        "the current logical schema")
    val physNames = dataSchema.fieldNames.map(n =>
      if (n == "_change_type") n else inv.getOrElse(n, n))
    val physSchema = org.apache.spark.sql.types.StructType(
      dataSchema.fields.zip(physNames).map { case (f, p) => f.copy(name = p) })

    // bootstrap decision is made ONCE per checkpoint (the marker makes
    // it durable); later drains replay the recorded range exclusion
    val ckBoot = new Path(checkpoint, "graft_bootstrap")
    def feedDir(v: Long) = new Path(s"$tablePath/_cdf/v=$v")
    val bootRange: Option[(Long, Long)] =
      if (fs.exists(ckBoot)) {
        val in = fs.open(ckBoot)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                   finally in.close()
        if (body == "none") None
        else body.split("\\s+") match {
          case Array(f, t) => Some((f.toLong, t.toLong))
          case _ => throw new IllegalStateException(
            s"corrupt bootstrap marker $ckBoot: '$body'")
        }
      } else {
        val missing = (0L to latest).filterNot(v => fs.exists(feedDir(v)))
        val range =
          if (missing.isEmpty) None
          else Some(Scale.listFeedCheckpoints(fs, tablePath)
            .filter { case (f, t) =>
              missing.forall(v => v > f && v <= t) &&
                (0L to f).forall(v => fs.exists(feedDir(v)))
            }.sortBy(_._2).lastOption.getOrElse(throw new IllegalStateException(
              s"cdfStreamOnce: per-commit feed dir(s) v=${missing.mkString(",")} " +
                s"of $tablePath are gone and no single feed checkpoint covers " +
                "them behind an intact prefix — the stream cannot bootstrap; " +
                "squash the feed over the swept range before vacuuming (or " +
                "start streams before sweeping history)")))
        range.foreach { case (f, t) =>
          foreach(Scale.readChangesBetween(spark, tablePath, f, t)
            .select(dataSchema.fieldNames.toIndexedSeq.map(col) :+
              col("_commit_version"): _*), -1L)
        }
        val out = fs.create(ckBoot, true)
        out.write(range.map { case (f, t) => s"$f $t" }.getOrElse("none")
          .getBytes("UTF-8"))
        out.close()
        range
      }

    val live = (0L to latest)
      .filter(v => bootRange.forall { case (f, t) => v <= f || v > t })
      .filter(v => fs.exists(feedDir(v)))
    if (live.isEmpty) return // bootstrap (if any) was the whole history
    val srcGlob = s"$tablePath/_cdf/v={${live.mkString(",")}}"
    // recursiveFileLookup disables hive-partition inference, so a DATA
    // column named `v` can never collide with the feed's `v=<n>` dir
    // layout; the commit version is derived from the file path instead
    val q = spark.readStream
      .schema(physSchema)
      .option("recursiveFileLookup", "true")
      .parquet(srcGlob)
      // physical -> logical aliasing + version-from-path must ride the
      // STREAMING plan: `_metadata` resolves only on the file source
      .select(physNames.zip(dataSchema.fieldNames).toIndexedSeq.map {
        case (p, l) => col(p).as(l) } :+
        regexp_extract(col("_metadata.file_path"), "/v=(\\d+)/", 1)
          .cast("long").as("_commit_version"): _*)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) => foreach(b, id) }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    streamRanSinceTeardown = true
  }

  private def writeSlices(input: DataFrame, tsCol: String,
                          sentinelOpt: Option[DataFrame],
                          slices: Int, root: java.nio.file.Path,
                          src: java.nio.file.Path,
                          bounds: Option[(Long, Long)] = None): Unit = {
    // `bounds`: callers that already ran a min/max over THIS frame (for
    // the sentinel timestamp / lateness) pass it down — the internal
    // min/max scan was a measured chunk of the per-replay floor
    // (round-20: ~0.2 s per replay at gate scale, a full extra pass of
    // the replayed input at any scale).
    val (lo, hi) = bounds.getOrElse {
      val mm = phase("  slices:minmax")(
        input.agg(min(col(tsCol)).cast("long").as("lo"),
          max(col(tsCol)).cast("long").as("hi")).head())
      require(!mm.isNullAt(0), "replayFileStream: empty input")
      (mm.getLong(0), mm.getLong(1))
    }
    val span = math.max(1L, (hi - lo) / slices + 1)
    // ONE pass writes every slice file (hive-partitioned by slice index,
    // single task so each leaf is one part file) instead of `slices`
    // full-input filter+write jobs — the N-scan setup was a measured
    // chunk of the streaming family's bench floor. The sentinel
    // (watermark flush for append-mode aggregation replays; foreachBatch
    // replays omit it) RIDES THE LAST SLICE (round-20): the watermark is
    // computed from the max event time at the END of each micro-batch,
    // so a sentinel in the final data batch advances it exactly as a
    // sentinel-only batch did, and the trailing no-data batch still
    // does the flush — one whole micro-batch (its job + its planning/
    // WAL/state-commit overhead) removed from every replay.
    val sliced = input.withColumn("__slice",
      expr(s"(cast(`$tsCol` as bigint) - ${lo}L) div ${span}L"))
    val all = sentinelOpt.fold(sliced)(sent =>
      sliced.unionByName(sent.withColumn("__slice", lit((slices - 1).toLong))))
    writeSliceFiles(all, root, src,
      i => if (i < slices) Some(f"slice$i%04d") else None)
  }

  /** Write a `__slice`-stamped frame as one ascending-mtime file per
    * slice under `src` via a single hive-partitioned job. `nameOf` maps
    * a slice index to its file name (None = unexpected index, fails).
    * Empty slices produce no file — same observable behavior as the
    * old per-slice writes, whose empty files contributed no data
    * micro-batch and therefore failed the caller's incrementality
    * require just the same.
    */
  private def writeSliceFiles(all: DataFrame, root: java.nio.file.Path,
                              src: java.nio.file.Path,
                              nameOf: Int => Option[String]): Unit = {
    java.nio.file.Files.createDirectories(src)
    val tmp = root.resolve(s"__${src.getFileName}_all").toString
    // hash-repartition BY SLICE, not coalesce(1): each slice still lands
    // wholly in one task (one part file per slice dir — the invariant
    // the mtime-pinned rename below needs), but distinct slices write in
    // parallel instead of serializing the whole replay input through a
    // single task (round-19; the slice write was a measured chunk of the
    // per-replay floor)
    phase("  slices:write")(
      all.repartition(all.sparkSession.sparkContext.defaultParallelism,
          col("__slice"))
        .write.mode("overwrite").partitionBy("__slice").parquet(tmp))
    val baseMtime = (System.currentTimeMillis() / 1000) * 1000 - 3600L * 1000
    // Rows with a NULL slice value land in __slice=__HIVE_DEFAULT_PARTITION__;
    // the old per-slice `=== i` filters dropped them silently, so skip that
    // dir here to keep the same observable behavior (and avoid toLong blowing
    // up on the sentinel dir name).
    Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("__slice=") &&
        f.getName.stripPrefix("__slice=").forall(_.isDigit))
      .sortBy(_.getName.stripPrefix("__slice=").toLong)
      .foreach { dir =>
        val i = dir.getName.stripPrefix("__slice=").toInt
        val name = nameOf(i).getOrElse(
          sys.error(s"unexpected slice index $i in ${dir.getPath}"))
        val part = Option(dir.listFiles()).getOrElse(Array.empty)
          .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
          .getOrElse(sys.error(s"no part file written for slice $i"))
        val dst = src.resolve(s"$name.parquet").toFile
        require(part.renameTo(dst), s"rename failed: $part -> $dst")
        require(dst.setLastModified(baseMtime + i * 60000L),
          s"cannot pin mtime for $dst")
      }
  }

  /** Replay `input` as `slices` files ordered by `orderCol` and hand
    * each micro-batch's frame to `onBatch` — the `foreachBatch` half of
    * the harness, for sinks that are STATEMENTS rather than appends
    * (CDC upsert into a keyed table, warehouse MERGE). No watermark and
    * no sentinel: emission IS the callback, which Structured Streaming
    * invokes strictly in batch order with batch N+1 not starting until
    * N's callback returns — exactly the ordering a merge sequence
    * needs. Empty batches (possible when a slice range holds no rows)
    * are skipped. The incrementality require is the same as
    * [[replayFileStream]]'s: the work must actually arrive split.
    */
  def replayForeachBatch(input: DataFrame, orderCol: String, slices: Int,
                         bounds: Option[(Long, Long)] = None)
                        (onBatch: DataFrame => Unit): Unit = {
    val spark = input.sparkSession
    require(slices >= 2, s"replayForeachBatch: need >= 2 slices, got $slices")
    val root = java.nio.file.Files.createTempDirectory(scratchParent, "replayfb_")
    val src = root.resolve("src")
    writeSlices(input, orderCol, None, slices, root, src, bounds)
    val q = spark.readStream
      .schema(input.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!df.isEmpty) onBatch(df.toDF())
      }
      .option("checkpointLocation", root.resolve("ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    streamRanSinceTeardown = true
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    require(dataBatches >= slices,
      s"replayForeachBatch: expected >= $slices data micro-batches, saw " +
        s"$dataBatches - the run was not incremental")
  }

  /** [[replayForeachBatch]] with a mid-stream STOP + RESTART — the
    * exactly-once sink surface: run 1 consumes slices 0..splitAt-1 and
    * terminates; the remaining slices land and run 2 RESUMES from the
    * same checkpoint (verified: its first batchId strictly follows run
    * 1's last — a sink keyed on batchId therefore sees each batch id
    * exactly once across the two processes, which is the contract an
    * idempotent commit composes with). `onBatch(df, batchId)` gets the
    * real batch ids so sinks can implement batchId-keyed idempotence.
    */
  def replayForeachBatchRestart(input: DataFrame, orderCol: String,
                                slices: Int, splitAt: Int,
                                bounds: Option[(Long, Long)] = None)
                               (onBatch: (DataFrame, Long) => Unit): Unit = {
    val spark = input.sparkSession
    require(slices >= 3, s"replayForeachBatchRestart: need >= 3 slices, got $slices")
    require(splitAt >= 1 && splitAt < slices,
      s"replayForeachBatchRestart: splitAt must cut the replay in two, got $splitAt/$slices")
    val root = java.nio.file.Files.createTempDirectory(scratchParent, "replayfbr_")
    val src = root.resolve("src")
    val (lo, hi) = bounds.getOrElse {
      val mm = input.agg(min(col(orderCol)).cast("long").as("lo"),
        max(col(orderCol)).cast("long").as("hi")).head()
      require(!mm.isNullAt(0), "replayForeachBatchRestart: empty input")
      (mm.getLong(0), mm.getLong(1))
    }
    val span = math.max(1L, (hi - lo) / slices + 1)
    def writeSlicePhase(range: Range): Unit = {
      val sliced = input.withColumn("__slice",
          expr(s"(cast(`$orderCol` as bigint) - ${lo}L) div ${span}L"))
        .filter(col("__slice").isin(range.map(_.toLong): _*))
      writeSliceFiles(sliced, root, src,
        i => if (range.contains(i)) Some(f"slice$i%04d") else None)
    }
    def startRun(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .schema(input.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (!df.isEmpty) onBatch(df.toDF(), id)
        }
        .option("checkpointLocation", root.resolve("ck").toString)
        .trigger(Trigger.AvailableNow())
        .start()

    writeSlicePhase(0 until splitAt)
    val q1 = startRun()
    q1.awaitTermination()
    val q1Data = q1.recentProgress.count(_.numInputRows > 0)
    val q1LastBatch = q1.recentProgress.map(_.batchId).foldLeft(-1L)(math.max)
    require(q1Data >= splitAt,
      s"replayForeachBatchRestart: run 1 expected >= $splitAt data micro-batches, saw $q1Data")

    writeSlicePhase(splitAt until slices)
    val q2 = startRun()
    q2.awaitTermination()
    streamRanSinceTeardown = true
    val q2Data = q2.recentProgress.count(_.numInputRows > 0)
    val q2FirstBatch = q2.recentProgress.map(_.batchId).foldLeft(Long.MaxValue)(math.min)
    require(q2Data >= slices - splitAt,
      s"replayForeachBatchRestart: run 2 expected >= ${slices - splitAt} data " +
        s"micro-batches, saw $q2Data")
    require(q2FirstBatch > q1LastBatch,
      s"replayForeachBatchRestart: run 2 did not resume from the checkpoint " +
        s"(first batch $q2FirstBatch vs run-1 last $q1LastBatch)")
  }

  /** Run a STATEFUL transform in UPDATE output mode and capture every
    * micro-batch's emission with its batch id — the dashboard-refresh
    * semantics append mode can't show: a key re-emits in EVERY batch
    * where its aggregate changed, and the last write per key is the
    * final state. No watermark sentinel (update emits without
    * watermark gating) and no watermark needed on the transform for a
    * bounded replay. Returns the raw captured updates
    * (transform columns + `__batch`); callers reduce last-writer-wins
    * themselves so the per-batch emission trail stays checkable.
    */
  def replayUpdateMode(input: DataFrame, tsCol: String, slices: Int,
                       statePartitions: Int = 4,
                       bounds: Option[(Long, Long)] = None)
                      (transform: DataFrame => DataFrame): DataFrame = {
    val spark = input.sparkSession
    require(slices >= 2, s"replayUpdateMode: need >= 2 slices, got $slices")
    val root = java.nio.file.Files.createTempDirectory(scratchParent, "replayupd_")
    val src = root.resolve("src")
    writeSlices(input, tsCol, None, slices, root, src, bounds)
    val out = root.resolve("out").toString
    val shuffleKey = "spark.sql.shuffle.partitions"
    val savedShuffle = spark.conf.get(shuffleKey)
    val q = try {
      spark.conf.set(shuffleKey, statePartitions.toString)
      spark.readStream
        .schema(input.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .transform(transform)
        .writeStream
        .outputMode("update")
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            df.withColumn("__batch", lit(id))
              .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", root.resolve("ck").toString)
        .trigger(Trigger.AvailableNow())
        .start()
    } finally spark.conf.set(shuffleKey, savedShuffle)
    q.awaitTermination()
    streamRanSinceTeardown = true
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    require(dataBatches >= slices,
      s"replayUpdateMode: expected >= $slices data micro-batches, saw " +
        s"$dataBatches - the run was not incremental")
    spark.read.parquet(out)
  }

  def replayFileStream(input: DataFrame, tsCol: String, sentinel: DataFrame,
                       slices: Int, statePartitions: Int = 4,
                       sessionConfs: Map[String, String] = Map.empty,
                       bounds: Option[(Long, Long)] = None)
                      (transform: DataFrame => DataFrame): DataFrame = {
    val spark = input.sparkSession
    require(slices >= 2, s"replayFileStream: need >= 2 slices to exercise " +
      s"cross-batch state, got $slices")
    val root = java.nio.file.Files.createTempDirectory(scratchParent, "replay_")
    val src = root.resolve("src")
    phase("writeSlices")(
      writeSlices(input, tsCol, Some(sentinel), slices, root, src, bounds))

    val out = root.resolve("out").toString
    // State partition count is FROZEN INTO THE CHECKPOINT at query
    // start (spark.sql.shuffle.partitions), so it must be sized to the
    // replayed state volume, not inherited from the session's batch
    // tuning: every micro-batch commits one store delta per partition,
    // and 32 near-empty partitions × (slices + no-data batches) is
    // pure fixed overhead — measured ~2 s per replay at gate scale.
    // Restored after start() (the running query keeps its own copy);
    // results are partitioning-independent either way (determinism
    // gate pins this). `sessionConfs` rides the same set/restore window
    // (e.g. the RocksDB state-store provider transformWithState needs).
    val shuffleKey = "spark.sql.shuffle.partitions"
    val savedShuffle = spark.conf.get(shuffleKey)
    val savedConfs = sessionConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    val q = try {
      spark.conf.set(shuffleKey, statePartitions.toString)
      sessionConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      phase("start")(spark.readStream
        .schema(input.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .transform(transform)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", root.resolve("ck").toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start())
    } finally {
      spark.conf.set(shuffleKey, savedShuffle)
      savedConfs.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    phase("awaitTermination")(q.awaitTermination())
    streamRanSinceTeardown = true
    lastProgress = q.recentProgress.toIndexedSeq.map(_.json)
    if (streamDebug) lastProgress.foreach(p => System.err.println(s"[stream-progress] $p"))
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    require(dataBatches >= slices,
      s"replayFileStream: expected >= $slices data micro-batches, saw " +
        s"$dataBatches - the run was not incremental")
    spark.read.parquet(out)
  }

  /** CHECKPOINT-RESTART replay — the state-RECOVERY surface. Same
    * slicing/sentinel/mtime rules as [[replayFileStream]], but the
    * replay is driven by TWO sequential `StreamingQuery` lifetimes
    * sharing one checkpoint and one sink:
    *
    *   1. only the first `splitAt` slice files exist; query #1 runs
    *      them to completion (`Trigger.AvailableNow`) and STOPS — its
    *      aggregation state (partial windows/sessions straddling the
    *      split) and its watermark are now only in the checkpoint;
    *   2. the remaining slices plus the sentinel are written and query
    *      #2 starts AGAINST THE SAME CHECKPOINT — it must resume from
    *      the recorded offsets (batch ids continue; already-processed
    *      files are not re-read) and restore the state store, or the
    *      straddling windows emit as duplicate partials / doubled
    *      counts and the DuckDB oracle compare fails.
    *
    * Because the caller's `lateness` covers the whole replayed span,
    * the watermark stays below every real window end until the
    * sentinel, so ALL emission happens in query #2 — the entire run-1
    * contribution reaches the sink purely via recovered state. The
    * resume (not restart-from-scratch) is asserted structurally: query
    * #2's batch ids must start strictly after query #1's last.
    *
    * 100 TB shape: this is the production failure/redeploy path — on a
    * real cluster every long-running streaming job is stopped and
    * restarted (rollouts, preemptions, crashes) and correctness rests
    * exactly on this checkpoint contract, not on any single query
    * lifetime.
    */
  def replayFileStreamRestart(input: DataFrame, tsCol: String, sentinel: DataFrame,
                              slices: Int, splitAt: Int, statePartitions: Int = 4,
                              bounds: Option[(Long, Long)] = None)
                             (transform: DataFrame => DataFrame): DataFrame = {
    val spark = input.sparkSession
    // one slice per query lifetime is the minimum that pins the
    // contract: run 1 builds state, run 2 must recover it (the restart
    // boundary IS the slice boundary); the sentinel rides with run 2
    require(slices >= 2, s"replayFileStreamRestart: need >= 2 slices, got $slices")
    require(splitAt >= 1 && splitAt < slices,
      s"replayFileStreamRestart: splitAt must cut the replay in two, got $splitAt/$slices")
    val root = java.nio.file.Files.createTempDirectory(scratchParent, "replayrs_")
    val src = root.resolve("src")
    val (lo, hi) = bounds.getOrElse {
      val mm = input.agg(min(col(tsCol)).cast("long").as("lo"),
        max(col(tsCol)).cast("long").as("hi")).head()
      require(!mm.isNullAt(0), "replayFileStreamRestart: empty input")
      (mm.getLong(0), mm.getLong(1))
    }
    val span = math.max(1L, (hi - lo) / slices + 1)
    // one partitioned pass per PHASE (before/after the restart), not
    // one job per slice — see writeSlices; the sentinel rides run 2's
    // LAST slice (same one-fewer-micro-batch argument as writeSlices)
    def writeSlicePhase(range: Range, withSentinel: Boolean): Unit = {
      val sliced = input.withColumn("__slice",
          expr(s"(cast(`$tsCol` as bigint) - ${lo}L) div ${span}L"))
        .filter(col("__slice").isin(range.map(_.toLong): _*))
      val all = if (!withSentinel) sliced
        else sliced.unionByName(sentinel.withColumn("__slice", lit((slices - 1).toLong)))
      writeSliceFiles(all, root, src,
        i => if (range.contains(i)) Some(f"slice$i%04d") else None)
    }

    val out = root.resolve("out").toString
    val shuffleKey = "spark.sql.shuffle.partitions"
    val savedShuffle = spark.conf.get(shuffleKey)
    def startRun(): org.apache.spark.sql.streaming.StreamingQuery =
      try {
        spark.conf.set(shuffleKey, statePartitions.toString)
        spark.readStream
          .schema(input.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(src.toString)
          .transform(transform)
          .writeStream
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", root.resolve("ck").toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
      } finally spark.conf.set(shuffleKey, savedShuffle)

    writeSlicePhase(0 until splitAt, withSentinel = false)
    val q1 = startRun()
    q1.awaitTermination()
    val q1Data = q1.recentProgress.count(_.numInputRows > 0)
    val q1LastBatch = q1.recentProgress.map(_.batchId).foldLeft(-1L)(math.max)
    require(q1Data >= splitAt,
      s"replayFileStreamRestart: run 1 expected >= $splitAt data micro-batches, saw $q1Data")

    writeSlicePhase(splitAt until slices, withSentinel = true)
    val q2 = startRun()
    q2.awaitTermination()
    streamRanSinceTeardown = true
    val q2Data = q2.recentProgress.count(_.numInputRows > 0)
    val q2FirstBatch = q2.recentProgress.map(_.batchId).foldLeft(Long.MaxValue)(math.min)
    // the sentinel rides the last slice, so run 2 contributes exactly
    // its slice count of data batches
    require(q2Data >= slices - splitAt,
      s"replayFileStreamRestart: run 2 expected >= ${slices - splitAt} data " +
        s"micro-batches, saw $q2Data")
    require(q2FirstBatch > q1LastBatch,
      s"replayFileStreamRestart: run 2 did not resume from the checkpoint " +
        s"(first batch $q2FirstBatch vs run-1 last $q1LastBatch)")
    spark.read.parquet(out)
  }

  /** TWO-SOURCE replay — the stream-STREAM surface: both inputs become
    * independent time-sliced file sources (each micro-batch pulls one
    * file from each, so the sides advance together through event time)
    * and `transform` joins the two live streams. Same sentinel /
    * lateness / mtime rules per side; same incrementality require.
    * For an INNER stream-stream join, matches emit in the micro-batch
    * where the second side arrives — cross-batch join STATE (a left
    * row waiting for its right match N batches later) is exactly what
    * this exercises.
    */
  def replayFileStream2(a: DataFrame, b: DataFrame, tsCol: String,
                        sentinelA: DataFrame, sentinelB: DataFrame,
                        slices: Int, statePartitions: Int = 4)
                       (transform: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val spark = a.sparkSession
    require(slices >= 2, s"replayFileStream2: need >= 2 slices, got $slices")
    val root = java.nio.file.Files.createTempDirectory(scratchParent, "replay2_")
    val srcA = root.resolve("srcA")
    val srcB = root.resolve("srcB")
    writeSlices(a, tsCol, Some(sentinelA), slices, root, srcA)
    writeSlices(b, tsCol, Some(sentinelB), slices, root, srcB)
    val out = root.resolve("out").toString
    val shuffleKey = "spark.sql.shuffle.partitions"
    val savedShuffle = spark.conf.get(shuffleKey)
    val q = try {
      spark.conf.set(shuffleKey, statePartitions.toString)
      def src(p: java.nio.file.Path, schema: org.apache.spark.sql.types.StructType) =
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(p.toString)
      transform(src(srcA, a.schema), src(srcB, b.schema))
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", root.resolve("ck").toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
    } finally spark.conf.set(shuffleKey, savedShuffle)
    q.awaitTermination()
    streamRanSinceTeardown = true
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    require(dataBatches >= slices,
      s"replayFileStream2: expected >= $slices data micro-batches, saw " +
        s"$dataBatches - the run was not incremental")
    spark.read.parquet(out)
  }
}
