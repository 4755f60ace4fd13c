package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.text.TextOps

/** Streaming twins of the batch dedup/upsert operators — the pieces a
  * continuously-ingesting training-data pipeline needs on top of the
  * reference's batch-only DAG: exact dedup of a document stream and
  * CDC newest-version-wins keyed state (the streaming form of
  * [[graft.operators.Relational.upsert]], r32).
  */
object StreamOps {

  /** Streaming exact dedup by normalized-content fingerprint
    * ([[TextOps.fingerprint]] — the same key t1 dedups on in batch).
    * `dropDuplicatesWithinWatermark` bounds the dedup state to the
    * watermark horizon, so state size is O(docs per lateness window),
    * never O(corpus) — the only viable shape for an unbounded stream.
    * Works on batch frames too (global dedup, watermark a no-op).
    */
  def dedupStream(docs: DataFrame, tsCol: String = "ts_ts",
                  textCol: String = "text",
                  lateness: String = "10 minutes"): DataFrame = {
    val fp = docs.withColumn("fp", TextOps.fingerprint(col(textCol)))
    if (fp.isStreaming)
      fp.withWatermark(tsCol, lateness).dropDuplicatesWithinWatermark("fp")
    else fp.dropDuplicates("fp")
  }

  case class Change(key: Long, version: Long, payload: String)

  // public: janino-generated encoder code must reach the constructor
  case class LatestState(version: Long, payload: String)

  implicit private val changeEnc: Encoder[Change] = Encoders.product[Change]
  implicit private val stateEnc: Encoder[LatestState] = Encoders.product[LatestState]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  /** CDC newest-version-wins over a keyed change stream: emits a row
    * whenever a strictly newer version arrives for a key, suppressing
    * stale/out-of-order updates. State per key is one (version, payload)
    * pair — O(live keys), partitioned by key across executors. Update
    * output mode; the batch twin is `Relational.upsert` (r32 semantics).
    *
    * @param idleTtl evict a key's state after this much processing-time
    *   inactivity (e.g. "24 hours"). Without a TTL, state is O(ALL keys
    *   ever seen) — unbounded on a 100 TB change stream. Eviction trades
    *   exactness: a pre-eviction stale version arriving later would be
    *   re-emitted as new. None (the default) keeps exact semantics for
    *   bounded key domains.
    */
  def latestByKey(changes: Dataset[Change],
                  idleTtl: Option[String] = None): Dataset[Change] = {
    val timeoutKind = if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    changes.groupByKey(_.key)
      .flatMapGroupsWithState[LatestState, Change](
        OutputMode.Update, timeoutKind) {
        (key: Long, it: Iterator[Change], state: GroupState[LatestState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val newest = (state.getOption.map(s => Change(key, s.version, s.payload)).iterator ++ it)
              .maxBy(_.version)
            val advanced = state.getOption.forall(_.version < newest.version)
            if (advanced) state.update(LatestState(newest.version, newest.payload))
            idleTtl.foreach(state.setTimeoutDuration)
            if (advanced) Iterator.single(newest) else Iterator.empty
          }
      }
  }

  /** Continuous incremental gold refresh: apply each micro-batch of a CDC
    * change stream to an on-disk parquet table via
    * [[graft.operators.Scale.mergeParquet]] (newest-per-key wins under
    * `order`; with `partitionCol`, only touched partitions rewrite). The
    * streaming replacement for the reference's rebuild-all-of-gold-per-run
    * loop (gold-snowflake/fact_sales_gold.py full overwrite): steady-state
    * cost per trigger is O(changed slice), not O(table).
    *
    * Restart safety: `foreachBatch` may REPLAY the last uncommitted batch
    * after a crash. The merge is idempotent — re-merging rows already in
    * the table changes nothing, because a tie on `order` keeps the
    * incumbent only when `order` is a TOTAL order per key (give it a
    * deterministic tiebreak, same as every dedupLatest call site); batch 0
    * bootstraps the table if `path` doesn't exist yet.
    */
  def mergeParquetSink(changes: DataFrame, path: String, keys: Seq[String],
                       order: Seq[org.apache.spark.sql.Column],
                       checkpoint: String,
                       partitionCol: Option[String] = None,
                       deleteCol: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // empty triggers (watermark-only progress) must not touch the table
        if (!batch.isEmpty)
          graft.operators.Scale.mergeParquet(
            batch.sparkSession, path, batch, keys, order, partitionCol, deleteCol)
      }
      .start()
}
