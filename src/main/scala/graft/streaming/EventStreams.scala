package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the event stream. The reference
  * pipeline is batch-only (SURVEY.md §2.8 — no streaming anywhere); these
  * are the streaming twins a complete engine ships: watermarked windowed
  * aggregation and stateful gap sessionization. Both transforms accept
  * either a batch or a streaming DataFrame — the verify-gate batch
  * queries (r19, s1) pin the same semantics the streaming paths produce.
  */
object EventStreams {

  case class Event(event_id: Long, ts_us: Long, user_id: Long,
                   event_type: String, value: Double)

  case class Session(user_id: Long, session_start_us: Long,
                     session_end_us: Long, n_events: Long)

  // NOT private: the state encoder's generated code must reach the
  // constructor (private nested classes break janino compilation).
  case class SessionState(startUs: Long, endUs: Long, n: Long)

  implicit private val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit private val sessionEnc: Encoder[Session] = Encoders.product[Session]
  implicit private val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Tumbling-window counts + value totals per event type, tolerating
    * 10 minutes of event-time lateness. Works identically on
    * `spark.readStream` input (append/update modes) and batch input
    * (where the watermark is a no-op).
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     lateness: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts_ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts_ts", lateness)
      .groupBy(window(col("ts_ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("w.start")).as("bucket"), col("event_type"), col("cnt"))

  /** Sliding (overlapping) windowed counts: every event is assigned to
    * window_/slide windows (e.g. 2 for 1h/30m), so unlike
    * [[windowedCounts]] the expansion itself — Spark's multi-window
    * explode inside the streaming aggregate — is under test, and each
    * open window's partial state spans MORE micro-batches than a
    * tumbling bucket would. State is still keyed (window, type) and
    * watermark-expired.
    */
  def slidingCounts(events: DataFrame, window_ : String, slide: String,
                    lateness: String): DataFrame =
    events
      .withColumn("ts_ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts_ts", lateness)
      .groupBy(window(col("ts_ts"), window_, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("w.start")).as("bucket"), col("event_type"), col("cnt"))

  /** Stateful gap sessionization via flatMapGroupsWithState: a session
    * closes when no event arrives within `gapUs` of its end. In
    * streaming, closure is driven by event-time timeout against the
    * watermark; in batch, each key is processed once with its full
    * iterator and all sessions emit immediately. Same output contract as
    * the batch window-based Relational.sessionize.
    */
  def sessionize(events: Dataset[Event], gapUs: Long): Dataset[Session] = {
    val gapMs = gapUs / 1000
    events
      .withColumn("ts_ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts_ts", "30 minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.startUs, s.endUs, s.n))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts_us - s.endUs <= gapUs =>
                  cur = Some(SessionState(s.startUs, math.max(s.endUs, e.ts_us), s.n + 1))
                case Some(s) =>
                  closed += Session(userId, s.startUs, s.endUs, s.n)
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1))
                case None =>
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1))
              }
            }
            cur match {
              case Some(s) if state.getOption.isEmpty || closed.nonEmpty || true =>
                state.update(s)
                // streaming: wait for quiet period before closing
                state.setTimeoutTimestamp(s.endUs / 1000 + gapMs)
              case _ =>
            }
            closed.iterator
          }
      }
  }

  /** The same gap-sessionization state machine through Spark 4's
    * `transformWithState` — the MODERN arbitrary-state API that
    * supersedes [[sessionize]]'s flatMapGroupsWithState: typed named
    * state registered in `init` (ValueState here; ListState/MapState
    * and per-state TTL are the API's other legs), EXPLICIT timers
    * (`registerTimer`/`handleExpiredTimer`, several per key if needed)
    * instead of the single implicit timeout slot, and RocksDB-backed
    * state stores (the API requires the provider). Semantics are
    * deliberately identical to [[sessionize]] — same fold, same
    * deterministic (ts, event_id) in-batch order, same end+gap timer —
    * so the three implementations (engine session_window, the legacy
    * GroupState machine, and this) are all pinned to ONE SQL oracle.
    *
    * 100 TB shape: state is per-live-key and timer-expired, identical
    * cost model to flatMapGroupsWithState; RocksDB moves state off-heap
    * so a wide key space spills to local disk instead of executor heap.
    */
  def sessionizeTws(events: Dataset[Event], gapUs: Long): Dataset[Session] = {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, TimerValues, ExpiredTimerInfo, StatefulProcessor}
    val gapMs = gapUs / 1000
    class SessionProcessor extends StatefulProcessor[Long, Event, Session] {
      @transient private var st: org.apache.spark.sql.streaming.ValueState[SessionState] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[SessionState]("session",
          Encoders.product[SessionState], TTLConfig.NONE)
      override def handleInputRows(userId: Long, rows: Iterator[Event],
                                   tv: TimerValues): Iterator[Session] = {
        val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
        val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
        var cur = if (st.exists()) Some(st.get()) else None
        sorted.foreach { e =>
          cur match {
            case Some(s) if e.ts_us - s.endUs <= gapUs =>
              cur = Some(SessionState(s.startUs, math.max(s.endUs, e.ts_us), s.n + 1))
            case Some(s) =>
              closed += Session(userId, s.startUs, s.endUs, s.n)
              cur = Some(SessionState(e.ts_us, e.ts_us, 1))
            case None =>
              cur = Some(SessionState(e.ts_us, e.ts_us, 1))
          }
        }
        cur.foreach { s =>
          st.update(s)
          // one pending close-timer per key: replace, never accumulate
          getHandle.listTimers().foreach(getHandle.deleteTimer)
          getHandle.registerTimer(s.endUs / 1000 + gapMs)
        }
        closed.iterator
      }
      override def handleExpiredTimer(userId: Long, tv: TimerValues,
                                      info: ExpiredTimerInfo): Iterator[Session] =
        if (st.exists()) {
          val s = st.get(); st.clear()
          Iterator.single(Session(userId, s.startUs, s.endUs, s.n))
        } else Iterator.empty
    }
    events
      .withColumn("ts_ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts_ts", "30 minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState[Session](new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Gap sessionization through Spark's NATIVE `session_window` —
    * the declarative alternative to [[sessionize]]'s
    * flatMapGroupsWithState: the engine manages merging/expiring session
    * state (no user state-machine to get wrong), and the same code runs
    * batch and streaming (append mode after the watermark passes a
    * session's end). Output contract matches [[sessionize]]: the native
    * window's end is last-event + gap, so `session_end_us` subtracts the
    * gap back to the last event's time. Prefer this form unless the
    * session logic needs custom per-event state (e.g. [[sessionize]]'s
    * exact event_id tie-break inside one timestamp — the native window
    * keys on time alone, identical whenever timestamps are distinct).
    */
  def sessionizeNative(events: DataFrame, gapUs: Long,
                       lateness: String = "30 minutes"): DataFrame = {
    // the session_window gap is an interval literal with millisecond
    // granularity here; a silently truncated sub-ms gap would diverge
    // from the µs-exact stateful twin
    require(gapUs % 1000 == 0, s"gapUs must be whole milliseconds, got $gapUs")
    val gapExpr = s"INTERVAL ${gapUs / 1000} MILLISECOND"
    events
      .withColumn("ts_ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts_ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts_ts"), gapExpr).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        (unix_micros(col("w.end")) - gapUs).as("session_end_us"),
        col("n_events"))
  }

  /** Time-bounded attribution join — the stream-stream join surface
    * (SURVEY.md §2.8; the reference pipeline has no streaming at all).
    * Pairs each impression with every conversion by the same user whose
    * event time falls in `[imp_ts, imp_ts + windowSec]`.
    *
    * Inputs need `event_id`, `user_id`, `ts_us` (epoch micros). On
    * streaming frames both sides get a watermark and the join carries an
    * event-time range constraint, so Spark can expire join state past
    * `lateness + windowSec` — state is O(events per horizon), never
    * O(stream). On batch frames the same code is a plain hash equijoin
    * on `user_id` with a residual time filter (the equi-key bounds the
    * pair blow-up; no all-pairs step), which is what the s3 gate query
    * hash-matches against DuckDB.
    */
  def attributionJoin(imps: DataFrame, convs: DataFrame,
                      windowSec: Long = 3600,
                      lateness: String = "1 hour",
                      joinType: String = "inner"): DataFrame = {
    def prep(df: DataFrame, side: String): DataFrame = {
      val withTs = df.select(
        col("event_id").as(s"${side}_id"),
        col("user_id").as(s"${side}_user"),
        col("ts_us").as(s"${side}_us"),
        timestamp_micros(col("ts_us")).as(s"${side}_ts"))
      if (df.isStreaming) withTs.withWatermark(s"${side}_ts", lateness) else withTs
    }
    val i = prep(imps, "imp")
    val c = prep(convs, "conv")
    // leftOuter is the UNMATCHED-IMPRESSION surface: in streaming,
    // Spark can only declare a buffered left row unmatched once the
    // watermark has passed its whole match window (imp_ts + windowSec),
    // so null-padded rows emit with that delay — the same state-expiry
    // bound the inner join uses, no extra state. In batch the same
    // code is a plain outer equijoin with the residual time condition.
    i.join(c,
        col("imp_user") === col("conv_user") &&
          col("conv_ts") >= col("imp_ts") &&
          col("conv_ts") <= col("imp_ts") + expr(s"INTERVAL $windowSec SECONDS"),
        joinType)
      .select(col("imp_user").as("user_id"), col("imp_id"), col("conv_id"),
        (col("conv_us") - col("imp_us")).as("delay_us"))
  }

  /** Stream-static enrichment: join a (possibly unbounded) event frame
    * against a bounded dimension frame. The dim side is explicitly
    * broadcast — in streaming mode Spark re-plans the static side per
    * micro-batch, and broadcasting keeps every batch a map-side hash
    * join with NO stream-side shuffle, which is the only sane shape for
    * a 100 TB/day stream against a dim table. Works identically on
    * batch frames (the s4 gate query hash-matches DuckDB through this
    * exact code path); StreamingSpec pins MemoryStream == batch twin.
    */
  def enrichJoin(events: DataFrame, dim: DataFrame,
                 eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  /** Batch flush helper for tests/backfills: sessionize a bounded
    * dataset, emitting ALL sessions including still-open ones (batch
    * flatMapGroupsWithState never times out, so open sessions would
    * otherwise stay in discarded state).
    */
  def sessionizeBatch(events: Dataset[Event], gapUs: Long): Dataset[Session] = {
    events.groupByKey(_.user_id).flatMapGroups { (userId: Long, it: Iterator[Event]) =>
      val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var cur: Option[SessionState] = None
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts_us - s.endUs <= gapUs =>
            cur = Some(SessionState(s.startUs, math.max(s.endUs, e.ts_us), s.n + 1))
          case Some(s) =>
            out += Session(userId, s.startUs, s.endUs, s.n)
            cur = Some(SessionState(e.ts_us, e.ts_us, 1))
          case None =>
            cur = Some(SessionState(e.ts_us, e.ts_us, 1))
        }
      }
      cur.foreach(s => out += Session(userId, s.startUs, s.endUs, s.n))
      out.iterator
    }
  }
}
