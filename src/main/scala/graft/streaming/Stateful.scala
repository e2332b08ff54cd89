package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Typed event row for the stateful operators (matches the `events`
  * table / the [[StreamingSpec]] fixture shape). */
case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Per-user running state kept between micro-batches. */
case class UserState(nEvents: Long, totalValue: Double, lastTs: Long)

/** Emitted whenever a user's state updates. */
case class UserUpdate(user_id: Long, n_events: Long, total_value: Double,
    anomaly: Boolean)

/** Closed per-user session emitted when the watermark passes the user's
  * last event + gap (event-time eviction). */
case class UserSession(user_id: Long, n_events: Long, total_value: Double,
    last_event_ms: Long)

/** A document arriving at the ingestion edge: `seq` is the admission
  * order (monotone per source — an ingest offset/sequence number). */
case class DocArrival(doc_id: Long, source: String, seq: Long, text: String)

/** Per-document admission verdict from [[Stateful.budgetAdmissions]]. */
case class AdmitDecision(doc_id: Long, source: String, seq: Long,
    n_tok: Long, admitted: Boolean)

/** Custom stateful streaming (SURVEY.md §2B B34 surface:
  * `KeyValueGroupedDataset.flatMapGroupsWithState`): arbitrary per-key
  * state that Spark's built-in windows can't express — here a running
  * per-user profile with anomaly flagging (value > 10× the user's running
  * mean).
  *
  * Scale properties: state is one small record per active user, sharded by
  * the groupBy key across executors and checkpointed by the state store;
  * a processing-time timeout ages out idle users so state never grows
  * unboundedly.
  */
object Stateful {

  private def updateUser(ageOutIdle: Boolean)(
      userId: Long,
      events: Iterator[EventRow],
      state: GroupState[UserState]): Iterator[UserUpdate] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var s = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
      val out = scala.collection.mutable.ArrayBuffer.empty[UserUpdate]
      events.foreach { e =>
        val mean = if (s.nEvents == 0) e.value else s.totalValue / s.nEvents
        val anomaly = s.nEvents >= 3 && e.value > 10 * mean
        s = UserState(s.nEvents + 1, s.totalValue + e.value,
          math.max(s.lastTs, e.ts.getTime))
        out += UserUpdate(userId, s.nEvents, s.totalValue, anomaly)
      }
      state.update(s)
      if (ageOutIdle) state.setTimeoutDuration("1 hour")
      out.iterator
    }
  }

  private def sessionize(gapMs: Long)(
      userId: Long,
      events: Iterator[EventRow],
      state: GroupState[UserState]): Iterator[UserSession] = {
    if (state.hasTimedOut) {
      // Watermark passed lastTs + gap: the session is complete BY EVENT
      // TIME — late events inside the gap would have extended it; later
      // ones are beyond the watermark contract.
      val s = state.get
      state.remove()
      Iterator.single(UserSession(userId, s.nEvents, s.totalValue, s.lastTs))
    } else {
      var s = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
      events.foreach { e =>
        s = UserState(s.nEvents + 1, s.totalValue + e.value,
          math.max(s.lastTs, e.ts.getTime))
      }
      state.update(s)
      state.setTimeoutTimestamp(s.lastTs + gapMs)
      Iterator.empty
    }
  }

  /** Event-time session aggregation via `EventTimeTimeout`: state for a
    * user is evicted — and its closed session emitted — when the stream's
    * WATERMARK (not the wall clock) passes the user's last event plus the
    * gap. This is the correct timeout mode for replayed/late data: a
    * backfill running at full speed closes sessions on the data's own
    * timeline, where a processing-time timeout would close them early or
    * never. Input must carry `withWatermark` on `ts` (asserted here). */
  def userSessions(events: Dataset[EventRow], gapMs: Long = 600000L): Dataset[UserSession] = {
    implicit val sessionEnc = Encoders.product[UserSession]
    implicit val stateEnc = Encoders.product[UserState]
    events
      .withWatermark("ts", s"$gapMs milliseconds")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[UserState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(sessionize(gapMs))
  }

  /** Spark-4-native session processor for [[userSessionsTws]]: `ValueState`
    * in the RocksDB state store plus an explicit event-time TIMER per user
    * — each batch of events re-arms the timer at lastTs + gap, and
    * `handleExpiredTimer` fires once the watermark passes it, emitting the
    * closed session. Same semantics as the flatMapGroupsWithState form
    * ([[userSessions]]), cross-validated in StatefulSpec. */
  private class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, EventRow, UserSession] {
    @transient private var state: ValueState[UserState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserState](
        "session", Encoders.product[UserState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, events: Iterator[EventRow],
        timers: TimerValues): Iterator[UserSession] = {
      var s = if (state.exists()) state.get() else UserState(0L, 0.0, Long.MinValue)
      events.foreach { e =>
        s = UserState(s.nEvents + 1, s.totalValue + e.value,
          math.max(s.lastTs, e.ts.getTime))
      }
      state.update(s)
      // one pending timer per user: re-arm at the new session deadline
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(s.lastTs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[UserSession] = {
      // An orphaned timer (state cleared elsewhere, or a replayed
      // checkpoint edge) must be ignored, not thrown on.
      if (!state.exists()) return Iterator.empty
      val s = state.get()
      state.clear()
      Iterator.single(UserSession(userId, s.nEvents, s.totalValue, s.lastTs))
    }
  }

  /** [[userSessions]] re-expressed on the Spark 4 `transformWithState`
    * API: typed `ValueState` in the RocksDB state store and explicit
    * event-time timers instead of the single implicit GroupState timeout.
    * Requires `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider (transformWithState's state backend). */
  def userSessionsTws(events: Dataset[EventRow], gapMs: Long = 600000L): Dataset[UserSession] = {
    implicit val sessionEnc = Encoders.product[UserSession]
    events
      .withWatermark("ts", s"$gapMs milliseconds")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Works on both batch and streaming Datasets (flatMapGroupsWithState
    * is the same API either way; in batch mode state starts empty).
    *
    * `ageOutIdle=true` arms a 1-hour processing-time timeout so idle
    * users' state is evicted — the production setting for unbounded key
    * spaces. Leave false for synchronous tests: pending timeouts keep
    * scheduling no-data batches, so `processAllAvailable()` never sees an
    * idle query. */
  def userProfiles(events: Dataset[EventRow], ageOutIdle: Boolean = false): Dataset[UserUpdate] = {
    implicit val updateEnc = Encoders.product[UserUpdate]
    implicit val stateEnc = Encoders.product[UserState]
    val timeout = if (ageOutIdle) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Append(), timeout)(updateUser(ageOutIdle))
  }

  /** Default admission budget (SUBWORD tokens per source — the x56 unit;
    * ~40% of a source's mass at sf0.001/0.01, ~4% at sf0.1, so the
    * decision is non-trivial at every test scale). */
  val AdmitBudget = 2000L

  /** Token-budget admission at the ingestion edge: per-source running
    * token total in keyed state; a document is admitted iff the total
    * BEFORE it is under the budget (x22's exclusive-prefix rule, so the
    * budget is overshot by at most one document), with tokens counted in
    * x56's SUBWORD unit ([[graft.functions.SubwordCount]] — the same
    * code the native expression runs, called directly here since a typed
    * state function is already JVM-side). The total accumulates EVERY
    * processed document (monotone, matching the window-oracle exactly);
    * once a source exhausts its budget every later arrival is rejected.
    *
    * One function, both modes: on a batch Dataset
    * `flatMapGroupsWithState` sees each source's full history in one
    * iterator (sorted here by `seq`) — that batch form is the registered
    * x57 and is DuckDB-oracle-checked; under `readStream` the same
    * function keeps the running total in the state store across
    * micro-batches, and StreamingSpec proves chunked-stream ≡ one-batch
    * when arrivals respect `seq` order. At-least-once replay of an
    * already-counted document double-counts it — the usual foreachBatch
    * idempotency caveat, documented rather than hidden.
    *
    * Scale: state is ONE long per source; rows shard by source. A whole
    * source's micro-batch slice lands in one task — the whale knob is
    * the micro-batch size, and the batch backfill form for huge sources
    * is x22b's two-phase pre-prune, not this. */
  def budgetAdmissions(docs: Dataset[DocArrival],
      budget: Long = AdmitBudget): Dataset[AdmitDecision] = {
    implicit val outEnc = Encoders.product[AdmitDecision]
    implicit val stateEnc = Encoders.scalaLong
    docs
      .groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState[Long, AdmitDecision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[DocArrival], state: GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.seq).map { d =>
            val n = graft.functions.SubwordCount.count(
              Option(d.text).getOrElse(""))
            val admit = used < budget
            used += n
            AdmitDecision(d.doc_id, source, d.seq, n, admit)
          }
          state.update(used)
          out.iterator
      }
  }
}
