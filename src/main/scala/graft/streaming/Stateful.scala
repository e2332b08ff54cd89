package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for the stateful operators (matches the `events`
  * table / the [[StreamingSpec]] fixture shape). */
case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Per-user running state kept between micro-batches. */
case class UserState(nEvents: Long, totalValue: Double, lastTs: Long)

/** Emitted whenever a user's state updates. */
case class UserUpdate(user_id: Long, n_events: Long, total_value: Double,
    anomaly: Boolean)

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
}
