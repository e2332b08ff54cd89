package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** flatMapGroupsWithState: per-user running state across micro-batches —
  * counts accumulate between batches and anomalies flag against the
  * running mean. */
class StatefulSpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long, v: Double) =
    EventRow(id, Timestamp.valueOf(t), user, "click", v, "{}")

  test("state accumulates across micro-batches and flags anomalies") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Stateful.userProfiles(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("stateful_out").start()

    input.addData(Seq(
      ev(1, "2024-01-01 00:00:01", 1, 10.0),
      ev(2, "2024-01-01 00:00:02", 1, 12.0),
      ev(3, "2024-01-01 00:00:03", 1, 11.0)))
    q.processAllAvailable()
    // second batch: state must carry over (counts continue), 500 ≫ 10× mean
    input.addData(Seq(
      ev(4, "2024-01-01 00:10:00", 1, 500.0),
      ev(5, "2024-01-01 00:10:01", 2, 1.0)))
    q.processAllAvailable()
    val rows = spark.table("stateful_out").as[UserUpdate].collect().toSeq
    q.stop()

    val user1 = rows.filter(_.user_id == 1).sortBy(_.n_events)
    assert(user1.map(_.n_events) == Seq(1L, 2L, 3L, 4L), "state must survive batches")
    assert(user1.last.anomaly, "500 vs mean ~11 must flag")
    assert(user1.init.forall(!_.anomaly))
    assert(rows.count(_.user_id == 2) == 1)
  }

  test("event-time timeout closes sessions when the WATERMARK passes gap, not wall clock") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Stateful.userSessions(input.toDS(), gapMs = 600000L) // 10 min gap
      .writeStream.outputMode("append").format("memory").queryName("sessions_out").start()

    // user 1's session: three events inside one minute
    input.addData(Seq(
      ev(1, "2024-01-01 00:00:01", 1, 10.0),
      ev(2, "2024-01-01 00:00:02", 1, 12.0),
      ev(3, "2024-01-01 00:00:30", 1, 11.0)))
    q.processAllAvailable()
    assert(spark.table("sessions_out").isEmpty,
      "no wall-clock time passed, but more importantly no WATERMARK passed: session stays open")

    // an unrelated user's much-later event advances the watermark to
    // 00:50:00, far past user 1's last event (00:00:30) + 10 min
    input.addData(Seq(ev(4, "2024-01-01 01:00:00", 2, 1.0)))
    q.processAllAvailable()
    // timeouts fire in the micro-batch AFTER the watermark update
    input.addData(Seq(ev(5, "2024-01-01 01:00:01", 2, 1.0)))
    q.processAllAvailable()
    val rows = spark.table("sessions_out").as[UserSession].collect().toSeq
    q.stop()

    val s1 = rows.filter(_.user_id == 1)
    assert(s1.size == 1, s"user 1's session must close exactly once, got $rows")
    assert(s1.head.n_events == 3 && s1.head.total_value == 33.0)
    assert(s1.head.last_event_ms == Timestamp.valueOf("2024-01-01 00:00:30").getTime)
    assert(!rows.exists(_.user_id == 2), "user 2's session is still open (watermark at 00:50)")
  }

  test("transformWithState sessionizer matches the flatMapGroupsWithState form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[EventRow]
      val q = Stateful.userSessionsTws(input.toDS(), gapMs = 600000L)
        .writeStream.outputMode("append").format("memory").queryName("tws_out").start()
      input.addData(Seq(
        ev(1, "2024-01-01 00:00:01", 1, 10.0),
        ev(2, "2024-01-01 00:00:02", 1, 12.0),
        ev(3, "2024-01-01 00:00:30", 1, 11.0)))
      q.processAllAvailable()
      input.addData(Seq(ev(4, "2024-01-01 01:00:00", 2, 1.0)))
      q.processAllAvailable()
      input.addData(Seq(ev(5, "2024-01-01 01:00:01", 2, 1.0)))
      q.processAllAvailable()
      val rows = spark.table("tws_out").as[UserSession].collect().toSeq
      q.stop()
      // identical close to the GroupState form's assertions
      val s1 = rows.filter(_.user_id == 1)
      assert(s1.size == 1, s"user 1's session must close exactly once, got $rows")
      assert(s1.head.n_events == 3 && s1.head.total_value == 33.0)
      assert(s1.head.last_event_ms == Timestamp.valueOf("2024-01-01 00:00:30").getTime)
      assert(!rows.exists(_.user_id == 2), "user 2's session still open")
    } finally prevProvider match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("batch mode runs the same operator with empty initial state") {
    import spark.implicits._
    val out = Stateful.userProfiles(Seq(
      ev(1, "2024-01-01 00:00:01", 7, 5.0),
      ev(2, "2024-01-01 00:00:02", 7, 6.0)).toDS())
      .collect().sortBy(_.n_events)
    assert(out.map(_.n_events).toSeq == Seq(1L, 2L))
    assert(out.last.total_value == 11.0)
  }
}
