package graft.queries

import graft.SparkSpec

/** The window-based as-of join must agree with the join+aggregate form on
  * real data — two implementations, one semantics. */
class AsOfSpec extends SparkSpec {

  test("payload propagates atomically: a null field in the latest left row stays null") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 00:00:01"), 10L, Option(100.0), Option("first")),
      (1L, ts("2024-01-01 00:00:02"), 11L, None, Option("second")))
      .toDF("k", "lts", "seq", "a", "b")
    val right = Seq((1L, ts("2024-01-01 00:00:03"), 99L)).toDF("k", "rts", "rid")
    val out = AsOf.asOfJoin(left, right, "k", "k", "lts", "rts", "seq", Seq("a", "b"))
      .select("rid", "asof_a", "asof_b").collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(1),
      "latest left row's null payload field must NOT fall back to an older row")
    assert(out(0).getString(2) == "second")
  }

  test("null left keys/timestamps never match (join-predicate semantics)") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (Option(1L), Option(ts("2024-01-01 00:00:05")), 10L, "late"), // after the right row
      (Option(1L), None, 11L, "null-ts"),
      (Option.empty[Long], Option(ts("2024-01-01 00:00:01")), 12L, "null-key"))
      .toDF("k", "lts", "seq", "a")
    val right = Seq((1L, ts("2024-01-01 00:00:03"), 99L)).toDF("k", "rts", "rid")
    val out = AsOf.asOfJoin(left, right, "k", "k", "lts", "rts", "seq", Seq("a")).collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(out(0).fieldIndex("asof_a")),
      "null-ts/null-key left rows must not become universal matches")
  }

  test("window as-of equals join+max as-of on sf0.001") {
    val windowed = AsOf.latestOrderPerEvent(spark, sf)
      .select("event_id", "last_order_at")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val joined = Relational.defs.find(_.name == "b11_asof_join").get
      .fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(windowed.keySet == joined.keySet)
    windowed.foreach { case (id, at) =>
      assert(joined(id) == at, s"event $id: window=$at join=${joined(id)}")
    }
  }
}
