package graft.queries

import graft.SparkSpec

/** The window-based as-of join must agree with the join+aggregate form on
  * real data — two implementations, one semantics. */
class AsOfSpec extends SparkSpec {

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
