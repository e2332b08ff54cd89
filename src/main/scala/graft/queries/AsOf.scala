package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Window-based as-of join — the scale path for "latest left row at or
  * before each right row's timestamp".
  *
  * The join+max form (B11) materializes every (event × prior-order) pair
  * before aggregating: fine when per-key history is bounded, quadratic when
  * it is not. This operator instead UNIONs both sides into one stream,
  * sorts each key's timeline once (a single shuffle on the key — the same
  * exchange a sort-merge join needs anyway), and propagates the most
  * recent left-side payload with `last(_, ignoreNulls)` over an unbounded
  * preceding frame. Cost stays linear in input size per key — no pairwise
  * intermediate at any cluster size.
  *
  * Implemented by composing stock operators (union/window) per the
  * operator decision table (SURVEY.md §7.3): no custom SparkPlan needed.
  */
object AsOf {

  /** For each row of `right`, attach the latest `left` payload with
    * `left.leftTs <= right.rightTs` on the same key. Equal-timestamp left
    * rows resolve deterministically to the highest `leftSeq` value; left
    * rows sort before right rows at the same timestamp (inclusive as-of).
    * Output: all `right` columns + `asof_<payload>` columns (null when no
    * left row precedes).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      leftSeq: String,
      payloadCols: Seq[String]): DataFrame = {
    val rightCols = right.columns.toSeq
    val payloadType = StructType(payloadCols.map(c => left.schema(c)))
    // Left rows with a null key or timestamp can never satisfy the
    // join+max form's `leftTs <= rightTs` / key-equality predicates, so
    // they are excluded up front — under the window's nulls-first order
    // they would otherwise become universal "matches".
    val lSide = left
      .filter(col(leftKey).isNotNull && col(leftTs).isNotNull)
      .select(
        Seq(col(leftKey).as("_k"), col(leftTs).cast("timestamp").as("_ts"),
          lit(0).as("_kind"), col(leftSeq).as("_seq"),
          // The payload travels as ONE struct so propagation is atomic per
          // left row: a null payload FIELD in the latest left row stays
          // null instead of falling back to an older row's value (which
          // would fabricate a column mix no left row ever contained).
          struct(payloadCols.map(col): _*).as("_p")) ++
          rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val rSide = right.select(
      Seq(col(rightKey).as("_k"), col(rightTs).cast("timestamp").as("_ts"),
        lit(1).as("_kind"), lit(null).cast(left.schema(leftSeq).dataType).as("_seq"),
        lit(null).cast(payloadType).as("_p")) ++
        rightCols.map(c => col(c).as(s"_r_$c")): _*)
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts"), col("_kind"), col("_seq"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lSide.unionByName(rSide)
      .select(
        Seq(col("_kind"),
          last(col("_p"), ignoreNulls = true).over(w).as("_asof")) ++
          rightCols.map(c => col(s"_r_$c").as(c)): _*)
      .filter(col("_kind") === 1)
      .select(
        rightCols.map(col) ++
          payloadCols.map(c => col("_asof").getField(c).as(s"asof_$c")): _*)
  }

  /** B11 in window form: latest order per event (same semantics as the
    * join+max variant, linear instead of pairwise). */
  def latestOrderPerEvent(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.t(s, dir, "orders")
    val events = Tables.t(s, dir, "events")
    asOfJoin(orders, events,
      leftKey = "o_custkey", rightKey = "user_id",
      leftTs = "o_orderdate", rightTs = "ts",
      leftSeq = "o_orderkey", payloadCols = Seq("o_orderkey", "o_orderdate"))
      .filter(col("asof_o_orderkey").isNotNull)
      .select(col("event_id"),
        col("asof_o_orderkey").as("last_orderkey"),
        date_format(col("asof_o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("last_order_at"))
      .orderBy("event_id")
  }

  private val b11bSql =
    """WITH j AS (SELECT e.event_id, o.o_orderkey, o.o_orderdate
                  FROM events e JOIN orders o
                    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts),
       m AS (SELECT event_id, max(o_orderdate) AS md FROM j GROUP BY event_id)
       SELECT j.event_id, max(j.o_orderkey) AS last_orderkey,
              strftime(m.md, '%Y-%m-%d %H:%M:%S') AS last_order_at
       FROM j JOIN m ON j.event_id = m.event_id AND j.o_orderdate = m.md
       GROUP BY j.event_id, m.md ORDER BY j.event_id"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("b11b_asof_window", latestOrderPerEvent, Some(b11bSql)))
}
