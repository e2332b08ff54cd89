package graft.streaming

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed event aggregations (SURVEY.md §2B B31–B34).
  *
  * Each operator is written once against a DataFrame so the SAME logical
  * query runs in batch (driver verify, below) and over `readStream` with a
  * watermark (see [[StreamingJobs]] and the streaming specs). Event-time
  * windows shuffle on (window, key) — at scale the watermark bounds state,
  * and tumbling/sliding windows compact map-side before the exchange.
  */
object Windows {
  private def events(s: SparkSession, dir: String) = Tables.t(s, dir, "events")

  // ---------------------------------------------------------------- B31
  /** Tumbling 1-hour window × event_type. Core shared form: works on a
    * batch DF or a streaming DF unchanged. */
  def tumblingAgg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        col("event_type"), col("n"), col("sum_value"))

  def tumblingQuery(s: SparkSession, dir: String): DataFrame =
    tumblingAgg(events(s, dir)).orderBy("hr", "event_type")

  private val b31Sql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1, 2 ORDER BY hr, event_type"""

  // ---------------------------------------------------------------- B32
  /** Sliding window: 1-hour length, 30-minute slide (each event lands in
    * exactly two windows, epoch-aligned). */
  def slidingAgg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("ws"),
        col("event_type"), col("n"), col("sum_value"))

  def slidingQuery(s: SparkSession, dir: String): DataFrame =
    slidingAgg(events(s, dir)).orderBy("ws", "event_type")

  private val b32Sql =
    """SELECT CAST(floor(epoch_us(ts) / 1000000 / 1800) * 1800 AS BIGINT) - k * 1800 AS ws,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) kk
       GROUP BY 1, 2 ORDER BY ws, event_type"""

  // ---------------------------------------------------------------- B33
  /** Session windows (30-minute inactivity gap) in the lag+cumsum batch
    * form — the same session ids `session_window(ts, "30 minutes")`
    * assigns (native windows are end-EXCLUSIVE: an event exactly `gap`
    * after its predecessor starts a new session, hence `>=`); the
    * streaming form lives in [[StreamingJobs.sessionized]]. */
  def sessionAgg(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(w)
    df.withColumn("new_sess",
        when(prevTs.isNull ||
          unix_micros(col("ts")) - unix_micros(prevTs) >= 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sess", sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        round(sum("value"), 2).as("sum_value"))
  }

  def sessionQuery(s: SparkSession, dir: String): DataFrame =
    sessionAgg(events(s, dir)).orderBy("user_id", "sess")

  private val b33Sql =
    """WITH x AS (SELECT user_id, event_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                THEN 1 ELSE 0 END AS new_sess
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       y AS (SELECT user_id, ts, value,
           CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
         FROM x)
       SELECT user_id, sess, count(*) AS n_events,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
         round(sum(value), 2) AS sum_value
       FROM y GROUP BY user_id, sess ORDER BY user_id, sess"""

  // ---------------------------------------------------------------- B34
  /** Event-id dedup counts — batch counterpart of the streaming
    * watermarked dedup ([[StreamingJobs.dedup]]). countDistinct (not
    * dropDuplicates-then-count) so a duplicated event_id carrying
    * different event_types counts under BOTH types deterministically,
    * exactly as the COUNT(DISTINCT) oracle does — dropDuplicates would
    * keep a partition-order-dependent arbitrary row. */
  def dedupCounts(df: DataFrame): DataFrame =
    df.groupBy("event_type")
      .agg(countDistinct(col("event_id")).as("n_unique"))

  def dedupQuery(s: SparkSession, dir: String): DataFrame =
    dedupCounts(events(s, dir)).orderBy("event_type")

  private val b34Sql =
    """SELECT event_type, count(DISTINCT event_id) AS n_unique
       FROM events GROUP BY event_type ORDER BY event_type"""

  // ----------------------------------------------------------------
  // ---------------------------------------------------------------- x12
  /** Event-time interval join (click→purchase attribution): purchases
    * credit any click by the same user in the preceding 2 hours. One
    * shared form for batch and stream-stream: in streaming, both sides
    * carry watermarks and the two-sided time bound lets Spark evict join
    * state past the watermark — the join never holds unbounded history.
    * At scale this shuffles both streams once on user_id; the range
    * predicate evaluates inside the joined partition. */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.alias("c").join(purchases.alias("p"),
        expr("c.user_id = p.user_id AND p.ts >= c.ts AND p.ts <= c.ts + interval 2 hours"))
      .select(
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"),
        col("c.user_id").as("user_id"),
        round(col("p.value"), 2).as("purchase_value"),
        (unix_timestamp(col("p.ts")) - unix_timestamp(col("c.ts"))).as("lag_seconds"))

  def attributionQuery(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    attributionJoin(
      e.filter(col("event_type") === "click"),
      e.filter(col("event_type") === "purchase"))
      .orderBy("click_id", "purchase_id")
  }

  private val x12Sql =
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       round(CAST(p.value AS DOUBLE), 2) AS purchase_value,
       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS lag_seconds
       FROM events c JOIN events p
         ON c.user_id = p.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
       WHERE c.event_type = 'click' AND p.event_type = 'purchase'
       ORDER BY click_id, purchase_id"""

  // ---------------------------------------------------------------- b42
  /** b42 — weekly cohort retention, the canonical product-analytics
    * matrix every event warehouse serves: users cohort by the week of
    * their FIRST event (integer weeks since Monday 1970-01-05 — pure
    * date arithmetic, no float anywhere), and each (cohort, offset)
    * cell counts the cohort members active offset weeks later, with
    * retention in basis points of the cohort size. Offset 0 is the
    * cohort definition itself, so its retention is exactly 10⁴
    * (gated in the spec).
    *
    * Scale: distinct (user, week) collapses the event stream FIRST
    * (partial+final on the pair), the first-week frame is user-keyed,
    * and the matrix is |cohorts|×|offsets| — cells, not events, flow
    * into the final join; no window function at all. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    // FLOOR division, not Spark's truncate-toward-zero `div`: DuckDB's
    // `//` floors, so a pre-epoch event (datediff < 0) would land in a
    // different week under `div`. pmod is non-negative, so subtracting
    // it always rounds DOWN to the enclosing Monday boundary — exact
    // integer arithmetic, engine-identical for every valid timestamp.
    val wk = expr(
      """CAST((datediff(CAST(ts AS DATE), DATE'1970-01-05')
            - pmod(datediff(CAST(ts AS DATE), DATE'1970-01-05'), 7)) div 7
          AS BIGINT)""")
    val uw = events(s, dir).select(col("user_id"), wk.as("wk")).distinct()
    val first = uw.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    val sizes = first.groupBy("cohort_wk")
      .agg(count(lit(1)).as("cohort_users"))
    uw.join(first, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_wk")
      .select(col("cohort_wk"), col("offset_wk"), col("cohort_users"),
        col("n_active"),
        expr("(n_active * 10000) div cohort_users").as("retention_bp"))
      .orderBy("cohort_wk", "offset_wk")
  }

  private val b42Sql =
    """WITH uw AS (SELECT DISTINCT user_id,
           CAST(datediff('day', DATE '1970-01-05', CAST(ts AS DATE)) // 7
             AS BIGINT) AS wk
         FROM events),
       fw AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY user_id),
       sizes AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_users
                 FROM fw GROUP BY cohort_wk),
       cells AS (SELECT f.cohort_wk, uw.wk - f.cohort_wk AS offset_wk,
                   CAST(count(*) AS BIGINT) AS n_active
                 FROM uw JOIN fw f USING (user_id)
                 GROUP BY f.cohort_wk, uw.wk - f.cohort_wk)
       SELECT c.cohort_wk, c.offset_wk, s.cohort_users, c.n_active,
         CAST((c.n_active * 10000) // s.cohort_users AS BIGINT)
           AS retention_bp
       FROM cells c JOIN sizes s USING (cohort_wk)
       ORDER BY c.cohort_wk, c.offset_wk"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x12_attribution_join", attributionQuery, Some(x12Sql)),
    QueryDef("b42_cohort_retention", cohortRetention, Some(b42Sql)),
    QueryDef("b31_tumbling_window", tumblingQuery, Some(b31Sql)),
    QueryDef("b32_sliding_window", slidingQuery, Some(b32Sql)),
    QueryDef("b33_session_windows", sessionQuery, Some(b33Sql)),
    QueryDef("b34_dedup_events", dedupQuery, Some(b34Sql)))
}
