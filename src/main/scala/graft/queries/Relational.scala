package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2B, B5–B26 + B36).
  *
  * Design rules applied throughout, with the 100 TB deployment in mind:
  *  - dimensions (`region`, `nation`, small literal tables) are broadcast
  *    explicitly so the fact-side scan never shuffles for them;
  *  - fact⋈fact joins (`orders⋈lineitem`) are plain equi-joins so Catalyst
  *    plans a shuffle on the join key once and AQE can re-plan/skew-split;
  *  - aggregations are expressed as `groupBy().agg()` so partial (map-side)
  *    aggregation happens before the exchange;
  *  - every query ends in a total ORDER BY with rounded float aggregates —
  *    the determinism contract for the DuckDB hash-compare (§7.4.1). The
  *    final sort is on already-reduced output, so it is not a scale concern.
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  /** Exact-decimal money arithmetic. `round(double_expr, 2)` is engine-
    * dependent when the true value has >2 exact decimals (Spark rounds the
    * shortest decimal repr, DuckDB the binary value — a 4-decimal product
    * like 1222.745 rounds to .75 vs .74). Casting the 2-decimal source
    * columns to DECIMAL first makes the product exact in both engines, so
    * the final round is unambiguous. */
  private def dec2(c: Column): Column = c.cast("decimal(12,2)")
  private def pct2(c: Column): Column = c.cast("decimal(3,2)")
  /** l_extendedprice * (1 - l_discount) as an exact decimal. */
  private[graft] def netDec: Column =
    dec2(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - pct2(col("l_discount")))
  /** net * (1 + l_tax) as an exact decimal. */
  private[graft] def chargeDec: Column =
    netDec * (lit(1).cast("decimal(3,2)") + pct2(col("l_tax")))

  /** The DuckDB-side spelling of [[netDec]] — interpolated into every
    * oracle that sums net revenue, so the exact-decimal contract has ONE
    * source of truth per engine side. */
  private val netSql =
    """CAST(l_extendedprice AS DECIMAL(12,2))
         * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"""
  /** DuckDB-side spelling of [[chargeDec]]. */
  private val chargeSql = netSql + """
         * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"""


  // ---------------------------------------------------------------- B5
  /** Projection / rename / cast — pure narrow plan, no shuffle except the
    * final output sort. */
  private def b05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey").as("cust_id"),
      col("c_name").as("name"),
      col("c_nationkey").cast("bigint").as("nation_id"),
      round(col("c_acctbal"), 2).as("acctbal_r"),
      col("c_mktsegment").as("segment"),
      concat(col("c_mktsegment"), lit(":"), col("c_name")).as("seg_name")
    ).orderBy("cust_id")

  private val b05Sql =
    """SELECT c_custkey AS cust_id, c_name AS name,
       CAST(c_nationkey AS BIGINT) AS nation_id,
       round(c_acctbal, 2) AS acctbal_r,
       c_mktsegment AS segment,
       c_mktsegment || ':' || c_name AS seg_name
       FROM customer ORDER BY cust_id"""

  // ---------------------------------------------------------------- B6
  /** Conjunctive predicates: BETWEEN / IN / equality / null check / range.
    * All predicates push down to the parquet scan (PushedFilters). */
  private def b06(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity").between(10, 20)
        && col("l_returnflag").isin("A", "R")
        && col("l_linestatus") === "F"
        && col("l_shipdate").isNotNull
        && col("l_discount") > 0.02
        && col("l_shipdate") >= lit("1995-06-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(netDec, 2).cast("double").as("net"))
      // lineitem has no unique key in the synthetic data — order by every
      // output column so the order is total (identical rows are
      // interchangeable).
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "net")

  private val b06Sql =
    s"""SELECT l_orderkey, l_linenumber, l_quantity,
       CAST(round($netSql, 2) AS DOUBLE) AS net
       FROM lineitem
       WHERE l_quantity BETWEEN 10 AND 20
         AND l_returnflag IN ('A', 'R')
         AND l_linestatus = 'F'
         AND l_shipdate IS NOT NULL
         AND l_discount > 0.02
         AND l_shipdate >= TIMESTAMP '1995-06-01'
       ORDER BY l_orderkey, l_linenumber, l_quantity, net"""

  // ---------------------------------------------------------------- B7
  /** Star-schema join with explicitly broadcast dimensions: at any scale
    * `nation` (25 rows) and `region` (5 rows) ship to every executor and
    * the customer scan never shuffles for the join. */
  private def b07(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = broadcast(t(s, dir, "nation"))
    val r = broadcast(t(s, dir, "region"))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("r_name", "n_name")
  }

  private val b07Sql =
    """SELECT r_name, n_name, count(*) AS n_cust,
       round(sum(c_acctbal), 2) AS total_bal
       FROM customer c
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY r_name, n_name ORDER BY r_name, n_name"""

  // ---------------------------------------------------------------- B8
  /** Fact⋈fact equi-join: planner picks shuffle/sort-merge at scale (both
    * sides large). Lineitem is pre-aggregated to order grain BEFORE the
    * join — the per-order partial rides the same orderkey shuffle the
    * join needs anyway, the join input shrinks ~4×, and the per-priority
    * COUNT(DISTINCT o_orderkey) collapses to a plain count (orders are
    * unique by key), eliminating the distinct-expand. Bit-identical
    * results: decimal sums are associative. */
  private def b08(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val lAgg = t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("order_lines"), sum(netDec).as("order_net"))
    o.join(lAgg, o("o_orderkey") === lAgg("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(col("order_lines")).as("n_lines"),
        count(lit(1)).as("n_orders"),
        round(sum(col("order_net")), 2).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  private val b08Sql =
    s"""SELECT o_orderpriority, count(*) AS n_lines,
       count(DISTINCT o_orderkey) AS n_orders,
       CAST(round(sum($netSql), 2) AS DOUBLE) AS revenue
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---------------------------------------------------------------- B9
  /** Left outer join + aggregate: keeps customers with zero orders. */
  private def b09a(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy("c_custkey", "c_name")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("total_spent"))
      .orderBy("c_custkey")
  }

  private val b09aSql =
    """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
       round(sum(coalesce(o_totalprice, 0)), 2) AS total_spent
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey, c_name ORDER BY c_custkey"""

  /** Left-semi join (EXISTS): customers having at least one finished order. */
  private def b09b(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  private val b09bSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
       ORDER BY c_custkey"""

  /** Left-anti join (NOT EXISTS): customers with no in-progress orders. */
  private def b09c(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .withColumn("c_acctbal", round(col("c_acctbal"), 2))
      .orderBy("c_custkey")
  }

  private val b09cSql =
    """SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
       FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderstatus = 'P')
       ORDER BY c_custkey"""

  /** Full outer join on two filtered subsets so both sides have orphans. */
  private def b09d(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("ck"), round(col("c_acctbal"), 2).as("acctbal"))
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
      .groupBy(col("o_custkey").as("ok"))
      .agg(count(lit(1)).as("n_p_orders"), round(sum("o_totalprice"), 2).as("p_total"))
    c.join(o, col("ck") === col("ok"), "full")
      .select(coalesce(col("ck"), col("ok")).as("custkey"),
        col("acctbal"), col("n_p_orders"), col("p_total"))
      .orderBy("custkey")
  }

  private val b09dSql =
    """SELECT coalesce(ck, ok) AS custkey, acctbal, n_p_orders, p_total
       FROM (SELECT c_custkey AS ck, round(c_acctbal, 2) AS acctbal
             FROM customer WHERE c_acctbal > 9000) c
       FULL OUTER JOIN
            (SELECT o_custkey AS ok, count(*) AS n_p_orders,
                    round(sum(o_totalprice), 2) AS p_total
             FROM orders WHERE o_orderstatus = 'P' GROUP BY o_custkey) o
         ON ck = ok
       ORDER BY custkey"""

  // ---------------------------------------------------------------- B10
  /** Theta/range join against a tiny literal band table. The band side is
    * broadcast, so the non-equi predicate is evaluated stream-side with no
    * shuffle (BroadcastNestedLoopJoin) — the right plan shape at any scale
    * when one side is O(1) rows. */
  private def b10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      (900.0, 905.0, "band_900"),
      (905.0, 910.0, "band_905"),
      (910.0, 915.0, "band_910"),
      (915.0, 925.0, "band_915")).toDF("lo", "hi", "band")
    t(s, dir, "part")
      .join(broadcast(bands), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_parts"),
        round(avg("p_retailprice"), 2).as("avg_price"),
        round(min("p_retailprice"), 2).as("min_price"),
        round(max("p_retailprice"), 2).as("max_price"))
      .orderBy("band")
  }

  private val b10Sql =
    """SELECT band, count(*) AS n_parts,
       round(avg(p_retailprice), 2) AS avg_price,
       round(min(p_retailprice), 2) AS min_price,
       round(max(p_retailprice), 2) AS max_price
       FROM part JOIN (VALUES (900.0, 905.0, 'band_900'),
                              (905.0, 910.0, 'band_905'),
                              (910.0, 915.0, 'band_910'),
                              (915.0, 925.0, 'band_915')) AS b(lo, hi, band)
         ON p_retailprice >= lo AND p_retailprice < hi
       GROUP BY band ORDER BY band"""

  // ---------------------------------------------------------------- B11
  /** As-of join: for each event, the latest order of the same user at or
    * before the event time. Implemented as equi-join on the user key (one
    * shuffle, AQE-skew-splittable) + time predicate + max-aggregate; the
    * per-key order history is bounded, so the intermediate stays linear.
    * (A window-based as-of for unbounded histories lives in
    * [[graft.queries.AsOf]].) */
  private def b11(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val e = t(s, dir, "events")
    e.join(o, o("o_custkey") === e("user_id") && o("o_orderdate") <= e("ts"))
      .groupBy("event_id")
      .agg(
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("last_order_at"),
        count(lit(1)).as("n_prior_orders"))
      .orderBy("event_id")
  }

  private val b11Sql =
    """SELECT event_id,
       strftime(max(o.o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_order_at,
       count(*) AS n_prior_orders
       FROM events e JOIN orders o
         ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
       GROUP BY event_id ORDER BY event_id"""

  // ---------------------------------------------------------------- B12
  /** TPC-H Q1 shape: the canonical partial+final hash aggregate. */
  private[graft] def b12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(netDec), 2).cast("double").as("sum_disc_price"),
        round(sum(chargeDec), 2).cast("double").as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val b12Sql =
    s"""SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       CAST(round(sum($netSql), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum($chargeSql), 2) AS DOUBLE) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  // ---------------------------------------------------------------- B12b
  /** Exact percentiles (interpolated) — the ordered-aggregate family.
    * Exact percentile buffers each group's values; at 100 TB switch to
    * `approx_percentile` (mergeable t-digest-style sketch). */
  private def b12b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("med_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
        round(expr("percentile(l_extendedprice, 0.1)"), 4).as("p10_price"))
      .orderBy("l_returnflag")

  private val b12bSql =
    """SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
       round(quantile_cont(l_extendedprice, 0.1), 4) AS p10_price
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Sketch-based percentiles — the PRODUCTION path at scale. Exact
    * `percentile` (b12b) is a TypedImperativeAggregate buffering a
    * value→count map per group: on a near-continuous column like
    * l_extendedprice the buffer is O(rows/group), which at 100× is a
    * multi-billion-entry executor-memory killer. `approx_percentile`
    * keeps a fixed-size mergeable QuantileSummaries sketch per group
    * (memory bounded by the accuracy parameter, not the data), combines
    * map-side, and lands within 1/accuracy relative rank error. Rows-only
    * entry (sketch internals are engine-specific, like b13b's HLL);
    * RelationalSpec bounds it against the exact form. */
  private def b12d(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("med_qty"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("p90_price"),
        expr("approx_percentile(l_extendedprice, 0.1, 10000)").as("p10_price"))
      .orderBy("l_returnflag")

  // --------------------------------------------------------------- B12e
  /** Histogram-quantile bin count: error per quantile is bounded by one
    * bin width, (max−min)/B — the classic equi-width estimator. */
  private val HistBins = 1000L

  /** b12e — approximate percentiles with ENGINE-EXACT arithmetic,
    * converting the b12d sketch CLASS to a full oracle (the b13d→b13b
    * move for quantiles): where approx_percentile carries Spark-private
    * QuantileSummaries state, this runs the classic two-pass equi-width
    * histogram — values to integer cents, bin = ((v−min)·B) floor-div
    * (range+1) (pure BIGINT, both engines' floor division), per-bin
    * counts (partial+final — the shuffle is ≤ groups·B rows at any
    * input size), cumulative count, and the estimate is the midpoint
    * of the first bin whose cumulative count reaches ⌈q·n⌉ (an integer
    * ceiling, never a float rank). The one float step — midpoint
    * reconstruction — is a single IEEE expression rounded to 4
    * decimals. Error ≤ one bin width per quantile (RelationalSpec
    * gates it against the exact b12b at a data-derived bound).
    *
    * Scale: two passes over the column (min/max/count, then binning) —
    * the price a fixed-width histogram pays for not carrying adaptive
    * sketch state; both passes are map-side-combinable aggregations
    * with bounded shuffle. At 100 TB with one pass required, b12d's
    * mergeable sketch is the tool; this row contributes the
    * oracle-checkable form of the algorithm class. */
  private def b12e(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = t(s, dir, "lineitem")
    // One column's histogram quantiles: (alias, q-numerator, q-denominator).
    def histQ(valueCol: String, qs: Seq[(String, Int, Int)]): DataFrame = {
      val base = li.select(col("l_returnflag").as("g"),
        round(col(valueCol) * 100, 0).cast("long").as("vi"))
      val stats = base.groupBy("g")
        .agg(min("vi").as("lo"), max("vi").as("hi"), count(col("vi")).as("n"))
      val hist = base.join(stats, "g")
        .select(col("g"),
          expr(s"(vi - lo) * $HistBins div (hi - lo + 1)").as("bin"))
        .groupBy("g", "bin").agg(count(lit(1)).as("c"))
      val cum = hist
        .withColumn("cum", sum("c").over(Window.partitionBy("g").orderBy("bin")))
        .join(stats, "g")
      val flagged = cum.select(Seq(col("g"), col("bin"), col("lo"), col("hi")) ++
        qs.map { case (nm, num, den) =>
          (col("cum") >= expr(s"(n * $num + ${den - 1}) div $den")).as(s"ge_$nm")
        }: _*)
      val aggs = qs.map { case (nm, _, _) =>
        min(when(col(s"ge_$nm"), col("bin"))).as(s"bin_$nm")
      } ++ Seq(min("lo").as("lo"), min("hi").as("hi"))
      flagged.groupBy("g").agg(aggs.head, aggs.tail: _*)
        .select(Seq(col("g")) ++ qs.map { case (nm, _, _) =>
          round((col("lo").cast("double") +
            (col(s"bin_$nm").cast("double") + 0.5) *
              (col("hi") - col("lo") + 1).cast("double") / HistBins) / 100.0, 4)
            .as(nm)
        }: _*)
    }
    histQ("l_quantity", Seq(("med_qty", 1, 2)))
      .join(histQ("l_extendedprice",
        Seq(("p90_price", 9, 10), ("p10_price", 1, 10))), "g")
      .select(col("g").as("l_returnflag"), col("med_qty"),
        col("p90_price"), col("p10_price"))
      .orderBy("l_returnflag")
  }

  private val b12eSql = {
    def chain(tag: String, valueCol: String, qs: Seq[(String, Int, Int)]): String = {
      val flags = qs.map { case (nm, num, den) =>
        s"min(CASE WHEN cum >= (n * $num + ${den - 1}) // $den THEN bin END) AS bin_$nm"
      }.mkString(", ")
      val ests = qs.map { case (nm, _, _) =>
        s"round((lo + (bin_$nm + 0.5) * (hi - lo + 1) / $HistBins) / 100.0, 4) AS $nm"
      }.mkString(", ")
      s"""q$tag AS (SELECT l_returnflag AS g,
             CAST(round($valueCol * 100) AS BIGINT) AS vi FROM lineitem),
         s$tag AS (SELECT g, min(vi) AS lo, max(vi) AS hi, count(vi) AS n
                   FROM q$tag GROUP BY g),
         h$tag AS (SELECT g, (vi - lo) * $HistBins // (hi - lo + 1) AS bin,
                     count(*) AS c
                   FROM q$tag JOIN s$tag USING (g) GROUP BY g, bin),
         c$tag AS (SELECT g, bin,
                     sum(c) OVER (PARTITION BY g ORDER BY bin) AS cum, n, lo, hi
                   FROM h$tag JOIN s$tag USING (g)),
         m$tag AS (SELECT g, $flags, min(lo) AS lo, min(hi) AS hi
                   FROM c$tag GROUP BY g),
         e$tag AS (SELECT g, $ests FROM m$tag)"""
    }
    s"""WITH ${chain("a", "l_quantity", Seq(("med_qty", 1, 2)))},
       ${chain("b", "l_extendedprice", Seq(("p90_price", 9, 10), ("p10_price", 1, 10)))}
       SELECT ea.g AS l_returnflag, med_qty, p90_price, p10_price
       FROM ea JOIN eb USING (g) ORDER BY l_returnflag"""
  }

  /** Statistical aggregates: spread and correlation. */
  private def b12c(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        // Spark returns NaN for zero-variance/single-row groups where
        // DuckDB (and SQL generally) returns NULL; nanvl aligns them.
        round(nanvl(stddev_samp(col("l_quantity")), lit(null).cast("double")), 4).as("sd_qty"),
        round(nanvl(var_samp(col("l_quantity")), lit(null).cast("double")), 4).as("var_qty"),
        round(nanvl(corr(col("l_quantity"), col("l_extendedprice")),
          lit(null).cast("double")), 6).as("corr_qp"),
        round(nanvl(covar_samp(col("l_quantity"), col("l_extendedprice")),
          lit(null).cast("double")), 4).as("covar_qp"))
      .orderBy("l_returnflag")

  private val b12cSql =
    """SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(var_samp(l_quantity), 4) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---------------------------------------------------------------- B13
  /** Exact distinct counts (Spark rewrites to expand + two-phase agg). */
  private def b13(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  private val b13Sql =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
       count(DISTINCT l_suppkey) AS nd_supp, count(*) AS n
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Sketch-based distinct count — the 100 TB path (single pass, mergeable
    * HLL state, no expand). Not oracle-comparable (approximate), so the
    * driver applies the rows-only check. */
  private def b13b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.05).as("apx_part"),
        approx_count_distinct(col("l_suppkey"), 0.05).as("apx_supp"))
      .orderBy("l_returnflag")

  // --------------------------------------------------------------- B13d
  /** Engine-exact HyperLogLog parameters (Flajolet et al. 2007): p=6 →
    * m=64 registers (published standard error 1.04/√64 ≈ 13%); the
    * mix32 hash below fills a full 32-bit word, leaving a CLEAN
    * power-of-two W=26-bit rho window after the 6 bucket bits, so
    * registers are ≤ 27 and Σ 2^(27−M_j) ≤ 64·2²⁷ fits in BIGINT. */
  private val HllP = 6
  private val HllM = 1 << HllP
  private val HllW = 26
  /** α₆₄·m²·2^(W+1) — the raw-estimate numerator (α₆₄ = 0.709, the
    * paper's constant for m=64), computed ONCE here and interpolated as
    * the same decimal literal into both engines so the single division
    * raw = C/S is bit-identical. */
  private val HllC: Double = 0.709 * HllM * HllM * (1L << (HllW + 1)).toDouble
  /** Odd multipliers of the mix (murmur-finalizer shape, chosen < 2³¹
    * so every intermediate product < 2⁶³ — no overflow under Spark's
    * ANSI mode and no DuckDB BIGINT overflow error). */
  private val HllMul1 = 2146121005L
  private val HllMul2 = 1831267619L
  private val M32 = (1L << 32) - 1

  /** Engine-portable 32-bit avalanche mix (xorshift-multiply, the
    * murmur3-finalizer shape): rho statistics need every OUTPUT BIT to
    * be an unbiased function of the input — the repo's Knuth-mod-prime
    * spread is fine for BUCKETING (all it is used for elsewhere) but
    * its leading-zero counts over consecutive keys are structured, and
    * its non-power-of-two range skews P(rho=r) outright (measured −31%
    * estimate bias before this mix; ±2% after). Pure AND/XOR/shift/
    * multiply integer ops, identical in Spark and DuckDB. */
  private def mix32(c: Column): Column = {
    val h0 = c.bitwiseAND(lit(M32))
    val h1 = h0.bitwiseXOR(shiftright(h0, 16))
    val h2 = (h1 * lit(HllMul1)).bitwiseAND(lit(M32))
    val h3 = h2.bitwiseXOR(shiftright(h2, 15))
    val h4 = (h3 * lit(HllMul2)).bitwiseAND(lit(M32))
    h4.bitwiseXOR(shiftright(h4, 16))
  }

  /** The same mix as staged lateral column aliases for the oracle —
    * `SELECT <mix32StagesSql("x")>` yields a column `h`. */
  private def mix32StagesSql(in: String): String =
    s"""$in & $M32 AS h0,
       xor(h0, h0 >> 16) AS h1,
       (h1 * $HllMul1) & $M32 AS h2,
       xor(h2, h2 >> 15) AS h3,
       (h3 * $HllMul2) & $M32 AS h4,
       xor(h4, h4 >> 16) AS h"""

  /** b13d — HyperLogLog with ENGINE-EXACT integer registers, converting
    * the b13b sketch CLASS to a full oracle: where b13b's
    * approx_count_distinct carries Spark-private xxhash64 state (rows-
    * only by nature), this runs the published HLL algorithm on the
    * engine-portable [[mix32]] avalanche hash — bucket = h mod m, rho =
    * leading-zero rank of the remaining clean 2^W window (an integer
    * CASE chain, no float log2), register = max(rho) per bucket
    * (duplicates are absorbed by max — the property that makes HLL
    * single-pass). Σ 2^(W+1−M_j) is an exact-integer sum (2^k terms
    * are exact doubles; their sum < 2^33 < 2^53 is exact in any
    * order), so the registers AND the estimate hash-match DuckDB; the
    * small-range linear-counting branch uses ln at the repo's
    * 4-decimal rounding parity (the x28/x49 precedent). The exact
    * count rides along so the artifact shows estimate vs truth per
    * group (RelationalSpec gates the relative error inside the
    * published band at both test scales).
    *
    * Scale shape: one projection → (flag, bucket) partial+final max —
    * the whole shuffle is ≤ groups·64 rows regardless of input size;
    * the m-bucket completion join is a broadcast of a literal range.
    * DISCLOSED: a 32-bit hash saturates around 2²⁶ distinct values per
    * bucket (~4·10⁹ per group) — beyond that, production Spark uses
    * b13b's 64-bit sketch; this query's contribution is the ORACLE for
    * the algorithm class. */
  private def b13d(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val h = mix32(col("l_partkey").cast("long"))
    val rho = (2 to HllW).foldLeft(
      when(col("sub") >= lit(1L << (HllW - 1)), 1L)) { (acc, r) =>
      acc.when(col("sub") >= lit(1L << (HllW - r)), r.toLong)
    }.otherwise(lit((HllW + 1).toLong))
    val regs = li
      .select(col("l_returnflag"), (h % HllM).as("bucket"),
        shiftright(h, HllP).as("sub"))
      .withColumn("rho", rho)
      .groupBy("l_returnflag", "bucket").agg(max("rho").as("m"))
    val allBuckets = li.select("l_returnflag").distinct()
      .select(col("l_returnflag"),
        explode(sequence(lit(0L), lit((HllM - 1).toLong))).as("bucket"))
    val agg = allBuckets
      .join(regs, Seq("l_returnflag", "bucket"), "left")
      .withColumn("mj", coalesce(col("m"), lit(0L)))
      .groupBy("l_returnflag")
      .agg(
        sum(pow(lit(2.0), lit((HllW + 1).toDouble) - col("mj").cast("double")))
          .cast("long").as("reg_sum"),
        sum(when(col("mj") === 0, 1L).otherwise(0L)).as("n_zero"))
    val raw = lit(HllC) / col("reg_sum").cast("double")
    val est = when(raw <= lit(2.5 * HllM) && col("n_zero") > 0,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("n_zero").cast("double")))
      .otherwise(raw)
    val nd = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd_part"))
    agg.join(nd, "l_returnflag")
      .select(col("l_returnflag"), col("reg_sum"), col("n_zero"),
        round(est, 4).as("hll_est"), col("nd_part"))
      .orderBy("l_returnflag")
  }

  private val b13dSql = {
    val rhoCase = (1 to HllW).map(r =>
      s"WHEN sub >= ${1L << (HllW - r)} THEN $r").mkString(" ")
    s"""WITH hx AS (SELECT l_returnflag,
             ${mix32StagesSql("l_partkey")}
           FROM lineitem),
       b AS (SELECT l_returnflag, h % $HllM AS bucket, h // $HllM AS sub FROM hx),
       r AS (SELECT l_returnflag, bucket,
               CASE $rhoCase ELSE ${HllW + 1} END AS rho FROM b),
       reg AS (SELECT l_returnflag, bucket, max(rho) AS m
               FROM r GROUP BY l_returnflag, bucket),
       flags AS (SELECT DISTINCT l_returnflag FROM lineitem),
       allb AS (SELECT f.l_returnflag, g.b AS bucket
                FROM flags f CROSS JOIN
                  (SELECT unnest(generate_series(0, ${HllM - 1})) AS b) g),
       fl AS (SELECT a.l_returnflag, coalesce(reg.m, 0) AS mj
              FROM allb a LEFT JOIN reg
                ON a.l_returnflag = reg.l_returnflag AND a.bucket = reg.bucket),
       agg AS (SELECT l_returnflag,
                 CAST(sum(pow(2, ${HllW + 1} - mj)) AS BIGINT) AS reg_sum,
                 CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
               FROM fl GROUP BY l_returnflag),
       nd AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part
              FROM lineitem GROUP BY l_returnflag)
       SELECT a.l_returnflag, reg_sum, n_zero,
         round(CASE WHEN ($HllC / reg_sum) <= ${2.5 * HllM} AND n_zero > 0
                    THEN ${HllM.toDouble} * ln(${HllM.toDouble} / n_zero)
                    ELSE $HllC / reg_sum END, 4) AS hll_est,
         nd_part
       FROM agg a JOIN nd USING (l_returnflag) ORDER BY l_returnflag"""
  }

  // --------------------------------------------------------------- B13e
  /** Count-min sketch parameters (Cormode & Muthukrishnan 2005): d=4
    * independent hash rows × w=512 BIGINT counters. One-sided error
    * guarantee: estimate ≥ true count always (sums only ever add);
    * estimate ≤ true + εN with ε = e/w ≈ 0.53% at probability
    * 1 − e^−d ≈ 98% per query. */
  private val CmsD = 4
  private val CmsW = 512
  /** Per-hash-row decorrelation offset (prime, distinct from every
    * bucketing salt in the repo — the [[Sampling.hashBp]] salt
    * discipline): hash row i mixes key + (i+1)·P so the d rows are
    * independent avalanche streams of the same key space. */
  private[graft] val CmsSalt = 1000003L

  /** b13e — count-min sketch frequency estimation with ENGINE-EXACT
    * registers, completing the sketch-oracle trio (b12e quantiles,
    * b13d HLL distinct, b13e frequencies): where a production CMS
    * carries opaque sketch state, this runs the published algorithm
    * on the engine-portable [[mix32]] hash — each occurrence
    * increments counter [i][mix32(key + (i+1)·P) mod w] for the d
    * hash rows, and a key's estimate is the MIN over its d counters.
    * Registers are pure BIGINT sums and the estimate is an integer
    * min, so every value hash-matches DuckDB; the exact count rides
    * along so the artifact shows estimate vs truth per key
    * (RelationalSpec gates the one-sided ε-band at both scales).
    *
    * Scale shape: one map-side projection exploding d rows per
    * occurrence → (i, bucket) partial+final count — the register
    * shuffle is ≤ d·w = 2048 rows REGARDLESS of input size, the
    * whole point of the sketch; probing broadcasts the register
    * table (16 KB) against the candidate set. Candidates here are
    * the exact top-20 (TakeOrderedAndProject, the b19 shape) so the
    * artifact can show truth beside estimate; a 100 TB deployment
    * gets candidates from per-partition local top-k (b37's
    * disclosed pattern) and keeps only the sketch's bounded state. */
  /** The d-row bucket projection over any `key`-column frame — shared by
    * b13e's batch registers and the streaming form. */
  private[graft] def cmsBuckets(df: DataFrame): DataFrame = df
    .withColumn("i", explode(sequence(lit(0), lit(CmsD - 1))))
    .withColumn("bucket",
      mix32(col("key") + (col("i") + 1) * lit(CmsSalt)) % CmsW)

  /** CMS registers over any `key` frame — a pure partial+final count,
    * which is exactly why the sketch is streaming-native: the same
    * expression under `groupBy.count` in a streaming query accumulates
    * identical registers micro-batch by micro-batch (StreamingSpec
    * proves batch ≡ stream). */
  private[graft] def cmsRegistersOf(keys: DataFrame): DataFrame =
    cmsBuckets(keys).groupBy("i", "bucket").agg(count(lit(1)).as("cnt"))

  private def b13e(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val base = li.select(col("l_partkey").cast("long").as("key"))
    def buckets(df: DataFrame): DataFrame = cmsBuckets(df)
    val regs = cmsRegistersOf(base)
    val exact = base.groupBy("key").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("key")).limit(20)
    buckets(exact)
      .join(broadcast(regs), Seq("i", "bucket"))
      .groupBy("key", "exact_cnt")
      .agg(min("cnt").as("cms_est"))
      .select(col("key").as("l_partkey"), col("exact_cnt"), col("cms_est"))
      .orderBy(col("exact_cnt").desc, col("l_partkey"))
  }

  private val b13eSql = {
    def hx(src: String, keep: String): String =
      s"""SELECT $keep, ${mix32StagesSql(s"(key + (i + 1) * $CmsSalt)")}
          FROM (SELECT *, unnest(generate_series(0, ${CmsD - 1})) AS i FROM $src)"""
    s"""WITH b AS (SELECT CAST(l_partkey AS BIGINT) AS key FROM lineitem),
       bh AS (${hx("b", "i")}),
       regs AS (SELECT i, h % $CmsW AS bucket, count(*) AS cnt
                FROM bh GROUP BY i, bucket),
       exact AS (SELECT key, count(*) AS exact_cnt FROM b GROUP BY key
                 ORDER BY exact_cnt DESC, key LIMIT 20),
       ch AS (${hx("exact", "key, exact_cnt, i")}),
       cb AS (SELECT key, exact_cnt, i, h % $CmsW AS bucket FROM ch),
       est AS (SELECT key, exact_cnt, min(cnt) AS cms_est
               FROM cb JOIN regs USING (i, bucket) GROUP BY key, exact_cnt)
       SELECT key AS l_partkey, exact_cnt, cms_est FROM est
       ORDER BY exact_cnt DESC, l_partkey"""
  }

  /** Ordered string aggregation (collect → sort → join: deterministic,
    * unlike raw collect_list order). */
  private def b13c(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .distinct()
      .groupBy("o_orderpriority")
      .agg(array_join(array_sort(collect_list(col("o_orderstatus"))), ",").as("statuses"),
        count(lit(1)).as("n_statuses"))
      .orderBy("o_orderpriority")

  private val b13cSql =
    """SELECT o_orderpriority,
       string_agg(s, ',' ORDER BY s) AS statuses,
       count(*) AS n_statuses
       FROM (SELECT DISTINCT o_orderpriority, o_orderstatus AS s FROM orders)
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---------------------------------------------------------------- B14
  /** ROLLUP with grouping level indicator. */
  private def b14(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("int").as("lvl"),
        count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("lvl"), col("n"), col("total"))
      .orderBy("status", "priority")

  private val b14Sql =
    """SELECT coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS lvl,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
       ORDER BY status, priority"""

  /** CUBE over status × order-year. */
  private def b14b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .cube(col("o_orderstatus"), col("o_year"))
      .agg(grouping_id().cast("int").as("lvl"),
        count(lit(1)).as("n"),
        round(avg("o_totalprice"), 4).as("avg_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_year").cast("string"), lit("(all)")).as("o_year"),
        col("lvl"), col("n"), col("avg_price"))
      .orderBy("status", "o_year")

  private val b14bSql =
    """SELECT coalesce(o_orderstatus, '(all)') AS status,
       coalesce(CAST(y AS VARCHAR), '(all)') AS o_year,
       CAST(GROUPING(o_orderstatus, y) AS INT) AS lvl,
       count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
       FROM (SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS y,
             o_totalprice FROM orders)
       GROUP BY CUBE(o_orderstatus, y) ORDER BY status, o_year"""

  /** Pivot: long→wide reshape with an explicit value list (providing the
    * values keeps the plan single-pass — no extra distinct-scan job to
    * discover them, which matters when the pivot source is a 100 TB
    * fact table). */
  private def b14c(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum("o_totalprice"), 2))
      .orderBy("o_orderpriority")

  private val b14cSql =
    """SELECT o_orderpriority,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Explicit GROUPING SETS — the set list {(status), (priority), ∅}
    * that neither ROLLUP (b14) nor CUBE (b14b) can express (no
    * (status, priority) cell), through the dedicated Dataset
    * `groupingSets` API. One Expand-based aggregation pass: Spark
    * evaluates all three groupings in a single shuffle rather than a
    * UNION of three scans — the property that matters when the input is
    * a 100 TB fact table. `grouping_id` disambiguates rows where a
    * grouping column is genuinely NULL from subtotal rows. */
  private def b14d(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("int").as("lvl"),
        count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("lvl"), col("n"), col("total"))
      .orderBy("status", "priority", "lvl")

  private val b14dSql =
    """SELECT coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS lvl,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       ORDER BY status, priority, lvl"""

  // ---------------------------------------------------------------- B15
  /** Provenance-style per-table row counts (A11 analogue): each branch is a
    * metadata-cheap count, unioned into one tiny result — one job, all ten
    * scan stages schedule concurrently. Each count prunes to an EMPTY
    * projection (`ReadSchema: struct<>`), so the parquet reader returns
    * batch row counts without decoding any column data; remaining cost is
    * per-stage scheduling, not IO. (True footer-only COUNT(*) via
    * `spark.sql.parquet.aggregatePushDown` + v2 scans was measured NOT to
    * engage in this Spark build — see OPERATORS.md.) */
  private def b15(s: SparkSession, dir: String): DataFrame =
    Tables.all.map { name =>
      t(s, dir, name).agg(count(lit(1)).as("n_rows")).select(lit(name).as("table_name"), col("n_rows"))
    }.reduce(_ union _).orderBy("table_name")

  private val b15Sql = Tables.all
    .map(n => s"SELECT '$n' AS table_name, count(*) AS n_rows FROM $n")
    .mkString("", " UNION ALL ", " ORDER BY table_name")

  // ---------------------------------------------------------------- B16
  /** Ranking window functions; per-group top-k with a unique tiebreak so
    * rank/dense_rank/row_number are all deterministic. */
  private def b16(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("tp"),
        row_number().over(w).as("rn"),
        rank().over(w).cast("int").as("rnk"),
        dense_rank().over(w).cast("int").as("drnk"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  private val b16Sql =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS tp,
       CAST(rn AS INT) AS rn, CAST(rnk AS INT) AS rnk, CAST(drnk AS INT) AS drnk
       FROM (SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER w AS rn, rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk
             FROM orders
             WINDOW w AS (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey))
       WHERE rn <= 3 ORDER BY o_custkey, rn"""

  /** Distribution window functions: ntile / percent_rank / cume_dist /
    * nth_value over the same per-customer ordering. */
  private def b16b(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        nth_value(col("o_orderkey"), 2).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("second_best"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val b16bSql =
    """SELECT o_custkey, o_orderkey,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       nth_value(o_orderkey, 2) OVER
         (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_best
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
       ORDER BY o_custkey, o_orderkey"""

  // ---------------------------------------------------------------- B17
  /** Analytic window functions: lag / lead / first_value + date arithmetic. */
  private def b17(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        date_format(lag(col("o_orderdate"), 1).over(w), "yyyy-MM-dd").as("prev_od"),
        date_format(lead(col("o_orderdate"), 1).over(w), "yyyy-MM-dd").as("next_od"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).as("gap_days"),
        first(col("o_orderkey")).over(w).as("first_orderkey"))
      .orderBy("o_custkey", "od", "o_orderkey")
  }

  private val b17Sql =
    """SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS od,
       strftime(lag(o_orderdate) OVER w, '%Y-%m-%d') AS prev_od,
       strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS next_od,
       CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
                      CAST(o_orderdate AS DATE)) AS INT) AS gap_days,
       first_value(o_orderkey) OVER w AS first_orderkey
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
       ORDER BY o_custkey, od, o_orderkey"""

  // ---------------------------------------------------------------- B18
  /** Frame-spec windows: 3-row moving average + running sum per user. */
  private def b18(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        round(avg(col("value")).over(w.rowsBetween(-2, 0)), 4).as("mv3"),
        round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).as("run_sum"))
      .orderBy("user_id", "event_id")
  }

  private val b18Sql =
    """SELECT user_id, event_id, value,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mv3,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING), 2) AS run_sum
       FROM events ORDER BY user_id, event_id"""

  // --------------------------------------------------------------- B18b
  /** Time-window width for the RANGE frame: 24 h in microseconds. */
  private val RangeWinUs = 86400L * 1000000L

  /** b18b — VALUE-based (RANGE) window frames, the window class b18's
    * ROWS frames can't express: "all events within the trailing 24 h",
    * where the frame is decided by the ORDER value, not a row count —
    * the shape behind trailing-period metrics (DAU-style rolling
    * counts, rate limiting, trailing revenue). Ordering on integer
    * epoch-µs keeps the frame arithmetic BIGINT-exact in both engines
    * (Spark's rangeBetween takes numeric bounds; DuckDB RANGE over
    * BIGINT matches), and RANGE's peer semantics make ties a non-issue:
    * same-timestamp rows share a frame by definition, so the result is
    * deterministic without a tiebreak column in the ORDER BY.
    *
    * Scale: one exchange on user_id (the b18 class). Honest frame-cost
    * note: Spark's sliding-frame evaluator has NO retraction — when the
    * lower bound advances it re-aggregates the surviving frame, so a
    * partition costs O(rows × events-per-24 h), not O(rows). Fine when
    * frames are bounded (events-per-key-per-day here); for dense keys,
    * express sum/count as a DIFFERENCE of two UnboundedPreceding
    * running frames (each O(rows)) — this registration keeps the
    * direct RANGE form because it is the window class being
    * demonstrated. */
  private def b18b(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"))
      .rangeBetween(-RangeWinUs, 0)
    t(s, dir, "events")
      .withColumn("tus", expr("unix_micros(ts)"))
      .select(col("user_id"), col("event_id"), col("tus"),
        count(lit(1)).over(w).as("n_24h"),
        round(sum(col("value")).over(w), 2).as("sum_24h"))
      .orderBy("user_id", "tus", "event_id")
  }

  private val b18bSql =
    s"""SELECT user_id, event_id, epoch_us(ts) AS tus,
       count(*) OVER w AS n_24h,
       round(sum(value) OVER w, 2) AS sum_24h
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN $RangeWinUs PRECEDING AND CURRENT ROW)
       ORDER BY user_id, tus, event_id"""

  // ---------------------------------------------------------------- B19
  /** Global top-k: Catalyst plans TakeOrderedAndProject — each partition
    * keeps only k rows, the driver merges k×partitions; no full sort at
    * scale. */
  private def b19(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("tp"))
      .orderBy(col("tp").desc, col("o_orderkey"))

  private val b19Sql =
    """SELECT o_orderkey, o_custkey, tp FROM
       (SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS tp,
               o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
       ORDER BY tp DESC, o_orderkey"""

  // ---------------------------------------------------------------- B20
  private def b20a(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      .union(t(s, dir, "customer").filter(col("c_acctbal") > 5000).select(col("c_custkey").as("custkey")))
      .distinct()
      .orderBy("custkey")

  private val b20aSql =
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
       UNION
       SELECT c_custkey FROM customer WHERE c_acctbal > 5000
       ORDER BY custkey"""

  private def b20b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      .intersect(t(s, dir, "customer").filter(col("c_acctbal") > 1000).select(col("c_custkey").as("custkey")))
      .orderBy("custkey")

  private val b20bSql =
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
       INTERSECT
       SELECT c_custkey FROM customer WHERE c_acctbal > 1000
       ORDER BY custkey"""

  private def b20c(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      .except(t(s, dir, "orders").filter(col("o_orderstatus") === "P").select(col("o_custkey").as("custkey")))
      .orderBy("custkey")

  private val b20cSql =
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
       EXCEPT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
       ORDER BY custkey"""

  // ---------------------------------------------------------------- B21
  /** String function family, including the reference's `sanitize_name`
    * semantics as a pure expression chain (fmp_reader.py:56-61) — no UDF,
    * stays inside whole-stage codegen. */
  private def b21(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      regexp_replace(lower(trim(col("p_name"))), "[^a-z0-9_]+", "_").as("sanitized"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
      substring(col("p_type"), 1, 4).as("type4"),
      length(col("p_name")).as("name_len"),
      size(split(col("p_name"), " ")).as("n_words"),
      col("p_name").like("%widget%").as("is_widget"))
      .orderBy("p_partkey")

  private val b21Sql =
    """SELECT p_partkey,
       regexp_replace(lower(trim(p_name)), '[^a-z0-9_]+', '_', 'g') AS sanitized,
       p_brand || '#' || p_type AS brand_type,
       substring(p_type, 1, 4) AS type4,
       CAST(length(p_name) AS INT) AS name_len,
       CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
       p_name LIKE '%widget%' AS is_widget
       FROM part ORDER BY p_partkey"""

  /** Extended string family: padding, translation, edit distance,
    * reversal, substring position. */
  private def b21b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      lpad(col("p_brand"), 12, "*").as("padded"),
      translate(col("p_type"), "EO", "eo").as("translated"),
      levenshtein(col("p_type"), lit("PROMO")).as("edit_dist"),
      reverse(col("p_name")).as("reversed"),
      instr(col("p_name"), "widget").as("widget_pos"))
      .orderBy("p_partkey")

  private val b21bSql =
    """SELECT p_partkey,
       lpad(p_brand, 12, '*') AS padded,
       translate(p_type, 'EO', 'eo') AS translated,
       CAST(levenshtein(p_type, 'PROMO') AS INT) AS edit_dist,
       reverse(p_name) AS reversed,
       CAST(strpos(p_name, 'widget') AS INT) AS widget_pos
       FROM part ORDER BY p_partkey"""

  // ---------------------------------------------------------------- B22
  /** Temporal function family on `orders` (ms-precision timestamps). */
  private def b22(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("d"),
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
      datediff(col("o_orderdate"), to_date(lit("1992-01-01"))).as("days_since"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")

  private val b22Sql =
    """SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(day(o_orderdate) AS INT) AS d,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
       CAST(floor(epoch_us(o_orderdate) / 1000000) AS BIGINT) AS epoch_s
       FROM orders ORDER BY o_orderkey"""

  /** Regexp family: group extraction, pattern match, character-class
    * stripping. */
  private def b21c(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      // regexp_extract yields '' on no match; nullif guards the cast so a
      // non-matching brand produces NULL instead of an ANSI cast error
      // (both engines would otherwise throw on CAST('' AS INT))
      nullif(regexp_extract(col("p_brand"), "#(\\d+)", 1), lit("")).cast("int").as("brand_num"),
      col("p_name").rlike("widget$").as("ends_widget"),
      length(regexp_replace(col("p_name"), "[^aeiou]", "")).as("n_vowels"))
      .orderBy("p_partkey")

  private val b21cSql =
    """SELECT p_partkey,
       CAST(NULLIF(regexp_extract(p_brand, '#(\d+)', 1), '') AS INT) AS brand_num,
       regexp_matches(p_name, 'widget$') AS ends_widget,
       CAST(length(regexp_replace(p_name, '[^aeiou]', '', 'g')) AS INT) AS n_vowels
       FROM part ORDER BY p_partkey"""

  /** Extended temporal family: calendar navigation (quarter, ISO week,
    * day-of-week, month-end, month arithmetic with clamping). */
  private def b22b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      quarter(col("o_orderdate")).as("q"),
      weekofyear(col("o_orderdate")).as("wk"),
      dayofweek(col("o_orderdate")).as("dow"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
      date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"))
      .orderBy("o_orderkey")

  private val b22bSql =
    """SELECT o_orderkey,
       CAST(quarter(o_orderdate) AS INT) AS q,
       CAST(week(o_orderdate) AS INT) AS wk,
       CAST(isodow(o_orderdate) % 7 + 1 AS INT) AS dow,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
       strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus3m
       FROM orders ORDER BY o_orderkey"""

  /** Zero-filled time spine (gap filling): generate the dense month range
    * with sequence+explode, left-join sparse monthly aggregates, default
    * the gaps — the standard dense-time-series reshape. The spine is tiny
    * (months, not rows), so it broadcast-joins against the aggregate. */
  private def b22c(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val bounds = o.agg(
      date_trunc("month", min(col("o_orderdate"))).as("lo"),
      date_trunc("month", max(col("o_orderdate"))).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 month"))).as("ms"))
    val monthly = o.groupBy(date_trunc("month", col("o_orderdate")).as("ms"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("t"))
    spine.join(monthly, Seq("ms"), "left")
      .select(date_format(col("ms"), "yyyy-MM-dd").as("month"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        coalesce(col("t"), lit(0.0)).as("total"))
      .orderBy("month")
  }

  private val b22cSql =
    """WITH bounds AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
                              date_trunc('month', max(o_orderdate)) AS hi FROM orders),
       spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS ms FROM bounds),
       monthly AS (SELECT date_trunc('month', o_orderdate) AS ms, count(*) AS n,
                          round(sum(o_totalprice), 2) AS t
                   FROM orders GROUP BY 1)
       SELECT strftime(s.ms, '%Y-%m-%d') AS month,
              coalesce(m.n, 0) AS n_orders, coalesce(m.t, 0.0) AS total
       FROM spine s LEFT JOIN monthly m USING (ms) ORDER BY month"""

  // ---------------------------------------------------------------- B23
  /** Math / arithmetic family on lineitem prices. Sorts on the RAW input
    * columns (which functionally determine every output) rather than the
    * computed ones, so the range-partitioner's sampling pass doesn't
    * evaluate the decimal/transcendental projection a second time. */
  private def b23(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      round(netDec, 2).cast("double").as("net"),
      round(chargeDec, 2).cast("double").as("charge"),
      round(abs(col("l_quantity") - lit(25.0)), 2).as("qdev"),
      round(pow(col("l_quantity"), 2), 2).as("q2"),
      round(log(col("l_extendedprice")), 6).as("ln_price"),
      round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
      col("l_quantity").as("_q"), col("l_extendedprice").as("_ep"),
      col("l_discount").as("_d"), col("l_tax").as("_t"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("_q"), col("_ep"), col("_d"), col("_t"))
      .drop("_q", "_ep", "_d", "_t")

  private val b23Sql =
    s"""SELECT l_orderkey, l_linenumber,
       CAST(round($netSql, 2) AS DOUBLE) AS net,
       CAST(round($chargeSql, 2) AS DOUBLE) AS charge,
       round(abs(l_quantity - 25.0), 2) AS qdev,
       round(pow(l_quantity, 2), 2) AS q2,
       round(ln(l_extendedprice), 6) AS ln_price,
       round(sqrt(l_quantity), 6) AS sqrt_q
       FROM lineitem
       ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax"""

  /** Bitwise operator family (partition routing / bloom-filter style key
    * math). */
  private def b23c(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_orderkey").bitwiseAND(lit(255L)).as("band"),
      col("l_orderkey").bitwiseOR(lit(1024L)).as("bor"),
      col("l_orderkey").bitwiseXOR(lit(255L)).as("bxor"),
      shiftleft(col("l_orderkey"), 2).as("shl"),
      shiftright(col("l_orderkey"), 3).as("shr"))
      .orderBy("l_orderkey", "l_linenumber")

  private val b23cSql =
    """SELECT l_orderkey, l_linenumber,
       l_orderkey & 255 AS band,
       l_orderkey | 1024 AS bor,
       xor(l_orderkey, 255) AS bxor,
       l_orderkey << 2 AS shl,
       l_orderkey >> 3 AS shr
       FROM lineitem ORDER BY l_orderkey, l_linenumber"""

  /** Conditional / null-handling family: CASE, greatest/least, nullif,
    * coalesce. */
  private def b23b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey"),
      greatest(round(col("c_acctbal"), 2), lit(5000.0)).as("floor5k"),
      least(round(col("c_acctbal"), 2), lit(5000.0)).as("cap5k"),
      nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(default)")).as("seg_defaulted"),
      when(col("c_acctbal") < 0, "negative")
        .when(col("c_acctbal") < 5000, "mid")
        .otherwise("high").as("bal_band"))
      .orderBy("c_custkey")

  private val b23bSql =
    """SELECT c_custkey,
       greatest(round(c_acctbal, 2), 5000.0) AS floor5k,
       least(round(c_acctbal, 2), 5000.0) AS cap5k,
       nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
       coalesce(nullif(c_mktsegment, 'BUILDING'), '(default)') AS seg_defaulted,
       CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_band
       FROM customer ORDER BY c_custkey"""

  // ---------------------------------------------------------------- B24
  /** Array / higher-order function family over the embedding column. The
    * fold runs element-order-sequential in both engines, so double sums are
    * bit-comparable; rounding guards the last ulp. */
  private def b24(s: SparkSession, dir: String): DataFrame = {
    val e = col("embedding")
    val dbl = (c: Column) => c.cast("double")
    t(s, dir, "embeddings").select(
      col("vec_id"),
      size(e).as("dim"),
      round(dbl(element_at(e, 1)), 6).as("first_val"),
      round(aggregate(e, lit(0.0), (acc, x) => acc + dbl(x) * dbl(x)), 4).as("norm2"),
      round(aggregate(filter(e, x => x > 0), lit(0.0), (acc, x) => acc + dbl(x)), 4).as("pos_sum"))
      .orderBy("vec_id")
  }

  private val b24Sql =
    """SELECT m.vec_id, CAST(len(m.embedding) AS INT) AS dim,
       round(CAST(m.embedding[1] AS DOUBLE), 6) AS first_val,
       round(s.norm2, 4) AS norm2, round(s.pos_sum, 4) AS pos_sum
       FROM embeddings m JOIN
       (SELECT vec_id,
               sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS norm2,
               sum(CASE WHEN x > 0 THEN CAST(x AS DOUBLE) ELSE 0 END) AS pos_sum
        FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        GROUP BY vec_id) s USING (vec_id)
       ORDER BY vec_id"""

  /** Array predicate HOFs: exists / forall / filter-count. */
  private def b24b(s: SparkSession, dir: String): DataFrame = {
    val e = col("embedding")
    t(s, dir, "embeddings").select(
      col("vec_id"),
      exists(e, x => x.cast("double") > 0.2).as("any_big"),
      forall(e, x => x.cast("double") < 1.0).as("all_small"),
      size(filter(e, x => x > 0)).as("n_pos"))
      .orderBy("vec_id")
  }

  private val b24bSql =
    """SELECT vec_id,
       len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.2)) > 0 AS any_big,
       len(list_filter(embedding, x -> CAST(x AS DOUBLE) < 1.0)) = len(embedding) AS all_small,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
       FROM embeddings ORDER BY vec_id"""

  // ---------------------------------------------------------------- B25
  /** JSON extraction from the `events.props` payload column — both JSON
    * APIs: path extraction (`get_json_object`) and schema-full parse
    * (`from_json` to a struct). */
  private def b25(s: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("bigint")
    val kStruct = from_json(col("props"),
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k")
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(k).as("k_sum"),
        round(avg(k), 4).as("k_avg"),
        max(kStruct).as("k_max"))
      .orderBy("event_type")
  }

  private val b25Sql =
    """SELECT event_type, count(*) AS n,
       CAST(sum(k) AS BIGINT) AS k_sum,
       round(avg(k), 4) AS k_avg,
       max(k) AS k_max
       FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
       GROUP BY event_type ORDER BY event_type"""

  // ---------------------------------------------------------------- B26
  /** Data-plane hashing (the reference's SHA-256 provenance, A12, as a
    * distributed column op). */
  private def b26(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      sha2(col("text"), 256).as("text_sha256"),
      md5(col("text")).as("text_md5"),
      sha2(concat_ws("|", col("source"), col("text")), 256).as("src_sha256"))
      .orderBy("doc_id")

  private val b26Sql =
    """SELECT doc_id, sha256(text) AS text_sha256, md5(text) AS text_md5,
       sha256(source || '|' || text) AS src_sha256
       FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------------------- B36
  /** Typed UDAF (Aggregator) — weighted average; see [[WeightedAvg]]. */
  private def b36(s: SparkSession, dir: String): DataFrame = {
    val wavg = WeightedAvg.udafColumn
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      // the UDAF yields NaN for a zero total weight where the SQL
      // sum/sum oracle yields NULL (division by zero) — align here
      .agg(round(nanvl(wavg(col("l_extendedprice"), col("l_quantity")),
          lit(null).cast("double")), 4).as("wavg_price"),
        round(sum(col("l_quantity")), 2).as("sum_w"))
      .orderBy("l_returnflag")
  }

  private val b36Sql =
    """SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
       round(sum(l_quantity), 2) AS sum_w
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ------------------------------------------------- B38-B40 deep joins
  // TPC-H Q3/Q5/Q10 shapes: 3-6 table join trees with a mixed broadcast/
  // shuffle strategy. The dims (nation, region) are genuinely tiny at any
  // scale and broadcast explicitly; customer/orders/lineitem are facts and
  // must shuffle on their join keys (AQE handles skew/re-plan). Join order
  // is left to Catalyst's cost-based reorder — declaring the joins rather
  // than hand-ordering them is exactly what survives a 100× scale-up.

  /** Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem, revenue
    * top-10. Filters sit directly on the scans (pushdown), the two fact
    * joins shuffle on their keys, and the top-k is TakeOrderedAndProject. */
  private def b38(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
      .join(t(s, dir, "lineitem").filter(
        col("l_shipdate") > lit("1998-07-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(netDec), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .orderBy(col("revenue").desc, col("l_orderkey"))

  private val b38Sql =
    s"""SELECT l_orderkey, o_orderdate,
       CAST(round(sum($netSql), 2) AS DOUBLE) AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-07-01'
         AND l_shipdate > TIMESTAMP '1998-07-01'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** Q5 shape: region ⋈ nation dims broadcast over a customer ⋈ orders ⋈
    * lineitem ⋈ supplier fact chain, revenue per nation. The
    * c_nationkey = s_nationkey predicate makes the supplier join
    * selective (local-supplier semantics). */
  private def b39(s: SparkSession, dir: String): DataFrame = {
    val dims = broadcast(
      t(s, dir, "nation").join(
        broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey")))
    t(s, dir, "customer")
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(dims, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(netDec), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val b39Sql =
    s"""SELECT n_name,
       CAST(round(sum($netSql), 2) AS DOUBLE) AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'EUROPE'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01'
       GROUP BY n_name ORDER BY revenue DESC, n_name"""

  /** Q10 shape: returned-item revenue per customer over a quarter —
    * customer ⋈ orders ⋈ lineitem facts plus the broadcast nation dim,
    * grouped at customer grain, top-20. */
  private def b40(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(netDec), 2).cast("double").as("revenue"),
        round(max(col("c_acctbal")), 2).as("acctbal"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .orderBy(col("revenue").desc, col("c_custkey"))

  private val b40Sql =
    s"""SELECT c_custkey, c_name, n_name,
       CAST(round(sum($netSql), 2) AS DOUBLE) AS revenue,
       round(max(c_acctbal), 2) AS acctbal
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate < TIMESTAMP '1997-04-01'
         AND l_returnflag = 'R'
       GROUP BY c_custkey, c_name, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** Q4 shape (order-priority checking: quarter's orders with at least
    * one returned line) driven through the EXPLICIT runtime filter
    * ([[graft.operators.RuntimeFilter]]): the quarter's order keys
    * collapse to a broadcast 32 KB Bloom mask, the lineitem side is
    * pruned map-only at scan time, and only then does the semi-join
    * shuffle run — the fact exchange carries ~|quarter| keys' worth of
    * lines instead of every returned line in history. The oracle is the
    * PLAIN exists-join: its hash match certifies the reduction lossless
    * (the x67b discipline). At 100 TB this is the difference between
    * shuffling a quarter's slice and shuffling the whole fact table —
    * the shape Spark's own InjectRuntimeFilter produces when its size
    * thresholds trigger, stated unconditionally. */
  private def b41(s: SparkSession, dir: String): DataFrame = {
    val ords = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    val rlines = t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    val pruned = graft.operators.RuntimeFilter.bloomReduce(
      rlines, col("l_orderkey"), ords.select(col("o_orderkey")), "b41")
    ords.join(pruned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val b41Sql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate < TIMESTAMP '1997-04-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ----------------------------------------------------------------
  val defs: Seq[QueryDef] = Seq(
    QueryDef("b05_select_rename_cast", b05, Some(b05Sql)),
    QueryDef("b06_filter_predicates", b06, Some(b06Sql)),
    QueryDef("b07_broadcast_join", b07, Some(b07Sql)),
    QueryDef("b08_shuffle_join", b08, Some(b08Sql)),
    QueryDef("b09a_left_outer_join", b09a, Some(b09aSql)),
    QueryDef("b09b_semi_join", b09b, Some(b09bSql)),
    QueryDef("b09c_anti_join", b09c, Some(b09cSql)),
    QueryDef("b09d_full_outer", b09d, Some(b09dSql)),
    QueryDef("b10_range_join", b10, Some(b10Sql)),
    QueryDef("b11_asof_join", b11, Some(b11Sql)),
    QueryDef("b12_q1_agg", b12, Some(b12Sql)),
    QueryDef("b12b_percentiles", b12b, Some(b12bSql)),
    QueryDef("b12c_stats", b12c, Some(b12cSql)),
    QueryDef("b12d_approx_percentiles", b12d, None),
    QueryDef("b13_distinct_counts", b13, Some(b13Sql)),
    QueryDef("b13b_approx_distinct", b13b, None),
    QueryDef("b12e_histogram_percentiles", b12e, Some(b12eSql)),
    QueryDef("b13d_hll_pinned", b13d, Some(b13dSql)),
    QueryDef("b13e_cms_topk", b13e, Some(b13eSql)),
    QueryDef("b13c_string_agg", b13c, Some(b13cSql)),
    QueryDef("b14_rollup", b14, Some(b14Sql)),
    QueryDef("b14b_cube", b14b, Some(b14bSql)),
    QueryDef("b14c_pivot", b14c, Some(b14cSql)),
    QueryDef("b14d_grouping_sets", b14d, Some(b14dSql)),
    QueryDef("b15_provenance_counts", b15, Some(b15Sql)),
    QueryDef("b16_rank_topk", b16, Some(b16Sql)),
    QueryDef("b16b_window_extra", b16b, Some(b16bSql)),
    QueryDef("b17_lag_lead", b17, Some(b17Sql)),
    QueryDef("b18_moving_avg", b18, Some(b18Sql)),
    QueryDef("b18b_range_window", b18b, Some(b18bSql)),
    QueryDef("b19_global_topk", b19, Some(b19Sql)),
    QueryDef("b20a_union", b20a, Some(b20aSql)),
    QueryDef("b20b_intersect", b20b, Some(b20bSql)),
    QueryDef("b20c_except", b20c, Some(b20cSql)),
    QueryDef("b21_string_funcs", b21, Some(b21Sql)),
    QueryDef("b21b_string_extra", b21b, Some(b21bSql)),
    QueryDef("b21c_regexp", b21c, Some(b21cSql)),
    QueryDef("b22_datetime_funcs", b22, Some(b22Sql)),
    QueryDef("b22b_datetime_extra", b22b, Some(b22bSql)),
    QueryDef("b22c_time_spine", b22c, Some(b22cSql)),
    QueryDef("b23_math_funcs", b23, Some(b23Sql)),
    QueryDef("b23b_conditional", b23b, Some(b23bSql)),
    QueryDef("b23c_bitwise", b23c, Some(b23cSql)),
    QueryDef("b24_array_funcs", b24, Some(b24Sql)),
    QueryDef("b24b_array_predicates", b24b, Some(b24bSql)),
    QueryDef("b25_json_funcs", b25, Some(b25Sql)),
    QueryDef("b26_hash_provenance", b26, Some(b26Sql)),
    QueryDef("b36_weighted_avg_udaf", b36, Some(b36Sql)),
    QueryDef("b38_q3_shape", b38, Some(b38Sql)),
    QueryDef("b39_q5_shape", b39, Some(b39Sql)),
    QueryDef("b40_q10_shape", b40, Some(b40Sql)),
    QueryDef("b41_runtime_filter", b41, Some(b41Sql)))
}
