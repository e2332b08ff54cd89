package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Targeted semantics checks for relational queries whose registered form
  * is rows-only (no DuckDB oracle). */
class RelationalSpec extends SparkSpec {

  test("b12d approx percentiles track the exact b12b form within sketch error") {
    def byFlag(name: String): Map[String, Seq[Double]] =
      SparkEntry.queries(name)(spark, sf).collect().map { r =>
        r.getString(0) -> (1 to 3).map(i => r.get(i) match {
          case d: java.math.BigDecimal => d.doubleValue()
          case d: Double => d
          case other => other.toString.toDouble
        })
      }.toMap
    val exact = byFlag("b12b_percentiles")
    val approx = byFlag("b12d_approx_percentiles")
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, es) =>
      es.zip(approx(flag)).foreach { case (e, a) =>
        assert(math.abs(e - a) <= 0.01 * math.max(1.0, math.abs(e)),
          s"group $flag: approx $a strayed from exact $e")
      }
    }
  }

  test("b12e: histogram quantiles land within one bin width of the exact form") {
    val exact = graft.SparkEntry.queries("b12b_percentiles")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val hist = graft.SparkEntry.queries("b12e_histogram_percentiles")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(hist.keySet == exact.keySet)
    // Data-derived bound: one bin width per column (plus the exact
    // form's interpolation, absorbed by the 1.5x slack).
    import org.apache.spark.sql.functions._
    val li = graft.Tables.t(spark, sf, "lineitem")
    val Seq(wQty, wPrice) = Seq("l_quantity", "l_extendedprice").map { c =>
      val r = li.agg((max(col(c)) - min(col(c))).as("r")).head().getDouble(0)
      1.5 * r / 1000.0
    }
    hist.foreach { case (flag, (mq, p90, p10)) =>
      val (emq, ep90, ep10) = exact(flag)
      assert(math.abs(mq - emq) <= wQty, s"$flag med_qty: $mq vs $emq (±$wQty)")
      assert(math.abs(p90 - ep90) <= wPrice, s"$flag p90: $p90 vs $ep90 (±$wPrice)")
      assert(math.abs(p10 - ep10) <= wPrice, s"$flag p10: $p10 vs $ep10 (±$wPrice)")
    }
  }

  test("b13d: pinned HLL estimate lands inside the published error band; runs deterministic") {
    // m=64 -> std error 1.04/sqrt(64) ~= 13%; gate at ~2 sigma. The exact
    // count rides in the same output, so the bound needs no second query.
    val rows = graft.SparkEntry.queries("b13d_hll_pinned")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, nd) = (r.getDouble(3), r.getLong(4))
      assert(nd > 0 && math.abs(est / nd - 1.0) <= 0.26,
        s"flag ${r.getString(0)}: HLL est $est vs exact $nd")
      // Register-sum sanity: integer, positive, bounded by m * 2^(W+1).
      val s1 = r.getLong(1)
      assert(s1 > 0 && s1 <= 64L * (1L << 27), s"register sum out of range: $s1")
    }
    val again = graft.SparkEntry.queries("b13d_hll_pinned")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "pinned HLL must be run-to-run identical")
  }

  test("b13e: CMS estimates are one-sided and inside the published ε-band") {
    // d=4, w=512: est >= true ALWAYS (counters only add); est <= true +
    // εN with ε = e/w ≈ 0.53% at P ≈ 1 − e^−4 per probe — gate at 2× the
    // bound to absorb the probabilistic tail over 20 probes.
    val rows = graft.SparkEntry.queries("b13e_cms_topk")(spark, sf).collect()
    assert(rows.length == 20)
    val n = graft.Tables.t(spark, sf, "lineitem").count()
    val band = 2.0 * math.E / 512.0 * n
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact,
        s"key ${r.getLong(0)}: CMS must never underestimate ($est < $exact)")
      assert(est <= exact + band,
        s"key ${r.getLong(0)}: est $est strayed past exact $exact + $band")
    }
    val again = graft.SparkEntry.queries("b13e_cms_topk")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "pinned CMS must be run-to-run identical")
  }

  test("b14d: exactly the stated grouping sets appear — no (status, priority) cells") {
    val rows = graft.SparkEntry.queries("b14d_grouping_sets")(spark, sf).collect()
    // lvl bitmask: 01 = priority aggregated away (status rows),
    // 10 = status aggregated away (priority rows), 11 = grand total.
    val byLvl = rows.groupBy(_.getInt(2))
    assert(byLvl.keySet == Set(1, 2, 3), s"unexpected grouping levels: ${byLvl.keySet}")
    assert(byLvl(3).length == 1, "exactly one grand-total row")
    byLvl(1).foreach(r => assert(r.getString(1) == "(all)",
      s"status rows must aggregate priority away: $r"))
    byLvl(2).foreach(r => assert(r.getString(0) == "(all)",
      s"priority rows must aggregate status away: $r"))
    // The three sets partition the fact mass: each level's n sums to the total.
    val total = byLvl(3).head.getLong(3)
    assert(byLvl(1).map(_.getLong(3)).sum == total && byLvl(2).map(_.getLong(3)).sum == total,
      "every grouping set must cover all rows exactly once")
  }

  test("x83: log2 length buckets have exact power-of-two edges and cover the corpus") {
    val rows = graft.pipeline.TextStats.lengthHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, mn, mx) = (r.getInt(1), r.getLong(4), r.getLong(5))
      assert(mn >= (1L << (b - 1)) && mx < (1L << b),
        s"bucket $b must hold exactly [2^${b - 1}, 2^$b): [$mn, $mx]")
      assert(mn <= mx && r.getLong(2) > 0)
    }
    val total = graft.Tables.t(spark, sf, "documents").count()
    assert(rows.map(_.getLong(2)).sum == total, "histogram must cover every doc")
  }
}
