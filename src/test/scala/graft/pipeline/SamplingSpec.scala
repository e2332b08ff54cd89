package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Invariants of the sampling/mixture family beyond the oracle hash
  * compare: rate adherence, budget bounds, and the deterministic
  * fractional-upsampling contract. */
class SamplingSpec extends SparkSpec {

  test("stratified sample holds per-language rates and is deterministic") {
    val rows = Sampling.stratifiedSample(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (lang, (total, sampled)) =>
      val rate = Sampling.StratumRatesBp.getOrElse(lang, Sampling.DefaultRateBp)
      if (rate == Sampling.DefaultRateBp)
        assert(sampled == total, s"$lang: default rate must keep everything")
      else {
        // Bernoulli bound: ±4σ around the expected fraction.
        val p = rate.toDouble / 10000
        val sd = math.sqrt(total * p * (1 - p))
        assert(math.abs(sampled - total * p) <= 4 * sd + 1,
          s"$lang: sampled $sampled of $total at nominal rate $p")
      }
    }
    // Byte-identical membership on re-run (the reproducibility contract).
    val again = Sampling.stratifiedSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(4))).toMap
    val first = Sampling.stratifiedSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(4))).toMap
    assert(again == first)
  }

  test("x55: allocations sum to the budget exactly and stay within 1 of the true share") {
    val rows = Sampling.budgetApportion(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    val total = rows.map(_._2).sum
    // The Hamilton guarantee: Σ alloc == B exactly (naive rounding does
    // not give this), and every stratum is within 1 token of its exact
    // proportional share (quota monotonicity of largest-remainder).
    assert(rows.map(_._3).sum == Sampling.ApportionBudget,
      s"allocations must sum to the budget: $rows")
    rows.foreach { case (lang, avail, alloc) =>
      val exact = Sampling.ApportionBudget.toDouble * avail / total
      assert(math.abs(alloc - exact) <= 1.0, s"$lang: alloc $alloc vs exact $exact")
    }
    assert(rows.toSeq == Sampling.budgetApportion(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq)
  }

  test("x86: exact integer sqrt, both pmfs sum to the budget, boost flattens") {
    val rows = Sampling.temperatureSampling(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val nSrc = graft.Tables.t(spark, sf, "documents")
      .select("source").distinct().count()
    assert(rows.length == nSrc, "one row per source")
    rows.foreach { case (src, n, s, _, _, _) =>
      assert(s * s <= n && n < (s + 1) * (s + 1),
        s"$src: sqrt_tok $s is not the integer sqrt of $n")
    }
    // Both probability vectors are exact pmfs over the budget.
    assert(rows.map(_._4).sum == Sampling.ApportionBudget,
      "tempered masses must sum to the budget exactly")
    assert(rows.map(_._5).sum == Sampling.ApportionBudget,
      "natural masses must sum to the budget exactly")
    // The flattening direction of alpha < 1: the smallest source is
    // upsampled past parity, the largest downsampled below it, and the
    // tempered vector's spread never exceeds the natural one's.
    val smallest = rows.minBy(_._2); val largest = rows.maxBy(_._2)
    assert(smallest._6 > 10000,
      s"smallest source ${smallest._1} must be boosted: ${smallest._6} bp")
    assert(largest._6 < 10000,
      s"largest source ${largest._1} must be shrunk: ${largest._6} bp")
    val spreadA = rows.map(_._4).max - rows.map(_._4).min
    val spreadN = rows.map(_._5).max - rows.map(_._5).min
    assert(spreadA <= spreadN,
      s"alpha=1/2 must compress the distribution: $spreadA vs $spreadN")
    // boost is exactly q*1e4 div p.
    rows.foreach { case (src, _, _, q, p, b) =>
      assert(b == q * 10000L / math.max(p, 1L), s"$src: boost law violated")
    }
  }

  test("x103: length buckets cut padding waste vs one global batch; hand-pinned fixture") {
    import spark.implicits._
    // Bucket 2 (lens 4..7): docs of 4 and 6 tokens. Bucket 5 (32..63):
    // docs of 32 and 40 tokens. Global max 40.
    def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val corpus = Seq((1L, toks(4)), (2L, toks(6)), (3L, toks(32)), (4L, toks(40)))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lbb")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = Sampling.lengthBucketBatching(spark, dir.toString).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
      // Bucket 2: n=2, mass 10, padded 2*6=12, waste 2/12=1666 bp;
      // naive 2*40=80 pad, waste 70/80=8750 bp.
      assert(rows(2L) == ((2L, 4L, 6L, 10L, 12L, 1666L, 8750L)), s"b2: ${rows(2L)}")
      // Bucket 5: n=2, mass 72, padded 80, waste 8/80=1000 bp;
      // naive waste (80-72)/80 = same here since gmax=40=len_max.
      assert(rows(5L) == ((2L, 32L, 40L, 72L, 80L, 1000L, 1000L)), s"b5: ${rows(5L)}")
      rows.values.foreach { case (_, _, _, _, _, waste, naive) =>
        assert(waste <= naive, "bucketing can never pad more than one global batch")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("x102: priority sampling favors heavy docs and obeys the integer key law") {
    import spark.implicits._
    // 200 one-token docs vs 200 thirty-token docs: under E-S priorities
    // a heavy doc's key is an Exp draw divided by 30, so the top-100
    // should be overwhelmingly heavy (expected ~97%).
    val heavyText = (1 to 30).map(i => s"t$i").mkString(" ")
    val corpus = ((0L until 200L).map(i => (i, "light", "tok")) ++
      (200L until 400L).map(i => (i, "heavy", heavyText)))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("prio")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = Sampling.prioritySample(spark, dir.toString).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      assert(rows.length == Sampling.PrioritySampleK, "exact-size sample")
      val heavy = rows.count(_._2 == "heavy")
      assert(heavy >= 80, s"weight-30 docs must dominate the sample: $heavy/100")
      // The integer chain, independently recomputed per selected row.
      rows.foreach { case (id, _, w, sel, nlu, prio) =>
        val expectSel = (((id + Sampling.PrioritySalt) % HashConstants.HashPrime)
          * HashConstants.Knuth % HashConstants.HashPrime) % 10000L
        assert(sel == expectSel, s"doc $id: selector")
        assert(nlu == math.round(-1000000.0 *
          math.log((sel.toDouble + 1) / 10002.0)), s"doc $id: nlu")
        assert(prio == nlu * 1000000000L / w, s"doc $id: priority law")
      }
      // Reproducibility: byte-identical membership on re-run.
      val again = Sampling.prioritySample(spark, dir.toString).collect()
        .map(_.getLong(0)).toSeq
      assert(again == rows.map(_._1).toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("x112: interleave positions are unique, bijective, and cycle sources") {
    val rows = Sampling.interleaveOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    val n = Tables.t(spark, sf, "documents").count()
    assert(rows.length == n, "one position per document")
    assert(rows.map(_._5).distinct.length == rows.length, "positions unique")
    val srcs = rows.map(_._2).distinct.sorted
    val sCount = srcs.length.toLong
    // Position law: pos = (rk-1)*S + si, and si is the alphabetical index.
    val siOf = srcs.zipWithIndex.map { case (s0, i) => s0 -> i.toLong }.toMap
    rows.foreach { case (_, src, rk, si, pos) =>
      assert(si == siOf(src), s"$src: index")
      assert(pos == (rk - 1) * sCount + si, s"$src: position law")
    }
    // The interleave guarantee: in the prefix where every source still
    // has documents, each S-length block contains all S sources.
    val minSize = rows.groupBy(_._2).map(_._2.length).min
    val prefix = rows.filter(_._5 < minSize.toLong * sCount).sortBy(_._5)
    prefix.grouped(srcs.length).foreach { block =>
      if (block.length == srcs.length)
        assert(block.map(_._2).distinct.length == srcs.length,
          s"block must cycle all sources: ${block.map(_._2).toSeq}")
    }
    // Reproducibility.
    val again = Sampling.interleaveOrder(spark, sf).collect().map(_.getLong(0))
    assert(again.toSeq == rows.map(_._1).toSeq)
  }

  test("x102b: stratified sample takes k per source and matches the global order") {
    val strat = Sampling.prioritySampleStratified(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(6)))
    val bySrc = strat.groupBy(_._1)
    val srcCounts = Tables.t(spark, sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.foreach { case (src, rows) =>
      val expect = math.min(Sampling.StratPriorityK, srcCounts(src))
      assert(rows.length == expect, s"$src: ${rows.length} vs $expect")
      assert(rows.map(_._2).sorted.toSeq == (1L to expect).toSeq,
        s"$src: ranks must be contiguous")
      // Within a source the winners are the priority order itself.
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(r => (r._4, r._3)).toSeq ==
        rows.map(r => (r._4, r._3)).sortBy(identity).toSeq,
        s"$src: rank must follow (prio, doc_id)")
    }
    // Single-sourcing vs x102: any global winner inside a source must
    // appear in that source's stratified sample at least as early.
    val global = Sampling.prioritySample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stratIds = strat.map(_._3).toSet
    global.groupBy(_._2).foreach { case (src, g) =>
      g.take(Sampling.StratPriorityK.toInt).foreach { case (id, _) =>
        assert(stratIds.contains(id),
          s"$src: global winner $id missing from the stratified sample")
      }
    }
  }

  test("x98: specialist-vs-generalist excess drives the weights; planted domain wins") {
    import spark.implicits._
    // "web" carries the corpus-dominant vocabulary, so the generalist
    // (global) LM nearly IS web's specialist LM -> excess ~ 0. "wiki"
    // speaks a private vocabulary that is rare globally but common in
    // its own LM -> large positive excess -> DoReMi upweights it.
    val corpus = Seq(
      (1L, "wiki", "q1 q2 q3 q4 q1 q2"),
      (2L, "wiki", "q1 q3 q2 q4 q3 q1"),
      (3L, "web", "a b c d a b c d"),
      (4L, "web", "b a d c b a d c"),
      (5L, "web", "a a b b c c d d"),
      (6L, "web", "d c b a d c b a"))
      .toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("doremi").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Sampling.doremiWeights(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val byName = rows.map(r => r._1 -> r).toMap

    // Independent plain-Scala recomputation of the whole integer chain.
    val docsFx = Seq(
      (1L, "wiki", "q1 q2 q3 q4 q1 q2"), (2L, "wiki", "q1 q3 q2 q4 q3 q1"),
      (3L, "web", "a b c d a b c d"), (4L, "web", "b a d c b a d c"),
      (5L, "web", "a a b b c c d d"), (6L, "web", "d c b a d c b a"))
    val allToks = docsFx.flatMap { case (_, _, t) => t.split(" ") }
    val cfG = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nG = allToks.size.toLong
    val bySrc = docsFx.groupBy(_._2)
    val expect = bySrc.map { case (src, ds) =>
      val srcToks = ds.flatMap(_._3.split(" "))
      val cfS = srcToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nS = srcToks.size.toLong
      def nll(t: String, cf: Map[String, Long], n: Long): Double =
        -math.log(cf(t).toDouble / n)
      val (sg, sd) = ds.map { case (_, _, text) =>
        val ts = text.split(" ")
        val g = BigDecimal(ts.map(nll(_, cfG, nG)).sum / ts.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        val d = BigDecimal(ts.map(nll(_, cfS, nS)).sum / ts.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (math.round(g * 10000), math.round(d * 10000))
      }.unzip match { case (gs, dss) => (gs.sum, dss.sum) }
      val mg = (sg * 100) / ds.size; val md = (sd * 100) / ds.size
      val ex = math.max(mg - md, 0L)
      src -> (ds.size.toLong, mg, md, ex, 1000000L + ex)
    }
    expect.foreach { case (src, (n, mg, md, ex, f)) =>
      val got = byName(src)
      assert((got._2, got._3, got._4, got._5, got._6) == ((n, mg, md, ex, f)),
        s"$src: engine ${got} vs recomputed ($n, $mg, $md, $ex, $f)")
    }
    // MLE optimality: the specialist never does worse than the
    // generalist on its own domain (means, integer micro-nats).
    rows.foreach { case (src, _, mg, md, _, _, _) =>
      assert(md <= mg, s"$src: specialist mean $md beats generalist $mg")
    }
    // The planted direction and the exact-budget contract.
    assert(byName("wiki")._5 > byName("web")._5,
      "private-vocabulary domain must show the larger excess")
    assert(byName("wiki")._7 > byName("web")._7,
      "DoReMi must upweight the underserved domain")
    assert(rows.map(_._7).sum == Sampling.ApportionBudget,
      "weights must sum to the budget exactly")
  }

  test("x98 on the real corpus: one row per source, factor law, exact budget") {
    val rows = Sampling.doremiWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(4), r.getLong(5), r.getLong(6)))
    val nSrc = Tables.t(spark, sf, "documents").select("source").distinct().count()
    assert(rows.length == nSrc, "one row per source")
    rows.foreach { case (src, ex, f, _) =>
      assert(f == 1000000L + ex, s"$src: factor must be 1e6 + excess")
    }
    assert(rows.map(_._4).sum == Sampling.ApportionBudget)
  }

  test("x87: closed-form waterfill equals the sequential UNIMAX algorithm") {
    val rows = Sampling.unimaxAllocation(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4), r.getLong(5)))
    val totalTok = rows.map(_._2).sum
    val budget = 3 * totalTok
    assert(rows.map(_._5).sum == budget,
      s"allocations must consume the budget exactly: ${rows.map(_._5).sum} vs $budget")
    rows.foreach { case (lang, n, cap, capped, alloc, ebp) =>
      assert(cap == n * Sampling.MaxEpochs, s"$lang: cap law")
      assert(alloc <= cap, s"$lang: alloc $alloc exceeds capacity $cap")
      if (capped) assert(alloc == cap, s"$lang: capped but not at capacity")
      assert(ebp == alloc * 10000L / n && ebp <= Sampling.MaxEpochs * 10000L,
        s"$lang: epoch accounting")
    }
    // Both branches must be exercised at this SF or the test is vacuous.
    assert(rows.exists(_._4) && rows.exists(!_._4),
      "fixture must exercise capped AND uncapped languages")
    // Uncapped shares are uniform within the 1-token remainder grant.
    val un = rows.filterNot(_._4).map(_._5)
    assert(un.max - un.min <= 1, s"waterfill shares must be uniform: $un")
    // Ground truth: run the PAPER's sequential waterfill and compare.
    var remaining = rows.sortBy(r => (r._3, r._1)).toList
    var b = budget
    val seq = scala.collection.mutable.Map[String, Long]()
    while (remaining.nonEmpty) {
      val share = b / remaining.length
      remaining.find(_._3 < share) match {
        case Some(r) =>
          seq(r._1) = r._3; b -= r._3; remaining = remaining.filterNot(_ == r)
        case None =>
          val m = remaining.length; val w = b / m; val extra = b % m
          remaining.zipWithIndex.foreach { case (r, j) =>
            seq(r._1) = w + (if (j < extra) 1L else 0L)
          }
          remaining = Nil
      }
    }
    rows.foreach { case (lang, _, _, _, alloc, _) =>
      assert(seq(lang) == alloc,
        s"$lang: closed form $alloc != sequential waterfill ${seq(lang)}")
    }
  }

  test("x55b: carve-out respects each allocation within one doc's overshoot") {
    val perLangMax = Tables.t(spark, sf, "documents")
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("lang").agg(max("n").as("mx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Sampling.budgetCarveout(spark, sf).collect().foreach { r =>
      val (lang, alloc, kept, keptTokens) =
        (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4))
      assert(kept >= 1, s"$lang kept no docs")
      // Exclusive-prefix convention: overshoot < the largest kept doc.
      assert(keptTokens < alloc + perLangMax(lang),
        s"$lang kept $keptTokens tokens against allocation $alloc")
    }
  }

  test("x55b: a stratum whose allocation floors to 0 still keeps its rank-1 doc") {
    // Planted regime the real corpus never hits: lang "zz" holds 2 of
    // 1,000,000 tokens — its Hamilton share is 0.2 tokens, floors to 0,
    // and the single remainder seat (R = 1) goes to "aa"'s 0.8
    // remainder. Without the force-keep, "zz" would keep zero docs,
    // violating the ">= 1 doc per stratum" contract.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("carve0").toString
    try {
      Seq(
        (1L, "aa", Seq.fill(999998)("w").mkString(" ")),
        (2L, "zz", "w w"))
        .toDF("doc_id", "lang", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = Sampling.budgetCarveout(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
      val (zzAlloc, zzKept, zzTokens) = rows("zz")
      assert(zzAlloc == 0L, s"the planted regime must floor zz's allocation to 0: $rows")
      assert(zzKept == 1L, "zz must force-keep its rank-1 doc")
      assert(zzTokens == 2L)
      assert(rows("aa")._1 == Sampling.ApportionBudget, s"aa takes the whole budget: $rows")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("source budget keeps >=1 doc per source and bounds overshoot") {
    val budget = 800L
    val perDocMax = Tables.t(spark, sf, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(max("n").as("mx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Sampling.sourceBudgetSelect(spark, sf, budget).collect().foreach { r =>
      val (source, kept, keptTokens) = (r.getString(0), r.getLong(2), r.getLong(3))
      assert(kept >= 1, s"$source kept no docs")
      // Exclusive-prefix convention: overshoot < the largest kept doc.
      assert(keptTokens < budget + perDocMax(source),
        s"$source kept $keptTokens tokens against budget $budget")
    }
  }

  test("scalable budget select equals the single-window form exactly") {
    val a = Sampling.sourceBudgetSelect(spark, sf, 800L).collect().toSeq
    val b = Sampling.sourceBudgetSelectScalable(spark, sf, 800L).collect().toSeq
    assert(a == b, "two-phase pre-prune must reproduce the global selection")
    // Pruning really bounds phase 2: candidates per source stay within
    // subStrata * (budget + 1) rows even if the stratum were a whale.
    val c = Sampling.sourceBudgetSelectScalable(spark, sf, 10L, subStrata = 4).collect()
    assert(c.nonEmpty && c.forall(_.getLong(2) >= 1))
  }

  test("source cap keeps each source's top docs by quality; scalable form identical") {
    val out = Sampling.sourceCapByQuality(spark, sf, cap = 10).collect()
    val bySource = out.groupBy(_.getString(1))
    bySource.foreach { case (src, rows) =>
      assert(rows.length <= 10, s"$src exceeded the cap: ${rows.length}")
      // Ranks are 1..n within each source, quality non-increasing by rank.
      val ranked = rows.sortBy(_.getLong(3))
      assert(ranked.map(_.getLong(3)).toSeq == (1L to rows.length).toSeq)
      val qs = ranked.map(_.getDouble(2)).toSeq
      assert(qs == qs.sorted(Ordering[Double].reverse),
        s"$src quality must be non-increasing by rank: $qs")
    }
    // No kept doc may be outranked by a dropped one of the same source.
    val minKept = out.groupBy(_.getString(1))
      .map { case (s2, rows) => s2 -> rows.map(_.getDouble(2)).min }
    val dropped = Sampling.sourceCapByQuality(spark, sf, cap = Int.MaxValue)
      .collect().filter(_.getLong(3) > 10)
    dropped.foreach { r =>
      assert(r.getDouble(2) <= minKept(r.getString(1)),
        s"dropped doc ${r.getLong(0)} outranks a kept one in ${r.getString(1)}")
    }
    val scalable = Sampling.sourceCapByQualityScalable(spark, sf, cap = 10).collect()
    assert(out.toSeq == scalable.toSeq,
      "two-phase pre-prune must reproduce the global selection exactly")
  }

  test("x73 epoch allocation: contiguous epochs in [1,4], quality-ordered, budget-bounded") {
    val rows = Sampling.epochAllocation(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, u, _, e, alloc) =>
      assert(e >= 1 && e <= Sampling.MaxEpochs, s"$src: epochs $e out of range")
      assert(alloc == e * u, s"$src: alloc must be epochs x unique tokens")
    }
    // Quality-ordered within the marginal round: if a source reached
    // round r, every strictly-better source (qd desc, source tiebreak)
    // must have reached r too — the breadth-first grant order.
    val maxE = rows.map(_._4).max
    if (maxE >= 2) {
      val ordered = rows.toSeq.sortBy { case (src, _, qd, _, _) => (-qd, src) }
      ordered.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4 >= b._4,
            s"better source ${a._1} (qd ${a._3}) got ${a._4} epochs, " +
              s"worse ${b._1} (qd ${b._3}) got ${b._4}")
        case _ => ()
      }
    }
    // Budget contract: the 2.5-epoch budget, prefix-rule overshoot
    // bounded by one source's single-epoch cost.
    val total = rows.map(_._2).sum
    val budget = total * 5 / 2
    val alloc = rows.map(_._5).sum
    assert(alloc >= math.min(budget, total * Sampling.MaxEpochs) - rows.map(_._2).max,
      "allocation must approach the budget")
    assert(alloc <= budget + rows.map(_._2).max,
      s"overshoot past one epoch-cost: alloc $alloc vs budget $budget")
    val again = Sampling.epochAllocation(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == again.toSeq, "allocation must be run-to-run identical")
  }

  test("x76 curriculum: four non-overlapping quality bands covering every doc") {
    val rows = Sampling.curriculumPhases(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to Sampling.CurriculumPhases),
      s"all phases must be non-empty: ${rows.map(_._1).toSeq}")
    val d = graft.Tables.t(spark, sf, "documents")
    val n = d.count()
    assert(rows.map(_._2).sum == n, "every doc lands in exactly one phase")
    assert(rows.map(_._4).sum ==
      d.agg(org.apache.spark.sql.functions.sum("doc_id")).head().getLong(0),
      "id checksums must partition the corpus")
    // Quality bands strictly descending and disjoint (the cut is on the
    // integer quality value, so bands can never interleave).
    rows.sliding(2).foreach {
      case Array(hi, lo) =>
        assert(hi._5 > lo._6,
          s"phase ${hi._1} min ${hi._5} must exceed phase ${lo._1} max ${lo._6}")
      case _ => ()
    }
    // Quartile balance modulo value ties: each phase within 20% of n/4.
    rows.foreach { case (p, nd, _, _, _, _) =>
      assert(math.abs(nd - n / 4.0) <= 0.2 * n / 4.0 + 1,
        s"phase $p holds $nd docs vs ~${n / 4}")
    }
  }

  test("mixture emits floor(w) to ceil(w) copies per doc, exact for integer w") {
    val out = Sampling.mixtureMaterialize(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.foreach { case (lang, (docs, emitted)) =>
      val w = Sampling.MixWeightsX100.getOrElse(lang, Sampling.DefaultWeightX100)
      val lo = (w / 100) * docs
      val hi = lo + (if (w % 100 == 0) 0L else docs)
      assert(emitted >= lo && emitted <= hi,
        s"$lang: $emitted copies of $docs docs outside [$lo,$hi] for w=$w")
      if (w % 100 == 0)
        assert(emitted == lo, s"$lang: integer weight must emit exactly $lo")
      else {
        // The fractional part should land near frac(w)·docs (±4σ).
        val p = (w % 100).toDouble / 100
        val sd = math.sqrt(docs * p * (1 - p))
        assert(math.abs((emitted - lo) - docs * p) <= 4 * sd + 1,
          s"$lang: fractional upsample ${emitted - lo} of $docs at frac $p")
      }
    }
  }

  test("registered salt constants are pairwise distinct (r12 regression)") {
    // Round 12 shipped PrioritySalt == MixSalt == DensSalt == 104729:
    // three independent keep/draw decisions became bit-identical hash
    // draws on the same key — deterministic (anti-)correlation between
    // x23 upsampling, x97 density thinning, and x102 priority sampling.
    // Every salted decision must use its own salt; this gate fails the
    // build if a future operator reuses one.
    val salts = Map(
      "PrefixSalt(x20)" -> Sampling.PrefixSalt,
      "SampleSalt(x21)" -> Sampling.SampleSalt,
      "MixSalt(x23)" -> Sampling.MixSalt,
      "CarveSalt(x55b)" -> Sampling.CarveSalt,
      "PrioritySalt(x102)" -> Sampling.PrioritySalt,
      "InterleaveSalt(x112)" -> Sampling.InterleaveSalt,
      "DensSalt(x97)" -> Similarity.DensSalt,
      "DsirSalt(x50)" -> Selection.DsirSalt,
      "ShardSalt(x15d)" -> Curation.ShardSalt,
      "CmsSalt(b12d)" -> graft.queries.Relational.CmsSalt)
    val dupes = salts.groupBy(_._2).filter(_._2.size > 1)
    assert(dupes.isEmpty,
      s"salt collision — correlated sampling decisions: $dupes")
  }
}
