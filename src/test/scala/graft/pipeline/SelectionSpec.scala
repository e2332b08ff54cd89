package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Invariants of the targeted-selection family (x49–x51) beyond the
  * oracle hash compare: a hand-computed BM25 fixture, DSIR sign/shape
  * properties, and planted documents proving the corpus-vacuous Gopher
  * rules actually fire. */
class SelectionSpec extends SparkSpec {

  // --------------------------------------------------------------- x104
  test("x104: retro neighbors exclude same-doc, flag continuations, exact jaccard") {
    import spark.implicits._
    def u(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    // Chunk length 20. doc1 = 2 chunks; its two chunks share the token
    // "selfy" (same-doc exclusion bait). doc1c0 shares sh1..sh5 with
    // doc2c0. doc2 = 3 chunks; doc2c2 shares q1..q4 with doc3's single
    // chunk, so both sides of that pair have NO continuation.
    val d1 = (u("a", 9) ++ Seq("selfy") ++ u("sh", 5) ++ u("f", 5) ++
      u("g", 19) ++ Seq("selfy")).mkString(" ")
    val d2 = (u("sh", 5) ++ u("h", 15) ++ u("i", 20) ++ u("q", 4) ++
      u("j", 16)).mkString(" ")
    val d3 = (u("q", 4) ++ u("k", 16)).mkString(" ")
    val corpus = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("retro")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = Selection.retroNeighbors(spark, dir.toString).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6), r.getBoolean(7)))
      // The paper's rule: no neighbor from the query's own document,
      // even though doc1's chunks share a sub-cap token.
      assert(rows.forall { case (d, _, _, nd, _, _, _, _) => d != nd },
        s"same-doc neighbors must be excluded: ${rows.toSeq}")
      val byChunk = rows.groupBy(r => (r._1, r._2))
      // doc1 chunk0 -> doc2 chunk0 only: 20 distinct tokens each side,
      // 5 shared -> jac 5/35 = 0.1429; doc2 continues -> has_cont.
      assert(byChunk((1L, 0L)).toSeq ==
        Seq((1L, 0L, 1L, 2L, 0L, 5L, 0.1429, true)), s"${byChunk((1L, 0L))}")
      // doc3's chunk -> doc2 chunk2 (last of 3): no continuation;
      // jac 4/36 = 0.1111.
      assert(byChunk((3L, 0L)).toSeq ==
        Seq((3L, 0L, 1L, 2L, 2L, 4L, 0.1111, false)), s"${byChunk((3L, 0L))}")
      // ...and the reverse direction sees doc3's single chunk: no cont.
      assert(byChunk((2L, 2L)).toSeq ==
        Seq((2L, 2L, 1L, 3L, 0L, 4L, 0.1111, false)), s"${byChunk((2L, 2L))}")
      // doc1 chunk1 shares nothing cross-doc: absent.
      assert(!byChunk.contains((1L, 1L)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  // ---------------------------------------------------------------- x49
  test("x139: merged stats equal a full recount; x49 scored from the table is bit-identical") {
    import spark.implicits._
    // Planted two-snapshot corpus: term overlap across snapshots (the
    // df-addition law needs disjoint DOC sets, not disjoint vocab),
    // repeated terms within one doc (df counts docs, not occurrences).
    val old_ = Seq((0L, "spark join join fast"), (2L, "dup spark scan")).toDF("doc_id", "text")
    val batch = Seq((1L, "join dup dup"), (3L, "window spark")).toDF("doc_id", "text")
    val oldDf = old_.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .distinct().groupBy("tok").agg(count(lit(1)).as("df"))
    val oldScal = old_.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("sumdl"))
    val merged = Selection.incrementalBm25Stats(batch, oldDf, oldScal)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // Full recount of the union, derived independently in Scala.
    val all = Seq("spark join join fast", "dup spark scan", "join dup dup", "window spark")
    val dfExp = all.map(_.split(" ").toSet).flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sumdl = all.map(_.split(" ").length.toLong).sum
    assert(merged.map(_._1) == merged.map(_._1).sorted, "ordered by term")
    merged.foreach { case (tok, df, n, s) =>
      assert(df == dfExp(tok), s"df($tok)")
      assert(n == 4L && s == sumdl, s"scalars on $tok")
    }
    assert(merged.map(_._1).toSet == dfExp.keySet, "full vocabulary covered")
    // Production read path: x49 scored FROM the registered standing
    // table reproduces the live-statistics x49 output bit for bit
    // (exact-integer artifact, avgdl derived in double on both paths).
    val stats = graft.SparkEntry.queries("x139_incremental_bm25_stats")(spark, sf)
    val fromStats = Selection.bm25FromStats(
      Tables.t(spark, sf, "documents"), stats, Selection.Bm25Query, Selection.Bm25TopK)
      .collect().toSeq
    val live = Selection.bm25TopK(spark, sf).collect().toSeq
    assert(fromStats == live,
      s"table-scored BM25 must equal live-scored: ${fromStats.take(3)} vs ${live.take(3)}")
  }

  test("x49: hand-computed BM25 on a planted corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark join spark"),
      (2L, "join fast"),
      (3L, "other words here four")).toDF("doc_id", "text")
    // N=3, dl=(3,2,4), avgdl=3; df(spark)=1, df(join)=2;
    // idf_spark=ln(1+2.5/1.5), idf_join=ln(1.6); k1=1.2, b=0.75.
    val rows = Selection.bm25Of(corpus, Seq("spark", "join"), 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, 2, 1.8186), (2L, 1, 0.5442)),
      s"got ${rows.toSeq}")
  }

  test("x49: top-k is rank-consistent on the real corpus") {
    val rows = Selection.bm25TopK(spark, sf).collect()
    assert(rows.length == Selection.Bm25TopK)
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must be non-increasing")
    assert(rows.map(_.getInt(1)).forall(n => n >= 1 && n <= Selection.Bm25Query.size))
  }

  // --------------------------------------------------------------- x49b
  test("x49b: each batch query's top-k equals the single-query form") {
    val batch = Selection.bm25Batch(spark, sf).collect()
      .groupBy(_.getInt(0))
    assert(batch.keySet == Set(1, 2, 3))
    Selection.Bm25Queries.groupBy(_._1).foreach { case (qid, pairs) =>
      val single = Selection.bm25Of(
        graft.Tables.t(spark, sf, "documents"), pairs.map(_._2), Selection.Bm25BatchK)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      val fromBatch = batch(qid).sortBy(_.getInt(4))
        .map(r => (r.getLong(1), r.getDouble(3))).toSeq
      assert(fromBatch == single, s"query $qid: $fromBatch vs $single")
    }
  }

  // ---------------------------------------------------------------- x50
  test("x50: planted target/non-target corpora separate by sign") {
    import spark.implicits._
    // Counts must dominate the add-one smoothing mass (B=256 pseudo-
    // counts on each side) for the density ratio to surface — 50 copies
    // per class does; a 5-doc corpus provably cannot (ln((2+1)/266) <
    // ln((3+1)/277) even for a feature twice as common in-target).
    val copies = 50
    val corpus = (
      (0 until 2 * copies).map(i => (i.toLong, "alpha beta gamma", true)) ++
        (0 until copies).map(i => (200L + i, "delta epsilon zeta", false)) ++
        (0 until copies).map(i => (300L + i, "alpha beta gamma", false)) :+
        ((400L, "solo", false))).toDF("doc_id", "text", "tgt")
    val w = Selection.dsirWeightsOf(corpus, col("tgt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // Doc 300 is token-identical to the target slice: more probable under
    // the target model than the raw average. Doc 200 shares nothing with
    // the target: its buckets exist only via smoothing.
    assert(w(300L)._2 > 0, s"target-like doc must weight positive: ${w(300L)}")
    assert(w(200L)._2 < 0, s"off-target doc must weight negative: ${w(200L)}")
    assert(w(300L)._2 > w(200L)._2)
    // Feature count: n unigrams + (n-1) bigrams; single-token doc has 1.
    assert(w(0L)._1 == 5, s"3 unigrams + 2 bigrams: ${w(0L)}")
    assert(w(400L)._1 == 1, s"single-token doc has one feature: ${w(400L)}")
  }

  test("x50: two-corpus form equals the sliced form on the same data universe") {
    val docs = Tables.t(spark, sf, "documents")
    val crawl = docs.filter(col("lang") =!= "en").select("doc_id", "text")
    val tgt = docs.filter(col("lang") === "en").select("doc_id", "text")
    // Weights depend only on the feature histograms, not on ids, and
    // crawl ∪ target here IS the whole corpus — so the separate-corpus
    // form must reproduce the sliced form's weights for every crawl doc.
    val against = Selection.dsirWeightsAgainst(crawl, tgt)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val sliced = Selection.dsirWeights(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val crawlIds = crawl.collect().map(_.getLong(0)).toSet
    assert(against.keySet == crawlIds, "only crawl docs may be returned")
    crawlIds.foreach { id =>
      assert(against(id) == sliced(id), s"doc $id: ${against(id)} vs ${sliced(id)}")
    }
  }

  test("x50: English documents weight above every other language") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "lang")
    val means = Selection.dsirWeights(spark, sf)
      .join(docs, "doc_id")
      .groupBy("lang").agg(avg("log_weight").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val en = means("en")
    means.filter(_._1 != "en").foreach { case (lang, m) =>
      assert(en > m, s"en mean $en must exceed $lang mean $m")
    }
  }

  // --------------------------------------------------------------- x50b
  test("x50b: Gumbel-top-k sample is weight-biased and reproducible") {
    val all = Selection.dsirWeights(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sel = Selection.dsirResample(spark, sf).collect()
    assert(sel.length == Selection.DsirSampleK)
    // E[log w | selected] > E[log w]: the Gumbel noise is independent of
    // the weight, so a weighted sample must skew toward heavy docs —
    // deterministic here (fixed hash), not a flaky statistical bound.
    val selMean = sel.map(r => all(r.getLong(0))).sum / sel.length
    val allMean = all.values.sum / all.size
    assert(selMean > allMean,
      s"selected mean log-weight $selMean must exceed corpus mean $allMean")
    // Byte-identical membership on re-run (the x21 reproducibility
    // contract carried into the resampling step).
    val again = Selection.dsirResample(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(again == sel.map(_.getLong(0)).toSeq)
  }

  // ---------------------------------------------------------------- x53
  test("x53: every selected doc passes the gate; gating reshapes the sample") {
    val passed = Selection.gopherRules(spark, sf)
      .filter(col("pass_all") === 1).collect().map(_.getLong(0)).toSet
    val sel = Selection.selectionPipeline(spark, sf).collect().map(_.getLong(0)).toSet
    assert(sel.size == Selection.DsirSampleK)
    assert(sel.subsetOf(passed), s"selected docs outside the gate: ${sel -- passed}")
    // The histograms are trained on the GATED corpus, so the weights —
    // and the sample — must genuinely differ from x50b's whole-corpus
    // run (same salt, same k: any difference is the composition acting).
    val whole = Selection.dsirResample(spark, sf).collect().map(_.getLong(0)).toSet
    assert(sel != whole, "gated-model sample must differ from the whole-corpus sample")
  }

  // ---------------------------------------------------------------- x51
  test("x51: planted documents fire each corpus-vacuous rule") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a # b # c # d"), // 3 '#' / 7 words = 0.43 sym; mwl 1.0
      (2L, "greatgrandiloquent perspicaciousness incomprehensibilities magnanimousnesses"),
      (3L, "1 2 3 4 5 word"), // 1 alpha word of 6
      (4L, "please wait... loading... done... now... ok... yes..."),
      (5L, Seq.fill(13)("the cat and dog").mkString(" "))) // 52 words, 2 stopwords
      .toDF("doc_id", "text")
    val r = Selection.gopherRulesOf(corpus)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Int]("pass_hash") == 0, "hash symbols must fail")
    assert(r(1L).getAs[Int]("pass_ellipsis") == 1, "no ellipses in the hash doc")
    assert(r(1L).getAs[Int]("pass_mwl") == 0, "mean word length 1.0 must fail")
    assert(r(2L).getAs[Int]("pass_mwl") == 0, "mean word length > 10 must fail")
    assert(r(3L).getAs[Int]("pass_alpha") == 0, "numeric tokens must fail")
    assert(r(4L).getAs[Int]("pass_ellipsis") == 0, "ellipses must fail")
    assert(r(4L).getAs[Int]("pass_hash") == 1, "no hash symbols in the ellipsis doc")
    assert(r(4L).getAs[Int]("pass_alpha") == 1, "word... still counts as alphabetic")
    assert(r(5L).getAs[Int]("pass_all") == 1, s"the passing doc must pass: ${r(5L)}")
  }

  test("x51: rule mix on the real corpus matches the measured regime") {
    val agg = Selection.gopherRules(spark, sf)
      .agg(sum("pass_len"), sum("pass_mwl"),
        sum("pass_hash") + sum("pass_ellipsis") - count(lit(1)),
        sum("pass_alpha"), sum("pass_stop"), sum("pass_all"), count(lit(1)))
      .collect()(0)
    val (len, mwl, sym, alpha, stop, all, n) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3),
        agg.getLong(4), agg.getLong(5), agg.getLong(6))
    // Live rules split the corpus; vacuous rules pass everything (the
    // scaladoc's disclosure, pinned so a data refresh that changes the
    // regime fails loudly here rather than silently devaluing the query).
    assert(len > 0 && len < n, s"length rule must split the corpus: $len/$n")
    assert(stop > 0 && stop < n, s"stopword rule must split the corpus: $stop/$n")
    assert(all > 0 && all < n, s"conjunction must be non-trivial: $all/$n")
    assert(mwl == n && sym == n && alpha == n,
      s"mwl/symbol/alpha are corpus-vacuous by construction: $mwl/$sym/$alpha vs $n")
  }

  // ---------------------------------------------------------------- x64
  test("x64: hand-computed hashed-linear classifier score on a planted corpus") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta"), (2L, "alpha alpha alpha alpha"))
      .toDF("doc_id", "text")
    def w(tok: String): Long =
      Selection.clfWeight(graft.functions.TokenHash.hash(tok) % Selection.ClfBuckets)
    val out = Selection.classifierQualityOf(corpus).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    val s1 = w("alpha") + w("beta")
    val s2 = 4 * w("alpha")
    // The query's integer half-away-from-zero rounding of sumw/(1000·n)
    // to 6 decimals, re-derived independently here.
    def logit(sumw: Long, n: Long): Double =
      math.signum(sumw) * ((math.abs(sumw) * 2000L + n) / (2L * n)) / 1000000.0
    assert(out(1L)._1 == 2 && out(2L)._1 == 4)
    assert(out(1L)._2 == logit(s1, 2))
    assert(out(2L)._2 == logit(s2, 4))
    assert(out(1L)._3 == (s1 > 2 * Selection.ClfThresholdMilli))
    // doc 2 repeats one token: its per-token logit is exactly w("alpha")/1000
    assert(out(2L)._3 == (w("alpha") > Selection.ClfThresholdMilli))
  }

  test("x64: the pinned classifier splits the real corpus non-trivially") {
    val agg = Selection.classifierQuality(spark, sf)
      .agg(sum(when(col("keep"), 1L).otherwise(0L)), count(lit(1))).collect()(0)
    val (kept, n) = (agg.getLong(0), agg.getLong(1))
    assert(kept > 0 && kept < n, s"classifier must split the corpus: $kept/$n")
  }

  // --------------------------------------------------------------- x64b
  test("x90: calibration table replicates exactly from x64b scores and x51 labels") {
    val logit = Selection.classifierFitQuality(spark, sf).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(2) * 1e6)).toMap
    val good = Selection.gopherRules(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Int]("pass_all") == 1)).toMap
    val expected = logit.toSeq.map { case (id, micro) =>
      (math.min((micro + 1000000L) / Selection.ClfCalBinMicro, 99L),
        if (good(id)) 1L else 0L)
    }.groupBy(_._1).map { case (b, xs) => b -> (xs.size.toLong, xs.map(_._2).sum) }
    val rows = Selection.classifierCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(rows.map(_._1).toSet == expected.keySet, "one row per non-empty bin")
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq, "bin-ordered")
    val totGood = expected.values.map(_._2).sum
    var cumD = 0L; var cumG = 0L
    rows.reverse.foreach { case (b, lo, nd, ng, rate, cd, cg, prec, rec) =>
      val (end, eng) = expected(b)
      cumD += end; cumG += eng
      assert(lo == b * Selection.ClfCalBinMicro - 1000000L, s"bin $b edge")
      assert((nd, ng) == (end, eng), s"bin $b counts")
      assert(rate == ng * 10000L / nd, s"bin $b rate")
      assert((cd, cg) == (cumD, cumG), s"bin $b cumulative")
      assert(prec == cumG * 10000L / cumD && rec == cumG * 10000L / totGood,
        s"bin $b operating point")
    }
    // The bottom row sweeps everything: recall must read 10000 there.
    assert(rows.head._9 == 10000L, "full-sweep recall")
    // Separation sanity: the top bin's good-rate beats the bottom bin's
    // (the x64b separation result restated on the report's own numbers).
    assert(rows.last._5 >= rows.head._5,
      s"calibration direction: top-bin rate ${rows.last._5} < bottom ${rows.head._5}")
  }

  test("x64b: fitted gate separates planted good/bad docs far better than chance") {
    import spark.implicits._
    // Clearly separable vocabularies: "good" docs are ≥50 common English
    // words with stopwords (they pass the Gopher battery — the fit
    // label), "bad" docs are symbol-spam that fails it. The closed-form
    // class-centroid fit must then score every good doc positive and
    // every bad doc negative ON ITS OWN TRAINING CORPUS — chance would
    // be ~50%.
    // mean word length must clear Gopher's 3.0 floor — short-word prose
    // ("the cat and the dog…", mwl 2.67) would label the good docs BAD
    // and invert the fit.
    val goodText =
      (("the quick brown foxes jumped over the fence and chased rabbits " +
        "through sunny meadows while farmers watched from wooden porches ") * 3).trim
    val badText = ("#### @@@@ !!!! %%%% ^^^^ &&&& " * 10).trim
    val corpus = ((1L to 6L).map(i => (i, goodText + s" extra$i")) ++
      (7L to 12L).map(i => (i, badText + s" @$i"))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("x64b").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Selection.classifierFitQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    (1L to 6L).foreach(i => assert(out(i)._1 > 0 && out(i)._2,
      s"good doc $i must score positive: ${out(i)}"))
    (7L to 12L).foreach(i => assert(out(i)._1 < 0 && !out(i)._2,
      s"bad doc $i must score negative: ${out(i)}"))
  }

  test("x64b: on the real corpus, mean fitted logit of Gopher-pass docs exceeds fails") {
    // The fit label is x51 pass_all; the fitted score must recover that
    // separation in aggregate (the per-doc label is not memorizable from
    // a 512-bucket linear model, so this is a real generalization check
    // across the two class centroids, not a tautology).
    val scored = Selection.classifierFitQuality(spark, sf)
    val labeled = Selection.gopherRules(spark, sf).select(col("doc_id"),
      (col("pass_all") === 1).as("good"))
    val m = scored.join(labeled, "doc_id")
      .groupBy("good").agg(avg("logit").as("ml"), count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(m.contains(true) && m.contains(false),
      s"corpus must contain both classes: $m")
    assert(m(true)._1 > m(false)._1,
      s"mean logit good ${m(true)} must exceed bad ${m(false)}")
    // And the keep decision must track the label better than chance:
    // P(keep | good) > P(keep | bad).
    val k = scored.join(labeled, "doc_id").groupBy("good")
      .agg(avg(when(col("keep"), 1.0).otherwise(0.0)).as("kr"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(k(true) > k(false), s"keep rate by class: $k")
  }

  test("x124: fused ranks equal hand-computed competition ranks of the three signals") {
    import graft.SparkEntry
    def sig(rows: Array[org.apache.spark.sql.Row], idx: Int): Map[Long, Option[Double]] =
      rows.map(r => r.getLong(0) ->
        (if (r.isNullAt(idx)) None else Some(r.getDouble(idx)))).toMap
    val q = sig(SparkEntry.queries("x01_quality_score")(spark, sf).collect(), 5)
    val c = sig(SparkEntry.queries("x64b_classifier_fitted")(spark, sf).collect(), 2)
    val g = sig(SparkEntry.queries("x119_context_gain")(spark, sf).collect(), 5)
    def ranks(m: Map[Long, Option[Double]]): Map[Long, Long] = {
      val nn = m.values.flatten.toSeq
      m.map { case (id, v) =>
        id -> (v match {
          case Some(x) => 1L + nn.count(_ > x)
          case None => nn.size + 1L
        })
      }
    }
    val (rq, rc, rg) = (ranks(q), ranks(c), ranks(g))
    val out = Selection.rankFusion(spark, sf).collect()
    assert(out.length == q.size, "every doc is ranked")
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == rq(id), s"doc $id quality rank")
      assert(r.getLong(2) == rc(id), s"doc $id classifier rank")
      assert(r.getLong(3) == rg(id), s"doc $id gain rank")
      assert(r.getLong(4) == rq(id) + rc(id) + rg(id), s"doc $id fused sum")
    }
    // Ties must share a rank somewhere in a 4dp-rounded signal, proving
    // the competition (not row_number) semantics is really exercised.
    assert(rq.values.toSeq.distinct.size < rq.size,
      "the corpus must contain tied quality scores")
  }

  test("x117: contingency cells partition the corpus; kappa recomputes from the cells") {
    val rows = Selection.gateAgreement(spark, sf).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), if (r.isNullAt(7)) None else Some(r.getLong(7)))
    }
    assert(rows.map(_._1).toSeq ==
      Seq(("clean", "classifier"), ("clean", "gopher"), ("gopher", "classifier")),
      "exactly the three gate pairs, totally ordered")
    val nDocs = graft.Tables.t(spark, sf, "documents").count()
    val m = rows.toMap
    rows.foreach { case (pair, (n11, n10, n01, n00, agree, kappa)) =>
      assert(n11 + n10 + n01 + n00 == nDocs, s"$pair cells must partition the corpus")
      assert(Seq(n11, n10, n01, n00).forall(_ >= 0), s"$pair cells non-negative")
      // agree/kappa re-derived from the row's own cells with BigInt
      // floor division — the exact published formulas.
      val n = BigInt(nDocs)
      assert(BigInt(agree) == (BigInt(1000000) * (n11 + n00)) / n, s"$pair agreement law")
      val peNum = (BigInt(n11) + n10) * (BigInt(n11) + n01) +
        (BigInt(n01) + n00) * (BigInt(n10) + n00)
      val den = n * n - peNum
      if (den == 0) assert(kappa.isEmpty, s"$pair kappa undefined for a constant gate")
      else {
        val num = BigInt(1000000) * (n * (BigInt(n11) + n00) - peNum)
        // BigInt / truncates; emulate floor for the possibly-negative numerator.
        val fl = if (num.sign >= 0 || num % den == 0) num / den else num / den - 1
        assert(kappa.contains(fl.toLong), s"$pair kappa law: got $kappa want $fl")
        assert(fl <= 1000000L && fl >= -1000000L, s"$pair kappa must sit in [-1, 1]")
      }
    }
    // Marginals must be consistent ACROSS rows: each gate's positive
    // count is pair-independent (clean appears in two rows, etc.).
    val cleanPos1 = m(("clean", "gopher"))._1 + m(("clean", "gopher"))._2
    val cleanPos2 = m(("clean", "classifier"))._1 + m(("clean", "classifier"))._2
    assert(cleanPos1 == cleanPos2, "clean-gate marginal must agree across pairs")
    val gopherPos1 = m(("clean", "gopher"))._1 + m(("clean", "gopher"))._3
    val gopherPos2 = m(("gopher", "classifier"))._1 + m(("gopher", "classifier"))._2
    assert(gopherPos1 == gopherPos2, "gopher marginal must agree across pairs")
    val clfPos1 = m(("clean", "classifier"))._1 + m(("clean", "classifier"))._3
    val clfPos2 = m(("gopher", "classifier"))._1 + m(("gopher", "classifier"))._3
    assert(clfPos1 == clfPos2, "classifier marginal must agree across pairs")
    // Run-deterministic.
    assert(Selection.gateAgreement(spark, sf).collect().toSeq ==
      Selection.gateAgreement(spark, sf).collect().toSeq)
  }
}
