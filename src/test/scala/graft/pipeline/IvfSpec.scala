package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** IVF index semantics: full coverage of the corpus by lists, pruned
  * probes, and recall of the brute-force top-1 with enough probes. */
class IvfSpec extends SparkSpec {

  test("every vector lands in exactly one of nlist lists") {
    val (_, indexed) = Ivf.build(Tables.t(spark, sf, "embeddings"))
    assert(indexed.count() == 500)
    val lists = indexed.select("list_id").distinct().collect().map(_.getInt(0)).toSet
    assert(lists.size <= Ivf.DefaultNlist && lists.nonEmpty)
  }

  test("search result is deterministic across runs") {
    val a = Ivf.searchQuery(spark, sf).collect().toSeq
    val b = Ivf.searchQuery(spark, sf).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("x10b: pinned coarse lists cover the corpus; search is deterministic") {
    graft.functions.GraftFunctions.register(spark)
    // Coverage: re-derive the assignment exactly as the query does and
    // confirm every vector lands in exactly one of the nlist lists.
    val r = Ivf.searchPinnedIvfQuery(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 10)
    val lists = r.map(_.getLong(1)).toSet
    assert(lists.size <= 2, s"probe must read at most 2 lists: $lists")
    assert(lists.forall(l => l >= 0 && l < Ivf.DefaultNlist))
    val again = Ivf.searchPinnedIvfQuery(spark, sf).collect()
    assert(r.toSeq == again.toSeq, "pinned IVF must be run-to-run identical")
  }

  test("x10b: pinned-quantizer recall bounds the Lloyd-convergence trade") {
    // The quantile-pinned coarse quantizer trades Lloyd convergence for
    // cross-engine exactness (the x59 deviation, applied to the coarse
    // stage). The probe reads 2/8 lists; require majority recall@10 vs
    // brute force — the same gate class x59 carries — and exact cosines
    // for every surfaced hit (the search IS exact within probed lists).
    val exact = Similarity.cosineTopK(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pinned = Ivf.searchPinnedIvfQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val recall = pinned.count { case (id, _) => exact.contains(id) }
    assert(recall >= 5, s"recall@10 was $recall/10: ${pinned.toSeq} vs ${exact.keySet}")
    pinned.foreach { case (id, c) =>
      exact.get(id).foreach(e => assert(c == e, s"vec $id: $c vs $e")) }
  }

  test("x94: D4 prune — alive restriction, exact per-cluster floor drop, prototypical-first") {
    val rows = Ivf.d4Prune(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    // Operates on EXACTLY x33's alive set (the SemDeDup survivors).
    val alive = Similarity.semanticAliveIds(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == alive, "x94 must rank exactly the semantic-dedup survivors")
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val n = members.length.toLong
      val dropK = n * Ivf.D4DropBp / 10000L
      // Drop count is the exact floor; dropped = the smallest-rank rows.
      assert(members.count(!_._5) == dropK, s"cluster $cid: drop count must be floor(n*bp/1e4)")
      members.foreach { case (_, _, _, r, kept) =>
        assert(kept == (r > dropK), s"cluster $cid rank $r: kept must be r > $dropK") }
      // Rank follows (d2, vec_id): prototypical (small d2) members drop first.
      val byRank = members.sortBy(_._4)
      assert(byRank.map(m => (m._3, m._1)).toSeq ==
        members.sortBy(m => (m._3, m._1)).map(m => (m._3, m._1)).toSeq,
        s"cluster $cid: rank must be the (d2, vec_id) total order")
    }
  }

  test("x94: D4 prune is run-to-run deterministic") {
    val a = Ivf.d4Prune(spark, sf).collect().toSeq
    assert(a == Ivf.d4Prune(spark, sf).collect().toSeq)
    assert(a.nonEmpty)
  }

  test("x52: int8 quantized top-10 recalls the exact top-10 within tolerance") {
    val exact = Similarity.cosineTopK(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sq8 = Similarity.annSq8TopK(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(sq8.length == 10)
    // Recall@10: int8 at 64 dims loses ~1e-3 of cosine — the exact and
    // quantized top-10 SETS must agree on this corpus (rank swaps between
    // near-tied neighbors are the expected, acceptable degradation).
    val hits = sq8.count { case (id, _) => exact.contains(id) }
    assert(hits == 10, s"recall@10 was $hits/10: ${sq8.toSeq} vs $exact")
    // Quantization error bound: |cos8 - cos| small for every shared id.
    sq8.filter { case (id, _) => exact.contains(id) }.foreach { case (id, c8) =>
      assert(math.abs(c8 - exact(id)) <= 0.005, s"vec $id: $c8 vs ${exact(id)}")
    }
  }

  test("x101: matryoshka funnel — full-dim re-rank is exact on its shortlist") {
    val exact = Similarity.cosineTopK(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mat = Similarity.annMatryoshkaTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(mat.length == 10)
    // Funnel recall vs exact b29: these embeddings are NOT MRL-trained
    // (the prefix is an untrained truncation), so demand a majority,
    // not the paper's near-1.0.
    val hits = mat.count { case (id, _, _) => exact.contains(id) }
    assert(hits >= 5, s"recall@10 was $hits/10: ${mat.toSeq} vs ${exact.keySet}")
    // On every recalled id the re-rank cosine IS the exact cosine —
    // stage 2 uses full dims, so no approximation survives the funnel.
    mat.foreach { case (id, _, cos) =>
      exact.get(id).foreach(e => assert(cos == e, s"vec $id: $cos vs $e"))
    }
    // The output ranks by the FULL cosine (prefix decides membership,
    // never the final order).
    assert(mat.map(_._3).toSeq == mat.map(_._3).sortBy(-_).toSeq)
  }

  test("x111: JL distortion sits inside the 1/sqrt(d') band; audit is exact") {
    val rows = Similarity.jlDistortion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // Pair law: consecutive slice members only.
    rows.foreach { case (va, vb, cf, cj, err) =>
      assert(va % 17 == 0 && vb == va + 17, s"pair law: $va/$vb")
      assert(cf >= -1.0001 && cf <= 1.0001 && cj >= -1.0001 && cj <= 1.0001)
      assert(math.abs(err - math.abs(cf - cj)) < 1.5e-4, s"err column law at $va")
    }
    // The JL promise at d' = 16: typical cosine error ~ 1/sqrt(16) =
    // 0.25. Gate the MEAN well inside it and allow tail outliers.
    val errs = rows.map(_._5)
    val mean = errs.sum / errs.length
    assert(mean < 0.25, f"mean |cos error| $mean%.3f must sit inside the JL band")
    assert(errs.count(_ > 0.6) <= errs.length / 10,
      "large distortions must be rare")
  }

  test("x52b: IVF+SQ8 composed top-5 matches the exact-in-list top-5") {
    val exact = Similarity.annIvfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val sq8 = Similarity.annIvfSq8TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(sq8.length == 5)
    // Same list restriction, so quantization is the ONLY difference:
    // the id sets must agree and cosines within the int8 error band.
    assert(sq8.map(_._1).toSet == exact.keySet,
      s"${sq8.toSeq} vs $exact")
    sq8.foreach { case (id, c8) =>
      assert(math.abs(c8 - exact(id)) <= 0.005, s"vec $id: $c8 vs ${exact(id)}")
    }
  }

  test("x59: PQ-ADC candidates recall the exact top-10 and the re-rank is exact") {
    val exact = Similarity.cosineTopK(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pq = Ivf.searchPqQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(pq.length == 10)
    // Candidate recall: 16-centroid-per-subspace codes on re-rolled
    // synthetic data — require a majority, not identity (measured 7-9/10
    // across scales; the norm-corrected ADC ranking is what buys this,
    // raw-dot ranking measured 4/10).
    val recall = pq.count { case (id, _) => exact.contains(id) }
    assert(recall >= 5, s"recall@10 was $recall/10: ${pq.toSeq} vs ${exact.keySet}")
    // Every surfaced hit's cosine is EXACT (the re-rank recomputes it
    // from the raw vectors), so ranks among surfaced ids are true ranks.
    pq.foreach { case (id, c) =>
      exact.get(id).foreach(e => assert(c == e, s"vec $id: $c vs $e")) }
    assert(pq.map(-_._2).toSeq == pq.map(-_._2).toSeq.sorted, s"descending: ${pq.toSeq}")
  }

  test("x59b: IVFADC top-5 equals the exact-in-list top-5 (quantization fully recovered)") {
    // Coarse lists are the label partitions (integer-floor mean
    // centroids). Recompute the probe set independently and the exact
    // cosine top-5 restricted to those lists — the ADC candidate stage
    // is then the only difference, so re-rank must recover the exact
    // in-list answer end-to-end.
    val emb = Tables.t(spark, sf, "embeddings")
    val dim = Ivf.PqM * Ivf.PqSubDim
    val base = emb.select(col("vec_id"), col("label"),
      Ivf.intMillionths(col("embedding")).as("xi"))
    val cen = base.groupBy("label").agg(
      array((0 until dim).map(d =>
        floor(sum(element_at(col("xi"), d + 1)).cast("double") / count(lit(1)))
          .cast("long")): _*).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray)
    val qv = base.filter(col("vec_id") === 0).select("xi").head().getSeq[Long](0).toArray
    val probes = cen.map { case (l, c) =>
      var d2 = 0L; var j = 0
      while (j < dim) { val t = qv(j) - c(j); d2 += t * t; j += 1 }
      (d2, l)
    }.sorted.take(2).map(_._2).toSeq
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val inList = emb.filter(col("vec_id") =!= 0 && col("label").isin(probes: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(Similarity.cosine(col("embedding"), col("q_emb")), 4).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    val ivfadc = Ivf.searchIvfPqQuery(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(ivfadc == inList, s"ivfadc=$ivfadc exact-in-list=$inList")
  }

  test("x59: PQ codes are in range and deterministic across runs") {
    val (cb, enc) = Ivf.buildPq(Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), Ivf.intMillionths(col("embedding")).as("xi")))
    assert(cb.length == Ivf.PqM && cb.forall(_.length == Ivf.PqK) &&
      cb.forall(_.forall(_.length == Ivf.PqSubDim)))
    val bounds = enc.select(
      (0 until Ivf.PqM).map(m => max(col(s"code_$m")).as(s"mx$m")) ++
        (0 until Ivf.PqM).map(m => min(col(s"code_$m")).as(s"mn$m")): _*).head()
    (0 until Ivf.PqM).foreach { m =>
      assert(bounds.getAs[Int](s"mx$m") < Ivf.PqK && bounds.getAs[Int](s"mn$m") >= 0) }
    val a = Ivf.searchPqQuery(spark, sf).collect().toSeq
    val b = Ivf.searchPqQuery(spark, sf).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("native pq_encode/adc_score match the composed reference expressions") {
    // The production path assigns all M codes in one native PqEncode
    // pass; codeExpr is the composed argmin column tree it replaced.
    // Equality on the real corpus (every row, every subspace) proves the
    // rewrite is a pure performance change, not a semantic one.
    val base = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), Ivf.intMillionths(col("embedding")).as("xi"))
    val (cb, enc) = Ivf.buildPq(base)
    val reference = (0 until Ivf.PqM).foldLeft(base) { (df, ms) =>
      df.withColumn(s"ref_$ms",
        Ivf.codeExpr(cb(ms), slice(col("xi"), ms * Ivf.PqSubDim + 1, Ivf.PqSubDim)))
    }
    val joined = enc.join(reference.drop("xi"), "vec_id")
    val mismatches = joined.filter(
      (0 until Ivf.PqM).map(ms => col(s"code_$ms") =!= col(s"ref_$ms"))
        .reduce(_ || _)).count()
    assert(mismatches == 0)
    // adc_score ≡ the element_at lookup chain over the same table.
    val flat = cb.flatten.flatten
    val qv = base.filter(col("vec_id") === 0).select("xi").head().getSeq[Long](0).toArray
    val table = (0 until Ivf.PqM * Ivf.PqK).map { i =>
      val ms = i / Ivf.PqK
      val cen = cb(ms)(i % Ivf.PqK)
      cen.indices.map(j => cen(j) * qv(ms * Ivf.PqSubDim + j)).sum
    }.toArray
    graft.functions.GraftFunctions.register(spark)
    val adcCmp = enc.select(
      call_function("adc_score", col("codes"), typedLit(table.toSeq)).as("nat"),
      (0 until Ivf.PqM).map(ms =>
        element_at(typedLit(table.toSeq), lit(ms * Ivf.PqK + 1) + col(s"code_$ms")))
        .reduce(_ + _).as("ref"))
    assert(adcCmp.filter(col("nat") =!= col("ref")).count() == 0)
    assert(flat.length == Ivf.PqM * Ivf.PqK * Ivf.PqSubDim)
  }

  test("x68: each batched query's top-k equals its single-query brute force") {
    val emb = Tables.t(spark, sf, "embeddings")
    val batch = Similarity.annBatchTopK(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(1)).map(r =>
        (r.getLong(2), r.getDouble(3))).toSeq }
    assert(batch.keySet == (0L until Similarity.AnnBatchQueries.toLong).toSet)
    // independent single-query reference for two of the eight queries
    Seq(0L, 3L).foreach { qid =>
      val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("q_emb"))
      val single = emb.filter(col("vec_id") >= Similarity.AnnBatchQueries)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(Similarity.cosine(col("embedding"), col("q_emb")), 4).as("c"))
        .orderBy(col("c").desc, col("vec_id")).limit(Similarity.AnnBatchK)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) == single, s"q$qid: ${batch(qid)} vs $single")
    }
  }

  test("x80: topic mixture is a complete, consistent partition of embedded docs") {
    val emb = Tables.t(spark, sf, "embeddings")
    val docsDf = Tables.t(spark, sf, "documents")
    val rows = Ivf.topicMix(spark, sf).collect()
    // Every embedded doc lands in exactly one cluster row.
    val nEmbDocs = emb.select(col("vec_id"))
      .join(docsDf.select(col("doc_id")), col("vec_id") === col("doc_id")).count()
    assert(rows.map(_.getLong(1)).sum == nEmbDocs,
      "cluster doc counts must partition the embedded docs")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "one row per cluster")
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < Ivf.DefaultNlist))
    // The id checksum partitions the doc_id mass (membership pin).
    val idSum = emb.select(col("vec_id"))
      .join(docsDf.select(col("doc_id")), col("vec_id") === col("doc_id"))
      .agg(sum("doc_id")).collect().head.getLong(0)
    assert(rows.map(_.getLong(7)).sum == idSum, "id checksums must partition Σ doc_id")
    rows.foreach { r =>
      assert(r.getLong(5) <= r.getLong(4) && r.getLong(4) <= r.getLong(6),
        s"cluster ${r.getLong(0)}: avg quality must sit inside [min, max]")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000,
        s"cluster ${r.getLong(0)}: share_bp out of range")
    }
    // Share is of the WHOLE corpus token mass: sums to ≤ 10⁴ and is
    // close when embeddings cover the corpus.
    assert(rows.map(_.getLong(3)).sum <= 10000L)
    // Cluster ids agree with the registered x10b assignment discipline:
    // same memoized quantizer tag, so a second call is byte-stable.
    val again = Ivf.topicMix(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "report must be run-deterministic")
  }

  test("x84: topic drift agrees with the per-doc snapshot diff it summarizes") {
    val d = Tables.t(spark, sf, "documents")
    val emb = Tables.t(spark, sf, "embeddings").select(col("vec_id"))
    val rows = Ivf.topicDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (old, nw, add, rem, net) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(add <= nw && rem <= old && net == nw - old,
        s"cluster ${r.getLong(0)} drift arithmetic inconsistent: $r")
    }
    // Cluster sums must equal the embedded slices of the snapshot sets.
    def embedded(ids: org.apache.spark.sql.DataFrame): Long =
      ids.join(emb, ids("doc_id") === emb("vec_id")).count()
    val curN = embedded(d.filter(col("doc_id") % 31 =!= 11).select("doc_id"))
    val prevN = embedded(d.filter(col("doc_id") % 31 =!= 3).select("doc_id"))
    assert(rows.map(_.getLong(2)).sum == curN, "Σ n_new must cover the embedded cur set")
    assert(rows.map(_.getLong(1)).sum == prevN, "Σ n_old must cover the embedded prev set")
    // The derived convention populates both directions of drift.
    assert(rows.map(_.getLong(3)).sum > 0 && rows.map(_.getLong(4)).sum > 0,
      "added and removed docs must both appear at every SF")
  }

  test("with nprobe = nlist the IVF top-1 equals brute-force top-1") {
    val emb = Tables.t(spark, sf, "embeddings")
    val (model, indexed) = Ivf.build(emb)
    val brute = Similarity.cosineTopK(spark, sf).collect().head.getLong(0)
    // probe everything: candidate set == full corpus, so exact recall
    val all = (0 until Ivf.DefaultNlist)
    val q = indexed.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val ivfTop = indexed.filter(col("vec_id") =!= 0 && col("list_id").isin(all: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(Similarity.cosine(col("embedding"), col("q_emb")), 4).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(1)
      .collect().head.getLong(0)
    assert(ivfTop == brute)
  }

  test("x137: nprobe recall curve is monotone, bounded, and agrees with the x10b search") {
    val rows = Ivf.nprobeRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1L to Ivf.MaxNprobe).toSeq, "one row per nprobe")
    rows.foreach { case (np, hits, bp) =>
      assert(hits >= 0 && hits <= 10, s"nprobe $np: hits $hits out of [0, 10]")
      assert(bp == hits * 1000, s"nprobe $np: recall_bp must be hits * 1000")
    }
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 <= hi._2, s"widening the probe can only add hits: $lo vs $hi")
    }
    // Cross-query law: the curve's nprobe=2 cell IS the overlap between
    // the brute-force top-10 (b29) and the registered 2-list pinned
    // search (x10b) — any ground-truth vector inside the probed lists
    // outranks every other in-list candidate, so x10b must surface it.
    val gt = Similarity.cosineTopK(spark, sf).collect().map(_.getLong(0)).toSet
    val x10b = Ivf.searchPinnedIvfQuery(spark, sf).collect().map(_.getLong(0)).toSet
    val hits2 = rows.find(_._1 == 2L).get._2
    assert(hits2 == (gt & x10b).size.toLong,
      s"x137 hits@2 ($hits2) != |b29 top10 ∩ x10b top10| (${(gt & x10b).size})")
    // Determinism: the pinned quantizer + integer ranking re-derive
    // identically run to run.
    assert(Ivf.nprobeRecall(spark, sf).collect().toSeq ==
      Ivf.nprobeRecall(spark, sf).collect().toSeq)
  }

  test("x138: partition-pruned IVF search equals x10b bit for bit") {
    val part = Ivf.searchPartitionedIvfQuery(spark, sf).collect().toSeq
    val pinned = Ivf.searchPinnedIvfQuery(spark, sf).collect().toSeq
    assert(part.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) ==
      pinned.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))),
      "the at-rest partitioned path must reproduce the in-memory search exactly")
    // The at-rest index covers the corpus: one directory per coarse list,
    // and the union of partitions holds every vector exactly once.
    val path = Ivf.partitionedIndexPath(spark, sf)
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("list_id="))
    assert(dirs.length == Ivf.DefaultNlist,
      s"expected ${Ivf.DefaultNlist} list partitions, got ${dirs.map(_.getName).toSeq}")
    val total = spark.read.parquet(path).count()
    assert(total == Tables.t(spark, sf, "embeddings").count(), "index must cover the corpus")
  }

  test("x125: prototypicality ranks cluster cores first, the planted outlier last") {
    import spark.implicits._
    // Two tight 8-dim clusters around distinct centers plus one far
    // outlier. The outlier must carry the largest residual and the worst
    // (largest) prototypicality rank; ranks must recompute from the
    // residuals by the competition law.
    val dim = 64
    def vec(center: Float, jitterId: Int): Seq[Float] =
      Array.tabulate(dim)(j => center + (if (j == jitterId % dim) 0.001f else 0f)).toSeq
    val a = (1 to 20).map(i => (i.toLong, vec(0.2f, i)))
    val b = (21 to 40).map(i => (i.toLong, vec(-0.3f, i)))
    val outlier = Seq((99L, Array.tabulate(dim)(j => if (j % 2 == 0) 5.0f else -5.0f).toSeq))
    val dir = java.nio.file.Files.createTempDirectory("proto")
    try {
      (a ++ b ++ outlier).toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      graft.pipeline.Ivf.clearModelCache()
      val rows = Ivf.prototypicality(spark, dir.toString).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.length == 41)
      val byId = rows.map(r => r._1 -> r).toMap
      val maxRes = rows.map(_._3).max
      assert(byId(99L)._3 == maxRes, s"outlier must carry the max residual: ${byId(99L)}")
      assert(byId(99L)._4 == rows.map(_._4).max, "outlier ranks least prototypical")
      // Competition-rank law, recomputed brute force (ascending residual).
      rows.foreach { case (id, _, res, rk) =>
        assert(rk == 1L + rows.count(_._3 < res), s"vec $id rank law")
      }
      assert(rows.forall(r => r._2 >= 0 && r._2 < Ivf.DefaultNlist.toLong),
        "assignments stay inside the list range")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
