package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Property-style invariants (SURVEY.md §5.2.3) over seeded generated
  * inputs: JSONL round-trips, dedup idempotence, sanitizer output charset.
  */
class PropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  test("JSONL round-trip: write → read preserves rows including nulls") {
    import spark.implicits._
    val rows = (1 to 200).map { i =>
      (i.toLong,
        if (i % 7 == 0) null else s"val_$i",
        if (i % 11 == 0) null else s"x ${rnd.nextInt(1000)}")
    }
    val df = rows.toDF("id", "a", "b")
    val dir = Files.createTempDirectory("rt").resolve("out").toString
    sinks.Sinks.writeJsonl(df.orderBy("id"), dir, ordered = true)
    val back = spark.read.json(dir).select("id", "a", "b").orderBy("id")
    assert(back.collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("exact dedup is idempotent: dedup(dedup(X)) == dedup(X)") {
    import spark.implicits._
    val docs = (1 to 300).map(i => (i.toLong, s"text ${i % 100}")).toDF("doc_id", "text")
    val once = docs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("keep_id"))
    val keptDocs = docs.join(once, sha2(col("text"), 256) === col("h"))
      .filter(col("doc_id") === col("keep_id"))
      .select("doc_id", "text")
    val twice = keptDocs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("keep_id"))
    assert(once.orderBy("h").collect().toSeq == twice.orderBy("h").collect().toSeq)
    assert(keptDocs.count() == 100)
  }

  test("sanitizer output always matches ^[^0-9\\W]\\w*$ semantics (or empty)") {
    val alphabet = "aZ 0.9-_'é漢\n\t,;!"
    (1 to 1000).foreach { _ =>
      val s = (0 to rnd.nextInt(15)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val out = etl.Sanitize.sanitize(s)
      assert(!out.exists(c => c.isWhitespace || c.isUpper), s"'$s' -> '$out'")
      assert(out.isEmpty || !out.head.isDigit, s"'$s' -> '$out'")
      // only word characters survive
      assert("(?U)^\\w*$".r.matches(out), s"'$s' -> '$out'")
    }
  }

  test("df-capped jaccard pairs are a value-exact subset of uncapped pairs (random corpora)") {
    import spark.implicits._
    // Random corpora over a small vocabulary PLUS a planted corpus-wide
    // hot token: the cap may only REMOVE pairs (candidate recall), never
    // change a surviving pair's Jaccard value and never invent a pair —
    // and the hot token must actually trigger the cap (df = n ≫ 8√n), so
    // the subset relation is tested non-vacuously: "hot uniqX" docs pair
    // uncapped (j = 1/3 via the hot token) but lose their only surviving
    // candidate key when capped.
    val docs = ((1 to 80).map { i =>
      (i.toLong, "hot " + (1 to (3 + rnd.nextInt(10))).map(_ => s"w${rnd.nextInt(25)}").mkString(" "))
    } ++ (81 to 90).map(i => (i.toLong, s"hot uniq$i"))).toDF("doc_id", "text")
    val capped = Dedup.jaccardPairsOn(docs, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val uncapped = Dedup.jaccardPairsOn(docs, threshold = 0.3, dfCapC = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(uncapped.nonEmpty, "vocabulary is small enough that some pairs must match")
    capped.foreach { case (pair, j) =>
      assert(uncapped.get(pair).contains(j),
        s"capped pair $pair=$j must exist with the identical value uncapped")
    }
    val hotOnly = (81 to 90).flatMap(a => (a + 1 to 90).map(b => (a.toLong, b.toLong)))
    assert(hotOnly.forall(uncapped.contains),
      "uncapped must pair the hot-token-only docs (j = 1/3 >= 0.3)")
    assert(hotOnly.forall(p => !capped.contains(p)),
      "the cap must drop pairs whose only shared key is the hot token")
  }

  test("line dedup with an unreachable threshold reassembles every doc byte-identically") {
    import spark.implicits._
    // Identity property: when no line can exceed maxDf, the posexplode →
    // anti-join → sort → array_join chain must reproduce the ORIGINAL
    // text exactly for every doc — any reassembly-order or
    // boundary-handling bug shows up as a byte diff. Random multi-line
    // docs (varying line counts, duplicate lines within and across docs,
    // empty lines).
    val docs = (1 to 150).map { i =>
      val nLines = 1 + rnd.nextInt(6)
      val text = (1 to nLines).map { _ =>
        rnd.nextInt(4) match {
          case 0 => ""                                      // empty line
          case 1 => "shared boilerplate line"               // cross-doc dup
          case _ => (1 to 1 + rnd.nextInt(5)).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")
        }
      }.mkString("\n")
      (i.toLong, text)
    }
    val df = docs.toDF("doc_id", "text")
    val out = pipeline.Curation
      .lineDedupOn(df, split(col("text"), "\n"), maxDf = Int.MaxValue, sep = "\n")
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
    docs.foreach { case (id, text) =>
      val (nRemoved, clean) = out(id)
      assert(nRemoved == 0L, s"doc $id: nothing may be removed at maxDf=MaxValue")
      assert(clean == text, s"doc $id reassembly diff:\norig =$text\nclean=$clean")
    }
  }

  test("intra-doc line strip is idempotent on random line corpora") {
    import spark.implicits._
    // Random docs assembled from a small line vocabulary (so repeats are
    // common); stripping first-occurrences twice must equal once — the
    // second pass finds nothing left to remove.
    val vocab = Vector("alpha one", "beta two", "gamma three", "delta four", "eps five")
    val docs = (1L to 60L).map { i =>
      val n = 2 + rnd.nextInt(8)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString("\n"))
    }.toDF("doc_id", "text")
    val once = pipeline.Curation.intraDocDedupOn(docs, split(col("text"), "\n"), "\n")
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = pipeline.Curation.intraDocDedupOn(once, split(col("text"), "\n"), "\n")
    val changed = twice.filter(col("n_removed") =!= 0).count()
    assert(changed == 0, s"$changed docs changed on the second pass")
    val onceOut = once.orderBy("doc_id").collect().map(_.getString(1)).toSeq
    val twiceOut = twice.orderBy("doc_id").collect().map(_.getString(4)).toSeq
    assert(onceOut == twiceOut, "clean_text must be a fixpoint")
  }

  test("content chunking is lossless: chunks concatenate back to every doc byte-identically") {
    // Chunking must PARTITION each document — no token lost, duplicated,
    // or reordered — for any content whatsoever, here the whole real
    // sf corpus. Concatenating chunk_text in chunk order must reproduce
    // text exactly; a disagreement count is computed distributed.
    val chunks = pipeline.Curation.contentChunks(Tables.t(spark, sf, "documents"))
    val rebuilt = chunks
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
        x => x.getField("chunk_text")), " ").as("rebuilt"))
    val bad = Tables.t(spark, sf, "documents")
      .join(rebuilt, Seq("doc_id"), "left")
      .filter(not(col("text") <=> col("rebuilt")))
      .count()
    assert(bad == 0, s"$bad docs did not reassemble byte-identically from chunks")
  }

  test("minhash candidate generation is a superset of high-jaccard pairs (planted)") {
    import spark.implicits._
    // 20 base docs + exact copies → every copy pair must be found
    val base = (1 to 20).map(i => (i.toLong,
      (1 to 12).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")))
    val copies = base.map { case (id, t) => (id + 100, t) }
    val df = (base ++ copies).toDF("doc_id", "text")
    val found = Dedup.minhashCandidatePairs(df, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    base.foreach { case (id, _) =>
      assert(found.contains((id, id + 100)), s"exact copy pair ($id, ${id + 100}) missed")
    }
  }

  test("subword count: JVM scan obeys its algebraic laws on random strings") {
    // The native SubwordCount is the production token meter (x56/x56b,
    // x57 admission, x15c packing); these laws are what chunked
    // processing at scale leans on.
    import graft.functions.SubwordCount.count
    val vocabWords = graft.pipeline.Bpe.Vocab4 ++ graft.pipeline.Bpe.Vocab3 ++
      graft.pipeline.Bpe.Vocab2
    val alphabet = "abcdefghijklmnopqrstuvwxyz"
    def randWord(): String =
      if (rnd.nextBoolean()) vocabWords(rnd.nextInt(vocabWords.size)) * (1 + rnd.nextInt(3))
      else (1 to 1 + rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(26))).mkString
    (1 to 500).foreach { _ =>
      val a = (1 to 1 + rnd.nextInt(8)).map(_ => randWord()).mkString(" ")
      val b = (1 to 1 + rnd.nextInt(8)).map(_ => randWord()).mkString(" ")
      // Space-concatenation merge law: a boundary splits exactly there,
      // so per-chunk counts add — the property that lets a 100 TB corpus
      // be counted chunk-parallel and summed.
      assert(count(a + " " + b) == count(a) + count(b), s"merge law broke on <$a> + <$b>")
      // Bounds: >= one token per word, <= one per character.
      val words = a.split(" ").count(_.nonEmpty)
      assert(count(a) >= words && count(a) <= a.replace(" ", "").length, s"bounds broke on <$a>")
    }
    assert(count("") == 0L && count("   ") == 0L)
    // Greedy is NOT additive across arbitrary (non-space) concatenation —
    // pin one witness so nobody "simplifies" the merge law to it:
    // "ca"+"ts" = "cats": c|at|s (3) vs c|a (2) + t|s (2).
    assert(count("cats") == 3L && count("ca") + count("ts") == 4L)
  }

  test("context windows: count/coverage/slice invariants over random docs and configs") {
    import spark.implicits._
    val docs = (1 to 120).map { i =>
      val n = 1 + rnd.nextInt(80)
      (i.toLong, (0 until n).map(j => s"w${rnd.nextInt(50)}").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for ((winLen, stride) <- Seq((40, 20), (16, 16), (7, 3))) {
      val rows = pipeline.Curation.contextWindowsOf(df, winLen, stride).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      val perDoc = rows.groupBy(_._1)
      docs.foreach { case (id, text) =>
        val toks = text.split(" ")
        val wins = perDoc(id).sortBy(_._2)
        // ⌈n/stride⌉ windows, ids dense from 0, starts on the stride grid.
        assert(wins.length == (toks.length + stride - 1) / stride,
          s"doc $id ($winLen,$stride): ${wins.length} windows for ${toks.length} tokens")
        wins.zipWithIndex.foreach { case ((_, wid, start, nTok, wtext), i) =>
          assert(wid == i && start == i * stride)
          // Window text is exactly the token slice; tail length labelled.
          val expect = toks.slice(start, start + winLen)
          assert(nTok == expect.length && wtext == expect.mkString(" "),
            s"doc $id window $wid: '$wtext' vs '${expect.mkString(" ")}'")
        }
        // Every token covered at least once (stride <= winLen).
        val covered = wins.flatMap { case (_, _, start, nTok, _) =>
          start until (start + nTok) }.toSet
        assert(covered == toks.indices.toSet, s"doc $id coverage gap")
      }
    }
  }

  test("z-order: random 31-bit pairs round-trip and preserve per-dim order") {
    import spark.implicits._
    val pairs = (1 to 5000).map { _ =>
      (rnd.nextLong().abs & ((1L << 31) - 1), rnd.nextLong().abs & ((1L << 31) - 1))
    }
    val df = pairs.toDF("a", "b")
    val z = operators.ZOrder.zkey(col("a"), col("b"))
    val (da, db) = operators.ZOrder.zdecode(col("z"))
    val out = df.select(col("a"), col("b"), z.as("z"))
      .select(col("a"), col("b"), col("z"), da.as("da"), db.as("db"))
    assert(out.where(col("a") =!= col("da") || col("b") =!= col("db")).count() == 0,
      "Morton interleave must be invertible on the full 31-bit range")
    assert(out.where(col("z") < 0).count() == 0,
      "62-bit keys must stay non-negative BIGINTs")
    // Monotone per dimension at a fixed other coordinate (curve property).
    val fixedB = (0 until 200).map(i => (i.toLong * 7919 % (1L << 31), 12345L))
      .toDF("a", "b")
    val keys = fixedB.select(col("a"), operators.ZOrder.zkey(col("a"), col("b")).as("z"))
      .orderBy("a").collect().map(r => r.getLong(1))
    assert(keys.sameElements(keys.sorted),
      "at fixed b, zkey must be monotone in a")
  }

  test("CMS never underestimates on an adversarially skewed corpus") {
    import spark.implicits._
    // Zipf-ish: key k appears ~ 3000/k times — heavy head, long tail.
    val rows = (1 to 200).flatMap(k => Seq.fill(3000 / k)(k.toLong)).toDF("key")
    rows.createOrReplaceTempView("cms_prop_input")
    // Reuse the registered machinery indirectly: recompute with the same
    // mix and parameters over this frame via SQL-free column ops.
    val d = 4; val w = 512; val p = 1000003L
    def mix(c: org.apache.spark.sql.Column) = {
      val m32 = (1L << 32) - 1
      val h0 = c.bitwiseAND(lit(m32))
      val h1 = h0.bitwiseXOR(shiftright(h0, 16))
      val h2 = (h1 * lit(2146121005L)).bitwiseAND(lit(m32))
      val h3 = h2.bitwiseXOR(shiftright(h2, 15))
      val h4 = (h3 * lit(1831267619L)).bitwiseAND(lit(m32))
      h4.bitwiseXOR(shiftright(h4, 16))
    }
    val exploded = rows.withColumn("i", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("bucket", mix(col("key") + (col("i") + 1) * lit(p)) % w)
    val regs = exploded.groupBy("i", "bucket").agg(count(lit(1)).as("cnt"))
    val exact = rows.groupBy("key").agg(count(lit(1)).as("exact"))
    val est = exact.withColumn("i", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("bucket", mix(col("key") + (col("i") + 1) * lit(p)) % w)
      .join(regs, Seq("i", "bucket"))
      .groupBy("key", "exact").agg(min("cnt").as("est"))
    val under = est.where(col("est") < col("exact")).count()
    assert(under == 0, s"CMS underestimated $under keys — sums can only add")
    val n = rows.count()
    val over = est.where(col("est") > col("exact") + lit(2.0 * math.E / w * n)).count()
    assert(over == 0, s"$over keys past the 2x epsilon-band on a skewed corpus")
  }

  test("round-13 hash primitives are total and law-abiding on random inputs") {
    import graft.pipeline.Multimodal
    val r = new scala.util.Random(4242)
    // dhash64 / audioFp64: NEVER throw on arbitrary bytes (corrupt files
    // at 100 TB must score, not kill tasks); real fixtures always hash;
    // Hamming is symmetric and bounded by 64.
    (1 to 200).foreach { _ =>
      val junk = Array.fill(r.nextInt(400))(r.nextInt(256).toByte)
      Multimodal.dhash64(junk)           // must not throw
      Multimodal.audioFp64(junk)         // must not throw
      Multimodal.audioSpectralFp64(junk) // must not throw
    }
    val hs = (1 to 25).map { i =>
      val seed = Array.fill(192)((r.nextInt(200) + 1).toByte)
      val h = Multimodal.dhash64(
        Multimodal.pngFixture(1 + r.nextInt(30), 1 + r.nextInt(20), seed))
      assert(h.isDefined, s"a real PNG must always hash (iter $i)")
      h.get
    }
    for (a <- hs; b <- hs) {
      val d = java.lang.Long.bitCount(a ^ b)
      assert(d >= 0 && d <= 64 && d == java.lang.Long.bitCount(b ^ a))
    }
    (1 to 25).foreach { i =>
      val seed = Array.fill(192)((r.nextInt(200) + 1).toByte)
      val wav = Multimodal.amWavFixture(800 + r.nextInt(1600), seed)
      assert(Multimodal.audioFp64(wav).isDefined,
        s"a real WAV must always fingerprint (iter $i)")
      assert(Multimodal.audioSpectralFp64(wav).isDefined,
        s"a real WAV must always spectral-fingerprint (iter $i)")
      assert(Multimodal.audioSpectralFp64(
        Multimodal.toneWavFixture(800 + r.nextInt(1600), seed)).isDefined,
        s"a real tone WAV must always spectral-fingerprint (iter $i)")
    }
  }

  test("char entropy: native law battery on random unicode strings") {
    val alphabets = Seq("ab", "abcde", "a\u00e9\u4e2d", "a\uD834\uDD1Eb")
    val r = new scala.util.Random(99)
    alphabets.foreach { alpha =>
      val cps = alpha.codePoints().toArray
      (1 to 50).foreach { _ =>
        val n = 1 + r.nextInt(80)
        val sb = new java.lang.StringBuilder()
        (1 to n).foreach(_ => sb.appendCodePoint(cps(r.nextInt(cps.length))))
        val s0 = sb.toString
        val e = graft.functions.CharEntropy.entropy(s0)
        assert(e >= 0L, s"entropy is non-negative: '$s0' -> $e")
        val distinct = s0.codePoints().distinct().count()
        if (distinct == 1L) assert(e == 0L, s"uniform string has zero entropy: '$s0'")
        else assert(e > 0L, s"mixed string has positive entropy: '$s0'")
        // Permutation invariance: entropy sees the multiset only.
        val shuffled = {
          val arr = s0.codePoints().toArray
          val perm = r.shuffle(arr.toSeq).toArray
          val b = new java.lang.StringBuilder(); perm.foreach(b.appendCodePoint); b.toString
        }
        assert(graft.functions.CharEntropy.entropy(shuffled) == e,
          s"entropy must be permutation-invariant: '$s0' vs '$shuffled'")
      }
    }
  }

  test("merge law: incremental equals full for RANDOM batch/ref splits (all three artifact families)") {
    import org.apache.spark.sql.functions._
    import graft.pipeline.{Curation, Dedup, Similarity, TextStats}
    // The registered x121/x129/x133 queries prove incremental ≡ full on
    // ONE split (even/odd) via their oracles; this battery proves the
    // merge LAW itself — the equality cannot depend on which documents
    // happen to land in the batch. Each iteration splits the corpus by
    // a salted hash and checks the merged artifact against a full
    // rebuild of the union.
    val docs = graft.Tables.t(spark, sf, "documents").select("doc_id", "text")
    val emb = graft.Tables.t(spark, sf, "embeddings").select("vec_id", "embedding")
    Seq(17L, 90001L).foreach { salt =>
      val side = pmod(col("doc_id") * 2654435761L + salt, lit(5)) === 0
      val batch = docs.filter(side)
      val ref = docs.filter(!side)
      // Lexical clusters (x121's merge) vs full re-cluster of the union.
      val oldLabels = Curation.propagateMinLabels(Curation.undirectedEdges(
        Dedup.jaccardPairsPrefixOn(ref, 0.8).select(col("da"), col("db"))))._1
      val inc = Curation.incrementalClustersFromIndex(batch, ref, oldLabels, 0.8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = Curation.propagateMinLabels(Curation.undirectedEdges(
        Dedup.jaccardPairsPrefixOn(docs, 0.8).select(col("da"), col("db"))))._1
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(inc.size == docs.count(), s"salt $salt: every doc labelled")
      inc.foreach { case (id, cid) =>
        assert(full.getOrElse(id, id) == cid,
          s"salt $salt lexical: doc $id incremental $cid vs full")
      }
      // LM table (x133's merge) vs full recount of the union.
      val oldLm = ref.select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cf"))
      val incLm = TextStats.incrementalUnigramLm(batch, oldLm).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val fullLm = docs.select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cf")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(incLm == fullLm, s"salt $salt: merged LM must equal full recount")
    }
    // Semantic clusters (x129's merge) — one salted split (the pair
    // chain is the expensive piece; the even/odd split is oracle-proved
    // every round).
    val eSide = pmod(col("vec_id") * 2654435761L + 40503L, lit(3)) === 0
    val t = Similarity.SemanticDedupThreshold
    val oldSem = Curation.propagateMinLabels(Curation.undirectedEdges(
      Similarity.embeddingNearDupsLshOn(emb.filter(!eSide), t)
        .select(col("va").as("da"), col("vb").as("db"))))._1
    val incSem = Similarity.incrementalSemanticClustersFromIndex(
        emb.filter(eSide), emb.filter(!eSide), oldSem, t)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullSem = Curation.propagateMinLabels(Curation.undirectedEdges(
      Similarity.embeddingNearDupsLshOn(emb, t)
        .select(col("va").as("da"), col("vb").as("db"))))._1
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    incSem.foreach { case (id, cid) =>
      assert(fullSem.getOrElse(id, id) == cid,
        s"semantic: vec $id incremental $cid vs full")
    }
  }
}
