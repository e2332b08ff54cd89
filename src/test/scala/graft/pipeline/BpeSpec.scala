package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Greedy longest-match subword tokenization (x56/x56b) on planted
  * words with hand-derived tokenizations, plus the regime and
  * budget-divergence pins. */
class BpeSpec extends SparkSpec {

  private def counts(words: String*): Map[String, Long] = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      .select(col("text"), Bpe.subwordCount(col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("x56: planted words tokenize exactly by the greedy longest-match rule") {
    val c = counts("the", "there", "tionthe", "join", "customer", "xyzq", "",
      "that", "a", "the cat thing")
    assert(c("the") == 1L)
    assert(c("there") == 2L, "ther|e — the 4-gram wins the munch over the|re")
    assert(c("tionthe") == 2L, "tion|the")
    assert(c("join") == 3L, "j|o|in (oi is not in the vocabulary)")
    assert(c("customer") == 6L, "c|u|st|o|m|er")
    assert(c("xyzq") == 4L, "no hits — single-char fallback")
    assert(c("") == 0L, "empty text holds zero tokens")
    assert(c("that") == 1L)
    assert(c("a") == 1L)
    assert(c("the cat thing") == 1L + 2L + 2L, "the | c,at | th,ing")
  }

  test("x56: native codegen'd expression equals the nested-HOF reference everywhere") {
    graft.functions.GraftFunctions.register(spark)
    // Full corpus + the planted edge cases: every doc must agree between
    // the interpreted HOF fold and the native hash-set scan.
    val corpus = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
    import spark.implicits._
    val edge = Seq((9001L, ""), (9002L, "  double  spaces  "), (9003L, "tionthe there"),
      (9004L, null.asInstanceOf[String]), (9005L, "x"),
      // Non-BMP: the native scan must count CODE POINTS like Spark's
      // length/substr do — a surrogate pair is ONE fallback token.
      (9006L, "the 😀😀 cat 𝕏"))
      .toDF("doc_id", "text")
    val both = corpus.union(edge)
      .select(col("doc_id"),
        Bpe.subwordCount(col("text")).as("native"),
        Bpe.subwordCountRef(col("text")).as("ref"))
      .filter(col("native") =!= col("ref"))
      .collect()
    assert(both.isEmpty, s"native/HOF divergence: ${both.mkString(", ")}")
  }

  test("x56: count bounds and determinism on the real corpus") {
    val out = Bpe.tokenCounts(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val (ws, sub) = (r.getLong(1), r.getLong(2))
      assert(sub >= ws, s"every non-empty word is >= 1 subword: $r")
      assert(sub <= ws * 24, s"a word cannot exceed its char count in tokens: $r")
    }
    // The vocabulary must genuinely compress this corpus (not all
    // single-char fallback): mean subwords-per-word well under mean
    // word length.
    val totals = Bpe.tokenCounts(spark, sf)
      .agg(sum("n_subword_tok"), sum("n_ws_tok")).collect()(0)
    val perWord = totals.getLong(0).toDouble / totals.getLong(1)
    assert(perWord > 1.5 && perWord < 5.0,
      s"subwords per word $perWord out of the measured regime (~3.4)")
    assert(Bpe.tokenCounts(spark, sf).collect().toSeq == out.toSeq)
  }

  test("x56b: subword apportionment sums to the budget and diverges from x55") {
    val bpe = Bpe.budgetApportionBpe(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(bpe.values.sum == Sampling.ApportionBudget,
      "Hamilton guarantee must hold in the subword unit too")
    val ws = Sampling.budgetApportion(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(bpe.keySet == ws.keySet)
    // The unit change must MOVE allocations: subword mass is not
    // proportional to whitespace mass across languages. If this ever
    // fails the corpus regime changed and x56b is vacuous — re-measure.
    assert(bpe != ws, s"subword allocations must differ from whitespace ones: $bpe vs $ws")
  }

  // ---------------------------------------------------------------- x65
  test("x65: hand-computed pair counts on a planted corpus") {
    import spark.implicits._
    // words: "aaa" appears twice (freq 2), "bb" once, "a" is single-char
    // (contributes no pair); "aaa" holds TWO overlapping 'aa' positions.
    val corpus = Seq((1L, "aaa bb a"), (2L, "aaa")).toDF("doc_id", "text")
    val out = Bpe.pairCountsOf(corpus, 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out == Seq("aa" -> 4L, "bb" -> 1L), s"got $out")
  }

  test("x65: top-K pair list is deterministic and strictly ordered on the real corpus") {
    val a = Bpe.pairCounts(spark, sf).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = Bpe.pairCounts(spark, sf).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == b && a.size == Bpe.BpePairTopK)
    // (cnt DESC, pair ASC) is a total order: no adjacent inversion.
    a.sliding(2).foreach { case Seq((p1, c1), (p2, c2)) =>
      assert(c1 > c2 || (c1 == c2 && p1 < p2), s"order violated at $p1/$p2")
    }
  }

  // ---------------------------------------------------------------- x71
  test("x65b: hand-computed 2-merge fixture (pair argmax, recount, tie-break)") {
    import spark.implicits._
    // Corpus: "aa ab aa" -> vocab aa(freq 2), ab(freq 1).
    //   iter 1 pairs: (a,a)=2, (a,b)=1 -> merge (a,a)->aa, cnt 2
    //   iter 2 (after rewrite aa->[aa], ab->[a,b]): (a,b)=1 -> merge ab
    //   iter 3: no pairs left -> loop ends early (2 rows, not K=5)
    val corpus = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    val out = Bpe.bpeMergesOf(spark, corpus, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq((1L, "a", "a", "aa", 2L), (2L, "a", "b", "ab", 1L)),
      s"got ${out.toSeq}")
  }

  test("x65b: greedy left-to-right merge application (aaa -> [aa, a], then aaa)") {
    import spark.implicits._
    // "aaa": iter 1 counts (a,a) at TWO positions (overlapping occurrences
    // both count, Sennrich's get_stats) -> merge (a,a) cnt 2; the rewrite
    // must be greedy LTR non-overlapping: [aa, a], NOT [a, aa]. iter 2
    // then merges (aa, a) cnt 1 — which only exists under LTR pairing.
    val corpus = Seq((1L, "aaa")).toDF("doc_id", "text")
    val out = Bpe.bpeMergesOf(spark, corpus, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq((1L, "a", "a", "aa", 2L), (2L, "aa", "a", "aaa", 1L)),
      s"got ${out.toSeq}")
  }

  test("x65b: iteration 1's argmax equals x65's top pair on the real corpus") {
    // The loop's first merge IS x65's statistic — the two registered
    // queries must agree on what the next merge rule would be (x65 orders
    // by concatenated pair string, x65b by (lhs, rhs); they can only
    // diverge on a cnt tie between pairs whose concatenations collide,
    // absent here).
    val top = Bpe.pairCounts(spark, sf).collect().head
    val firstMerge = Bpe.bpeMerges(spark, sf).collect().head
    assert(firstMerge.getString(3) == top.getString(0),
      s"x65b first merge ${firstMerge.getString(3)} vs x65 top pair ${top.getString(0)}")
    assert(firstMerge.getLong(4) == top.getLong(1), "counts must agree")
  }

  test("x65c: applying the trained merges tokenizes the hand-computed fixture") {
    import spark.implicits._
    // "aa ab aa" trains merges (a,a)->aa then (a,b)->ab (the x65b
    // fixture); applying them tokenizes both words to ONE token each:
    // doc = 6 char-symbols, 3 BPE tokens, 0.5 tok/char.
    val corpus = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("x65c").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Bpe.bpeApplyCounts(spark, dir).collect()
    assert(r.length == 1)
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getDouble(3)) == ((6L, 3L, 0.5)),
      s"got ${r(0)}")
  }

  test("x65b/x65c: words containing line terminators wrap every char (DOTALL regression)") {
    import spark.implicits._
    // Pre-fix, Java's '.' skipped \r, leaving it UNWRAPPED in the
    // delimited encoding: "a\rb" became ONE corrupt symbol containing
    // the delimiter (2 phantom tokens, no trainable pairs). With
    // (?s) the word is 3 symbols; merges (\r,b) then (a,\rb) collapse
    // it to 1 token. DuckDB RE2 needed the same flag for \n parity.
    val corpus = Seq((1L, "a\rb")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("x65crlf").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merges = Bpe.bpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(merges.toSeq == Seq((1L, "\r", "b"), (2L, "a", "\rb")), s"got ${merges.toSeq}")
    val applied = Bpe.bpeApplyCounts(spark, dir).collect()(0)
    assert((applied.getLong(1), applied.getLong(2)) == ((3L, 1L)), s"got $applied")
  }

  test("x65c: real-corpus invariants — merges compress, never expand or drop docs") {
    val out = Bpe.bpeApplyCounts(spark, sf).collect()
    assert(out.length == graft.Tables.t(spark, sf, "documents").count())
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"BPE tokens cannot exceed char symbols: $r")
    }
    // The 5 trained merges must actually fire somewhere: corpus-wide
    // token mass strictly below character mass.
    assert(out.map(_.getLong(2)).sum < out.map(_.getLong(1)).sum,
      "trained merges must compress the corpus")
  }

  test("x71: English premium is exactly 1.0 and mass columns cross-check x56") {
    val rows = Bpe.tokenizerFairness(spark, sf).collect()
    val byLang = rows.map(r => r.getString(0) -> r).toMap
    assert(byLang.contains("en"), "corpus regime: English must be present")
    assert(byLang("en").getDouble(7) == 1.0,
      "en's tokens-per-char over its own baseline must round to exactly 1.0")
    // Integer masses must agree with x56's per-doc table summed per lang
    // (same expression, independent aggregation path).
    val x56 = Bpe.tokenCounts(spark, sf)
      .join(Tables.t(spark, sf, "documents").select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(sum("n_subword_tok").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(4) == x56(r.getString(0)),
        s"${r.getString(0)}: n_subword_tok diverges from the x56 sum")
    }
    // Derived rates are consistent with their own integer masses.
    rows.foreach { r =>
      val (chars, words, tok) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(math.abs(r.getDouble(5) - tok.toDouble / words) < 5e-5)
      assert(math.abs(r.getDouble(6) - chars.toDouble / tok) < 5e-5)
    }
  }

  test("x71: empty-only and en-free corpora degrade to NULL rates, not errors") {
    import spark.implicits._
    // A lang of only-empty docs: 0 words, 0 subwords -> NULL tok_per_word /
    // chars_per_tok; no 'en' rows at all -> NULL premium everywhere.
    val planted = Seq((1L, null.asInstanceOf[String], "zz", "s", 0L),
      (2L, "", "zz", "s", 0L), (3L, "the cat", "fr", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("x71nulls").toString
    planted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Bpe.tokenizerFairness(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("zz").isNullAt(5) && out("zz").isNullAt(6) && out("zz").isNullAt(7))
    assert(out("fr").getLong(4) == 3L, "the|c,at")
    assert(out("fr").isNullAt(7), "no English baseline -> NULL premium")
  }

  test("x82: hand-computed Viterbi DP on a planted vocabulary") {
    import spark.implicits._
    // One doc "aaaaa aaa aaa ab ba": words aaaaa(1) aaa(2) ab(1) ba(1).
    // Piece masses: a13 aa8 aaa5 aaaa2 ab1 ba1 b2 → T = 32; integer
    // costs len(bin(T div f)): a=2 aa=3 aaa=3 aaaa=5 ab=6 ba=6 b=5.
    // aaaaa (len 5 > max piece 4) MUST split: best [aaa|aa] or [aa|aaa]
    // → packed (3+3)*64+2 = 386 → (cost 6, 2 pieces). Whole-word wins
    // everywhere else: aaa→(3,1), ab→(6,1), ba→(6,1).
    val planted = Seq((1L, "aaaaa aaa aaa ab ba")).toDF("doc_id", "text")
    val out = Bpe.unigramViterbiOf(planted).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      "aaaaa" -> ((1L, 6L, 2L)),
      "aaa" -> ((2L, 3L, 1L)),
      "ab" -> ((1L, 6L, 1L)),
      "ba" -> ((1L, 6L, 1L))), s"hand-computed DP must match: $out")
  }

  test("x82: corpus DP matches an independent brute-force reimplementation") {
    // Rebuild vocabulary, costs, and the (cost, n_pieces)-lexicographic
    // optimum in plain Scala from the raw texts — no Spark expressions
    // shared with the implementation — and require exact agreement.
    val texts = graft.Tables.t(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.lit(""))).collect().map(_.getString(0))
    val wfreq = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ").filter(_.nonEmpty).foreach(w =>
      wfreq(w) = wfreq.getOrElse(w, 0L) + 1))
    val pf = scala.collection.mutable.Map.empty[String, Long]
    wfreq.foreach { case (w, f) =>
      for (i <- 0 until w.length; k <- 1 to math.min(Bpe.UniMaxPiece, w.length - i))
        { val p = w.substring(i, i + k); pf(p) = pf.getOrElse(p, 0L) + f } }
    val multi = pf.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(Bpe.UniVocabTop)
    val vocab = (multi ++ pf.filter(_._1.length == 1)).toMap
    val t = vocab.values.sum
    val cost = vocab.map { case (p, f) =>
      p -> java.lang.Long.toBinaryString(t / f).length.toLong }
    def dp(w: String): Long = {
      val best = Array.fill(w.length + 1)(Long.MaxValue / 2)
      best(0) = 0L
      for (i <- 1 to w.length;
           j <- math.max(0, i - Bpe.UniMaxPiece) until i;
           c <- cost.get(w.substring(j, i)))
        best(i) = math.min(best(i), best(j) + c * 64 + 1)
      best(w.length)
    }
    val out = Bpe.unigramViterbi(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, tc, np) = (r.getString(0), r.getLong(2), r.getLong(3))
      val v = dp(w)
      assert(tc == v / 64 && np == v % 64,
        s"word '$w': engine ($tc, $np) vs brute-force (${v / 64}, ${v % 64})")
    }
  }

  test("x95: hand-computed hard-EM step — counts, prune, and new costs pinned") {
    import spark.implicits._
    // Corpus "ab ab ab cd": words ab(3) cd(1). Piece masses a3 b3 ab3
    // c1 d1 cd1 → T = 12; costs len(bin(12 // f)): ab=3 cd=4 a=3 b=3
    // c=4 d=4. Viterbi: "ab" → [ab] (193 < a+b 386); "cd" → [cd]
    // (257 < 514). E-step counts: ab=3, cd=1 (singles PRUNED — on no
    // path); T' = 4; new costs: ab len(bin(4//3=1))=1, cd len(bin(4))=3.
    val planted = Seq((1L, "ab ab ab cd")).toDF("doc_id", "text")
    val out = Bpe.unigramViterbiEmOf(planted).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("ab", 3L, 3L, 1L), ("cd", 1L, 4L, 3L)),
      s"hand-computed EM step must match: ${out.toSeq}")
  }

  test("x95: backtracked segmentation reassembles losslessly and agrees with x82") {
    val docs = Tables.t(spark, sf, "documents")
    val segs = Bpe.uniSegmentsOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
    assert(segs.nonEmpty)
    // Lossless: the pieces concatenate back to the word, none empty.
    segs.foreach { case (w, _, ps) =>
      assert(ps.mkString("") == w, s"pieces must reassemble '$w': $ps")
      assert(ps.forall(_.nonEmpty), s"no empty piece in '$w': $ps")
      assert(ps.forall(_.length <= Bpe.UniMaxPiece), s"piece length cap in '$w': $ps")
    }
    // Path length agrees with x82's packed n_pieces per word, and the
    // E-step mass identity holds: Σ_pieces f = Σ_words wfreq·n_pieces.
    val np = Bpe.unigramViterbi(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    segs.foreach { case (w, _, ps) =>
      assert(ps.length.toLong == np(w)._2, s"'$w': ${ps.length} vs ${np(w)._2}") }
    val emMass = Bpe.unigramViterbiEm(spark, sf).collect().map(_.getLong(1)).sum
    val dpMass = np.values.map { case (wf, n) => wf * n }.sum
    assert(emMass == dpMass, s"EM piece mass $emMass must equal DP path mass $dpMass")
  }
}
