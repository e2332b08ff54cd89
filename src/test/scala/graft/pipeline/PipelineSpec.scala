package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Dedup / similarity / multimodal operator semantics on controlled
  * inputs (the oracle hash-compare covers the registered query shapes). */
class PipelineSpec extends SparkSpec {

  private def docsDf = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
      (3L, "completely different text about spark engines"),
      (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (5L, "unrelated words forming another document entirely"))
      .toDF("doc_id", "text")
  }

  test("MinHash+LSH finds planted near-dups and the exact dup") {
    val pairs = Dedup.minhashCandidatePairs(docsDf, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), "exact duplicate must collide in every band")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      s"near-duplicate should be a candidate, got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("MinHash signatures are deterministic and k-long") {
    val sigs = Dedup.minhashSignatures(docsDf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.values.forall(_.size == Dedup.MinhashK))
    assert(sigs(1L) == sigs(4L), "identical docs → identical signatures")
    val again = Dedup.minhashSignatures(docsDf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs == again, "signatures must be run-deterministic")
  }

  test("SimHash: identical docs equal, near-dups within small hamming distance") {
    val sh = Dedup.simhash(docsDf).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    val near = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    val far = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    assert(near < far, s"near-dup hamming $near should be < unrelated $far")
  }

  test("cosine: self-similarity is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val a = df.as("a"); val b = df.as("b")
    val sims = a.crossJoin(b)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        round(Similarity.cosine(col("a.embedding"), col("b.embedding")), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sims((1L, 1L)) == 1.0)
    assert(sims((1L, 3L)) == 1.0, "colinear vectors → cosine 1")
    assert(sims((1L, 2L)) == 0.0)
  }

  test("IVF search space is pruned to the query label partition") {
    val all = Tables.t(spark, sf, "embeddings")
    val qLabel = all.filter(col("vec_id") === 0).select("label").collect()(0).getInt(0)
    val got = Similarity.annIvfTopK(spark, sf).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getInt(1) == qLabel), "IVF results must stay in the coarse partition")
  }

  test("multimodal feature extraction is deterministic and schema-stable") {
    val media = Multimodal.fromDocuments(Tables.t(spark, sf, "documents"))
    assert(media.schema == Multimodal.mediaSchema ||
      media.columns.toSeq == Multimodal.mediaSchema.fields.map(_.name).toSeq)
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect().toSeq
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect().toSeq
    assert(f1 == f2)
    assert(f1.size == 500)
    val first = f1.head
    assert(first.getInt(1) > 0, "payload bytes")
  }

  test("x08b: ImageIO round-trips planted PNGs exactly; corrupt payloads score undecodable") {
    // Known fixture: a 3×2 gray-ramp image — decoded dims and mean MUST
    // be exact (PNG is lossless; the mean of bytes 10,20,30,40,50,60
    // cycled over 6 pixels is 35.0).
    val seed = Array[Byte](10, 20, 30, 40, 50, 60)
    val png = Multimodal.pngFixture(3, 2, seed)
    assert(png.length > 8 &&
      (png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)),
      "fixture must be a real PNG stream")
    assert(Multimodal.decodeImage(png).contains((3, 2, 35.0)))
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    // Registered query: encode documents → decode back. Every payload
    // must decode, match its stored metadata, and be run-deterministic.
    val out = SparkEntry.queries("x08b_image_decode")(spark, sf).collect().toSeq
    assert(out.size == 500)
    assert(out.forall(r => r.getInt(2) == 1), "every generated PNG must decode")
    assert(out.forall(r => r.getInt(5) == 1), "decoded dims must equal stored metadata")
    assert(out == SparkEntry.queries("x08b_image_decode")(spark, sf).collect().toSeq)
  }

  test("x08c: WAV round-trips planted clips exactly; corrupt payloads score undecodable") {
    // 100-frame square wave at amp 8192: every sample is ±8192, so the
    // integer mean square is exactly 8192² = 67108864 — a full-amplitude
    // invariant no lossy step may disturb (WAV is PCM-lossless).
    val wav = Multimodal.wavFixture(nFrames = 100, period = 10)
    assert(new String(wav.take(4)) == "RIFF", "fixture must be a real WAV stream")
    assert(Multimodal.decodeAudio(wav).contains((8000, 1, 100L, 67108864L)))
    assert(Multimodal.decodeAudio("not audio".getBytes).isEmpty)
    assert(Multimodal.decodeAudio(Array.empty[Byte]).isEmpty)
    // r15 ADVICE: structurally valid RIFF with nonsense fmt values must
    // stay on the None contract (the JDK codec rejects such payloads),
    // not classify as decodable with garbage features. rate=0 at bytes
    // 24-27; channels at 22-23 of the canonical 44-byte header.
    val zeroRate = wav.clone()
    zeroRate(24) = 0; zeroRate(25) = 0; zeroRate(26) = 0; zeroRate(27) = 0
    assert(Multimodal.decodeAudio(zeroRate).isEmpty, "rate=0 must not decode")
    val negRate = wav.clone()
    negRate(27) = 0x80.toByte // sign bit -> negative little-endian rate
    assert(Multimodal.decodeAudio(negRate).isEmpty, "rate<0 must not decode")
    val absurdChannels = wav.clone()
    absurdChannels(22) = 0xff.toByte; absurdChannels(23) = 0x7f.toByte // 32767 ch
    assert(Multimodal.decodeAudio(absurdChannels).isEmpty,
      "an absurd channel count must not decode")
  }

  test("x08d: exact-integer image features round-trip the PNG encode/decode") {
    // 2x2 gray PNG from bytes 'ab' cycled: pixels 97,98,97,98 ->
    // graysum 390, mean_bp = 390*10000 // 4 = 975000.
    val png = Multimodal.pngFixture(2, 2, "ab".getBytes)
    assert(Multimodal.decodeImageRaw(png).contains((2, 2, 3L * 390L)))
    val out = SparkEntry.queries("x08d_image_decode_certified")(spark, sf).collect()
    assert(out.length == 500)
    assert(out.forall(_.getInt(3) == 1), "decoded dims must match metadata")
    // The double-mean query (x08b) and the exact-bp query must agree to
    // the floor: mean_bp div 10000 == floor(mean).
    val means = SparkEntry.queries("x08b_image_decode")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(6)).toMap
    out.foreach { r =>
      val bp = r.getLong(4)
      val m = means(r.getLong(0))
      assert(math.abs(bp / 10000.0 - m) < 0.0002,
        s"media ${r.getLong(0)}: exact bp $bp vs double mean $m")
    }
  }

  test("x08c: full-corpus audio decode features match the generation rule") {
    val out = SparkEntry.queries("x08c_audio_decode")(spark, sf).collect().toSeq
    assert(out.size == 500)
    assert(out.forall(r => r.getInt(2) == 1), "every generated WAV must decode")
    assert(out.forall(r => r.getInt(3) == 8000 && r.getInt(4) == 1), "format fields round-trip")
    assert(out.forall(r => { val f = r.getLong(5); f >= 800 && f < 1600 }),
      "frame counts must match the generation rule")
    assert(out.forall(r => r.getInt(6) == 1),
      "decoded frame counts must agree with the stored metadata")
    assert(out.forall(_.getLong(7) == 67108864L),
      "square wave at amp 8192 has exact mean square everywhere")
    assert(out == SparkEntry.queries("x08c_audio_decode")(spark, sf).collect().toSeq)
  }

  test("lock-free WAV path: fixture bytes and decode equal the JDK codec exactly") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def jdkWav(pcm: Array[Byte], nFrames: Int, rate: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // Byte-for-byte: the hand-rolled canonical header (the executor-
    // thread-scaling replacement for the globally synchronized
    // AudioSystem registry) is indistinguishable at rest from the JDK
    // writer's output, across sizes, rates, and both fixture families.
    for ((n, period, rate) <- Seq((100, 10, 8000), (800, 16, 8000),
        (1599, 63, 8000), (64, 2, 16000))) {
      val w = Multimodal.wavFixture(n, period, rate)
      assert(java.util.Arrays.equals(w, jdkWav(w.drop(44), n, rate)),
        s"fixture ($n, $period, $rate) must match the JDK writer byte for byte")
      // And the lock-free parser agrees with the JDK reader on it.
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(w))
      val f = ais.getFormat
      assert(Multimodal.decodeAudio(w).exists { case (r, c, fr, _) =>
        r == f.getSampleRate.toInt && c == f.getChannels &&
          fr == ais.getFrameLength
      }, "fast-path decode must agree with the JDK reader's header fields")
      ais.close()
    }
    // Beyond-PCM-16 payloads FALL BACK to the JDK codec (same outputs as
    // before the fast path existed): an 8-bit WAV still decodes, with
    // the disclosed mean-square 0 for non-16-bit encodings.
    val pcm8 = Array.tabulate[Byte](200)(i => (i % 64).toByte)
    val fmt8 = new AudioFormat(8000f, 8, 1, false, false)
    val bos8 = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm8), fmt8, 200L),
      AudioFileFormat.Type.WAVE, bos8)
    assert(Multimodal.decodeAudio(bos8.toByteArray).contains((8000, 1, 200L, 0L)),
      "non-16-bit WAV must take the JDK fallback with the pre-existing contract")
  }

  test("x115: perceptual-hash dedup pairs near-duplicate images, skips different ones") {
    import org.apache.spark.sql.Row
    // A: 32×24 row-increasing gradient (within every dHash row, left
    // cell mean < right cell mean → the all-zero hash). B: byte-identical
    // payload (Hamming 0). C: ONE corner pixel changed — only grid cell
    // (0,0) is touched, which participates in exactly one comparison, so
    // Hamming(A,C) ≤ 1 BY CONSTRUCTION. D: the reversed gradient — every
    // comparison flips (the all-ones hash), Hamming(A,D) = 64.
    val seedA = Array.tabulate[Byte](768)(i => (i % 192).toByte)
    val seedC = seedA.clone(); seedC(0) = 127.toByte
    val seedD = Array.tabulate[Byte](768)(i => (191 - i % 192).toByte)
    val pA = Multimodal.pngFixture(32, 24, seedA)
    val pB = pA.clone()
    val pC = Multimodal.pngFixture(32, 24, seedC)
    val pD = Multimodal.pngFixture(32, 24, seedD)
    val Seq(hA, hB, hC, hD) =
      Seq(pA, pB, pC, pD).map(p => Multimodal.dhash64(p).get)
    assert(hA == 0L && hB == hA, "monotone gradient is the all-zero hash")
    assert(hD == -1L, "reversed gradient flips all 64 comparisons")
    assert(java.lang.Long.bitCount(hA ^ hC) <= 1, "corner-pixel edit moves ≤ 1 bit")
    assert(Multimodal.dhash64("not a png".getBytes).isEmpty)
    assert(Multimodal.dhash64(Array.empty[Byte]).isEmpty)
    // Pigeonhole law the banding relies on: any pair within Hamming 3
    // shares at least one of the 4 16-bit bands.
    def bands(h: Long): Seq[Long] = (0 until Multimodal.PhashBands)
      .map(i => (h >>> (i * 16)) & 0xffffL)
    for (base <- Seq(hA, hC, 0x123456789abcdefL);
         flips <- Seq(Seq(0), Seq(5, 21), Seq(3, 17, 63), Seq(0, 1, 2))) {
      val other = flips.foldLeft(base)((h, b) => h ^ (1L << b))
      assert(bands(base).zip(bands(other)).exists(p => p._1 == p._2),
        s"pigeonhole: $base vs $other must share a band")
    }
    // End-to-end: the planted quartet through the registered pair shape.
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, pA, "image/png", 32: java.lang.Integer, 24: java.lang.Integer),
        Row(2L, pB, "image/png", 32: java.lang.Integer, 24: java.lang.Integer),
        Row(3L, pC, "image/png", 32: java.lang.Integer, 24: java.lang.Integer),
        Row(4L, pD, "image/png", 32: java.lang.Integer, 24: java.lang.Integer),
        Row(5L, "corrupt".getBytes, "image/png",
          1: java.lang.Integer, 1: java.lang.Integer)),
      Multimodal.mediaSchema)
    val pairs = Multimodal.phashNearDupPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"near-dup trio pairs exactly, far image and corrupt payload never: $pairs")
    assert(pairs((1L, 2L)) == 0L, "identical payloads verify at Hamming 0")
    assert(pairs((1L, 3L)) == java.lang.Long.bitCount(hA ^ hC).toLong)
    // Registered corpus query: deterministic, law-abiding output.
    val out = SparkEntry.queries("x115_image_phash_dedup")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs are (min, max)-oriented")
      assert(r.getLong(2) <= Multimodal.PhashMaxHamming, "verify bound holds")
    }
    assert(out.toSeq ==
      SparkEntry.queries("x115_image_phash_dedup")(spark, sf).collect().toSeq)
  }

  test("x116: audio fingerprint dedup pairs a perturbed-PCM clip, skips a different profile") {
    import org.apache.spark.sql.Row
    // A: ascending amplitude profile (within a segment adjacent windows
    // tie, across boundaries the later window is louder → strict-greater
    // never fires → the all-zero fingerprint). B: byte-identical. C: one
    // PCM sample flipped inside the data chunk (WAV has no checksum) —
    // sample ~28 lands in fingerprint window 1, so at most the two
    // comparisons touching window 1 move. D: the descending profile —
    // every segment boundary now fires, far from A.
    val seedA = Array.tabulate[Byte](768)(i => (i % 192).toByte)
    val seedD = Array.tabulate[Byte](768)(i => (191 - i % 192).toByte)
    val pA = Multimodal.amWavFixture(1600, seedA)
    val pB = pA.clone()
    val pC = pA.clone(); pC(100) = (pC(100) ^ 0x55).toByte
    val pD = Multimodal.amWavFixture(1600, seedD)
    val Seq(hA, hB, hC, hD) =
      Seq(pA, pB, pC, pD).map(p => Multimodal.audioFp64(p).get)
    assert(hA == 0L && hB == hA, "ascending profile is the all-zero fingerprint")
    assert(java.lang.Long.bitCount(hA ^ hC) <= Multimodal.PhashMaxHamming,
      "a local PCM edit moves at most the adjacent comparison bits")
    assert(java.lang.Long.bitCount(hA ^ hD) > Multimodal.PhashMaxHamming,
      "the reversed profile must sit outside the verify bound")
    assert(Multimodal.audioFp64("not audio".getBytes).isEmpty)
    assert(Multimodal.audioFp64(Array.empty[Byte]).isEmpty)
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, pA, "audio/wav", 16: java.lang.Integer, 16: java.lang.Integer),
        Row(2L, pB, "audio/wav", 16: java.lang.Integer, 16: java.lang.Integer),
        Row(3L, pC, "audio/wav", 16: java.lang.Integer, 16: java.lang.Integer),
        Row(4L, pD, "audio/wav", 16: java.lang.Integer, 16: java.lang.Integer),
        Row(5L, "corrupt".getBytes, "audio/wav",
          1: java.lang.Integer, 1: java.lang.Integer)),
      Multimodal.mediaSchema)
    val pairs = Multimodal.audioFpNearDupPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"near-dup trio pairs exactly, far clip and corrupt payload never: $pairs")
    assert(pairs((1L, 2L)) == 0L)
    assert(pairs((1L, 3L)) == java.lang.Long.bitCount(hA ^ hC).toLong)
    val out = SparkEntry.queries("x116_audio_fingerprint_dedup")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs are (min, max)-oriented")
      assert(r.getLong(2) <= Multimodal.PhashMaxHamming, "verify bound holds")
    }
    assert(out.toSeq ==
      SparkEntry.queries("x116_audio_fingerprint_dedup")(spark, sf).collect().toSeq)
  }

  test("x118: JSD is zero for identical distributions, ln 2 for disjoint, law-abiding on the corpus") {
    import spark.implicits._
    // Planted: X and Y share the exact token distribution (JSD must be
    // EXACTLY zero — every per-token term is round(p·ln 1) = 0); Z is
    // vocabulary-disjoint (JSD = ln 2, up to the defined nano-rounding
    // of one term per vocab entry).
    val corpus = Seq(
      (1L, "a b c a", "X"), (2L, "c b a a", "X"),
      (3L, "a a b c", "Y"), (4L, "b a c a", "Y"),
      (5L, "d e f g", "Z"), (6L, "g f e d", "Z"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("jsd")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = TextStats.sourceDivergence(spark, dir.toString).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      assert(out.keySet == Set(("X", "Y"), ("X", "Z"), ("Y", "Z")))
      assert(out(("X", "Y"))._4 == 0L, "identical distributions diverge by exactly 0")
      val ln2Nano = math.round(1e9 * math.log(2.0))
      Seq(("X", "Z"), ("Y", "Z")).foreach { p =>
        val (na, nb, vocab, jsd) = out(p)
        assert(na == 8 && nb == 8 && vocab == 7, s"$p mass/vocab")
        assert(math.abs(jsd - ln2Nano) <= vocab,
          s"$p: disjoint vocab must sit at ln 2 (± per-term nano rounding): $jsd")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    // Corpus run: C(|sources|, 2) rows, all within [0, ln 2], ordered,
    // deterministic.
    val rows = TextStats.sourceDivergence(spark, sf).collect()
    val nSrc = Tables.t(spark, sf, "documents").select("source").distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2, "one row per unordered source pair")
    val ln2Nano = math.round(1e9 * math.log(2.0))
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs are (min, max)-oriented")
      val jsd = r.getLong(5)
      assert(jsd >= -r.getLong(4) && jsd <= ln2Nano + r.getLong(4),
        s"JSD must sit in [0, ln 2] up to nano rounding: $r")
    }
    assert(rows.toSeq == TextStats.sourceDivergence(spark, sf).collect().toSeq)
  }

  test("x119: context gain is higher for ordered text than its shuffled twin; laws hold") {
    import spark.implicits._
    // Two docs with the SAME token multiset (identical unigram score by
    // construction — the LM is shared), one periodic (every bigram is
    // deterministic: a→b, b→a), one scrambled. Context must buy the
    // periodic doc strictly more information. A 1-token doc has no
    // bigrams → NULL gain, row preserved.
    val corpus = Seq(
      (1L, "a b a b a b a b a b a b"),
      (2L, "a a b b a b b a a b b a"),
      (3L, "solo")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("cgain")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = TextStats.contextGain(spark, dir.toString).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
      assert(out(3L)._2 == 0L && out(3L)._3.isEmpty,
        "a bigram-less doc keeps its row with NULL gain")
      assert(out(1L)._3.get > out(2L)._3.get,
        s"ordered text must gain more from context than its shuffled twin: $out")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    // Corpus laws: gain recomputes from the two published scores; the
    // interpolation bounds it below by ln(lambda_c) = -1.204 (p2 >=
    // 0.3*p1 pointwise), up to the 4dp rounding of three quantities.
    val rows = TextStats.contextGain(spark, sf).collect()
    rows.filter(!_.isNullAt(5)).foreach { r =>
      val want = BigDecimal(r.getDouble(3) - r.getDouble(4))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) == want, s"gain must equal round(u - b, 4): $r")
      assert(r.getDouble(5) >= math.log(TextStats.BigramLambdaC) - 0.0002,
        s"interpolation lower bound violated: $r")
    }
    assert(rows.exists(r => !r.isNullAt(5) && r.getDouble(5) > 0),
      "context must help somewhere in a natural-ish corpus")
  }

  test("x122: semantic near-dup pairs never straddle splits; every vector is assigned") {
    val split = Similarity.semanticSafeSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val nVecs = Tables.t(spark, sf, "embeddings").count()
    assert(split.size == nVecs, "every embedding must receive a split")
    assert(split.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // THE leakage property on whatever pairs the corpus holds: both
    // endpoints of every x09 cosine pair share cluster AND split.
    Similarity.embeddingNearDupsLsh(spark, sf, Similarity.SemanticDedupThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).foreach { case (a, b) =>
        assert(split(a) == split(b),
          s"pair ($a, $b) straddles clusters/splits: ${split(a)} vs ${split(b)}")
      }
    // Same-cluster => same-split globally (cluster key drives the hash).
    split.values.groupBy(_._1).foreach { case (cid, members) =>
      assert(members.map(_._2).toSet.size == 1, s"cluster $cid split apart")
    }
    // The split must not collapse: train holds the bulk.
    val frac = split.values.count(_._2 == "train").toDouble / nVecs
    assert(frac > 0.7, s"train fraction collapsed: $frac")
    // Planted straddle-proof: two colinear vectors (cosine 1.0) MUST
    // share a split whatever their raw ids hash to; the orthogonal
    // third keys its own singleton cluster.
    import spark.implicits._
    val dim = 8
    val planted = Seq(
      (1L, Array.fill(dim)(0.5f).toSeq),
      (2L, Array.fill(dim)(0.25f).toSeq),
      (300L, Array.tabulate(dim)(j => if (j % 2 == 0) 1.0f else -1.0f).toSeq))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ssplit")
    try {
      planted.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val p = Similarity.semanticSafeSplit(spark, dir.toString).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      assert(p(1L)._1 == 1L && p(2L)._1 == 1L,
        s"colinear pair must share the min-id cluster: $p")
      assert(p(1L)._2 == p(2L)._2, s"colinear pair must share a split: $p")
      assert(p(300L)._1 == 300L, s"orthogonal vector stays a singleton: $p")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("x123: holdout perplexity scores eval under the train-only LM with exact Laplace math") {
    import spark.implicits._
    import graft.pipeline.HashConstants.{HashPrime, Knuth}
    def bucket(id: Long): Long = ((id % HashPrime) * Knuth % HashPrime) % 100
    // Pick ids landing in each split by the REAL hash (no special-cased
    // test path), then hand-compute the Laplace score: train "a a b" →
    // LM a:2 b:1, N=3, V=2, denominator 6; eval "a c" → p(a)=3/6,
    // p(c)=1/6 (OOV) → avg = (ln 2 + ln 6)/2 = 1.2425 at 4dp, 1 OOV.
    val trainId = (1L to 2000L).find(bucket(_) < 90).get
    val evalId = (1L to 2000L).find(bucket(_) >= 95).get
    val valId = (1L to 2000L).find(i => bucket(i) >= 90 && bucket(i) < 95).get
    val corpus = Seq(
      (trainId, "a a b"), (evalId, "a c"), (valId, "zz zz zz"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("hperp")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = TextStats.holdoutPerplexity(spark, dir.toString).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(out.keySet == Set(evalId),
        s"only the ≥95 bucket is scored (val bucket must not leak in): $out")
      val want = BigDecimal((math.log(2.0) + math.log(6.0)) / 2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(evalId) == ((2L, 1L, want)), s"hand-computed Laplace score: ${out(evalId)}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    // Corpus: one row per test-bucket doc, scores positive, deterministic.
    val rows = TextStats.holdoutPerplexity(spark, sf).collect()
    val nTest = Tables.t(spark, sf, "documents")
      .filter(expr(s"((doc_id % $HashPrime) * $Knuth % $HashPrime) % 100 >= 95"))
      .count()
    assert(rows.length == nTest, "every held-out doc must be scored")
    rows.foreach(r => assert(r.getDouble(3) > 0, s"NLL must be positive: $r"))
    assert(rows.toSeq == TextStats.holdoutPerplexity(spark, sf).collect().toSeq)
  }

  test("x128: jackknife SE is zero on a constant corpus, recomputes brute force on sf") {
    import spark.implicits._
    // Every doc identical → every leave-one-out mean equals the mean →
    // SE exactly 0 (the integer discipline makes this EXACT, not ~0).
    val flat = (1L to 60L).map(i => (i, "the quick brown fox jumps high"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("jk")
    try {
      flat.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val r = TextStats.qualityJackknife(spark, dir.toString).collect().head
      assert(r.getLong(0) == 60L && r.getLong(3) == 0L,
        s"constant corpus must carry exactly zero jackknife SE: $r")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    // Brute-force law on the real corpus: recompute buckets, bucket
    // sums, leave-one-out means, and the SE from per-doc qualities.
    import graft.pipeline.HashConstants.{HashPrime, Knuth}
    val q = graft.SparkEntry.queries("x01_quality_score")(spark, sf).collect()
      .filter(!_.isNullAt(5))
      .map(r => r.getLong(0) -> math.round(r.getDouble(5) * 10000))
    val byBucket = q.groupBy { case (id, _) => ((id % HashPrime) * Knuth % HashPrime) % 100 }
    val n = q.length.toLong
    val s0 = q.map(_._2).sum
    val thetas = byBucket.values.toSeq
      .map(v => (s0 - v.map(_._2).sum) * 1000000L / (n - v.length))
    val tbar = thetas.sum / thetas.length
    val ssq = thetas.map(t => (t - tbar) * (t - tbar)).sum
    val wantSe = math.round(math.sqrt(
      ((thetas.length - 1) * ssq).toDouble / thetas.length))
    val row = TextStats.qualityJackknife(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == byBucket.size.toLong,
      s"doc/bucket counts: $row")
    assert(row.getLong(2) == s0 * 1000000L / n, s"mean law: $row")
    assert(row.getLong(3) == wantSe, s"SE law: got ${row.getLong(3)} want $wantSe")
    assert(row.getLong(3) > 0, "a mixed corpus has nonzero estimator noise")
  }

  test("multimodal resize recomputes metadata and bounds payloads") {
    val media = Multimodal.fromDocuments(Tables.t(spark, sf, "documents"))
    val resized = Multimodal.resize(media, 8, 8).orderBy("media_id").collect()
    assert(resized.length == 500)
    assert(resized.forall(r => r.getInt(2) == 8 && r.getInt(3) == 8))
    val orig = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    resized.zip(orig).foreach { case (rz, o) =>
      assert(rz.getAs[Array[Byte]](1).length <= o.getInt(1), "resize must not grow payloads")
    }
  }

  test("multimodal frame sampling fans one row out per sampled frame") {
    val media = Multimodal.fromDocuments(Tables.t(spark, sf, "documents"))
    val frames = Multimodal.frameSample(media, stride = 2)
    val perDoc = frames.groupBy("media_id").count().orderBy("media_id").collect()
    assert(perDoc.length == 500)
    assert(frames.select("frame_idx").distinct().collect()
      .forall(_.getInt(0) % 2 == 0), "only every stride-th frame sampled")
  }

  test("x136: LSH cost profile matches an independent bucket-size fold and is monotone") {
    val emb = Tables.t(spark, sf, "embeddings")
    val rows = Similarity.lshCostProfileOn(emb, Similarity.LshCostCaps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == Similarity.LshCostCaps, "one row per cap, ascending")
    // Independent fold: bucket sizes -> Σ C(n,2) and the capped sums,
    // computed in plain Scala from the same bucket table the candidate
    // join reads (different aggregation path than the registered query).
    val sizes = Similarity.lshCandidateBucketSizes(emb).collect().map(_.getLong(0))
    def c2(n: Long) = n * (n - 1) / 2
    val exact = sizes.map(c2).sum
    rows.foreach { case (cap, clipped, maxB, candExact, candCapped, savedBp) =>
      assert(candExact == exact, s"cap $cap: exact mass $candExact != fold $exact")
      assert(maxB == sizes.max, s"cap $cap: max bucket")
      assert(clipped == sizes.count(_ > cap).toLong, s"cap $cap: clipped count")
      assert(candCapped == sizes.map(n => c2(math.min(n, cap))).sum, s"cap $cap: capped mass")
      assert(savedBp == (if (exact == 0) 0L else (exact - candCapped) * 10000 / exact))
    }
    // Monotone: a larger cap keeps at least as much candidate mass.
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._5 <= hi._5, s"cand_capped must be nondecreasing: $lo vs $hi")
      assert(lo._6 >= hi._6, s"saved_bp must be nonincreasing: $lo vs $hi")
    }
    // A cap at/above the largest bucket clips nothing and saves nothing.
    rows.filter(r => r._1 >= rows.head._3).foreach { r =>
      assert(r._2 == 0L && r._4 == r._5 && r._6 == 0L,
        s"cap ${r._1} >= max bucket ${r._3} must be a no-op: $r")
    }
  }

  test("LSH near-dup pairs are a subset of exact all-pairs with identical cosines") {
    val lsh = Similarity.embeddingNearDupsLsh(spark, sf, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val allPairs = Similarity
      .embeddingNearDupsAllPairs(Tables.t(spark, sf, "embeddings"), threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.nonEmpty, "bucketed path should surface some near-dups")
    lsh.foreach { case (pair, cos) =>
      assert(allPairs.get(pair).contains(cos),
        s"LSH pair $pair cosine $cos must match the exact all-pairs oracle")
    }
    val recall = lsh.size.toDouble / allPairs.size
    assert(recall > 0.05, s"LSH recall $recall collapsed (${lsh.size}/${allPairs.size})")
  }

  test("df cap keeps posting-list candidates ~linear on a stopword-heavy corpus") {
    import spark.implicits._
    val n = 120
    val stop = "the and of to in a for with on is"
    val corpus = ((1 to n).map(i => (i.toLong, s"$stop unique${i}a unique${i}b unique${i}c")) ++
      Seq((1000L, "rareterm alpha beta gamma delta"),
          (1001L, "rareterm alpha beta gamma epsilon"))).toDF("doc_id", "text")
    // Every doc shares the 10 stopwords: uncapped, the posting self-join
    // would emit ≥ n(n-1)/2 ≈ 7k candidate pairs from those keys alone.
    // The cap (df² ≤ 64·122 → df ≤ 88 < 122) drops them → linear candidates.
    val tok = Dedup.cappedPostings(corpus,
      array_distinct(split(col("text"), " ")), "tok", Dedup.DfCapC)
    val candidates = tok.as("a").join(tok.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    assert(candidates <= 4L * (n + 2), s"candidate pairs $candidates blew past linear")
    // Rare-token signal survives the cap: the planted near-dup still pairs.
    val pairs = Dedup.jaccardPairsOn(corpus, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1000L, 1001L)), s"expected only the planted pair, got $pairs")
    // Same planted pair through the char-3-gram form.
    val gpairs = Dedup.ngramJaccardPairsOn(corpus, n = 3, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gpairs.contains((1000L, 1001L)), s"n-gram form lost the planted pair: $gpairs")
  }

  /** Brute-force all-pairs Jaccard ≥ t with exact scores — the truth set
    * the prefix filter's LOSSLESS claim is checked against. */
  private def bruteForcePairs(base: org.apache.spark.sql.DataFrame,
      t: Double): Map[(Long, Long), Double] = {
    graft.functions.GraftFunctions.register(spark)
    val sets = base.select(col("doc_id"),
      array_sort(array_distinct(split(col("text"), " "))).as("keys"))
    sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        call_function("set_jaccard", col("a.keys"), col("b.keys")).as("j"))
      .filter(col("j") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  test("prefix filter prunes >=50% of candidates at t=0.8 and loses no pair") {
    import spark.implicits._
    val n = 120
    val stop = "the and of to in a for with on is"
    // Every doc: the 10 stopwords + 10 doc-unique tokens (20 keys). The
    // planted near-dup clones swap ONE unique token: J = 19/21 ≈ 0.905.
    def uniques(tag: String) = (1 to 10).map(j => s"u${tag}_$j").mkString(" ")
    val corpus = ((1 to n).map(i => (i.toLong, s"$stop ${uniques(i.toString)}")) ++
      Seq((2001L, s"$stop ${uniques("a")}"),
          (2002L, s"$stop ${uniques("a").replace("ua_10", "swapped")}"),
          (2003L, s"$stop ${uniques("b")}"),
          (2004L, s"$stop ${uniques("b").replace("ub_10", "other")}")))
      .toDF("doc_id", "text")
    val key = array_distinct(split(col("text"), " "))
    // Baseline: the UNFILTERED posting self-join — the shared stopwords
    // make every doc pair a candidate, ~n²/2.
    val tok0 = corpus.select(col("doc_id"), explode(key).as("tok"))
    val uncapped = tok0.as("a").join(tok0.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    assert(uncapped > 7000, s"fixture lost its density: $uncapped candidates")
    // Prefix postings at t=0.8 keep the 5 globally-rarest keys per doc —
    // the doc-unique tokens — so stopword collisions vanish.
    val pre = Dedup.prefixPostings(corpus, key, "tok", 0.8)
    val prefCands = pre.as("a").join(pre.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    assert(prefCands <= uncapped / 2,
      s"prefix filter pruned ${uncapped - prefCands} of $uncapped — below the 50% bar")
    // Lossless: the full pipeline equals brute-force all-pairs truth.
    val got = Dedup.jaccardPairsPrefixOn(corpus, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val truth = bruteForcePairs(corpus, 0.8)
      .map { case (p, j) => p -> math.rint(j * 10000) / 10000 }
    assert(truth.keySet == Set((2001L, 2002L), (2003L, 2004L)),
      s"fixture should plant exactly two strict near-dup pairs, got ${truth.keySet}")
    assert(got == truth, s"prefix path diverged from brute force: $got vs $truth")
    // The adaptive dispatch routes high thresholds through the prefix path.
    val adaptive = Dedup.nearDupPairsOn(corpus, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(adaptive == truth.keySet)
  }

  test("prefix filter is lossless on the dense corpus where the df cap is not") {
    // At 500 docs the synthetic documents table is vocabulary-dense: most
    // tokens have df > 8·√n, so the df cap drops nearly every posting and
    // with it nearly every true high-threshold pair — the measured
    // motivation for routing t ≥ 0.5 through the prefix filter instead.
    val dense = Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val truth = bruteForcePairs(dense, 0.8)
    val viaPrefix = Dedup.jaccardPairsPrefixOn(dense, 0.8).count()
    val viaCap = Dedup.jaccardPairsOn(dense, 0.8).count()
    assert(truth.size > 10000, s"density assumption broke: ${truth.size} true pairs")
    assert(viaPrefix == truth.size,
      s"prefix path found $viaPrefix of ${truth.size} true pairs")
    assert(viaCap < truth.size / 10,
      s"df cap unexpectedly kept $viaCap of ${truth.size} — contrast test is stale")
  }

  test("prefix filter losslessness holds over random corpora and thresholds") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812)
    // Small vocabularies force heavy token sharing → dense true-pair sets
    // that stress the prefix certificate; varied doc lengths stress the
    // ⌈t·n⌉ integer arithmetic across many n.
    for (trial <- 1 to 5) {
      val vocab = (1 to 12 + rnd.nextInt(10)).map(i => s"v$i")
      val corpus = (1 to 60).map { i =>
        val n = 3 + rnd.nextInt(18)
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val t = Seq(0.5, 0.6, 0.75, 0.8, 1.0)(rnd.nextInt(5))
      val got = Dedup.jaccardPairsPrefixOn(corpus, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = bruteForcePairs(corpus, t).keySet
      assert(got == want,
        s"trial $trial t=$t: prefix ${got.size} pairs vs brute ${want.size}; " +
          s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("containment join finds the subset pair symmetric Jaccard misses") {
    import spark.implicits._
    val small = (1 to 10).map(i => s"quote_$i").mkString(" ")
    val big = ((1 to 10).map(i => s"quote_$i") ++ (1 to 90).map(i => s"body_$i")).mkString(" ")
    val corpus = (Seq((1L, small), (2L, big)) ++
      (10 to 40).map(i => (i.toLong, (1 to 15).map(j => s"u${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
    // Jaccard(1, 2) = 10/100 = 0.1 — invisible to the near-dup join even
    // at low thresholds once its length filter runs. Containment(1→2) = 1.0.
    val cont = Dedup.containmentPairsOn(corpus, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cont == Map((1L, 2L) -> 1.0),
      s"expected exactly the planted quote-inclusion pair: $cont")
    // Randomized losslessness vs brute force (directional, raw-integer
    // threshold arithmetic exercised across many (t, n)).
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val vocab = (1 to 15).map(i => s"v$i")
      val c2 = (1 to 40).map { i =>
        (i.toLong, Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val t = Seq(0.7, 0.85, 1.0)(rnd.nextInt(3))
      val got = Dedup.containmentPairsOn(c2, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.functions.GraftFunctions.register(spark)
      val sets = c2.select(col("doc_id"),
        array_sort(array_distinct(split(col("text"), " "))).as("k"))
      val want = sets.as("a").crossJoin(sets.as("b"))
        .filter(col("a.doc_id") =!= col("b.doc_id") &&
          lit(10000) * call_function("set_overlap", col("a.k"), col("b.k")) >=
            lit(math.round(t * 10000)) * size(col("a.k")))
        .select(col("a.doc_id"), col("b.doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"trial $trial t=$t: ${got.size} vs brute ${want.size}")
    }
  }

  test("x141b dispatch: both containment branches are bit-equal; the decision reads the profile") {
    import spark.implicits._
    // Mixed corpus: a hot token ("common") crowding many docs plus a
    // planted full-containment pair on rare tokens — exercises the
    // salted branch's hot/cold split AND its salted join output.
    val rnd = new scala.util.Random(11)
    val small = (1 to 8).map(i => s"rare_$i").mkString(" ")
    val big = ((1 to 8).map(i => s"rare_$i") ++ (1 to 40).map(i => s"fill_$i")).mkString(" ")
    val corpus = (Seq((1L, small), (2L, big)) ++ (10 to 80).map { i =>
      (i.toLong, ("common " + Seq.fill(6)(s"w${rnd.nextInt(20)}").mkString(" ")))
    }).toDF("doc_id", "text")
    for (t <- Seq(0.7, 0.9)) {
      val direct = Dedup.containmentPairsOn(corpus, t).collect().toSeq
      // Force real salting with a hot threshold the "common" crowd (and
      // most fill tokens) exceed — the test seam pins the salted-join
      // LOGIC; production engages past X29HotTokenDf.
      val salted = Dedup.containmentPairsSaltedOn(corpus, t, hotDf = 1L)
        .collect().toSeq
      assert(direct == salted,
        s"t=$t: dispatch branches must be bit-equal (${direct.size} vs ${salted.size})")
      // Degenerate seams: everything hot and nothing hot both still
      // equal the direct branch.
      assert(Dedup.containmentPairsSaltedOn(corpus, t, hotDf = 0L)
        .collect().toSeq == direct, s"t=$t all-hot")
    }
    // The registered decision line carries the profile mass and the
    // branch actually taken; on every shipped corpus the mass sits
    // under budget -> the direct prefix branch.
    val row = Dedup.containmentDispatchQuery(spark, sf).collect().head
    assert(row.getAs[Long]("budget_rows") == Dedup.X29JoinRowBudget)
    assert(row.getAs[String]("path") == "prefix",
      s"test-scale mass must sit under the 10M budget: $row")
    assert(row.getAs[Long]("join_rows") < Dedup.X29JoinRowBudget)
    // And the dispatch itself equals the direct branch on that corpus.
    val base = graft.Tables.t(spark, sf, "documents").filter(col("doc_id") % 17 === 0)
    assert(Dedup.containmentPairsDispatched(base, 0.9).collect().toSeq ==
      Dedup.containmentPairsOn(base, 0.9).collect().toSeq)
  }

  test("prefix length uses exact integer arithmetic (ceil(0.8*25) trap)") {
    import spark.implicits._
    // 25 distinct tokens at t=0.8: prefix must be 25 - ceil(20) + 1 = 6.
    // Double arithmetic computes ceil(0.8*25) = ceil(20.000000000000004)
    // = 21 and would emit 5 — one lost certificate key per such doc.
    val one = Seq((1L, (1 to 25).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val kept = Dedup.prefixPostings(one,
      array_distinct(split(col("text"), " ")), "tok", 0.8).count()
    assert(kept == 6, s"expected prefix of 6 keys for n=25, t=0.8; got $kept")
  }

  test("incremental dedup drops only new docs matching the reference corpus") {
    import spark.implicits._
    def uniq(tag: String) = (1 to 20).map(j => s"w${tag}_$j").mkString(" ")
    val ref = Seq(
      (1L, uniq("a")), (2L, uniq("b")), (3L, uniq("c"))).toDF("doc_id", "text")
    val newDocs = Seq(
      (10L, uniq("a")),                                   // exact dup of ref 1
      (11L, uniq("b").replace("wb_20", "changed")),       // near-dup of ref 2 (J=19/21)
      (12L, uniq("x")),                                   // genuinely new
      (13L, uniq("x")),                                   // exact dup of 12 — but NEW-new
      (14L, uniq("y"))).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(newDocs, ref, 0.8)
      .collect().map(_.getLong(0)).toSet
    // Asymmetric: drops vs the reference only; new-vs-new duplicates
    // (12, 13) both survive — that is the self-join's job, not this op's.
    assert(out == Set(12L, 13L, 14L),
      s"expected exact+near ref matches dropped, new-new kept: $out")

    // doc_id COLLISION between the two sides (independent id spaces):
    // new doc 1 is unrelated to ref doc 1 and must survive — the union
    // re-keying keeps the colliding pair's tokens in separate prefix
    // windows and the sides disjoint; keying by raw doc_id made the doc
    // its own "duplicate".
    val collidingNew = Seq((1L, uniq("p")), (2L, uniq("b"))).toDF("doc_id", "text")
    val out2 = Dedup.incrementalDedup(collidingNew, ref, 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(out2 == Set(1L),
      s"colliding-id doc must survive, near-dup of ref 2 must not: $out2")

    // NEGATIVE ids (hash-derived keys): Java % would put them on neither
    // prefix side and let their near-dups through silently.
    val negRef = Seq((-3L, uniq("a"))).toDF("doc_id", "text")
    val negNew = Seq((-7L, uniq("a").replace("ua_10", "tweak")), (8L, uniq("z")))
      .toDF("doc_id", "text")
    val out3 = Dedup.incrementalDedup(negNew, negRef, 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(out3 == Set(8L),
      s"near-dup of a negative-id ref doc must be dropped: $out3")
  }

  test("x114: zipf head is rank-consistent, share-exact, and exponents recompute") {
    val rows = TextStats.zipfRankFrequency(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    // The sf0.001 synthetic vocabulary has fewer types than the head
    // width, so the head is min(K, |vocab|) rows.
    val vocab = Tables.t(spark, sf, "documents")
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("t"))
      .distinct().count()
    val expectLen = math.min(TextStats.ZipfTopK.toLong, vocab)
    assert(rows.length.toLong == expectLen, s"${rows.length} vs $expectLen")
    assert(rows.map(_._1).toSeq == (1L to expectLen).toSeq)
    // Counts non-increasing down the ranks; rank 1 has no exponent.
    rows.sliding(2).foreach { case Array((_, _, c1, _, _), (r, _, c2, _, _)) =>
      assert(c2 <= c1, s"counts must fall with rank at $r")
    }
    assert(rows.head._5.isEmpty && rows.tail.forall(_._5.nonEmpty))
    // Independent recomputation of shares and local exponents.
    val total = Tables.t(spark, sf, "documents")
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("t"))
      .count()
    rows.foreach { case (rank, _, cnt, ppm, sOpt) =>
      assert(ppm == cnt * 1000000L / total, s"share law at $rank")
      sOpt.foreach { s0 =>
        val pc = rows(rank.toInt - 2)._3
        val expect = BigDecimal((math.log(pc.toDouble) - math.log(cnt.toDouble)) /
          (math.log(rank.toDouble) - math.log((rank - 1).toDouble)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(s0 - expect) < 1.5e-4, s"exponent at $rank: $s0 vs $expect")
        assert(s0 >= 0.0, s"frequency must not rise with rank at $rank")
      }
    }
  }

  test("x113: vocabulary growth is cumulative, sublinear, and anchors to the corpus") {
    val rows = TextStats.heapsVocabGrowth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(rows.map(_._1).toSeq == (1000L to 10000L by 1000L).toSeq)
    // Nested prefixes: all three cumulative series are nondecreasing.
    rows.sliding(2).foreach { case Array((_, d1, n1, v1, _), (f, d2, n2, v2, _)) =>
      assert(d2 >= d1 && n2 >= n1 && v2 >= v1, s"cumulative law broke at $f")
    }
    // The 100% prefix IS the corpus: doc count, token mass, and the
    // global distinct-type count all anchor exactly.
    val docsDf = Tables.t(spark, sf, "documents")
    val last = rows.last
    assert(last._2 == docsDf.count(), "doc anchor")
    val vGlobal = docsDf
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("t"))
      .distinct().count()
    assert(last._4 == vGlobal, s"type anchor: ${last._4} vs $vGlobal")
    // Heaps' law signature: vocabulary grows SUBLINEARLY — every local
    // exponent sits in [0, 1). The synthetic corpus saturates its small
    // vocabulary early, so later exponents legitimately read 0.0; on a
    // natural corpus they would sit strictly inside (0, 1).
    rows.flatMap(_._5).foreach { b =>
      assert(b >= 0.0 && b < 1.0, s"local Heaps exponent $b out of [0,1)")
    }
  }

  test("x110: the quality sweep is monotone and anchors to the x01 score") {
    val sweep = TextStats.qualitySweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(sweep.map(_._1).toSeq == (0L to 10000L by 500L).toSeq)
    // Raising the floor can only shrink the kept set and its mass,
    // and can only raise (or hold) the survivors' mean quality.
    sweep.sliding(2).foreach { case Array((_, n1, m1, q1), (t, n2, m2, q2)) =>
      assert(n2 <= n1 && m2 <= m1, s"kept-set monotonicity broke at $t")
      (q1, q2) match {
        case (Some(a), Some(b)) => assert(b >= a, s"mean quality fell at $t")
        case _ => ()
      }
    }
    // Anchor: the t=0 row is the whole scored corpus — cross-checked
    // against the registered x01 output.
    val x01 = TextStats.qualityScore(spark, sf).collect()
      .filter(!_.isNullAt(5))
    val qbps = x01.map(r => math.round(r.getDouble(5) * 10000))
    val (_, n0, _, q0) = sweep.head
    assert(n0 == qbps.length, s"doc anchor: $n0 vs ${qbps.length}")
    assert(q0.contains(qbps.sum / qbps.length), "mean anchor")
    sweep.foreach { case (t, n, _, q) =>
      if (n == 0) assert(q.isEmpty, s"empty cell at $t must have NULL mean")
      else assert(q.exists(_ >= t), s"survivor mean below the floor at $t")
    }
  }

  test("x109: the S-curve table matches closed-form math and orders correctly") {
    val rows = Dedup.lshBandingPlanner(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.length == 45, "9 similarities x 5 factorizations")
    // Closed form recomputed independently (math.pow is fine here —
    // the assertion tolerates the last-ulp difference the engine's
    // repeated squaring avoids).
    rows.foreach { case (sBp, r, b, p, reg) =>
      assert(r * b == 16, s"factorization law at $sBp/$r")
      val expect = 1.0 - math.pow(1.0 - math.pow(sBp / 10000.0, r.toDouble),
        b.toDouble)
      assert(math.abs(p - expect) < 5e-4, s"($sBp,$r): $p vs $expect")
      assert(reg == (r == 4L), s"registered flag at $sBp/$r")
    }
    // The defining S-curve property: at fixed s, more rows per band
    // pushes collisions DOWN (curve moves right); at fixed (r, b),
    // p is nondecreasing in s.
    rows.groupBy(_._1).foreach { case (s0, g) =>
      val byR = g.sortBy(_._2).map(_._4)
      assert(byR.toSeq == byR.sortBy(-_).toSeq, s"p must fall with r at $s0")
    }
    rows.groupBy(_._2).foreach { case (r0, g) =>
      val byS = g.sortBy(_._1).map(_._4)
      assert(byS.toSeq == byS.sorted.toSeq, s"p must rise with s at r=$r0")
    }
  }

  test("x105: the threshold sweep is monotone and anchors to x11's own pairs") {
    val sweep = Dedup.dedupThresholdSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sweep.map(_._1).toSeq == (1500L to 10000L by 500L).toSeq,
      "one row per grid threshold, zero-count rows included")
    // Tightening the threshold can only shrink the surviving set.
    sweep.sliding(2).foreach { case Array((_, p1, d1), (t, p2, d2)) =>
      assert(p2 <= p1 && d2 <= d1, s"monotonicity broke at $t")
    }
    // The sweep's loosest point IS x11's registered pair set: same
    // floor (0.15 = 1500 bp), same verified frame, so the counts must
    // agree exactly — the single-sourcing check.
    val x11Pairs = Dedup.ngramJaccardPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (_, p0, d0) = sweep.head
    assert(p0 == x11Pairs.length, s"pair anchor: $p0 vs ${x11Pairs.length}")
    assert(d0 == x11Pairs.flatMap(p => Seq(p._1, p._2)).distinct.length,
      "docs-touched anchor")
    // Docs touched are bounded by 2 pairs (and at least a pair's worth).
    sweep.foreach { case (t, p, d) =>
      if (p > 0) assert(d >= 2 && d <= 2 * p, s"doc bound at $t: $p pairs, $d docs")
      else assert(d == 0, s"zero pairs must touch zero docs at $t")
    }
  }

  test("x107: constraint verdicts flip on planted duplicate ids, nulls, and drift") {
    import spark.implicits._
    // clean: 3 perfect rows. dirty: duplicate doc_id, a NULL text, and
    // an n_chars that disagrees with length(text).
    val corpus = Seq(
      (1L, "good text", "en", "clean", 9L),
      (2L, "more text", "en", "clean", 9L),
      (3L, "also fine", "de", "clean", 9L),
      (10L, "dup id row", "en", "dirty", 10L),
      (10L, "dup id row", "en", "dirty", 10L),
      (11L, null.asInstanceOf[String], "en", "dirty", 0L),
      (12L, "drifted", "fr", "dirty", 99L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("dq")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = Report.qualityVerification(spark, dir.toString).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(8), r.getBoolean(9), r.getBoolean(10),
          r.getBoolean(11), r.getBoolean(12))).toMap
      val clean = rows("clean")
      assert(clean == ((3L, 3L, 0L, 10000L, 0L, true, true, true, true)),
        s"clean: $clean")
      val dirty = rows("dirty")
      // 4 rows, 3 distinct ids, 1 null text (completeness 7500 bp),
      // drift rows: the NULL-text row (length NULL vs n_chars 0 -> the
      // -1 sentinel catches it) and the 99-vs-7 row.
      assert(dirty == ((4L, 3L, 1L, 7500L, 2L, false, false, false, false)),
        s"dirty: $dirty")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("x100: line votes find the majority language and score mixed pages' purity") {
    import spark.implicits._
    // multiLineDocs splits the body at " a " and adds a src header and
    // lang footer. Doc 1's body lines are data-flavored; doc 2 mixes
    // data lines with query lines so purity < 10000.
    val corpus = Seq(
      (1L, "data row table a data table row a row data", "en", "s1"),
      (2L, "data row table a query scan join a query join scan a table data row", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("llv")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = TextStats.lineLangVote(spark, dir.toString).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3),
          r.getLong(4), r.getLong(5))).toMap
      // Doc 1: 5 lines = header + 3 data-ish body lines + footer.
      // Header/footer score 0-0-0 -> 'en' by tie rule; body -> datalang.
      assert(rows(1L) == ((5L, 2L, "datalang", 3L, 6000L)), s"doc1: ${rows(1L)}")
      // Doc 2: 6 lines; 2 datalang + 2 querylang + 2 'en' (header+footer).
      // Tie at 2 votes breaks on pred asc -> datalang, purity 3333.
      assert(rows(2L) == ((6L, 3L, "datalang", 2L, 3333L)), s"doc2: ${rows(2L)}")
      rows.values.foreach { case (nl, _, _, v, p) =>
        assert(p == v * 10000 / nl, "purity law")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("x108: hand-computed Flesch scores; easy prose outranks dense jargon") {
    import spark.implicits._
    val easy = "The cat sat on the mat. It was fat. It sat all day."
    val dense = "Organizational prioritization necessitates comprehensive interdepartmental collaboration"
    val corpus = Seq((1L, easy), (2L, dense)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("flesch")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = TextStats.fleschReadability(spark, dir.toString).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(5))).toMap
      // Independent recomputation with the same integer formula.
      def recompute(text: String): (Long, Long, Long, Long) = {
        val w = text.split(" ").length.toLong
        val s = math.max(1L, text.count(c => ".!?".contains(c)).toLong)
        val runs = "[aeiouAEIOU]+".r.findAllIn(text).length.toLong
        val novowel = text.split(" ").count(t => !t.exists(c => "aeiouAEIOU".contains(c))).toLong
        val y = runs + novowel
        (w, s, y, 206835L - (1015L * w) / s - (84600L * y) / w)
      }
      Seq(1L -> easy, 2L -> dense).foreach { case (id, text) =>
        val (w, s, y, fre) = recompute(text)
        val got = rows(id)
        assert((got._1, got._2, got._3, got._4) == ((w, s, y, fre)),
          s"doc $id: $got vs ($w,$s,$y,$fre)")
      }
      // Short monosyllabic sentences score far above polysyllabic
      // jargon, and the published bands separate them.
      assert(rows(1L)._4 > rows(2L)._4 + 50000,
        s"easy ${rows(1L)._4} vs dense ${rows(2L)._4}")
      assert(rows(1L)._5 == "very_easy" && rows(2L)._5 == "very_difficult",
        s"bands: ${rows(1L)._5} / ${rows(2L)._5}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("x99: char entropy separates repetition floods from fluent text; exact integers") {
    import spark.implicits._
    val fluent = "The quick brown fox jumps over the lazy dog while birds sing in the morning light."
    val corpus = Seq(
      (1L, "a" * 80),          // one-char flood: entropy 0, long -> dropped
      (2L, fluent),            // natural text: ~2.8 nats -> kept
      (3L, "hi"),              // short-doc exemption: kept despite low H
      (4L, ""),                // empty: NULL entropy, never kept
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("cent")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = TextStats.charEntropy(spark, dir.toString).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toMap
      // Independent recomputation with the same integer-term formula.
      def h(text: String): Long = {
        val len = text.length
        text.distinct.map { c =>
          val cnt = text.count(_ == c)
          math.round(1000000.0 * (cnt.toDouble / len) *
            math.log(len.toDouble / cnt))
        }.sum
      }
      assert(rows(1L) == ((80L, 1L, Some(0L), false)), s"flood: ${rows(1L)}")
      assert(rows(2L) == ((fluent.length.toLong, fluent.distinct.length.toLong,
        Some(h(fluent)), true)), s"fluent: ${rows(2L)} vs ${h(fluent)}")
      assert(h(fluent) > TextStats.MinCharEntropyUnats,
        "natural English must clear the 2-nat bar")
      // "hi": two chars, each term round(1e6 * 0.5 * ln 2) = 346574.
      assert(rows(3L) == ((2L, 2L, Some(693148L), true)), s"short: ${rows(3L)}")
      assert(rows(4L) == ((0L, 0L, None, false)), s"empty: ${rows(4L)}")
      assert(rows(5L) == ((0L, 0L, None, false)), s"null: ${rows(5L)}")
      // The streaming gate predicate admits exactly x99's keep set —
      // the single-sourcing contract for the ingest edge.
      val gateKept = corpus.filter(TextStats.charEntropyKeepColumn)
        .collect().map(_.getLong(0)).toSet
      assert(gateKept == rows.filter(_._2._4).keySet,
        s"gate membership must equal the registered keep column: $gateKept")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("unigram logprob ranks rare-token docs above boilerplate") {
    import spark.implicits._
    val corpus = ((1 to 50).map(i => (i.toLong, "common words appear here")) ++
      Seq((100L, "rarex rarey rarez"))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ulp")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = TextStats.unigramLogprob(spark, dir.toString).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(out(100L) > out(1L),
        s"rare tokens must score more surprising than boilerplate: $out")
      // All boilerplate docs share one score (same tokens, same LM).
      assert((1 to 50).map(i => out(i.toLong)).distinct.size == 1)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("bigram logprob: word order matters; short docs score NULL, rows preserved") {
    import spark.implicits._
    // 50 copies of a fluent phrase train the bigram LM; doc 100 uses the
    // SAME unigrams shuffled, so x28 cannot tell them apart but the
    // bigram score must rank the shuffle as more surprising. Doc 200 has
    // one token (no bigrams): NULL score, row preserved.
    val corpus = ((1 to 50).map(i => (i.toLong, "the quick brown fox jumps")) ++
      Seq((100L, "fox the jumps quick brown"), (200L, "solo"))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("blp")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = TextStats.bigramLogprob(spark, dir.toString).collect()
      val out = rows.map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      assert(out(100L).get > out(1L).get,
        s"shuffled word order must score more surprising than fluent: $out")
      assert(out(200L).isEmpty, s"a 1-token doc has no bigrams: $out")
      assert(rows.length == 52, "every corpus row keeps a stats row")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("x96: Kneser–Ney — continuation count, not raw frequency, sets the backoff") {
    import spark.implicits._
    // v and z follow u equally often (c(uv) = c(uz) = 10, same context
    // marginal), but z also appears after 8 OTHER distinct contexts while
    // v only ever follows u. KN's continuation probability N+(·z)/B >
    // N+(·v)/B must make "u z" score LESS surprising than "u v" — raw
    // bigram MLE (x38's first term) cannot tell them apart. Hand-computed:
    // B = 10 types; P(v|u) = 9.25/20 + (0.75·2/20)(1/10) = 0.47
    //              P(z|u) = 9.25/20 + (0.75·2/20)(9/10) = 0.53
    val corpus = ((1 to 10).map(i => (i.toLong, "u v")) ++
      (11 to 20).map(i => (i.toLong, "u z")) ++
      (21 to 28).map(i => (i.toLong, s"w$i z")) ++
      Seq((99L, "solo"))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("kn")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = TextStats.knBigramLogprob(spark, dir.toString).collect()
      val out = rows.map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      assert(math.abs(out(1L).get - (-math.log(0.47))) < 1.5e-4, s"P(v|u): $out")
      assert(math.abs(out(11L).get - (-math.log(0.53))) < 1.5e-4, s"P(z|u): $out")
      assert(out(1L).get > out(11L).get,
        s"the novel-continuation word must score more surprising: $out")
      assert(out(99L).isEmpty && rows.length == 29,
        "a 1-token doc has no bigrams; every corpus row keeps a stats row")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("x97: density sampling thins the dense cluster, keeps sparse regions whole") {
    import spark.implicits._
    // 40 identical vectors form one dense LSH cell; 8 distinct basis-like
    // vectors sit alone. Density must separate the two regimes, sparse
    // vectors must ALWAYS be kept (keep probability 1 when every bucket
    // is a singleton), and the inverse-propensity weight must be exact.
    val dim = 8
    val dense = (1 to 40).map(i =>
      (i.toLong, Array.fill(dim)(0.5f).toSeq, 0))
    val sparse = (101 to 108).map(i =>
      (i.toLong, Array.tabulate(dim)(j => if (j == i - 101) 1.0f else -1.0f).toSeq, 1))
    val dir = java.nio.file.Files.createTempDirectory("dens")
    try {
      (dense ++ sparse).toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val rows = Similarity.densitySample(spark, dir.toString).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      assert(rows.length == 48)
      val byId = rows.map(r => r._1 -> r).toMap
      // Identical vectors share every band bucket: dens >= 40 per band.
      (1L to 40L).foreach { i =>
        assert(byId(i)._2 >= 40L * Similarity.LshBands, s"dense member $i: ${byId(i)}") }
      rows.foreach { case (id, dens, wppm, kept) =>
        assert(dens >= Similarity.LshBands, s"self-count floor: $id")
        assert(wppm == 1000000L * Similarity.LshBands / dens, s"HT weight must be exact: $id")
        if (dens == Similarity.LshBands) assert(kept, s"singleton-bucket vector $id must be kept")
      }
      // The dense cluster thins: strictly fewer than half its members survive.
      val denseKept = (1L to 40L).count(i => byId(i)._4)
      assert(denseKept < 20, s"dense cluster must thin toward uniform coverage: $denseKept/40")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("winnowing: shared long passage yields shared fingerprints; density ~2/(w+1)") {
    import spark.implicits._
    // Two docs share an 8-token passage at DIFFERENT offsets (>= w+k-1 =
    // 6 tokens, so the winnowing guarantee applies: at least one shared
    // fingerprint hash); a third doc shares nothing.
    val passage = "omega psi chi phi upsilon tau sigma rho"
    val corpus = Seq(
      (1L, s"aa1 bb1 cc1 $passage dd1"),
      (2L, s"xx2 $passage yy2 zz2 ww2 vv2"),
      (3L, "totally different content with many plain words here")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fps = TextStats.winnowFingerprints(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = fps.groupBy(_._1).map { case (d, rows) => d -> rows.map(_._3).toSet }
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      s"docs sharing an 8-token passage must share a fingerprint: $byDoc")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty,
      s"unrelated docs must not collide: $byDoc")
    // Density: fingerprints per doc << shingles per doc (w=4 keeps ~2/5).
    val nSh1 = 12 - 3 + 1 // doc 1 tokens=12, k=3
    assert(byDoc(1L).size < nSh1, s"winnowing must select a strict subset: ${byDoc(1L)}")
    // Selected positions must be valid shingle starts carrying the hash
    // that wins their window — spot-check determinism by re-running.
    val again = TextStats.winnowFingerprints(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fps.toSeq == again.toSeq, "fingerprints must be deterministic")
  }

  test("x42c: exact verify confirms true copies and REJECTS scattered-phrase candidates") {
    import spark.implicits._
    // Rejected pair: docs 1/2 share THREE distinct 6-token passages
    // (each >= w+k-1, so each guarantees >= 1 shared fingerprint —
    // n_shared >= 3 makes the pair an x42b candidate) scattered through
    // otherwise-disjoint text: 18 shared tokens of 58 distinct =
    // containment 0.31 < 0.5. Confirmed pair: doc 4 contains doc 3
    // verbatim (containment 1.0).
    val p1 = "alpha beta gamma delta epsilon zeta"
    val p2 = "eta theta iota kappa lambda mu"
    val p3 = "nu xi omicron pi rho sigma"
    def uniq(pfx: String, n: Int) = (1 to n).map(i => s"$pfx$i").mkString(" ")
    val docA = s"${uniq("aq", 10)} $p1 ${uniq("bq", 10)} $p2 ${uniq("cq", 10)} $p3 ${uniq("dq", 10)}"
    val docB = s"${uniq("eq", 10)} $p1 ${uniq("fq", 10)} $p2 ${uniq("gq", 10)} $p3 ${uniq("hq", 10)}"
    val base = (1 to 24).map(i => s"base$i").mkString(" ")
    val corpus = Seq(
      (1L, docA), (2L, docB),
      (3L, base), (4L, s"$base extraa extrab")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("x42c").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cand = TextStats.fingerprintPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cand.get((1L, 2L)).exists(_ >= 3),
      s"scattered-phrase pair must be an x42b candidate (the verify, not " +
        s"candidate generation, must do the rejecting): $cand")
    assert(cand.contains((3L, 4L)), s"true copy pair must be a candidate: $cand")
    val confirmed = TextStats.confirmedCopyPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(!confirmed.contains((1L, 2L)),
      s"candidate with containment < 0.5 must be rejected by the exact verify: $confirmed")
    assert(confirmed.get((3L, 4L)).contains(1.0),
      s"full containment copy must be confirmed at 1.0: $confirmed")
  }

  test("chunk dedup surfaces a passage repeated across docs at chunk granularity") {
    import spark.implicits._
    // A passage long enough to contain a boundary token repeats in three
    // docs with different surroundings; CDC stability means the interior
    // chunk is byte-identical in all three and the manifest reports it.
    def h(tok: String): Long =
      tok.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    val words = (1 to 300).map(i => s"v$i")
    val b = words.filter(h(_) % Curation.BoundaryMod == 0)
    val p = words.filterNot(w => h(w) % Curation.BoundaryMod == 0)
    assert(b.size >= 2, s"need boundary words: $b")
    // passage = boundary + 2 plain + boundary' ... chunk "b0 p0 p1" is
    // fully interior to the passage wherever it appears.
    val passage = Seq(b(0), p(0), p(1), b(1), p(2))
    val corpus = Seq(
      (1L, (Seq(p(10)) ++ passage ++ Seq(p(11))).mkString(" ")),
      (2L, (Seq(p(12), p(13)) ++ passage).mkString(" ")),
      (3L, (passage ++ Seq(p(14))).mkString(" ")),
      (4L, s"${p(20)} ${p(21)} ${p(22)}")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("chdedup").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.chunkDedup(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val interior = s"${b(0)} ${p(0)} ${p(1)}"
    assert(out.contains(interior),
      s"the passage-interior chunk must be flagged as duplicated: $out")
    assert(out(interior) == ((3L, 3L, 1L)),
      s"3 copies in 3 docs, first doc 1: ${out(interior)}")
    // x40c is x40b re-keyed on rolling_hash(chunk_text): same manifest
    // under the hash of each duplicated chunk (no collisions here, so
    // the mapping is a bijection).
    val byHash = Curation.chunkDedupByHash(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byHash == out.map { case (t, v) =>
      t.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L) -> v },
      s"hash-keyed manifest must be x40b re-keyed: $byHash vs $out")
  }

  test("PII redaction replaces URL/email/digit spans, URL-first order absorbs nested PII") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "contact me@example.com or visit https://a.example.com/u?id=1234567 soon"),
      (2L, "account 12345678 pin 999 short 12345"),
      (3L, "nothing to redact here")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("redact")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = Curation.piiRedact(spark, dir.toString).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
      // URL redacted FIRST: the id=1234567 inside it never becomes <DIGITS>,
      // and the standalone email is the only email counted.
      assert(out(1L) == ((1, 1, 0, "contact <EMAIL> or visit <URL> soon")), s"${out(1L)}")
      // Only runs of 6+ digits are PII-shaped; 999 and 12345 survive.
      assert(out(2L) == ((0, 0, 1, "account <DIGITS> pin 999 short 12345")), s"${out(2L)}")
      assert(out(3L) == ((0, 0, 0, "nothing to redact here")), s"${out(3L)}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("quality quantile filter keeps each language's top half, cut by integer rank") {
    import spark.implicits._
    // en: 4 docs with strictly decreasing quality (more stopwords = higher
    // x01 score); de: 3 docs — floor(3/2) = 1 kept, the integer 2·rn ≤ cnt
    // edge (no float median). Digits push quality down.
    val corpus = Seq(
      (1L, "the a of and to in", "en"),       // all stopwords — top
      (2L, "the a of word word word", "en"),
      (3L, "the word word 99 word11", "en"),
      (4L, "111 222 333 words here", "en"),   // digit-heavy — bottom
      (10L, "the a of", "de"),
      (11L, "the word 77", "de"),
      (12L, "000 111", "de")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("qq")
    try {
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val kept = TextStats.qualityQuantileFilter(spark, dir.toString).collect()
        .map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L, 10L),
        s"top half per language (2 of 4 en, 1 of 3 de): $kept")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("semantic dedup keeps one representative per embedding cluster") {
    import spark.implicits._
    // v0 ≈ v1 ≈ v2 (colinear — cosine 1), v7 orthogonal. The cluster
    // keeps min id 0; 1 and 2 are marked drop; the singleton keeps itself.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(2.0f, 0.0f, 0.0f)),
      (2L, Array(0.5f, 0.0f, 0.0f)),
      (7L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("semdedup")
    try {
      emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out = Similarity.semanticDedup(spark, dir.toString, threshold = 0.9).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(out(0L) == ((0L, true)) && out(1L) == ((0L, false)) && out(2L) == ((0L, false)),
        s"colinear trio collapses to representative 0: $out")
      assert(out(7L) == ((7L, true)), s"singleton keeps itself: $out")
      // Exactly one keeper per cluster — the SemDeDup invariant.
      out.toSeq.groupBy(_._2._1).foreach { case (cid, members) =>
        assert(members.count(_._2._2) == 1, s"cluster $cid keepers != 1: $members")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("semantic keep-best: embedding cluster keeps the highest-quality DOC, not min id") {
    import spark.implicits._
    // Embedding cluster {0, 1, 2} (colinear); doc 1 has the best text
    // quality (all stopwords), so it must be the keeper even though 0 is
    // the min id. Doc 7 is an embedding singleton and keeps itself.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(2.0f, 0.0f, 0.0f)),
      (2L, Array(0.5f, 0.0f, 0.0f)),
      (7L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val docsDf = Seq(
      (0L, "word word 99 11"),
      (1L, "the a of and"),       // all stopwords — best quality
      (2L, "word 123 456 789"),
      (7L, "plain words here")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("semkeep")
    try {
      emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      docsDf.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = Similarity.semanticDedupKeepBest(spark, dir.toString, threshold = 0.9)
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
      assert(out(1L) == ((0L, true)), s"best-quality doc 1 must be the keeper: $out")
      assert(out(0L)._2 == false && out(2L)._2 == false,
        s"min-id doc 0 is NOT the keeper when 1 outranks it: $out")
      assert(out(7L) == ((7L, true)), s"singleton keeps itself: $out")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("x47: SemDeDup centroid rule keeps the cluster member FARTHEST from the centroid") {
    import spark.implicits._
    // Cluster {0, 1, 2}: 0 and 1 are colinear (the mode); 2 is rotated
    // toward y but still above the 0.9 pair threshold with both. The
    // centroid leans toward the mode, so 2 has the LOWEST centroid
    // cosine and must be the keeper — the diversity choice, opposite of
    // what a mode-seeking rule would pick. 7 is an orthogonal singleton.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(2.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.4f, 0.0f)),
      (7L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("semdiv")
    try {
      emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out = Similarity.semanticKeepDiverse(spark, dir.toString, threshold = 0.9)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
        .toMap
      assert(out(2L)._1 == 0L && out(2L)._3,
        s"the off-axis member must be kept (diversity rule): $out")
      assert(!out(0L)._3 && !out(1L)._3,
        s"mode members must be dropped: $out")
      assert(out(2L)._2 < out(0L)._2 && out(2L)._2 < out(1L)._2,
        s"keeper must have the lowest centroid cosine: $out")
      assert(out(7L) == ((7L, 1.0, true)), s"singleton is its own centroid: $out")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("semantic decon flags train vectors colinear with an eval vector") {
    import spark.implicits._
    // Eval set = {e0, e1}. t10 is a paraphrase of e0 (colinear — cosine 1
    // despite sharing no "tokens"); t11 is orthogonal to both (clean);
    // t12 is a scaled copy of e1 (cosine 1). Threshold 0.9.
    val evalVecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val train = Seq(
      (10L, Array(3.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 0.0f, 1.0f)),
      (12L, Array(0.0f, 0.5f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecon(train, evalVecs, 0.9).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(out(10L) == ((1.0, true)), s"paraphrase of e0 must flag: $out")
    assert(out(11L)._2 == false && out(11L)._1 < 0.9, s"orthogonal vector is clean: $out")
    assert(out(12L) == ((1.0, true)), s"scaled copy of e1 must flag: $out")
  }

  test("x36b: bucketed tier drops replays/re-encodings, admits fresh vectors, agrees with exact tier") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(1.0f, 0.2f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.3f)),
      (2L, Array(0.4f, 0.4f, 1.0f))).toDF("vec_id", "embedding")
    val batch = Seq(
      (100L, Array(1.0f, 0.2f, 0.0f)), // exact replay of 0: buckets collide bit-exactly
      (101L, Array(0.0f, 2.0f, 0.6f)), // re-encoding (2x scale) of 1: cosine 1.0
      (102L, Array(-1.0f, 0.5f, 0.0f))) // genuinely new
      .toDF("vec_id", "embedding")
    val out = Similarity.incrementalSemanticDedupBucketed(batch, corpus, 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(102L),
      s"replay and re-encoding must drop, the fresh vector must survive: $out")
    val exact = Similarity.incrementalSemanticDedup(batch, corpus, 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(exact == out, s"bucketed tier must agree with the exact tier: $exact vs $out")
    // Dispatch: production cut -> bucketed plan (no corpus-wide
    // BroadcastNestedLoopJoin); below the sound regime -> the exact scan.
    val autoHi = Similarity.incrementalSemanticDedupAuto(batch, corpus, 0.95)
    assert(!autoHi.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "at >= 0.9 the dispatcher must take the bucketed equi-join tier")
    val autoLo = Similarity.incrementalSemanticDedupAuto(batch, corpus, 0.4)
    assert(autoLo.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "below 0.9 the dispatcher must take the exact broadcast scan")
    // Cross-validation on the real corpus at the registered slices: the
    // bucketed decision equals the exact decision at 0.95 (losslessness
    // the x36b oracle certifies at sf0.01; pinned here at sf0.001 too).
    val emb = graft.Tables.t(spark, sf, "embeddings")
    val fresh = emb.filter(col("vec_id") % 5 === 2).select(col("vec_id"), col("embedding"))
    val replayed = emb.filter(col("vec_id") % 5 =!= 2 && col("vec_id") % 7 === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
    val b = fresh.union(replayed)
    val c = emb.filter(col("vec_id") % 5 =!= 2)
    val bucketIds = Similarity.incrementalSemanticDedupBucketed(b, c, 0.95)
      .collect().map(_.getLong(0)).toSet
    val exactIds = Similarity.incrementalSemanticDedup(b, c, 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(bucketIds == exactIds, "bucketed must be lossless at 0.95 on the corpus")
    assert(bucketIds.nonEmpty && bucketIds.forall(_ < 10000000L),
      s"every replay must be dropped, fresh vectors admitted: ${bucketIds.size}")
  }

  test("exact dedup groups identical texts") {
    val d = Dedup.exactDedup _
    import spark.implicits._
    val spark2 = spark
    val res = Dedup.exactDedup(spark, sf).agg(sum("n_dups")).collect()(0).getLong(0)
    assert(res == 500, "every doc accounted for exactly once")
  }

  // ---------------------------------------------------------------- x70
  test("x91: sidecar columns agree doc-by-doc with every home operator") {
    val rows = Report.docAttributes(spark, sf).collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7),
        r.getLong(8), r.getBoolean(9), r.getString(10), r.getLong(11))).toMap
    val docs = Tables.t(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(rows.keySet == docs, "one sidecar row per document, none lost")
    // clf_keep must equal x64's registered keep decision per doc.
    val x64 = Selection.classifierQuality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    rows.foreach { case (id, a) =>
      assert(a._9 == x64(id), s"doc $id: clf_keep drifted from x64")
    }
    // g_pass totals must equal x51's pass_all mass.
    val gopherPass = Selection.gopherRules(spark, sf).collect()
      .count(r => r.getAs[Int]("pass_all") == 1)
    assert(rows.values.count(_._7) == gopherPass, "g_pass vs x51")
    // Per-source sums must reproduce the x70 report exactly.
    val x70 = Report.corpusReport(spark, sf).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    rows.values.groupBy(_._1).foreach { case (src, as) =>
      val (nd, nt, nq, ng, npii, ndup) = x70(src)
      assert(as.size.toLong == nd && as.map(_._4).sum == nt, s"$src mass")
      assert(as.count(_._6).toLong == nq && as.count(_._7).toLong == ng,
        s"$src gate counts")
      assert(as.count(_._8 > 0).toLong == npii, s"$src PII incidence")
      assert(as.count(_._11 > 1).toLong == ndup, s"$src dup mass")
    }
    // Dup group sizes are consistent: every doc sharing a hash shares
    // the size, and the size equals the hash's row count.
    rows.values.groupBy(_._10).foreach { case (h, as) =>
      assert(as.forall(_._11 == as.size), s"hash $h group size")
    }
  }

  test("x92: the ledger verdict is exactly the x91 sidecar folded through the battery") {
    val attrs = Report.docAttributes(spark, sf).collect().map(r =>
      r.getLong(0) -> (r.getBoolean(6), r.getBoolean(7), r.getBoolean(9),
        r.getLong(8), r.getString(10))).toMap
    // Canonical representative per hash = min doc_id (B27's discipline).
    val canon = attrs.toSeq.groupBy(_._2._5)
      .map { case (h, as) => h -> as.map(_._1).min }
    val ledger = Report.mixerLedger(spark, sf).collect()
    assert(ledger.map(_.getLong(0)).toSet == attrs.keySet, "one row per doc")
    ledger.foreach { r =>
      val (id, mask, kept, ff) =
        (r.getLong(0), r.getLong(3), r.getBoolean(4), r.getString(5))
      val (q, g, clf, emails, h) = attrs(id)
      val expect = (if (q) 0L else 1L) + (if (g) 0L else 2L) +
        (if (clf) 0L else 4L) + (if (emails > 0) 8L else 0L) +
        (if (id != canon(h)) 16L else 0L)
      assert(mask == expect, s"doc $id mask")
      assert(kept == (mask == 0L), s"doc $id verdict")
      val expectFf =
        if (mask == 0) "none"
        else Seq(1L -> "quality", 2L -> "gopher", 4L -> "classifier",
          8L -> "pii", 16L -> "duplicate").find(b => (mask & b._1) != 0).get._2
      assert(ff == expectFf, s"doc $id first_fail")
    }
    // The battery must actually discriminate on this corpus: kept docs
    // exist, dropped docs exist, and at least three distinct first-fail
    // reasons fire (quality/gopher/classifier orderings differ per doc).
    val reasons = ledger.map(_.getString(5)).toSet
    assert(reasons.contains("none") && reasons.size >= 4,
      s"battery should discriminate, saw $reasons")
  }

  test("x70: report totals agree with the home operators they summarize") {
    val rep = Report.corpusReport(spark, sf).collect()
    val totals = rep.map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4, a._5 + b._5))
    assert(totals._1 == 500, "every doc counted exactly once across sources")
    val gopherPass = Selection.gopherRules(spark, sf)
      .agg(sum("pass_all")).collect()(0).getLong(0)
    assert(totals._3 == gopherPass, s"gopher column must match x51: ${totals._3} vs $gopherPass")
    val dupMass = Dedup.exactDedup(spark, sf)
      .filter(col("n_dups") > 1).agg(sum("n_dups")).collect()(0)
    val expectedDup = if (dupMass.isNullAt(0)) 0L else dupMass.getLong(0)
    assert(totals._5 == expectedDup,
      s"dup-group membership must match B27's group sizes: ${totals._5} vs $expectedDup")
    // signals must be non-trivial on the real corpus
    assert(totals._2 > 0 && totals._2 < 500, s"quality floor splits: ${totals._2}")
  }

  // ---------------------------------------------------------------- x69
  test("x69: normalization collapses case/punct/space variants raw dedup misses") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "hello world"),      // raw dup of 2
      (4L, "unrelated text"),
      (5L, null.asInstanceOf[String]), // NULL text must not vanish
      (6L, "")).toDF("doc_id", "text")
    val out = Dedup.normalizedDedupOf(corpus).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getLong(3), r.getLong(4))).toMap
    // 1/2/3 share one normalized class of 3; raw groups are 1 and 2
    assert(out(1L) == ((true, 1L, 3L)), s"got $out")
    assert(out(2L) == ((false, 2L, 3L)))
    assert(out(3L) == ((false, 2L, 3L)))
    assert(out(4L) == ((true, 1L, 1L)))
    // NULL and empty text hash as the same empty doc on both keys
    assert(out(5L) == ((true, 2L, 2L)), s"NULL-text doc must keep its row: $out")
    assert(out(6L) == ((false, 2L, 2L)))
    assert(out.size == 6, "one row per input doc")
  }

  test("x69: on the real corpus every doc appears once and keeps are one-per-group") {
    val out = Dedup.normalizedDedup(spark, sf)
    assert(out.count() == 500)
    val perGroup = out.groupBy("norm_hash")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("keeps"),
        count(lit(1)).as("n"), first("n_norm_dups").as("sz"))
      .collect()
    perGroup.foreach { r =>
      assert(r.getLong(1) == 1L, s"exactly one keep per group: $r")
      assert(r.getLong(2) == r.getLong(3), s"group size column consistent: $r")
    }
  }

  test("x78 hard negatives: band-bounded, deduped from positives, top-k per doc") {
    val rows = Similarity.hardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty, "the sf0.001 corpus has same-bucket near-band pairs")
    rows.foreach { case (d, n, c, rk) =>
      assert(d != n, s"a doc can never be its own negative: $d")
      assert(c >= 0.3 && c < Similarity.SemanticDedupThreshold,
        s"($d,$n) cosine $c outside the hard-negative band")
      assert(rk >= 1 && rk <= Similarity.HardNegK, s"rank $rk out of range")
    }
    // Per doc: at most k rows, ranks contiguous from 1, cosines
    // non-increasing with rank.
    rows.groupBy(_._1).foreach { case (d, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length),
        s"doc $d ranks not contiguous: ${sorted.map(_._4).toSeq}")
      assert(sorted.length <= Similarity.HardNegK)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3,
          s"doc $d: rank ${a._4} cosine ${a._3} < rank ${b._4} cosine ${b._3}")
        case _ => ()
      }
    }
    // No positive leaks: nothing returned is a registered near-dup pair.
    val dups = Similarity.embeddingNearDupsLshOn(
      Tables.t(spark, sf, "embeddings"), Similarity.SemanticDedupThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (d, n, _, _) =>
      val key = (math.min(d, n), math.max(d, n))
      assert(!dups.contains(key), s"near-dup pair $key leaked into negatives")
    }
  }

  test("x89 bitext margins: every mined pair is its (src,lang) argmax above threshold") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        graft.pipeline.Ivf.intMillionths(col("embedding")).as("xi"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val lang = Tables.t(spark, sf, "documents").select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Driver-side replica of the whole margin pipeline on the same
    // integer-millionths vectors (quantized by the ENGINE's own expr,
    // so the replica tests the math, not the quantization).
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.foldLeft(0L)((acc, i) => acc + a(i) * b(i))
    val vs = emb.filter(e => lang.contains(e._1))
    val en = vs.filter(e => lang(e._1) == "en")
    val xx = vs.filter(e => lang(e._1) != "en")
    val cand = for { a <- en; b <- xx if a._2 == b._2 }
      yield (a._1, b._1, lang(b._1), dot(a._3, b._3))
    val an = cand.groupBy(c => (c._1, c._3)).map { case (k, cs) =>
      val top = cs.sortBy(c => (-c._4, c._2)).take(Similarity.BitextK)
      k -> (top.map(_._4).sum, top.length.toLong)
    }
    val bn = cand.groupBy(_._2).map { case (k, cs) =>
      val top = cs.sortBy(c => (-c._4, c._1)).take(Similarity.BitextK)
      k -> (top.map(_._4).sum, top.length.toLong)
    }
    val expected = cand.flatMap { case (s0, d0, l0, dt) =>
      val (a, kx) = an((s0, l0)); val (b, ky) = bn(d0)
      val den = a * ky + b * kx
      if (dt > 0 && den > 0)
        Some(((s0, l0), (d0, dt, dt * 2 * kx * ky * 10000L / den)))
      else None
    }.groupBy(_._1).flatMap { case (k, ms) =>
      val best = ms.map(_._2).minBy(m => (-m._3, m._1))
      if (best._3 > Similarity.BitextMarginBp) Some(k -> best) else None
    }
    val rows = Similarity.bitextMarginMining(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty, "the fixture must mine pairs")
    assert(rows.length == expected.size,
      s"mined ${rows.length} pairs, replica says ${expected.size}")
    rows.foreach { case (s0, l0, d0, dt, m) =>
      assert(lang(s0) == "en" && lang(d0) == l0,
        s"($s0,$l0,$d0): language sides violated")
      assert(m > Similarity.BitextMarginBp && dt > 0, s"($s0,$l0): thresholds")
      val (ed, edt, em) = expected((s0, l0))
      assert((d0, dt, m) == (ed, edt, em),
        s"($s0,$l0): engine ($d0,$dt,$m) != replica ($ed,$edt,$em)")
    }
  }

  test("x77 perplexity bins: balanced rank tertiles per language, ordered bands") {
    val rows = TextStats.perplexityBins(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(4),
        r.getDouble(5)))
    val byLang = rows.groupBy(_._1)
    byLang.foreach { case (lang, bins) =>
      val m = bins.map(b => b._2 -> b).toMap
      assert(m.keySet == Set("head", "middle", "tail"),
        s"$lang: all three bands must exist, got ${m.keySet}")
      // Rank tertiles: counts differ by at most 1.
      val counts = bins.map(_._3)
      assert(counts.max - counts.min <= 1,
        s"$lang: rank tertiles must balance, got ${counts.toSeq}")
      // Bands ordered by perplexity (non-strict: a tied score may
      // straddle a rank boundary).
      assert(m("head")._4 <= m("middle")._4 && m("middle")._4 <= m("tail")._4,
        s"$lang: band minima must be non-decreasing: $bins")
      assert(m("head")._5 <= m("middle")._5 && m("middle")._5 <= m("tail")._5,
        s"$lang: band maxima must be non-decreasing: $bins")
    }
    // Coverage: every doc in exactly one band.
    val n = graft.Tables.t(spark, sf, "documents").count()
    assert(rows.map(_._3).sum == n, "bands must partition the corpus")
  }

  test("x133: incremental LM merge equals a full recount (planted and corpus-scale)") {
    import spark.implicits._
    // Planted: old corpus {a a b}, batch {b c} → merged counts a=2,
    // b=2, c=1 — b's count must SUM across the standing table and the
    // batch, c is batch-novel, a is untouched standing mass.
    val old = Seq((2L, "a a b")).toDF("doc_id", "text")
    val batch = Seq((1L, "b c")).toDF("doc_id", "text")
    val oldLm = old.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cf"))
    val merged = TextStats.incrementalUnigramLm(batch, oldLm).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == Map("a" -> 2L, "b" -> 2L, "c" -> 1L), s"planted merge: $merged")
    // Corpus-scale: the registered parity merge equals a full recount.
    val full = graft.Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cf")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inc = SparkEntry.queries("x133_incremental_unigram_lm")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inc == full, "incremental LM must equal the full recount")
  }

  test("x134: drift gate trips on a broken-extractor wave, stays quiet on a same-distribution draw") {
    import spark.implicits._
    // Standing corpus: clean stopword-bearing prose. Broken wave: pure
    // digit strings (quality ~0 — no stopwords, all digits).
    val ref = (1L to 20L).map(i =>
      (i, s"the quick brown fox and the lazy dog number $i are of it"))
      .toDF("doc_id", "text")
    val broken = (100L to 109L).map(i => (i, s"12345 67890 ${i}99 00$i"))
      .toDF("doc_id", "text")
    val tripped = TextStats.ingestDriftGate(broken, ref).collect()(0)
    assert(tripped.getBoolean(6), s"broken wave must trip the alarm: $tripped")
    assert(tripped.getLong(5) < 0,
      s"mean shift must be negative (batch worse than corpus): $tripped")
    assert(tripped.getLong(0) == 10L && tripped.getLong(1) == 20L)
    // A same-distribution draw (the corpus against itself) is the
    // healthy baseline: JSD exactly 0, alarm quiet, mean shift 0.
    val quiet = TextStats.ingestDriftGate(ref, ref).collect()(0)
    assert(quiet.getLong(2) == 0L && !quiet.getBoolean(6) && quiet.getLong(5) == 0L,
      s"self-comparison must be exactly zero: $quiet")
    // Registered baseline on the sf corpus: a parity slice of one
    // distribution must not alarm.
    val corpus = SparkEntry.queries("x134_ingest_drift_gate")(spark, sf).collect()(0)
    assert(!corpus.getBoolean(6), s"same-distribution slice must stay quiet: $corpus")
    assert(corpus.getLong(2) >= 0L, "JSD is non-negative")
  }

  test("x131: the reference-side bucket cap is a DISCLOSED recall trade, pinned") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    // A degenerate reference crowd: > PhashBucketCap items with the
    // IDENTICAL hash. The cap skips those buckets, so an arriving
    // duplicate of the crowd is ADMITTED — the disclosed trade (a flat-
    // image flood must not quadratically inflate every wave). This pin
    // prevents the trade from silently becoming a different semantic.
    val crowdHash = 0x0123456789abcdefL
    val crowd = (1L to (Multimodal.PhashBucketCap + 1).toLong)
      .map(i => (i, java.lang.Long.valueOf(crowdHash)))
    val refHashes = (crowd :+ ((1000L, java.lang.Long.valueOf(0x7777000011112222L))))
      .toDF("media_id", "phash")
    val arrivals = Seq(
      (5000L, java.lang.Long.valueOf(crowdHash)),            // dup of the capped crowd
      (5001L, java.lang.Long.valueOf(0x7777000011112222L)),  // dup of the normal ref
      (5002L, java.lang.Long.valueOf(0x5555aaaa5555aaaaL)))  // fresh
      .toDF("media_id", "phash")
    val admitted = Multimodal.phashNearNewHashes(arrivals, refHashes)
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(5000L, 5002L),
      s"capped-crowd dup flows (disclosed), normal dup gates, fresh flows: $admitted")
    // Below the cap the same crowd DOES gate the arrival.
    val smallCrowd = (1L to (Multimodal.PhashBucketCap - 1).toLong)
      .map(i => (i, java.lang.Long.valueOf(crowdHash))).toDF("media_id", "phash")
    val admitted2 = Multimodal.phashNearNewHashes(arrivals, smallCrowd)
      .collect().map(_.getLong(0)).toSet
    assert(!admitted2.contains(5000L),
      s"under the cap the crowd dup must gate: $admitted2")
  }

  test("x133: fresh-start merge (empty standing table) equals the batch counts") {
    import spark.implicits._
    val batch = Seq((1L, "a b b")).toDF("doc_id", "text")
    val empty = spark.emptyDataFrame
      .withColumn("tok", lit("").cast("string"))
      .withColumn("cf", lit(0L)).limit(0)
      .select("tok", "cf")
    val merged = TextStats.incrementalUnigramLm(batch, empty).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == Map("a" -> 1L, "b" -> 2L),
      s"day-zero ingestion must bootstrap the table from nothing: $merged")
  }

  test("x130: spectral fingerprint hears melody the time-domain tier is blind to") {
    import graft.pipeline.Multimodal
    // Three constant-amplitude tone clips: A = melody from seedA, D =
    // the REVERSED melody, all with IDENTICAL (flat) energy envelopes.
    // audioFp64 (time-domain energy deltas) hashes every one to zero —
    // structurally blind; the spectral fingerprint separates them.
    val seedA = Array.tabulate[Byte](25)(i => (i * 7).toByte)
    val seedD = seedA.reverse
    val pA = Multimodal.toneWavFixture(1600, seedA)
    val pB = pA.clone()
    // Pitch-preserving perturbation: one PCM sample flipped — melody
    // intact, at most the window-local band comparisons move.
    val pC = pA.clone(); pC(100) = (pC(100) ^ 0x55).toByte
    val pD = Multimodal.toneWavFixture(1600, seedD)
    // Volume invariance: same melody at 2x gain.
    val pV = Multimodal.toneWavFixture(1600, seedA, amp = 8192)
    val Seq(tA, tD) = Seq(pA, pD).map(p => Multimodal.audioFp64(p).get)
    assert(tA == 0L && tD == 0L,
      "flat energy envelopes: the time-domain fingerprint sees nothing")
    val Seq(hA, hB, hC, hD, hV) =
      Seq(pA, pB, pC, pD, pV).map(p => Multimodal.audioSpectralFp64(p).get)
    assert(hB == hA, "byte-identical clip → identical fingerprint")
    assert(hV == hA, "2x gain → identical fingerprint (volume invariance)")
    assert(java.lang.Long.bitCount(hA ^ hC) <= Multimodal.PhashMaxHamming,
      s"pitch-preserving local edit stays in the near band: ${java.lang.Long.bitCount(hA ^ hC)}")
    assert(java.lang.Long.bitCount(hA ^ hD) > Multimodal.PhashMaxHamming,
      s"the reversed melody must sit outside the verify bound: ${java.lang.Long.bitCount(hA ^ hD)}")
    assert(Multimodal.audioSpectralFp64("not audio".getBytes).isEmpty)
    assert(Multimodal.audioSpectralFp64(Array.empty[Byte]).isEmpty)
    // Registered-query laws + determinism on the sf corpus.
    val out = SparkEntry.queries("x130_audio_spectral_dedup")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs are (min, max)-oriented")
      assert(r.getLong(2) <= Multimodal.PhashMaxHamming, "verify bound holds")
    }
    assert(out.toSeq ==
      SparkEntry.queries("x130_audio_spectral_dedup")(spark, sf).collect().toSeq)
  }

  // Fixture directions for the x129 merge spec, chosen so the LSH
  // collisions are GUARANTEED by construction (not by luck): u and v
  // agree on every band-1 plane sign while cos(u, v) = 0.058 — they
  // collide but are no edge at t = 0.45 — and the bridge w = u + v
  // inherits the shared band-1 signs exactly (a sum of same-signed
  // projections keeps the sign), with cos(w, u) = 0.79, cos(w, v) =
  // 0.65, both ≥ 0.45. z is unrelated to all three (|cos| < 0.25).
  private lazy val x129U = Array(-0.1924f,-0.2224f,-1.4947f,0.9300f,-0.5347f,1.4356f,0.8519f,0.0209f,0.7270f,-1.1119f,-0.3257f,-0.5761f,-1.2693f,0.0171f,-0.1450f,1.4354f,-3.3528f,-0.6721f,-0.9185f,-0.4641f,0.4219f,0.4038f,0.0283f,-0.4741f,0.4945f,0.3598f,-1.8428f,-0.2622f,-1.3747f,-1.1816f,0.1466f,0.0603f,0.1139f,-0.8756f,-0.2012f,-0.9127f,0.3819f,0.6887f,1.7552f,1.2661f,-0.8054f,-0.4578f,-0.9385f,0.3060f,1.9805f,0.7085f,-2.1994f,-1.2575f,-1.2926f,0.5151f,0.0013f,0.2999f,1.7816f,-0.8271f,-0.8476f,1.9658f,0.3423f,-0.7789f,-2.0287f,-1.5243f,-2.4444f,0.0683f,0.0442f,0.9930f)
  private lazy val x129V = Array(-0.1393f,-0.6936f,-0.7411f,1.9012f,-1.7657f,0.1737f,0.0256f,0.6167f,-0.4046f,0.4992f,0.8156f,-0.1474f,-0.4576f,-0.1863f,-0.9649f,-0.2077f,-0.3019f,0.2102f,1.3361f,1.3077f,-0.4453f,0.6030f,0.2949f,0.7616f,0.0215f,0.2657f,-0.4688f,-0.7846f,0.8721f,1.2988f,0.6623f,0.4358f,0.2662f,-0.4501f,-1.7831f,0.6634f,0.1993f,-0.5542f,-0.9647f,1.2779f,-1.8043f,1.7618f,0.6396f,2.3707f,-0.7178f,-0.0218f,-0.5066f,0.1552f,-0.2100f,-0.7485f,1.0749f,-0.7849f,-0.5078f,0.5546f,-0.5376f,-0.4346f,0.3560f,-0.3678f,-1.2466f,-0.1023f,-0.2198f,1.7048f,-1.0970f,0.9694f)
  private lazy val x129Z = Array(-0.5502f,0.3791f,0.3269f,0.6814f,0.0472f,-0.7591f,-1.1268f,1.0180f,-2.2916f,-0.5674f,-1.0441f,0.0705f,-0.5294f,-0.4563f,0.7901f,-0.5590f,-1.1554f,0.9792f,0.8470f,1.2015f,0.5345f,-0.7360f,1.1589f,-0.4020f,0.1723f,-1.1119f,-0.6486f,0.4551f,0.6743f,0.0323f,1.2337f,-0.0810f,-2.0865f,0.5066f,-2.1614f,-1.6876f,-0.4361f,0.5441f,0.5203f,-0.2828f,0.3496f,-1.2991f,2.3865f,-0.2576f,-0.1468f,-0.2323f,1.1210f,0.1653f,0.1744f,-0.3727f,-0.3784f,0.1916f,-0.0391f,0.0992f,-0.5845f,1.0680f,0.5353f,1.6758f,0.6479f,0.2351f,-0.0484f,1.0163f,0.0809f,-0.9310f)

  private def scaleVec(a: Array[Float], k: Float): Array[Float] = a.map(_ * k)

  test("x129: a new embedding bridges two standing semantic clusters via star edges; incremental equals full") {
    import spark.implicits._
    val t = Similarity.SemanticDedupThreshold
    // Standing corpus: cluster {10, 12} (parallel → cosine 1, identical
    // buckets), cluster {20, 22}, singleton 30 (direction -u: every
    // projection sign flips, cosine -1 to the u cluster).
    val w = x129U.zip(x129V).map { case (a, b) => a + b }
    val old = Seq(
      (10L, x129U), (12L, scaleVec(x129U, 1.1f)),
      (20L, x129V), (22L, scaleVec(x129V, 0.9f)),
      (30L, scaleVec(x129U, -1.0f))).toDF("vec_id", "embedding")
    // Batch: 11 = u + v bridges BOTH standing clusters; {13, 14} are a
    // fresh parallel new×new pair; nothing touches 30.
    val batch = Seq(
      (11L, w), (13L, x129Z), (14L, scaleVec(x129Z, 1.2f)))
      .toDF("vec_id", "embedding")
    // Separation premise: the standing index holds exactly two 2-clusters.
    val oldPairs = Similarity.embeddingNearDupsLshOn(old, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oldPairs == Set((10L, 12L), (20L, 22L)),
      s"standing index must hold exactly two separate clusters: $oldPairs")
    // Bridge premise: the cross tier surfaces 11 against members of BOTH
    // old clusters (guaranteed band-1 collisions by construction).
    val cross = Similarity.crossSemanticPairs(batch, old, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((11L, 10L), (11L, 12L), (11L, 20L), (11L, 22L)).subsetOf(cross),
      s"bridge must pair with both standing clusters: $cross")
    assert(!cross.exists(p => p._1 == 13L || p._1 == 14L),
      s"unrelated batch vectors must not cross-pair: $cross")
    val oldLabels = Curation.propagateMinLabels(Curation.undirectedEdges(
      Seq((10L, 12L), (20L, 22L)).toDF("da", "db")))._1
    val out = Similarity.incrementalSemanticClustersFromIndex(
        batch, old, oldLabels, t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // The merge fuses both old clusters THROUGH their star edges.
    Seq(10L, 11L, 12L, 20L, 22L).foreach(id => assert(out(id) == ((10L, 5L)),
      s"vec $id must land in the fused cluster rooted at 10: $out"))
    assert(out(13L) == ((13L, 2L)) && out(14L) == ((13L, 2L)),
      s"new-new pair must form its own cluster: $out")
    assert(out(30L) == ((30L, 1L)), s"singleton stays alone: $out")
    // Incremental ≡ full re-cluster of the union (the oracle proves this
    // at corpus scale; this pins it on the planted shape in-engine).
    val full = Curation.propagateMinLabels(Curation.undirectedEdges(
      Similarity.embeddingNearDupsLshOn(old.union(batch), t)
        .select(col("va").as("da"), col("vb").as("db"))))._1.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, (cid, _)) =>
      assert(full.getOrElse(id, id) == cid, s"vec $id: incremental $cid vs full $full")
    }
  }

  test("x129: corpus-scale incremental merge equals a full re-cluster (both parities)") {
    val t = Similarity.SemanticDedupThreshold
    val e = Tables.t(spark, sf, "embeddings").select("vec_id", "embedding")
    val full = Curation.propagateMinLabels(Curation.undirectedEdges(
      Similarity.embeddingNearDupsLshOn(e, t)
        .select(col("va").as("da"), col("vb").as("db"))))._1.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inc = SparkEntry.queries("x129_incremental_semantic_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc.nonEmpty && inc.size == e.count(),
      "every vector must receive a cluster id")
    inc.foreach { case (id, cid) =>
      assert(full.getOrElse(id, id) == cid, s"vec $id: incremental $cid vs full")
    }
  }
}
