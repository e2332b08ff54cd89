package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double, props: String)
case class Doc(doc_id: Long, text: String, lang: String)
case class Vec(vec_id: Long, embedding: Array[Float])
case class DocVec(doc_id: Long, text: String, lang: String, embedding: Array[Float])
case class Med(media_id: Long, payload: Array[Byte])
case class QVec(q_id: Long, q_emb: Array[Float])

/** B31–B34 streaming semantics: the same logical query must produce the
  * same result in batch and over a stream; watermark dedup drops
  * duplicate event ids. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val evs = Seq(
    Ev(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0, "{}"),
    Ev(2, ts("2024-01-01 00:15:00"), 1, "click", 2.0, "{}"),
    Ev(3, ts("2024-01-01 01:05:00"), 2, "view", 3.0, "{}"),
    Ev(4, ts("2024-01-01 01:45:00"), 2, "view", 4.0, "{}"),
    Ev(5, ts("2024-01-01 03:00:00"), 1, "click", 5.0, "{}"))

  test("B31 tumbling agg: streaming result equals batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingJobs.tumbling(input.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("tumbling_out").start()
    input.addData(evs.take(3))
    q.processAllAvailable()
    input.addData(evs.drop(3))
    q.processAllAvailable()
    val streaming = spark.table("tumbling_out")
      .orderBy("hr", "event_type").collect().toSeq
    q.stop()
    val batch = Windows.tumblingAgg(evs.toDF()).orderBy("hr", "event_type").collect().toSeq
    assert(streaming == batch)
  }

  test("x24 ingest gate: streaming admission equals the batch decision") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Docs spanning all gate axes: quality (stopword/digit density), PII
    // (an email), and the per-lang sampling hash.
    val docsIn = (1 to 120).map { i =>
      val quality = if (i % 3 == 0) "the a of and to in words here" else "xx 99999 111111 zz"
      val text = if (i % 17 == 0) s"$quality mail me at a@b.co" else quality
      Doc(i.toLong, text, Seq("en", "de", "fr", "zz")(i % 4))
    }
    val input = MemoryStream[Doc]
    // Append mode with NO watermark: the gate must plan as a stateless
    // projection — a stateful operator here would refuse this mode.
    val q = IngestGate.gate(input.toDF())
      .writeStream.outputMode("append").format("memory").queryName("gate_out").start()
    input.addData(docsIn.take(50))
    q.processAllAvailable()
    input.addData(docsIn.drop(50))
    q.processAllAvailable()
    val streaming = spark.table("gate_out").orderBy("doc_id").collect().toSeq
    q.stop()
    val batch = IngestGate.gate(docsIn.toDF()).orderBy("doc_id").collect().toSeq
    assert(streaming == batch, "gate decisions must be identical batch vs stream")
    assert(streaming.nonEmpty && streaming.size < docsIn.size,
      s"gate should admit a strict subset (${streaming.size} of ${docsIn.size})")
    // The email-bearing docs never pass.
    val admitted = streaming.map(_.getLong(0)).toSet
    assert(docsIn.filter(_.text.contains("@")).forall(d => !admitted(d.doc_id)))
  }

  test("streaming exact-tier incremental dedup equals the batch decision") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Static reference corpus; the new batch arrives as a stream — the
    // per-batch ingestion shape at the edge (stream-static LEFT ANTI,
    // no state store).
    val ref = Seq(Doc(1L, "seen text one", "en"), Doc(2L, "seen text two", "en")).toDF()
    val arrivals = Seq(
      Doc(10L, "seen text one", "en"),   // exact dup of ref 1 → dropped
      Doc(11L, "fresh text a", "en"),
      Doc(12L, "seen text two", "en"),   // exact dup of ref 2 → dropped
      Doc(13L, "fresh text b", "en"))
    val input = MemoryStream[Doc]
    val q = graft.pipeline.Dedup.exactNewDocs(input.toDF(), ref)
      .writeStream.outputMode("append").format("memory").queryName("incdedup_out").start()
    input.addData(arrivals.take(2))
    q.processAllAvailable()
    input.addData(arrivals.drop(2))
    q.processAllAvailable()
    val streaming = spark.table("incdedup_out").orderBy("doc_id").collect().toSeq
    q.stop()
    val batch = graft.pipeline.Dedup.exactNewDocs(arrivals.toDF(), ref)
      .orderBy("doc_id").collect().toSeq
    assert(streaming == batch)
    assert(streaming.map(_.getLong(0)) == Seq(11L, 13L),
      s"only the fresh docs survive: $streaming")
  }

  test("streaming near-tier incremental dedup (foreachBatch) equals the batch decision") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Static corpus; arrivals exercise both tiers: an exact sha dup, a
    // token PERMUTATION (sha differs, Jaccard 1.0 — only the near tier
    // the continuous stream-static join cannot run catches it), a
    // below-threshold near-miss (J = 5/7 < 0.8 — must survive, pinning
    // the threshold), and a fresh doc.
    val ref = Seq(
      Doc(1L, "alpha beta gamma delta epsilon zeta", "en"),
      Doc(2L, "one two three four five six", "en")).toDF()
    val arrivals = Seq(
      Doc(10L, "one two three four five six", "en"),          // exact dup → dropped
      Doc(11L, "alpha beta gamma delta epsilon theta", "en"), // J=5/7 near-miss → survives
      Doc(12L, "totally fresh document text here now", "en"),
      Doc(13L, "beta alpha gamma epsilon delta zeta", "en"))  // permutation, J=1 → dropped
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val input = MemoryStream[Doc]
    val dir = java.nio.file.Files.createTempDirectory("incdedup_near").toString
    val q = StreamingJobs.incrementalDedupStream(input.toDF(), ref, 0.8, dir) {
      (survivors, batchId) =>
        out += batchId -> survivors.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    }
    input.addData(arrivals.take(2))
    q.processAllAvailable()
    input.addData(arrivals.drop(2))
    q.processAllAvailable()
    q.stop()
    val streamed = out.sortBy(_._1).flatMap(_._2).toSeq
    val batch = graft.pipeline.Dedup.incrementalDedup(arrivals.toDF(), ref, 0.8)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    // Per-batch decisions concatenated == one batch over all arrivals
    // (each doc is judged against the static corpus only, so batch
    // boundaries cannot change any verdict).
    assert(streamed.sorted == batch.sorted, s"stream=$streamed batch=$batch")
    assert(streamed.sorted == Seq(11L, 12L),
      s"exact dup 10 and permutation near-dup 13 must drop: $streamed")
  }

  test("streaming incremental semantic dedup (foreachBatch) equals the batch decision") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Static corpus spans two directions; arrivals: a scaled copy of c1
    // (cosine 1 → dropped), an orthogonal fresh vector (survives), a
    // 45-degree near-miss (cosine ≈ 0.707 < 0.9 — survives, pinning the
    // threshold), and a near-copy of c2 (cosine ≈ 0.9994 → dropped).
    val corpus = Seq(
      Vec(1L, Array(1.0f, 0.0f, 0.0f)),
      Vec(2L, Array(0.0f, 1.0f, 0.0f))).toDF()
    val arrivals = Seq(
      Vec(10L, Array(3.0f, 0.0f, 0.0f)),
      Vec(11L, Array(0.0f, 0.0f, 1.0f)),
      Vec(12L, Array(1.0f, 1.0f, 0.0f)),
      Vec(13L, Array(0.1f, 3.0f, 0.0f)))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val input = MemoryStream[Vec]
    val dir = java.nio.file.Files.createTempDirectory("incdedup_sem").toString
    val q = StreamingJobs.incrementalSemanticDedupStream(input.toDF(), corpus, 0.9, dir) {
      (survivors, batchId) =>
        out += batchId -> survivors.orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    }
    input.addData(arrivals.take(2))
    q.processAllAvailable()
    input.addData(arrivals.drop(2))
    q.processAllAvailable()
    q.stop()
    val streamed = out.sortBy(_._1).flatMap(_._2).toSeq
    val batch = graft.pipeline.Similarity
      .incrementalSemanticDedup(arrivals.toDF(), corpus, 0.9)
      .orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    // Per-batch decisions concatenated == one batch over all arrivals
    // (each vector is judged against the static corpus only, so batch
    // boundaries cannot change any verdict).
    assert(streamed.sorted == batch.sorted, s"stream=$streamed batch=$batch")
    assert(streamed.sorted == Seq(11L, 12L),
      s"colinear 10 and near-copy 13 must drop; near-miss 12 survives: $streamed")
  }

  test("ANN serve stream: per-wave answers equal the one-shot batch retrieval") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Corpus on the three axes plus a diagonal; queries aligned so each
    // wave has a crisp, hand-checkable top-2.
    val corpus = Seq(
      Vec(1L, Array(1.0f, 0.0f, 0.0f)),
      Vec(2L, Array(0.0f, 1.0f, 0.0f)),
      Vec(3L, Array(0.0f, 0.0f, 1.0f)),
      Vec(4L, Array(1.0f, 1.0f, 0.0f))).toDF()
    val queries = Seq(
      QVec(100L, Array(2.0f, 0.0f, 0.0f)),
      QVec(101L, Array(0.0f, 0.0f, 5.0f)),
      QVec(102L, Array(1.0f, 1.0f, 0.1f)))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(Long, Int, Long, Double)])]
    val input = MemoryStream[QVec]
    val dir = java.nio.file.Files.createTempDirectory("annserve").toString
    val q = StreamingJobs.annServeStream(input.toDF(), corpus, 2, dir) {
      (answers, batchId) =>
        out += batchId -> answers.collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    }
    input.addData(queries.take(2))
    q.processAllAvailable()
    input.addData(queries.drop(2))
    q.processAllAvailable()
    q.stop()
    // Queries are independent and the corpus is static, so the waves'
    // concatenation must equal the one-shot batch retrieval row for row.
    val streamed = out.sortBy(_._1).flatMap(_._2).toSeq.sortBy(t => (t._1, t._2))
    val batch = graft.pipeline.Similarity.annTopKOn(queries.toDF(), corpus, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    // Hand-checked heads: 100 → axis 1 then diagonal 4; 101 → axis 3;
    // 102 → diagonal 4 first (cos ≈ 0.9965).
    val head = streamed.groupBy(_._1).view.mapValues(_.minBy(_._2)._3).toMap
    assert(head == Map(100L -> 1L, 101L -> 3L, 102L -> 4L), s"heads: $head")
  }

  test("unified ingest stream: one admission decision sees exact, lexical and semantic verdicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val refDocs = Seq(
      Doc(1L, "alpha beta gamma delta epsilon", "en"),
      Doc(2L, "one two three four five six", "en"),
      Doc(3L, "totally unrelated reference text here", "en")).toDF()
    val corpusVecs = Seq(
      Vec(1L, Array(1.0f, 0.0f, 0.0f)),
      Vec(2L, Array(0.0f, 1.0f, 0.0f)),
      Vec(3L, Array(0.0f, 0.0f, 1.0f))).toDF()
    // One drop per tier, one clean admit, one null-embedding admit:
    // 10 = exact sha dup; 11 = token permutation (set-Jaccard 1.0);
    // 12 = fresh text but colinear with corpus vec 3 (semantic dup);
    // 13 = clean on all tiers; 14 = embedding still pending (null) —
    // must NOT be silently dropped by the semantic tier.
    val arrivals = Seq(
      DocVec(10L, "alpha beta gamma delta epsilon", "en", Array(0.7f, 0.7f, 0.0f)),
      DocVec(11L, "six five four three two one", "en", Array(0.7f, -0.7f, 0.0f)),
      DocVec(12L, "fresh wording nobody wrote before", "en", Array(0.0f, 0.0f, 2.0f)),
      DocVec(13L, "another genuinely novel document text", "en", Array(1.0f, -1.0f, 0.5f)),
      DocVec(14L, "embedding still pending for this one", "en", null))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val input = MemoryStream[DocVec]
    val dir = java.nio.file.Files.createTempDirectory("ingest_all").toString
    val q = StreamingJobs.ingestDedupStream(input.toDF(), refDocs, corpusVecs, 0.8, 0.9, dir) {
      (admitted, batchId) =>
        out += batchId -> admitted.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    }
    input.addData(arrivals.take(3))
    q.processAllAvailable()
    input.addData(arrivals.drop(3))
    q.processAllAvailable()
    q.stop()
    val streamed = out.sortBy(_._1).flatMap(_._2).toSeq
    val batch = StreamingJobs.ingestAdmit(arrivals.toDF(), refDocs, corpusVecs, 0.8, 0.9)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(streamed.sorted == batch.sorted, s"stream=$streamed batch=$batch")
    assert(streamed.sorted == Seq(13L, 14L),
      s"each tier must drop its dup; clean + pending-embedding docs survive: $streamed")
  }

  test("x57 budget admission: chunked stream equals batch; state persists across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ~450 subword tokens per doc ("word" → w|or|d = 3, ×150), budget
    // 2000 → each source admits 5 docs (exclusive-prefix overshoot) and
    // rejects the rest; the budget line falls in the SECOND chunk for
    // both sources, so stream ≡ batch proves the state carried over.
    val text = Seq.fill(150)("word").mkString(" ")
    val arrivals = (1L to 20L).map(i => DocArrival(i, s"s${i % 2}", i, text))
    val input = MemoryStream[DocArrival]
    val q = Stateful.budgetAdmissions(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("admit_out").start()
    input.addData(arrivals.take(8))
    q.processAllAvailable()
    input.addData(arrivals.drop(8))
    q.processAllAvailable()
    val streamed = spark.table("admit_out").as[AdmitDecision]
      .collect().sortBy(_.doc_id).toSeq
    q.stop()
    val batch = Stateful.budgetAdmissions(arrivals.toDS())
      .collect().sortBy(_.doc_id).toSeq
    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    val admitted = batch.filter(_.admitted).map(_.doc_id)
    assert(batch.forall(_.n_tok == 450L))
    // 5 admitted per source: prefixes 0,450,900,1350,1800 < 2000, 2250 ≥.
    assert(admitted.size == 10 && admitted.sorted == (1L to 10L),
      s"first five arrivals of each source admitted: $admitted")
    assert(batch.count(!_.admitted) == 10, "later arrivals must be rejected")
  }

  test("unified ingest: intra-batch duplicate delivery is not amplified") {
    import spark.implicits._
    // At-least-once delivery can hand one batch the SAME doc_id twice.
    // Both the lexical and semantic frames then hold 2 rows for it; the
    // admission rejoin must preserve that multiplicity (left_semi on the
    // survivor-id SET), not square it to 4 for the idempotent sink.
    val refDocs = Seq(Doc(1L, "alpha beta gamma delta epsilon", "en")).toDF()
    val corpusVecs = Seq(Vec(1L, Array(1.0f, 0.0f, 0.0f))).toDF()
    val arrivals = Seq(
      DocVec(30L, "novel admitted text content here", "en", Array(0.0f, 1.0f, 0.0f)),
      DocVec(30L, "novel admitted text content here", "en", Array(0.0f, 1.0f, 0.0f)))
    val admitted = StreamingJobs.ingestAdmit(
      arrivals.toDF(), refDocs, corpusVecs, 0.8, 0.9)
      .collect().map(_.getLong(0)).toSeq
    assert(admitted.size <= 2,
      s"duplicate delivery must not be multiplied by the rejoin: $admitted")
    assert(admitted.nonEmpty && admitted.forall(_ == 30L), s"doc 30 must survive: $admitted")
  }

  test("unified ingest with a Gopher quality gate: reject-before-dedup tier") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val refDocs = Seq(Doc(1L, "alpha beta gamma delta epsilon", "en")).toDF()
    val corpusVecs = Seq(Vec(1L, Array(1.0f, 0.0f, 0.0f))).toDF()
    // 20 = passes the battery (52 words, 2 distinct stopwords, clean
    // ratios); 21 = novel on every dedup tier but too short for the
    // gate — the gate must reject it BEFORE dedup ever sees it.
    val passing = (Seq.fill(12)("the quick brown fox and") :+ "dog").mkString(" ")
    val arrivals = Seq(
      DocVec(20L, passing, "en", null),
      DocVec(21L, "novel but far too short", "en", null))
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val input = MemoryStream[DocVec]
    val dir = java.nio.file.Files.createTempDirectory("ingest_gated").toString
    val gate = Some(graft.pipeline.Selection.gopherPassColumn)
    val q = StreamingJobs.ingestDedupStream(
      input.toDF(), refDocs, corpusVecs, 0.8, 0.9, dir, gate) { (admitted, _) =>
      out += admitted.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    }
    input.addData(arrivals)
    q.processAllAvailable()
    q.stop()
    val streamed = out.flatten.toSeq
    val batch = StreamingJobs.ingestAdmit(
      arrivals.toDF(), refDocs, corpusVecs, 0.8, 0.9, gate)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(streamed.sorted == batch.sorted, s"stream=$streamed batch=$batch")
    assert(streamed == Seq(20L), s"the gate must reject doc 21: $streamed")
  }

  test("streaming boilerplate strip (foreachBatch) equals the batch strip") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Hot set from a static 5-doc corpus sharing one header line; the
    // arriving docs are stripped against THAT set — including a batch
    // where the header appears only once (batch-local df could never
    // call it hot, the corpus set must).
    val corpus = (1L to 5L).map(i => Doc(i, s"SHARED HEADER LINE\nbody $i", "en")).toDF()
    val hot = graft.pipeline.Curation
      .hotLinesOf(corpus, split(col("text"), "\n"), maxDf = 3)
      .persist()
    val arrivals = Seq(
      Doc(10L, "SHARED HEADER LINE\nfresh content ten", "en"),
      Doc(11L, "nothing hot here\nat all", "en"))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(Long, String)])]
    val input = MemoryStream[Doc]
    val dir = java.nio.file.Files.createTempDirectory("linestrip").toString
    val q = StreamingJobs.lineStripStream(input.toDF(), hot,
      split(col("text"), "\n"), "\n", dir) { (stripped, batchId) =>
        out += batchId -> stripped.orderBy("doc_id").collect()
          .map(r => r.getLong(0) -> r.getString(4)).toSeq
      }
    input.addData(arrivals.take(1))
    q.processAllAvailable()
    input.addData(arrivals.drop(1))
    q.processAllAvailable()
    q.stop()
    val streamed = out.sortBy(_._1).flatMap(_._2).toMap
    assert(streamed(10L) == "fresh content ten",
      s"corpus-hot header must strip even at batch df = 1: $streamed")
    assert(streamed(11L) == "nothing hot here\nat all", s"$streamed")
    val batch = graft.pipeline.Curation
      .lineStripAgainst(arrivals.toDF(), hot, split(col("text"), "\n"), "\n")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    hot.unpersist()
  }

  test("unified ingest with the x58c repetition tier: reject repetitive docs; dup delivery safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val refDocs = Seq(Doc(1L, "alpha beta gamma delta epsilon", "en")).toDF()
    val corpusVecs = Seq(Vec(1L, Array(1.0f, 0.0f, 0.0f))).toDF()
    // 40 = long doc of 60 DISTINCT words: every repetition signal ~0,
    // passes the battery, novel on every dedup tier. 41 = periodic spam
    // ("spam ham eggs" x 20): novel on the dedup tiers (nothing like it
    // in refDocs) but saturated dup-line/top-gram signals — the
    // repetition tier must reject it BEFORE dedup. 40 is delivered
    // TWICE in one batch: the battery computes on distinct docs, so the
    // duplicate must neither flip the verdict nor amplify output.
    val passingText = (0 until 60).map(i => s"word$i").mkString(" ")
    val arrivals = Seq(
      DocVec(40L, passingText, "en", null),
      DocVec(40L, passingText, "en", null),
      DocVec(41L, Seq.fill(20)("spam ham eggs").mkString(" "), "en", null))
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val input = MemoryStream[DocVec]
    val dir = java.nio.file.Files.createTempDirectory("ingest_rep").toString
    val q = StreamingJobs.ingestDedupStream(
      input.toDF(), refDocs, corpusVecs, 0.8, 0.9, dir,
      qualityGate = None, repetitionGate = true) { (admitted, _) =>
      out += admitted.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    }
    input.addData(arrivals)
    q.processAllAvailable()
    q.stop()
    val streamed = out.flatten.toSeq
    val batch = StreamingJobs.ingestAdmit(
      arrivals.toDF(), refDocs, corpusVecs, 0.8, 0.9,
      qualityGate = None, repetitionGate = true)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(streamed.sorted == batch.sorted, s"stream=$streamed batch=$batch")
    assert(streamed.nonEmpty && streamed.forall(_ == 40L),
      s"doc 40 admitted, repetitive doc 41 rejected: $streamed")
    assert(streamed.size <= 2,
      s"duplicate delivery must not be amplified: $streamed")
  }

  test("unified ingest with the x64 classifier tier as the quality gate: batch ≡ stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val refDocs = Seq(Doc(1L, "alpha beta gamma delta epsilon", "en")).toDF()
    val corpusVecs = Seq(Vec(1L, Array(1.0f, 0.0f, 0.0f))).toDF()
    // Derive one token the pinned classifier scores above the keep
    // threshold and one below it (a doc of one repeated token has
    // per-token logit exactly w(tok)/1000, so keep ⇔ w(tok) > τ) —
    // found from the model itself, not hardcoded, so a constant change
    // cannot silently vacuate the test.
    def w(tok: String): Long = graft.pipeline.Selection.clfWeight(
      graft.functions.TokenHash.hash(tok) % graft.pipeline.Selection.ClfBuckets)
    val tau = graft.pipeline.Selection.ClfThresholdMilli
    val good = (0 until 1000).map(i => s"tok$i").find(w(_) > tau).get
    val bad = (0 until 1000).map(i => s"tok$i").find(w(_) <= tau).get
    val arrivals = Seq(
      DocVec(50L, Seq.fill(8)(good).mkString(" "), "en", null),
      DocVec(51L, Seq.fill(8)(bad).mkString(" "), "en", null))
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val input = MemoryStream[DocVec]
    val dir = java.nio.file.Files.createTempDirectory("ingest_clf").toString
    val q = StreamingJobs.ingestDedupStream(
      input.toDF(), refDocs, corpusVecs, 0.8, 0.9, dir,
      qualityGate = Some(graft.pipeline.Selection.classifierKeepColumn)) { (admitted, _) =>
      out += admitted.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    }
    input.addData(arrivals)
    q.processAllAvailable()
    q.stop()
    val streamed = out.flatten.toSeq
    val batch = StreamingJobs.ingestAdmit(
      arrivals.toDF(), refDocs, corpusVecs, 0.8, 0.9,
      qualityGate = Some(graft.pipeline.Selection.classifierKeepColumn))
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(streamed.sorted == batch.sorted, s"stream=$streamed batch=$batch")
    assert(streamed == Seq(50L),
      s"classifier must admit the above-threshold doc only: $streamed")
  }

  test("unified ingest with the x64b FITTED classifier as the quality gate: batch ≡ stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val refDocs = Seq(Doc(1L, "alpha beta gamma delta epsilon", "en")).toDF()
    val corpusVecs = Seq(Vec(1L, Array(1.0f, 0.0f, 0.0f))).toDF()
    // The production cycle: fit the weight table on a REFERENCE corpus
    // with separable good/bad vocabularies (good docs pass the Gopher
    // label — >=50 tokens, mwl >= 3, stopwords; bad docs are symbol
    // spam), then gate stream arrivals that reuse those vocabularies.
    val goodText = (("the quick brown foxes jumped over the fence and chased " +
      "rabbits through sunny meadows while farmers watched quietly ") * 4).trim
    val badText = ("#### @@@@ !!!! %%%% " * 15).trim
    val fitRef = (Seq((1L, goodText), (2L, goodText + " extra")) ++
      Seq((3L, badText), (4L, badText + " @@"))).toDF("doc_id", "text")
    val gate = graft.pipeline.Selection.classifierFitKeepColumn(fitRef)
    val arrivals = Seq(
      DocVec(60L, "quick foxes chased rabbits through meadows", "en", null),
      DocVec(61L, "#### @@@@ !!!! %%%%", "en", null))
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val input = MemoryStream[DocVec]
    val dir = java.nio.file.Files.createTempDirectory("ingest_clf_fit").toString
    val q = StreamingJobs.ingestDedupStream(
      input.toDF(), refDocs, corpusVecs, 0.8, 0.9, dir,
      qualityGate = Some(gate)) { (admitted, _) =>
      out += admitted.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    }
    input.addData(arrivals)
    q.processAllAvailable()
    q.stop()
    val streamed = out.flatten.toSeq
    val batch = StreamingJobs.ingestAdmit(
      arrivals.toDF(), refDocs, corpusVecs, 0.8, 0.9,
      qualityGate = Some(gate))
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(streamed.sorted == batch.sorted, s"stream=$streamed batch=$batch")
    assert(streamed == Seq(60L),
      s"fitted gate must admit the good-vocabulary arrival only: $streamed")
  }

  test("unified ingest with the x79 C4 page gate: batch ≡ stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val refDocs = Seq(Doc(1L, "alpha beta gamma delta epsilon", "en")).toDF()
    val corpusVecs = Seq(Vec(1L, Array(1.0f, 0.0f, 0.0f))).toDF()
    // Find a text the battery itself accepts under doc_id 70 (no planted
    // hazard residues: 70 ∉ 37ℤ ∪ 41ℤ ∪ 43ℤ) — derived from the gate,
    // not hardcoded, the x64-test discipline: hash-parity punctuation
    // makes a specific text's sentence count non-obvious by eye.
    graft.functions.GraftFunctions.register(spark)
    val seedWords = Seq("table", "scan", "query", "merge", "batch", "window",
      "filter", "column", "stream", "value", "group", "order")
    val candidates = (0 until 20).map(n =>
      (0 until 60).map(i => seedWords((i * (n + 3)) % seedWords.size)).mkString(" "))
    def pagePasses(text: String, id: Long): Boolean =
      Seq((id, text)).toDF("doc_id", "text")
        .filter(graft.pipeline.Curation.c4PageKeepColumn).count() == 1
    val goodText = candidates.find(pagePasses(_, 70L)).get
    // 82 = 2·41 → the derived page carries the planted lorem-ipsum
    // hazard line, so ANY text is dropped at doc_id 82.
    val arrivals = Seq(
      DocVec(70L, goodText, "en", null),
      DocVec(82L, goodText + " extra", "en", null))
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val input = MemoryStream[DocVec]
    val dir = java.nio.file.Files.createTempDirectory("ingest_c4").toString
    val q = StreamingJobs.ingestDedupStream(
      input.toDF(), refDocs, corpusVecs, 0.8, 0.9, dir,
      qualityGate = Some(graft.pipeline.Curation.c4PageKeepColumn)) { (admitted, _) =>
      out += admitted.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    }
    input.addData(arrivals)
    q.processAllAvailable()
    q.stop()
    val streamed = out.flatten.toSeq
    val batch = StreamingJobs.ingestAdmit(
      arrivals.toDF(), refDocs, corpusVecs, 0.8, 0.9,
      qualityGate = Some(graft.pipeline.Curation.c4PageKeepColumn))
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(streamed.sorted == batch.sorted, s"stream=$streamed batch=$batch")
    assert(streamed == Seq(70L),
      s"C4 gate must admit the clean page and drop the lorem-planted one: $streamed")
  }

  test("b42: cohort retention — offset-0 row is the cohort itself, cells bounded") {
    val rows = Windows.cohortRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val cohorts = rows.map(_._1).distinct
    // Every cohort's offset-0 cell exists and retains exactly 100%:
    // week-of-first-event membership IS the cohort definition.
    cohorts.foreach { c =>
      val zero = rows.find(r => r._1 == c && r._2 == 0L)
        .getOrElse(fail(s"cohort $c has no offset-0 row"))
      assert(zero._4 == zero._3 && zero._5 == 10000L,
        s"offset 0 must retain the whole cohort: $zero")
    }
    rows.foreach { case (c, off, size, active, bp) =>
      assert(off >= 0, s"activity cannot precede the first event: $c/$off")
      assert(active >= 1 && active <= size, s"cell bounds: $c/$off")
      assert(bp == active * 10000 / size, s"retention law: $c/$off")
    }
  }

  test("x99 entropy gate at the ingest edge: flood rejected before dedup, batch = stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val refDocs = Seq(Doc(1L, "alpha beta gamma delta epsilon", "en")).toDF()
    val corpusVecs = Seq(Vec(1L, Array(1.0f, 0.0f, 0.0f))).toDF()
    // 40 = fluent 80-char text (entropy ~2.9 nats, kept); 41 = an
    // 80-char single-char flood (entropy 0) that is NOVEL on every
    // dedup tier — only the entropy gate can reject it; 42 = short doc
    // under the 50-char exemption, kept despite low entropy.
    val fluent = "The quick brown fox jumps over the lazy dog while birds sing in the morning"
    val arrivals = Seq(
      DocVec(40L, fluent, "en", null),
      DocVec(41L, "a" * 80, "en", null),
      DocVec(42L, "hi there", "en", null))
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val input = MemoryStream[DocVec]
    val dir = java.nio.file.Files.createTempDirectory("ingest_ent").toString
    val gate = Some(graft.pipeline.TextStats.charEntropyKeepColumn)
    val q = StreamingJobs.ingestDedupStream(
      input.toDF(), refDocs, corpusVecs, 0.8, 0.9, dir, gate) { (admitted, _) =>
      out += admitted.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    }
    input.addData(arrivals)
    q.processAllAvailable()
    q.stop()
    val streamed = out.flatten.toSeq
    val batch = StreamingJobs.ingestAdmit(
      arrivals.toDF(), refDocs, corpusVecs, 0.8, 0.9, gate)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(streamed.sorted == batch.sorted, s"stream=$streamed batch=$batch")
    assert(streamed.sorted == Seq(40L, 42L),
      s"the flood must die at the gate, the short doc must pass: $streamed")
  }

  test("x58c repetition gate (foreachBatch) equals the batch gate — per-doc, stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Per-doc signals depend on nothing outside the document, so the
    // micro-batch operator IS the batch operator — gated here so a
    // future corpus-relative signal cannot silently break the edge.
    val docsIn = Seq(
      Doc(1L, "a b c a b c a b c", "en"),            // fails dup/top rules
      Doc(2L, "one two three four five six seven eight", "en"))
    val out = scala.collection.mutable.Map.empty[Long, Boolean]
    val input = MemoryStream[Doc]
    val dir = java.nio.file.Files.createTempDirectory("repgate").toString
    val q = input.toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", dir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.pipeline.Repetition.gateOf(batch).collect()
          .foreach(r => out += r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pass_all"))
        ()
      }
      .start()
    input.addData(docsIn.take(1)); q.processAllAvailable()
    input.addData(docsIn.drop(1)); q.processAllAvailable()
    q.stop()
    val batchRes = graft.pipeline.Repetition.gateOf(docsIn.toDF())
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pass_all")).toMap
    assert(out.toMap == batchRes, s"stream=$out batch=$batchRes")
    assert(!out(1L), "periodic doc must fail the battery")
  }

  test("x12 stream-stream interval join equals the batch attribution join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val joined = Seq(
      Ev(10, ts("2024-01-01 00:05:00"), 1, "click", 1.0, "{}"),
      Ev(11, ts("2024-01-01 00:30:00"), 1, "purchase", 9.99, "{}"), // within 2h of 10
      Ev(12, ts("2024-01-01 05:00:00"), 1, "purchase", 5.00, "{}"), // too late for 10
      Ev(13, ts("2024-01-01 04:30:00"), 2, "click", 1.0, "{}"),
      Ev(14, ts("2024-01-01 04:45:00"), 2, "purchase", 3.50, "{}"), // within 2h of 13
      Ev(15, ts("2024-01-01 04:40:00"), 3, "purchase", 2.00, "{}"), // no prior click
      Ev(16, ts("2024-01-01 09:00:00"), 9, "view", 0.0, "{}")) // watermark pusher
    val input = MemoryStream[Ev]
    val q = StreamingJobs.attribution(input.toDF())
      .writeStream.outputMode("append").format("memory").queryName("attrib_out").start()
    input.addData(joined.take(3))
    q.processAllAvailable()
    input.addData(joined.drop(3))
    q.processAllAvailable()
    val streaming = spark.table("attrib_out")
      .orderBy("click_id", "purchase_id").collect().toSeq
    q.stop()
    val e = joined.toDF()
    val batch = Windows.attributionJoin(
      e.filter(col("event_type") === "click"),
      e.filter(col("event_type") === "purchase"))
      .orderBy("click_id", "purchase_id").collect().toSeq
    assert(batch.map(r => (r.getLong(0), r.getLong(1))) == Seq((10L, 11L), (13L, 14L)))
    assert(streaming == batch, s"stream=$streaming batch=$batch")
  }

  test("b13e CMS registers are streaming-native: stream registers equal batch") {
    // The mergeable-sketch property, demonstrated: the register frame is
    // a pure partial+final count, so the SAME expression under a
    // streaming groupBy accumulates identical registers across
    // micro-batches — frequency estimation over an unbounded ingest
    // stream with d x w bounded state.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    case class K(key: Long)
    val keys = (1 to 300).map(i => (i % 37).toLong)
    val input = MemoryStream[Long]
    val q = graft.queries.Relational.cmsRegistersOf(input.toDF().toDF("key"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_regs").start()
    input.addData(keys.take(120))
    q.processAllAvailable()
    input.addData(keys.drop(120))
    q.processAllAvailable()
    val streamed = spark.table("cms_regs")
      .orderBy("i", "bucket").collect().toSeq
    q.stop()
    val batch = graft.queries.Relational.cmsRegistersOf(keys.toDF("key"))
      .orderBy("i", "bucket").collect().toSeq
    assert(streamed == batch,
      "streaming CMS registers must equal the batch sketch over the same rows")
  }

  test("B34 watermark dedup drops duplicate event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingJobs.dedup(input.toDF())
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    input.addData(evs)
    q.processAllAvailable()
    // same ids again, inside the watermark horizon → must be dropped
    input.addData(evs.map(e => e.copy(value = e.value + 100)))
    q.processAllAvailable()
    val got = spark.table("dedup_out").collect()
    q.stop()
    assert(got.length == evs.length, s"expected ${evs.length} unique events, got ${got.length}")
  }

  test("B33: native session_window and lag+cumsum batch form agree on session structure") {
    val events = Tables.t(spark, sf, "events")
    val native = StreamingJobs.sessionized(events)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
      .orderBy("user_id").collect().toSeq
    val batch = Windows.sessionAgg(events)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
      .orderBy("user_id").collect().toSeq
    assert(native == batch)
  }

  test("B32 sliding windows assign each event to exactly two windows") {
    import spark.implicits._
    val total = Windows.slidingAgg(evs.toDF()).agg(sum("n")).collect()(0).getLong(0)
    assert(total == evs.length * 2)
  }

  test("foreachBatch JDBC sink appends micro-batches with batch ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:streamjdbc;create=true"
    val ckpt = java.nio.file.Files.createTempDirectory("sjdbc").toString
    val input = MemoryStream[Ev]
    val q = StreamingJobs.toJdbc(input.toDF(), url, "stream_events", ckpt)
    input.addData(evs.take(3)); q.processAllAvailable()
    input.addData(evs.drop(3)); q.processAllAvailable()
    q.stop()
    val loaded = spark.read.jdbc(url, "stream_events", new java.util.Properties())
    assert(loaded.count() == evs.length)
    val batchIds = loaded.select("batch_id").distinct().collect().map(_.getLong(0)).sorted
    assert(batchIds.length == 2, s"two micro-batches expected, got ${batchIds.toSeq}")
    assert(loaded.select("event_id").distinct().count() == evs.length)
  }

  test("streaming exact-phash media dedup (stream-static anti-join) equals batch") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    implicit val sqlCtx = spark.sqlContext
    // Reference corpus holds image A. Arrivals: B = identical payload
    // (same dHash → dropped), C = one corner pixel changed (Hamming 1 ≠
    // exact → survives the EXACT tier; the near tier is batch-only like
    // x26's), D = structurally different (survives), E = corrupt bytes
    // (null phash — must keep flowing, never be dropped as a "dup").
    val seedA = Array.tabulate[Byte](768)(i => (i % 192).toByte)
    val seedC = seedA.clone(); seedC(0) = 127.toByte
    val seedD = Array.tabulate[Byte](768)(i => (191 - i % 192).toByte)
    val pA = Multimodal.pngFixture(32, 24, seedA)
    val ref = Seq(Med(1L, pA)).toDF()
    val arrivals = Seq(
      Med(10L, pA.clone()),
      Med(11L, Multimodal.pngFixture(32, 24, seedC)),
      Med(12L, Multimodal.pngFixture(32, 24, seedD)),
      Med(13L, "corrupt".getBytes))
    val input = MemoryStream[Med]
    val q = Multimodal.phashExactNewMedia(input.toDF(), ref)
      .writeStream.outputMode("append").format("memory")
      .queryName("phash_gate_out").start()
    input.addData(arrivals.take(2)); q.processAllAvailable()
    input.addData(arrivals.drop(2)); q.processAllAvailable()
    val streaming = spark.table("phash_gate_out").orderBy("media_id")
      .collect().toSeq
    q.stop()
    val batch = Multimodal.phashExactNewMedia(arrivals.toDF(), ref)
      .orderBy("media_id").collect().toSeq
    assert(streaming == batch, "batch ≡ stream on the identical arrivals")
    assert(streaming.map(_.getLong(0)) == Seq(11L, 12L, 13L),
      s"exact dup dropped; near-miss, fresh, and corrupt all flow: $streaming")
    assert(streaming.find(_.getLong(0) == 13L).exists(_.isNullAt(1)),
      "corrupt arrival carries a null phash for downstream scoring")
  }

  test("streaming cluster-index maintenance: the standing index advances wave over wave") {
    import spark.implicits._
    import graft.pipeline.{Curation, Dedup}
    implicit val sqlCtx = spark.sqlContext
    val s8 = (1 to 8).map(i => s"s$i").mkString(" ")
    // Seed: the x121 planted shape — standing clusters {10,12} and
    // {20,22}, singleton 30 — at rest as corpus + label index.
    val seed = Seq(
      (10L, s"$s8 b1 a1"), (12L, s"$s8 b1 b2"),
      (20L, s"$s8 y1 x1"), (22L, s"$s8 y1 y2"),
      (30L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w0")).toDF("doc_id", "text")
    val corpusDir = java.nio.file.Files.createTempDirectory("cim_corpus").toString
    val indexDir = java.nio.file.Files.createTempDirectory("cim_index").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cim_ck").toString
    seed.write.mode("overwrite").parquet(s"$corpusDir/wave=seed")
    VersionedTable.seed(indexDir, Seq("labels" ->
      Curation.propagateMinLabels(Curation.undirectedEdges(
        Dedup.jaccardPairsPrefixOn(seed, 0.8).select(col("da"), col("db"))))._1))
    val input = MemoryStream[Doc]
    val q = StreamingJobs.clusterIndexMaintenanceStream(
      input.toDF(), corpusDir, indexDir, 0.8, ckpt)
    // Wave 1: 11 bridges BOTH standing clusters; 13 arrives fresh.
    input.addData(Seq(Doc(11L, s"$s8 b1 y1", "en"),
      Doc(13L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z0", "en")))
    q.processAllAvailable()
    // Wave 2: 14 is an exact dup of WAVE-1's 13 — only an ADVANCING
    // standing state can catch it (a stream-static gate's frozen ref
    // side never would); 15 is fresh.
    input.addData(Seq(Doc(14L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z0", "en"),
      Doc(15L, "q1 q2 q3", "en")))
    q.processAllAvailable()
    q.stop()
    val idx = VersionedTable.read(spark, indexDir, "labels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(10L, 11L, 12L, 20L, 22L).foreach(id =>
      assert(idx(id) == 10L, s"wave-1 fusion must persist for $id: $idx"))
    assert(idx(13L) == 13L && idx(14L) == 13L,
      s"the cross-WAVE duplicate must cluster with its wave-1 twin: $idx")
    assert(!idx.contains(15L) && !idx.contains(30L),
      "singletons stay out of the participants-only index")
    val corpusAfter = spark.read.parquet(corpusDir)
    assert(corpusAfter.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(10L, 11L, 12L, 13L, 14L, 15L, 20L, 22L, 30L), "corpus advanced")
    // The standing index after two waves equals a full re-cluster of
    // everything that ever arrived — the streaming form of the x121
    // incremental ≡ full guarantee.
    val full = Curation.propagateMinLabels(Curation.undirectedEdges(
        Dedup.jaccardPairsPrefixOn(
          corpusAfter.select(col("doc_id"), col("text")), 0.8)
          .select(col("da"), col("db"))))._1
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idx == full, s"standing index must equal the full re-cluster: $idx vs $full")
  }

  test("LM-table maintenance stream: the standing table after N waves equals a full recount") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lmDir = java.nio.file.Files.createTempDirectory("lm_idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lm_ckpt").toString
    // Seed: a standing table from an initial corpus (not empty, so the
    // merge exercises overlap with pre-stream history too).
    VersionedTable.seed(lmDir,
      Seq("lm" -> Seq(("alpha", 2L), ("beta", 1L)).toDF("tok", "cf")))
    val input = MemoryStream[Doc]
    val q = StreamingJobs.lmMaintenanceStream(input.toDF(), lmDir, ckpt)
    input.addData(Seq(Doc(1L, "alpha gamma gamma", "en")))
    q.processAllAvailable()
    input.addData(Seq(Doc(2L, "beta beta delta", "en")))
    q.processAllAvailable()
    q.stop()
    def table() = VersionedTable.read(spark, lmDir, "lm").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(table() == Map("alpha" -> 3L, "beta" -> 3L, "gamma" -> 2L, "delta" -> 1L),
      s"standing LM table must equal the full recount of seed + every wave: ${table()}")
    // Same-stream replay skip (the exactly-once ledger): the pointer
    // carries this stream's identity + last batch id, so re-offering a
    // merged id UNDER THE SAME identity is skipped...
    val sid = StreamingJobs.streamIdOf(spark, ckpt)
    assert(sid.nonEmpty, "checkpoint metadata must yield a stream identity")
    assert(VersionedTable.alreadyMerged(lmDir, 1L, sid) &&
      !VersionedTable.alreadyMerged(lmDir, 2L, sid),
      "same-identity replay ledger must skip merged ids and admit new ones")
    // ...while a FRESH checkpoint (new stream identity, batch ids
    // restarting at 0) RESETS the ledger instead of silently dropping
    // data until the new counter passes the old high-water mark — the
    // r16 ADVICE data-loss case: batch 0 of the new stream carries
    // genuinely NEW data and must merge, where the old bare-id rule
    // discarded it ('skipme' semantics, now gone).
    val ckpt2 = java.nio.file.Files.createTempDirectory("lm_ckpt2").toString
    val input2 = MemoryStream[Doc]
    val q2 = StreamingJobs.lmMaintenanceStream(input2.toDF(), lmDir, ckpt2)
    input2.addData(Seq(Doc(3L, "epsilon", "en")))
    q2.processAllAvailable() // batch 0 of a NEW stream: merges
    q2.stop()
    assert(table().get("epsilon").contains(1L),
      s"a new stream's batch 0 must merge, not vanish under the old " +
        s"high-water mark: ${table()}")
    assert(table().get("alpha").contains(3L),
      s"ledger reset must not disturb standing counts: ${table()}")
    // The commit adopted the new identity: its own replay now skips.
    val sid2 = StreamingJobs.streamIdOf(spark, ckpt2)
    assert(sid2.nonEmpty && sid2 != sid, "fresh checkpoint mints a fresh identity")
    assert(VersionedTable.alreadyMerged(lmDir, 0L, sid2) &&
      !VersionedTable.alreadyMerged(lmDir, 1L, sid2),
      "the ledger must re-key to the adopting stream")
  }

  test("LM-table maintenance: a crash mid-write cannot destroy the standing artifact") {
    import spark.implicits._
    val lmDir = java.nio.file.Files.createTempDirectory("lm_crash").toString
    VersionedTable.seed(lmDir, Seq("lm" -> Seq(("alpha", 2L)).toDF("tok", "cf")))
    val before = VersionedTable.current(lmDir).get
    // Simulate an app dying mid-commit: a half-written NEXT version
    // exists but the pointer was never swapped. The live artifact must
    // read back exactly as before, and a later commit must succeed.
    val half = java.nio.file.Paths.get(lmDir, "v1", "lm")
    java.nio.file.Files.createDirectories(half)
    java.nio.file.Files.writeString(half.resolve("part-garbage.parquet"), "torn write")
    assert(VersionedTable.current(lmDir).get == before,
      "pointer must still name the pre-crash version")
    assert(VersionedTable.read(spark, lmDir, "lm").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("alpha" -> 2L),
      "the live version must be untouched by the torn write")
    // Recovery: the next commit overwrites the torn v1 and swaps.
    VersionedTable.commit(lmDir, 0L, Seq("lm" -> Seq(("alpha", 5L)).toDF("tok", "cf")))
    assert(VersionedTable.read(spark, lmDir, "lm").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("alpha" -> 5L))
    assert(VersionedTable.lastBatchId(lmDir) == 0L)
  }

  test("BM25-stats maintenance stream: df and scalars track every wave exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val statsDir = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bm25_ckpt").toString
    // Fresh start: empty vocab, zero scalars — each its OWN table.
    VersionedTable.seed(statsDir, Seq(
      "vocab" -> Seq.empty[(String, Long)].toDF("tok", "df"),
      "scalars" -> Seq((0L, 0L)).toDF("n_docs", "sumdl")))
    val input = MemoryStream[Doc]
    val q = StreamingJobs.bm25StatsMaintenanceStream(input.toDF(), statsDir, ckpt)
    // Wave 1: "join" twice in one doc must count ONE df.
    input.addData(Seq(Doc(1L, "spark join join", "en"), Doc(2L, "dup scan", "en")))
    q.processAllAvailable()
    input.addData(Seq(Doc(3L, "join spark spark window", "en")))
    q.processAllAvailable()
    q.stop()
    val rows = StreamingJobs.readBm25Stats(spark, statsDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val dfm = rows.map(t => t._1 -> t._2).toMap
    assert(dfm == Map("spark" -> 2L, "join" -> 2L, "dup" -> 1L,
      "scan" -> 1L, "window" -> 1L), s"df must count docs, merged across waves: $dfm")
    rows.foreach { case (tok, _, n, s) =>
      assert(n == 3L && s == 9L, s"scalars must track every wave: ($tok, $n, $s)")
    }
    // Same-stream exactly-once + fresh-stream ledger reset (r16 ADVICE):
    // a merged id under THIS stream's identity is skipped; a FRESH
    // checkpoint's batch 0 carries new data and must merge (the old
    // bare-id rule silently dropped it).
    val sid = StreamingJobs.streamIdOf(spark, ckpt)
    assert(VersionedTable.alreadyMerged(statsDir, 1L, sid) &&
      !VersionedTable.alreadyMerged(statsDir, 2L, sid),
      "same-identity replay ledger must hold for the stats artifact")
    val ckpt2 = java.nio.file.Files.createTempDirectory("bm25_ckpt2").toString
    val input2 = MemoryStream[Doc]
    val q2 = StreamingJobs.bm25StatsMaintenanceStream(input2.toDF(), statsDir, ckpt2)
    input2.addData(Seq(Doc(4L, "flink window", "en")))
    q2.processAllAvailable() // batch 0 of a NEW stream: merges
    q2.stop()
    val scal = VersionedTable.read(spark, statsDir, "scalars").collect()
    assert(scal.length == 1 && scal.head.getLong(0) == 4L && scal.head.getLong(1) == 11L,
      s"a new stream's first wave must merge into the scalars: ${scal.mkString}")
  }

  test("BM25-stats maintenance: scalars survive a zero-vocab wave") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // r15 ADVICE: with scalars denormalized onto vocab rows, a first
    // wave of empty-text docs left zero vocab rows and the max()-based
    // recovery silently reset (n_docs, sumdl) to 0. The dedicated
    // 1-row scalars table cannot lose them.
    val statsDir = java.nio.file.Files.createTempDirectory("bm25_zv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bm25_zv_ckpt").toString
    VersionedTable.seed(statsDir, Seq(
      "vocab" -> Seq.empty[(String, Long)].toDF("tok", "df"),
      "scalars" -> Seq((0L, 0L)).toDF("n_docs", "sumdl")))
    val input = MemoryStream[Doc]
    val q = StreamingJobs.bm25StatsMaintenanceStream(input.toDF(), statsDir, ckpt)
    // null text -> split yields null -> explode emits NO vocab rows:
    // the genuine zero-vocab first wave the r15 ADVICE names.
    input.addData(Seq(Doc(1L, null, "en"), Doc(2L, null, "en")))
    q.processAllAvailable()
    input.addData(Seq(Doc(3L, "spark", "en")))
    q.processAllAvailable()
    q.stop()
    val scal = VersionedTable.read(spark, statsDir, "scalars").collect()
    assert(scal.length == 1, "scalars stay a single dedicated row")
    assert(scal.head.getLong(0) == 3L,
      s"n_docs must count the token-less wave too: ${scal.head.getLong(0)}")
  }

  test("streaming semantic-index maintenance: cross-wave embedding duplicates cluster") {
    import spark.implicits._
    import graft.pipeline.{Curation, Similarity}
    implicit val sqlCtx = spark.sqlContext
    val t = Similarity.SemanticDedupThreshold
    // Orthogonal directions: parallel (scaled) vectors are guaranteed
    // LSH collisions at cosine 1; cross-direction cosines are 0.
    def vec(i: Int, k: Float) = { val a = Array(0f, 0f, 0f); a(i) = k; a }
    val seed = Seq(Vec(10L, vec(0, 1f)), Vec(12L, vec(0, 1.1f)),
      Vec(30L, vec(0, -1f))).toDF()  // -u: opposite signs, cosine -1
    val corpusDir = java.nio.file.Files.createTempDirectory("sim_corpus").toString
    val indexDir = java.nio.file.Files.createTempDirectory("sim_index").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sim_ck").toString
    seed.write.mode("overwrite").parquet(s"$corpusDir/wave=seed")
    VersionedTable.seed(indexDir, Seq("labels" ->
      Curation.propagateMinLabels(Curation.undirectedEdges(
        Similarity.embeddingNearDupsLshOn(seed, t)
          .select(col("va").as("da"), col("vb").as("db"))))._1))
    val input = MemoryStream[Vec]
    val q = StreamingJobs.semanticIndexMaintenanceStream(
      input.toDF(), corpusDir, indexDir, t, ckpt)
    // Wave 1: 11 joins the standing {10, 12} cluster; 13 arrives fresh.
    input.addData(Seq(Vec(11L, vec(0, 2f)), Vec(13L, vec(1, 1f))))
    q.processAllAvailable()
    // Wave 2: 14 duplicates WAVE-1's 13 (cosine 1); 15 is fresh.
    input.addData(Seq(Vec(14L, vec(1, 1.5f)), Vec(15L, vec(2, 1f))))
    q.processAllAvailable()
    q.stop()
    val idx = VersionedTable.read(spark, indexDir, "labels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(10L, 11L, 12L).foreach(id =>
      assert(idx(id) == 10L, s"wave-1 join must persist for $id: $idx"))
    assert(idx(13L) == 13L && idx(14L) == 13L,
      s"the cross-WAVE embedding duplicate must cluster with its twin: $idx")
    assert(!idx.contains(15L) && !idx.contains(30L),
      "fresh and anti-parallel vectors stay out of the participants-only index")
    // Wave-over-wave ≡ full re-cluster of every vector that arrived.
    val corpusAfter = spark.read.parquet(corpusDir)
    val full = Curation.propagateMinLabels(Curation.undirectedEdges(
        Similarity.embeddingNearDupsLshOn(
          corpusAfter.select(col("vec_id"), col("embedding")), t)
          .select(col("va").as("da"), col("vb").as("db"))))._1
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idx == full, s"standing semantic index must equal the full re-cluster: $idx vs $full")
  }

  test("foreachBatch near-dup media gate drops Hamming<=3 arrivals; batch equals stream") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    implicit val sqlCtx = spark.sqlContext
    // Same cast as the exact-gate test, but the NEAR tier now also
    // drops C (the one-pixel edit at Hamming 1-3) — the re-encode /
    // small-edit case the exact tier structurally misses.
    val seedA = Array.tabulate[Byte](768)(i => (i % 192).toByte)
    val seedC = seedA.clone(); seedC(0) = 127.toByte
    val seedD = Array.tabulate[Byte](768)(i => (191 - i % 192).toByte)
    val pA = Multimodal.pngFixture(32, 24, seedA)
    val pC = Multimodal.pngFixture(32, 24, seedC)
    val ref = Seq(Med(1L, pA)).toDF()
    val arrivals = Seq(
      Med(10L, pA.clone()),
      Med(11L, pC),
      Med(12L, Multimodal.pngFixture(32, 24, seedD)),
      Med(13L, "corrupt".getBytes))
    // Planted premise: C is a TRUE near-dup (0 < Hamming ≤ 3) of A.
    val d = java.lang.Long.bitCount(
      Multimodal.dhash64(pA).get ^ Multimodal.dhash64(pC).get)
    assert(d > 0 && d <= Multimodal.PhashMaxHamming,
      s"planted near-dup must sit in the near band, Hamming $d")
    val outDir = java.nio.file.Files.createTempDirectory("neargate_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("neargate_ck").toString
    val input = MemoryStream[Med]
    val q = Multimodal.phashNearGateStream(input.toDF(), ref, outDir, ckpt)
    input.addData(arrivals.take(2)); q.processAllAvailable()
    input.addData(arrivals.drop(2)); q.processAllAvailable()
    q.stop()
    // The sink writes batch=<id> subdirs (the idempotent-replay key);
    // partition discovery surfaces that as a `batch` column — dropped
    // here to compare against the one-shot batch result.
    val outRead = spark.read.parquet(outDir)
    assert(outRead.columns.contains("batch"),
      "output must be batch-id-keyed (replay idempotence)")
    val streaming = outRead.drop("batch").orderBy("media_id").collect().toSeq
    val batch = Multimodal.phashNearNewMedia(arrivals.toDF(), ref)
      .orderBy("media_id").collect().toSeq
    assert(streaming == batch, "batch ≡ stream per micro-batch wave")
    assert(streaming.map(_.getLong(0)) == Seq(12L, 13L),
      s"exact AND near dups dropped; fresh and corrupt flow: $streaming")
    assert(streaming.find(_.getLong(0) == 13L).exists(_.isNullAt(1)),
      "corrupt arrival carries a null phash for downstream scoring")
  }

  test("full curation edge: strip + Bloom decon + semantic decon tiers; batch equals stream") {
    import spark.implicits._
    import graft.pipeline.Curation
    implicit val sqlCtx = spark.sqlContext
    // Standing artifacts, all computed from AT-REST data (the
    // lineStripStream recipe): a hot-shingle set from a corpus where
    // one 6-token passage repeats across two docs; a Bloom mask over a
    // held-out eval doc; one eval embedding.
    val corpus = Seq(
      Doc(1L, "first doc omega phi chi psi rho sigma trailing words", "en"),
      Doc(2L, "second doc omega phi chi psi rho sigma other ending", "en"),
      Doc(3L, "totally unrelated reference corpus text here", "en")).toDF()
    val hot = Curation.hotShinglesOf(corpus, 3, 1)
    val evalDocs = Seq(Doc(900L, "leak eval question answer tuple secret", "en")).toDF()
    val mask = Curation.bloomMaskOf(evalDocs)
    val evalVecs = Seq(Vec(900L, Array(0.0f, 0.0f, 1.0f))).toDF()
    val refDocs = corpus
    val corpusVecs = Seq(Vec(1L, Array(1.0f, 0.0f, 0.0f))).toDF()
    // 40 = clean of dups/decon but carries the corpus-hot passage →
    // admitted WITH the passage stripped; 41 = carries an eval shingle
    // → Bloom decon rejects; 42 = embedding colinear with the eval
    // vector → semantic decon rejects; 43 = clean, embedding pending.
    val arrivals = Seq(
      DocVec(40L, "intro words here omega phi chi psi rho sigma closing bits finish",
        "en", Array(0.0f, 1.0f, 0.0f)),
      DocVec(41L, "novel text with eval question answer inside it", "en",
        Array(0.0f, 1.0f, 0.0f)),
      DocVec(42L, "fresh wording nobody wrote before anywhere", "en",
        Array(0.0f, 0.0f, 2.0f)),
      DocVec(43L, "another genuinely novel document text", "en", null))
    def admit(df: org.apache.spark.sql.DataFrame) =
      StreamingJobs.ingestAdmit(df, refDocs, corpusVecs, 0.8, 0.9,
        hotShingles = Some(hot), deconMask = Some(mask),
        evalVecs = Some(evalVecs))
    val batch = admit(arrivals.toDF()).orderBy("doc_id").collect().toSeq
    assert(batch.map(_.getLong(0)) == Seq(40L, 43L),
      s"strip admits 40, decon tiers drop 41/42, clean 43 flows: " +
        s"${batch.map(_.getLong(0))}")
    val r40 = batch.find(_.getLong(0) == 40L).get
    assert(r40.getAs[Long]("n_masked") == 6L,
      s"the 6-token hot passage must be masked: $r40")
    val clean40 = r40.getAs[String]("clean_text")
    assert(!clean40.contains("omega") && clean40.contains("intro words here"),
      s"clean text drops the passage, keeps the fluent text: $clean40")
    // Stream form: same artifacts, two waves, identical decisions.
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[org.apache.spark.sql.Row])]
    val input = MemoryStream[DocVec]
    val dir = java.nio.file.Files.createTempDirectory("ingest_curate").toString
    val q = StreamingJobs.ingestDedupStream(input.toDF(), refDocs, corpusVecs,
      0.8, 0.9, dir, hotShingles = Some(hot), deconMask = Some(mask),
      evalVecs = Some(evalVecs)) { (admitted, batchId) =>
      out += batchId -> admitted.orderBy("doc_id").collect().toSeq
    }
    input.addData(arrivals.take(2)); q.processAllAvailable()
    input.addData(arrivals.drop(2)); q.processAllAvailable()
    q.stop()
    val streamed = out.sortBy(_._1).flatMap(_._2).toSeq
    assert(streamed.map(_.toSeq) == batch.map(_.toSeq),
      s"batch ≡ stream for the full curation edge: " +
        s"stream=${streamed.map(_.getLong(0))} batch=${batch.map(_.getLong(0))}")
  }

  test("Bloom-mask maintenance stream: per-wave OR-merge equals a fresh union build") {
    import spark.implicits._
    import graft.pipeline.Curation
    implicit val sqlCtx = spark.sqlContext
    val wave1 = Seq(Doc(900L, "first benchmark question answer tuple", "en"))
    val wave2 = Seq(Doc(901L, "second held out evaluation prompt text", "en"))
    val maskDir = java.nio.file.Files.createTempDirectory("mask_art").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mask_ck").toString
    // Seed: the all-zero mask (a fresh suite).
    VersionedTable.seed(maskDir, Seq("mask" -> Curation.bloomMaskToFrame(spark,
      new Array[Long](Curation.BloomBits / 64))))
    val input = MemoryStream[Doc]
    val q = StreamingJobs.bloomMaskMaintenanceStream(input.toDF(), maskDir, 3, ckpt)
    input.addData(wave1); q.processAllAvailable()
    input.addData(wave2); q.processAllAvailable()
    q.stop()
    val standing = Curation.bloomMaskFromFrame(
      VersionedTable.read(spark, maskDir, "mask"))
    val fresh = Curation.bloomMaskOf((wave1 ++ wave2).toDF(), 3)
    assert(standing.toSeq == fresh.toSeq,
      "two OR-merged waves must equal the fresh union build bit for bit")
    // And the standing artifact actually gates: both waves' docs flag,
    // an innocent doc does not.
    val probe = Curation.bloomDeconWithMask(
      Seq(Doc(1L, "first benchmark question answer tuple here", "en"),
        Doc(2L, "second held out evaluation prompt text copy", "en"),
        Doc(3L, "completely innocent training document words", "en")).toDF(),
      standing, 3)
    val flagged = probe.filter(col("flagged")).collect().map(_.getLong(0)).toSeq
    assert(flagged == Seq(1L, 2L), s"mask gates both waves' leaks: $flagged")
  }

  test("streamIdOf fails fast when no identity can be derived (r17 ADVICE)") {
    // The old driver-local read swallowed every Throwable into "",
    // silently degrading the replay ledger to the bare-id rule on any
    // checkpoint the driver could not read. Missing metadata must now
    // stop the stream loudly.
    val noMeta = java.nio.file.Files.createTempDirectory("no_meta").toString
    val e = intercept[IllegalStateException](
      StreamingJobs.streamIdOf(spark, noMeta))
    assert(e.getMessage.contains("metadata"))
    // An id-less metadata file is equally fatal (never a silent "").
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(noMeta, "metadata"), "{}")
    intercept[IllegalStateException](StreamingJobs.streamIdOf(spark, noMeta))
  }

  test("waveKey carries the FULL stream UUID (r17 ADVICE: no prefix-collision window)") {
    val sid = "6ba7b810-9dad-11d1-80b4-00c04fd430c8"
    assert(StreamingJobs.waveKey(sid, 3L) == s"$sid-3",
      "a truncated id would let two streams share a wave namespace")
    assert(StreamingJobs.waveKey("", 0L) == "legacy-0")
  }
}
