package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the windowed event operators (B31–B34).
  * Each reuses the SAME logical query as the batch form in [[Windows]],
  * with a watermark bounding state — the batch/streaming duality Spark's
  * incrementalization model is built on. State size at scale is
  * (watermark horizon × active keys), independent of total stream length.
  */
object StreamingJobs {

  /** B31 streaming: tumbling 1-hour aggregation with a 10-minute
    * late-data watermark. */
  def tumbling(events: DataFrame): DataFrame =
    Windows.tumblingAgg(events.withWatermark("ts", "10 minutes"))

  /** B32 streaming: sliding windows under the same watermark. */
  def sliding(events: DataFrame): DataFrame =
    Windows.slidingAgg(events.withWatermark("ts", "10 minutes"))

  /** B33 streaming: native session windows (30-minute inactivity gap) —
    * the streaming counterpart of [[Windows.sessionAgg]]'s lag+cumsum
    * batch form. */
  def sessionized(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("sum_value"))

  /** B34 streaming: exactly-once event-id dedup inside the watermark
    * horizon. `dropDuplicatesWithinWatermark` is load-bearing: plain
    * dropDuplicates("event_id") would NOT evict state via the watermark
    * (eviction requires the event-time column among the dedup keys), so
    * its state grows with total stream length; the within-watermark form
    * drops each key's state once the watermark passes it — state stays
    * (horizon × arrival rate). */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark("event_id")

  /** Streaming → JDBC sink via `foreachBatch`: each micro-batch appends
    * through the same Spark JDBC writer the batch loader uses
    * (`batchsize` batched inserts). Delivery is at-least-once — a restart
    * may replay the last uncommitted micro-batch — so the documented
    * production pattern is an idempotent target (unique key + MERGE, or a
    * `batch_id` column with dedup-on-read); Spark's JDBC writer has no
    * cross-partition transaction to offer exactly-once on its own.
    * Checkpointing makes replays bounded to one batch. */
  def toJdbc(df: org.apache.spark.sql.DataFrame, url: String, table: String,
      checkpointDir: String, batchSize: Int = 500): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .option("batchsize", batchSize.toString)
          .jdbc(url, table, new java.util.Properties())
      }
      .start()

  /** Online retrieval at the serving edge: each micro-batch of QUERY
    * vectors (q_id, q_emb) is answered with its exact cosine top-`k`
    * against the at-rest corpus via the proven x68 kernel
    * ([[graft.pipeline.Similarity.annTopKOn]]) inside `foreachBatch` —
    * the embedding-side counterpart of the dedup/decon gates: those
    * stream DOCUMENTS against standing indexes, this streams QUERIES
    * against the standing corpus. One corpus pass per micro-batch
    * regardless of batch width (the x68 batching win, now at the edge);
    * at deployment scale the corpus side is the at-rest IVF layout, so
    * the same call serves from the x138 partition-pruned index.
    *
    * Batch ≡ stream by construction: queries are mutually independent
    * and the corpus is static within a wave, so micro-batch boundaries
    * cannot change any result row (StreamingSpec pins two waves against
    * the one-shot batch answer). At-least-once delivery, idempotent
    * sink recommended — a replayed wave re-emits the same rows. */
  def annServeStream(queryVecs: DataFrame, corpus: DataFrame, k: Int,
      checkpointDir: String)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queryVecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.pipeline.Similarity.annTopKOn(batch, corpus, k), batchId)
      }
      .start()

  /** x26 streaming, near tier included: full incremental dedup (exact
    * sha-match PLUS near-dup Jaccard ≥ `threshold` against the static
    * corpus) per micro-batch via `foreachBatch`. The exact tier alone
    * runs as one continuous stream-static anti-join
    * ([[graft.pipeline.Dedup.exactNewDocs]]); the near tier's prefix
    * windows and union-corpus df aggregation are not incrementalizable
    * shapes for a single continuous query — but they don't need to be:
    * inside `foreachBatch` each micro-batch is a BATCH frame, so the
    * proven batch operator ([[graft.pipeline.Dedup.incrementalDedup]])
    * runs verbatim against the at-rest corpus — the production pattern
    * for an append-only ingestion edge (N×ΔN per batch, never N²).
    * Survivors feed `sink` (write to the lake, append to the corpus, …).
    *
    * Semantics note, same as every foreachBatch job: delivery is
    * at-least-once (a restart can replay the last uncommitted batch), so
    * the sink should be idempotent; batch≡stream equivalence of the
    * DECISION is gated in StreamingSpec. Docs within one micro-batch are
    * deduped against the corpus, not against each other — identical to
    * the batch operator's contract. */
  def incrementalDedupStream(newDocs: DataFrame, refDocs: DataFrame,
      threshold: Double, checkpointDir: String)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.pipeline.Dedup.incrementalDedup(batch, refDocs, threshold), batchId)
      }
      .start()

  /** x36 streaming: incremental SEMANTIC dedup per micro-batch via
    * `foreachBatch` — the embedding tier of the ingestion edge, closing
    * the set: exact (sha), lexical-near (prefix-filter Jaccard), and
    * semantic (cosine vs the at-rest corpus) all run per batch. Same
    * structure and same reasoning as [[incrementalDedupStream]]: the
    * broadcast-batch max-cosine shape is not an incrementalizable
    * continuous query, but inside foreachBatch the proven batch operator
    * ([[graft.pipeline.Similarity.incrementalSemanticDedup]]) runs
    * verbatim — ΔN broadcasts, the corpus streams map-side, N×ΔN per
    * batch. At-least-once delivery; idempotent sink recommended;
    * batch≡stream decision equivalence gated in StreamingSpec. Vectors
    * within one micro-batch are judged against the corpus only, not
    * against each other — identical to the batch operator's contract. */
  def incrementalSemanticDedupStream(newVecs: DataFrame, corpusVecs: DataFrame,
      threshold: Double, checkpointDir: String)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    newVecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.pipeline.Similarity.incrementalSemanticDedup(batch, corpusVecs, threshold), batchId)
      }
      .start()

  /** The per-batch admission decision of [[ingestDedupStream]] as a
    * plain batch operator — the arriving frame carries (doc_id, text,
    * …, embedding), i.e. the ingestion-edge reality where the embedding
    * is computed upstream of admission. Tiers, in order:
    *
    *  1. exact (sha256 anti-join vs `refDocs`) and lexical near-dup
    *     (union-df prefix filter at `lexThreshold`) — the proven
    *     [[graft.pipeline.Dedup.incrementalDedup]], which preserves the
    *     batch's extra columns;
    *  2. semantic — the survivors' embeddings against `corpusVecs`
    *     through the threshold-dispatched
    *     [[graft.pipeline.Similarity.incrementalSemanticDedupAuto]]
    *     (bucketed candidates at production cuts ≥ 0.9, exact broadcast
    *     scan below). Rows with a null embedding pass the tier untouched
    *     (no cosine can reach any threshold) — embeddings lagging
    *     ingestion must not silently drop documents.
    *
    * The curateV2 tail tiers run when their standing artifacts are
    * supplied (r14 ask #4 — a production ingest wave needs them BEFORE
    * admission, and each follows the lineStripStream recipe: the
    * reference set comes from the AT-REST corpus, the batch is
    * processed against it by the proven batch operator):
    *
    *  3. span strip (x34b) against `hotShingles` — the corpus's
    *     standing hot-shingle set ([[graft.pipeline.Curation
    *     .hotShinglesOf]], computed once per snapshot): admitted rows
    *     gain (n_tokens, n_masked, clean_text). Frequency MUST come
    *     from the corpus, not the batch (a micro-batch can't see
    *     corpus-wide df). Computed on DISTINCT (doc_id, text) and
    *     rejoined — the repetition-gate discipline, so at-least-once
    *     duplicate delivery can't corrupt per-doc reassembly;
    *  4. Bloom decontamination (x17/x67) against `deconMask` — the
    *     standing eval-suite mask (OR-merge-maintained;
    *     [[graft.pipeline.Curation.mergeBloomMasks]]): any doc whose
    *     CLEAN text (post-strip when tier 3 ran) shares a shingle with
    *     the mask is rejected. The Bloom sieve is lossless in the
    *     reject direction (x67b): zero hits proves zero overlap;
    *  5. semantic decontamination (x35) against `evalVecs`: arrivals
    *     whose embedding reaches `deconSemThreshold` cosine of any eval
    *     vector are rejected; null embeddings pass (same contract as
    *     the semantic dedup tier).
    *
    * Returns the ORIGINAL batch rows that cleared every tier (plus the
    * strip audit columns when tier 3 ran). Running the tiers inside ONE
    * body means a single admission decision sees all verdicts — one
    * sink, one idempotency story, one checkpoint — instead of
    * independent stream jobs whose partial admissions a downstream join
    * would have to reconcile. */
  def ingestAdmit(batch: DataFrame, refDocs: DataFrame, corpusVecs: DataFrame,
      lexThreshold: Double, semThreshold: Double,
      qualityGate: Option[Column] = None,
      repetitionGate: Boolean = false,
      hotShingles: Option[DataFrame] = None,
      stripShingleLen: Int = 3, stripMinRun: Int = 5,
      deconMask: Option[Array[Long]] = None, deconShingleLen: Int = 3,
      evalVecs: Option[DataFrame] = None,
      deconSemThreshold: Double = 0.3): DataFrame = {
    // Cheapest tier first: a per-row quality predicate (e.g. the x51
    // Gopher battery via Selection.gopherPassColumn, or the x64
    // classifier via Selection.classifierKeepColumn) rejects before any
    // dedup join runs — the production admission ordering. Gates built
    // from the engine's registered functions (token_hash etc.) must
    // analyze against THIS batch's session — under foreachBatch that is
    // a cloned session the caller never saw (the x36 lesson), so
    // register here, not at the call site.
    graft.functions.GraftFunctions.register(batch.sparkSession)
    val gated0 = qualityGate.map(batch.filter).getOrElse(batch)
    // Optional x58c tier: the full published Gopher repetition battery
    // (x58/x58b signals at the Table-A1 thresholds) as an admission
    // rule. Per-doc and stateless across docs, so batch ≡ stream holds
    // by construction — but NOT per-row: the signals are aggregations
    // over a doc's own n-grams, so an at-least-once duplicate delivery
    // (k copies of one doc in a batch) would double every count and
    // flip verdicts. The gate therefore computes on DISTINCT
    // (doc_id, text) and rejoins left_semi, which also preserves the
    // batch's own row multiplicity for the idempotent sink (the same
    // discipline as the semantic-tier rejoin below).
    val gated =
      if (!repetitionGate) gated0
      else gated0.join(
        graft.pipeline.Repetition.gateOf(
          gated0.select(col("doc_id"), col("text")).distinct())
          .filter(col("pass_all")).select("doc_id"),
        Seq("doc_id"), "left_semi")
    val lexOk = graft.pipeline.Dedup.incrementalDedup(gated, refDocs, lexThreshold)
    val semOk = graft.pipeline.Similarity.incrementalSemanticDedupAuto(
      lexOk.select(col("doc_id").as("vec_id"), col("embedding")),
      corpusVecs, semThreshold)
      .select(col("vec_id").as("doc_id"))
    // left_semi, not inner: semOk is a survivor-ID SET. Under
    // at-least-once delivery an intra-batch duplicate doc_id holds k
    // rows in BOTH frames; an inner join would emit k*k rows —
    // amplifying duplicates downstream — where semi preserves the
    // batch's own multiplicity for the idempotent sink to absorb.
    val admitted = lexOk.join(semOk, Seq("doc_id"), "left_semi")
    // Tier 3: x34b span strip vs the at-rest hot set. The audit frame
    // is per-doc (DISTINCT input, inner rejoin on doc_id preserves the
    // batch's own multiplicity without amplification).
    val stripped = hotShingles match {
      case None => admitted
      case Some(hot) =>
        admitted.join(
          graft.pipeline.Curation.spanMaskAgainst(
            admitted.select(col("doc_id"), col("text")).distinct(),
            hot, stripShingleLen, minRun = stripMinRun)
            .select(col("doc_id"), col("n_tokens"), col("n_masked"),
              col("clean_text")),
          Seq("doc_id"))
    }
    // Tier 4: Bloom-mask decon on the clean text (post-strip when the
    // strip tier ran — a masked passage must not still leak its grams
    // into the decon probe).
    val deconText = if (hotShingles.isDefined) col("clean_text") else col("text")
    val bloomOk = deconMask match {
      case None => stripped
      case Some(mask) =>
        val flagged = graft.pipeline.Curation.bloomDeconWithMask(
          stripped.select(col("doc_id"), deconText.as("text")).distinct(),
          mask, deconShingleLen)
          .filter(col("flagged")).select("doc_id")
        stripped.join(flagged, Seq("doc_id"), "left_anti")
    }
    // Tier 5: semantic decon vs the eval vectors; null embeddings pass.
    evalVecs match {
      case None => bloomOk
      case Some(ev) =>
        val contam = graft.pipeline.Similarity.semanticDecon(
          bloomOk.filter(col("embedding").isNotNull)
            .select(col("doc_id").as("vec_id"), col("embedding")).distinct(),
          ev, deconSemThreshold)
          .filter(col("contaminated"))
          .select(col("vec_id").as("doc_id"))
        bloomOk.join(contam, Seq("doc_id"), "left_anti")
    }
  }

  /** Unified ingestion edge: ALL dedup tiers — exact sha, lexical
    * near-dup, semantic — in ONE foreachBatch body via [[ingestAdmit]],
    * replacing the three separate stream jobs above for deployments that
    * want one admission decision per batch. Batch ≡ stream holds by
    * construction (foreachBatch hands the same batch frame the batch
    * operator takes) and is gated end-to-end in StreamingSpec; restart
    * recovery (including the cross-session function-registration class
    * of bug x36's RecoverySpec caught) is gated in RecoverySpec.
    * At-least-once delivery as with every foreachBatch job — keep the
    * sink idempotent. */
  def ingestDedupStream(newDocs: DataFrame, refDocs: DataFrame,
      corpusVecs: DataFrame, lexThreshold: Double, semThreshold: Double,
      checkpointDir: String, qualityGate: Option[Column] = None,
      repetitionGate: Boolean = false,
      hotShingles: Option[DataFrame] = None,
      stripShingleLen: Int = 3, stripMinRun: Int = 5,
      deconMask: Option[Array[Long]] = None, deconShingleLen: Int = 3,
      evalVecs: Option[DataFrame] = None,
      deconSemThreshold: Double = 0.3)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(ingestAdmit(batch, refDocs, corpusVecs, lexThreshold, semThreshold,
          qualityGate, repetitionGate, hotShingles, stripShingleLen,
          stripMinRun, deconMask, deconShingleLen, evalVecs,
          deconSemThreshold), batchId)
      }
      .start()

  /** x45 streaming: cross-corpus boilerplate strip per micro-batch. The
    * hot-line set comes from the AT-REST corpus (computed once by the
    * caller — [[graft.pipeline.Curation.hotLinesOf]], ideally persisted)
    * and each arriving batch is stripped against it via the proven batch
    * operator inside foreachBatch. Frequency must come from the corpus,
    * not the batch: a micro-batch can neither see that a nav bar is
    * corpus-wide nor avoid false hot lines from one spammy burst.
    * Batch ≡ stream gated in StreamingSpec. */
  def lineStripStream(newDocs: DataFrame, hotLines: DataFrame,
      lines: org.apache.spark.sql.Column, sep: String, checkpointDir: String)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.pipeline.Curation.lineStripAgainst(batch, hotLines, lines, sep), batchId)
      }
      .start()

  /** The maintenance streams' identity for the [[VersionedTable]]
    * replay ledger: the streaming query id persisted in the
    * checkpoint's `metadata` file (a documented, stable on-disk JSON —
    * `{"id":"<uuid>"}`), written by Spark at query start, BEFORE the
    * first micro-batch runs. Restarting the same checkpoint keeps the
    * id (replay skip applies); deleting/recreating the checkpoint —
    * even at the same path — mints a fresh id, which is exactly the
    * event that restarts the batch-id counter and must begin a fresh
    * ledger entry instead of silently dropping data (r16 ADVICE,
    * medium).
    *
    * Read through the HADOOP FILESYSTEM API, and FAIL FAST when no
    * identity can be derived (r17 ADVICE, medium): the old driver-local
    * java.nio read swallowed every Throwable into "", so on any
    * checkpointLocation that is not driver-local-readable (hdfs://,
    * s3a://, permissions) the ledger silently degraded to the legacy
    * bare-id rule — resurrecting the exact fresh-checkpoint silent
    * data-drop the identities exist to prevent. By the time a
    * foreachBatch body calls this, Spark has already written the
    * metadata file at query start; an unreadable/unparseable file here
    * is an operational fault that must stop the stream loudly, the
    * VersionedTable requireLocal discipline. */
  private[streaming] def streamIdOf(s: SparkSession, checkpointDir: String): String = {
    val path = new org.apache.hadoop.fs.Path(checkpointDir, "metadata")
    val txt =
      try {
        val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
        val in = fs.open(path)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      } catch {
        case e: Exception => throw new IllegalStateException(
          s"cannot read streaming-query metadata at $path — the " +
            s"maintenance streams' replay ledger needs the query identity " +
            s"Spark persists there at start; refusing to degrade to the " +
            s"bare-batch-id rule (it silently drops or double-merges data " +
            s"across checkpoint resets)", e)
      }
    """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt)
      .map(_.group(1).replace(":", "")).getOrElse(throw new IllegalStateException(
        s"streaming-query metadata at $path carries no \"id\" field: $txt"))
  }

  /** The corpus-subdir partition value for one maintenance wave:
    * unique per (stream identity, batch id), so a ledger-reset stream
    * (fresh checkpoint, ids restarting at 0) can never OVERWRITE a
    * previous stream's batch subdirectory — its wave 0 lands beside
    * history, not on top of it. The reference side of a merge is then
    * "every wave except the current one" (≡ `batch < batchId` within
    * one stream, plus all prior streams' merged waves). Seed data uses
    * the literal `wave=seed`. The FULL stream UUID keys the namespace
    * (r17 ADVICE: an 8-hex-char prefix left a ~2⁻³² prefix-collision
    * window in which a new stream's mode("overwrite") wave write would
    * land on — and destroy — another stream's subdirectory; the full
    * UUID is already directory-name-safe and collision-free). */
  private[streaming] def waveKey(streamId: String, batchId: Long): String =
    s"${if (streamId.isEmpty) "legacy" else streamId}-$batchId"

  /** x121 streaming: standing cluster-index MAINTENANCE at the
    * ingestion edge. Each micro-batch (1) merges into the AT-REST label
    * index via the proven star∪delta operator
    * ([[graft.pipeline.Curation.incrementalClustersFromIndex]]), (2)
    * overwrites the index with the merged participants-only map, and
    * (3) appends the batch to the at-rest corpus — so the index wave
    * N+1 reads is the one wave N wrote. This is the piece the
    * stream-static gate jobs structurally cannot do: their static side
    * never advances, so a wave-2 arrival duplicating a WAVE-1 arrival
    * goes unseen; here it clusters with it (StreamingSpec plants
    * exactly that).
    *
    * Storage discipline (r16, the same hardening the LM/BM25 streams
    * got; r17 wave keys): the corpus is wave-keyed subdirs
    * (`corpusDir/wave=<streamId>-<id>` via [[waveKey]]; seed the
    * initial corpus under `wave=seed`) — a replayed wave REWRITES its
    * own subdirectory instead of double-appending, and a ledger-reset
    * stream (fresh checkpoint, ids restarting at 0) lands BESIDE
    * history instead of overwriting another stream's `batch=0` — and
    * the label index is a [[VersionedTable]] (table "labels"; seed an
    * empty (node, lbl) frame for a fresh start), so a crash mid-wave
    * leaves the previous index version live and the pointer's
    * (stream, batch-id) ledger makes the merge exactly-once. Write
    * order is load-bearing: the corpus subdir lands FIRST (idempotent),
    * the merge reads `ref` as every wave EXCEPT the current one
    * (partition pruning keeps the just-written subdir out of the
    * reference side; within one stream this equals `batch < batchId`,
    * and prior streams' merged waves stay reference), and the index
    * commit is the atomic last step — a crash between the two replays
    * into an identical corpus rewrite + the merge. Replay determinism
    * is the SOURCE's contract (standard Structured Streaming): a
    * non-replayable source re-delivering a batch id with different
    * data rewrites the wave subdir without re-merging the index —
    * don't do that (r16 ADVICE, documented). Exactly one maintenance
    * stream may own an artifact at a time. */
  def clusterIndexMaintenanceStream(newDocs: DataFrame, corpusDir: String,
      indexDir: String, threshold: Double, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sid = streamIdOf(batch.sparkSession, checkpointDir)
        if (!VersionedTable.alreadyMerged(indexDir, batchId, sid)) {
          val s = batch.sparkSession
          val wave = waveKey(sid, batchId)
          val b = batch.select(col("doc_id"), col("text"))
          b.write.mode("overwrite").parquet(s"$corpusDir/wave=$wave")
          val ref = s.read.parquet(corpusDir)
            .filter(col("wave") =!= wave)
            .select(col("doc_id"), col("text"))
          val merged = graft.pipeline.Curation
            .incrementalClustersFromIndex(b, ref,
              VersionedTable.read(s, indexDir, "labels"), threshold)
          VersionedTable.commit(indexDir, batchId, Seq("labels" ->
            merged.filter(col("cluster_size") >= 2)
              .select(col("doc_id").as("node"), col("cluster_id").as("lbl"))),
            sid)
        }
        ()
      }
      .start()

  /** x129 streaming: the SEMANTIC cluster index maintained at the
    * ingestion edge — [[clusterIndexMaintenanceStream]]'s exact shape
    * with the LSH-cosine merge
    * ([[graft.pipeline.Similarity.incrementalSemanticClustersFromIndex]])
    * over (vec_id, embedding) waves. Same storage discipline
    * (batch-keyed corpus subdirs + [[VersionedTable]] label index,
    * exactly-once via the pointer ledger, corpus-first write order),
    * same wave-over-wave guarantee: the standing semantic index after
    * N waves equals a full re-cluster of every vector that ever
    * arrived (StreamingSpec gates it with a planted cross-wave
    * duplicate). */
  def semanticIndexMaintenanceStream(newVecs: DataFrame, corpusDir: String,
      indexDir: String, threshold: Double, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newVecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sid = streamIdOf(batch.sparkSession, checkpointDir)
        if (!VersionedTable.alreadyMerged(indexDir, batchId, sid)) {
          val s = batch.sparkSession
          val wave = waveKey(sid, batchId)
          val b = batch.select(col("vec_id"), col("embedding"))
          b.write.mode("overwrite").parquet(s"$corpusDir/wave=$wave")
          val ref = s.read.parquet(corpusDir)
            .filter(col("wave") =!= wave)
            .select(col("vec_id"), col("embedding"))
          val merged = graft.pipeline.Similarity
            .incrementalSemanticClustersFromIndex(b, ref,
              VersionedTable.read(s, indexDir, "labels"), threshold)
          VersionedTable.commit(indexDir, batchId, Seq("labels" ->
            merged.filter(col("cluster_size") >= 2)
              .select(col("vec_id").as("node"), col("cluster_id").as("lbl"))),
            sid)
        }
        ()
      }
      .start()

  /** x17/x67 streaming: standing Bloom-decon-mask MAINTENANCE at the
    * eval-suite edge. Each micro-batch of NEW EVAL DOCS (a fresh
    * benchmark added to the held-out suite) is hashed to its own delta
    * mask and OR-merged into the at-rest mask frame
    * ([[graft.pipeline.IndexExport]]'s `bloom_mask` artifact) — sound
    * because a Bloom filter over a union of corpora is exactly the
    * bitwise OR of their filters (set positions are per-shingle
    * functions; law proven in CurationSpec via
    * [[graft.pipeline.Curation.mergeBloomMasks]]). The standing mask
    * the ingestion gate probes therefore tracks a GROWING eval suite
    * without ever re-hashing history.
    *
    * The mask lives in a [[VersionedTable]] (table "mask"; seed with
    * [[graft.pipeline.Curation.bloomMaskToFrame]] of an empty mask for
    * a fresh start). The OR-merge was always idempotent under replay
    * (re-setting set bits), but the old in-place overwrite still had
    * the crash-loss window every maintenance stream shared — a death
    * mid-write destroyed the on-disk mask with the collected copy lost
    * with the app. Versioned commits close it, and the pointer ledger
    * additionally skips replayed waves outright. */
  def bloomMaskMaintenanceStream(newEvalDocs: DataFrame, maskDir: String,
      shingleLen: Int, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newEvalDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sid = streamIdOf(batch.sparkSession, checkpointDir)
        if (!VersionedTable.alreadyMerged(maskDir, batchId, sid)) {
          val s = batch.sparkSession
          val old = graft.pipeline.Curation.bloomMaskFromFrame(
            VersionedTable.read(s, maskDir, "mask"))
          val delta = graft.pipeline.Curation.bloomMaskOf(batch, shingleLen)
          VersionedTable.commit(maskDir, batchId, Seq("mask" ->
            graft.pipeline.Curation.bloomMaskToFrame(s,
              graft.pipeline.Curation.mergeBloomMasks(old, delta))), sid)
        }
        ()
      }
      .start()

  /** x133 streaming: standing unigram-LM-TABLE maintenance at the
    * ingestion edge. Each micro-batch's token counts merge into the
    * at-rest LM table via the proven mergeable-counts operator
    * ([[graft.pipeline.TextStats.incrementalUnigramLm]]) and the table
    * is rewritten — the wave-over-wave form of x133's merged ≡ rebuilt
    * law (StreamingSpec proves the table after N waves equals a full
    * recount of everything that ever arrived). The artifact lives in a
    * [[VersionedTable]] (table name "lm"; seed with an empty (tok, cf)
    * frame for a fresh start): each wave writes a COMPLETE new version
    * and atomically advances the pointer, so a crash anywhere leaves
    * the previous version live and intact — the prior in-place
    * overwrite destroyed the artifact if the app died mid-write (old
    * parquet deleted, localCheckpoint blocks gone with the app).
    * Replay is EXACTLY-ONCE in effect: the pointer records the last
    * merged batch id and a re-delivered micro-batch is skipped
    * (the r15 double-count caveat, closed; StreamingSpec replays a
    * merged batch through a fresh checkpoint and proves the counts do
    * not move). */
  def lmMaintenanceStream(newDocs: DataFrame, lmDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sid = streamIdOf(batch.sparkSession, checkpointDir)
        if (!VersionedTable.alreadyMerged(lmDir, batchId, sid)) {
          val merged = graft.pipeline.TextStats.incrementalUnigramLm(
            batch, VersionedTable.read(batch.sparkSession, lmDir, "lm"))
          VersionedTable.commit(lmDir, batchId, Seq("lm" -> merged), sid)
        }
        ()
      }
      .start()

  /** x139 streaming: standing BM25 retrieval-statistics maintenance —
    * the same wave shape over the BM25 stats artifact (scoring reads it
    * via [[graft.pipeline.Selection.bm25FromStats]]). The artifact is a
    * [[VersionedTable]] with TWO tables committed in one atomic swap:
    * "vocab" (tok, df) and "scalars" (its own always-one-row
    * (n_docs, sumdl) table, NOT columns denormalized onto vocab rows —
    * so a zero-vocab wave or an empty-text seed can never reset the
    * scalars through a max()-over-no-rows recovery; r15 ADVICE closed).
    * The merge is [[graft.pipeline.Selection.incrementalBm25StatsParts]];
    * crash-safety and exactly-once replay semantics are
    * [[lmMaintenanceStream]]'s. [[readBm25Stats]] rejoins the two
    * tables into the self-contained (tok, df, n_docs, sumdl) frame the
    * scorers consume. */
  def bm25StatsMaintenanceStream(newDocs: DataFrame, statsDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sid = streamIdOf(batch.sparkSession, checkpointDir)
        if (!VersionedTable.alreadyMerged(statsDir, batchId, sid)) {
          val s = batch.sparkSession
          val (vocab, scal) = graft.pipeline.Selection.incrementalBm25StatsParts(
            batch,
            VersionedTable.read(s, statsDir, "vocab"),
            VersionedTable.read(s, statsDir, "scalars"))
          VersionedTable.commit(statsDir, batchId,
            Seq("vocab" -> vocab, "scalars" -> scal), sid)
        }
        ()
      }
      .start()

  /** The self-contained (tok, df, n_docs, sumdl) frame the scorers
    * consume ([[graft.pipeline.Selection.bm25FromStats]]), rejoined
    * from the live version's vocab + scalars tables. */
  def readBm25Stats(s: SparkSession, statsDir: String): DataFrame =
    VersionedTable.read(s, statsDir, "vocab")
      .crossJoin(broadcast(VersionedTable.read(s, statsDir, "scalars")))
      .select(col("tok"), col("df"), col("n_docs"), col("sumdl"))

  /** x12 streaming: stream-stream interval join. Both sides carry
    * watermarks and the join condition bounds purchase time to
    * [click, click + 2h], so Spark evicts click state once the watermark
    * passes click + 2h and purchase state immediately — join state stays
    * (horizon × arrival rate), independent of stream length. */
  def attribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
    Windows.attributionJoin(clicks, purchases)
  }
}
