package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus observability (x70) — a LEAF-CONSUMER module by design: it
  * reads fragments from TextStats, Selection, and IngestGate at object
  * init, and NOTHING references Report back, so the init-dependency
  * graph stays acyclic (TextStats ← Selection, TextStats ← IngestGate
  * are existing edges; a report living inside TextStats would have
  * closed both cycles, and a cyclic object-init graph can deadlock the
  * JVM under concurrent first access — two threads each holding one
  * class-init lock while waiting on the other's). */
object Report {
  /** x70 — the per-source corpus health report an operating pipeline
    * monitors every ingestion cycle: document and token mass, quality-
    * floor pass count, Gopher-battery pass count, PII incidence, and
    * exact-duplicate mass, per `source`. Every signal is the SAME
    * single-sourced definition its home operator registers
    * ([[TextStats.qualityColumn]] + x24's floor,
    * [[Selection.gopherPassColumn]], [[PiiPatterns.emailCount]], B27's
    * sha-group size), so the report can never drift from the gates it
    * summarizes. All aggregates are integer counts/sums — no float mean
    * whose cross-engine summation order could flip a rounded digit —
    * so the report is engine-exact. NULL text reads as the empty doc
    * (the x56 coalesce discipline): a NULL hash would silently drop the
    * doc from the dup join — invisible to the oracle compare, which
    * would drop the same row — and an observability report that loses
    * documents is worse than none.
    *
    * Scale: ONE materialized pass computes every per-doc signal
    * map-side (eager checkpoint — the frame feeds both the dup-size
    * aggregation and the scored join, which would otherwise each
    * re-scan and re-hash the corpus); the source-keyed aggregation is
    * partial+final over a handful of strata; the dup-size side is
    * B27's uniform hash shuffle joined back at doc grain. */
  def corpusReport(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.t(s, dir, "documents")
      .withColumn("text", coalesce(col("text"), lit("")))
      .select(col("doc_id"), col("source"),
        sha2(col("text"), 256).as("h"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        (TextStats.qualityColumn >= graft.streaming.IngestGate.MinQuality).as("q_pass"),
        Selection.gopherPassColumn.as("g_pass"),
        (PiiPatterns.emailCount > 0).as("has_pii"))
      .transform(Checkpoints.stable)
    val dup = scored.groupBy("h").agg(count(lit(1)).as("grp"))
    scored.join(dup, "h").groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tok").as("n_tokens"),
      sum(when(col("q_pass"), 1L).otherwise(0L)).as("n_pass_quality"),
      sum(when(col("g_pass"), 1L).otherwise(0L)).as("n_pass_gopher"),
      sum(when(col("has_pii"), 1L).otherwise(0L)).as("n_with_pii"),
      sum(when(col("grp") > 1, 1L).otherwise(0L)).as("n_in_dup_groups"))
      .orderBy("source")
  }

  private val x70Sql = {
    import graft.streaming.IngestGate
    s"""WITH base AS (SELECT doc_id, source, coalesce(text, '') AS text
                    FROM documents),
       dup AS (SELECT sha256(text) AS h, count(*) AS grp
               FROM base GROUP BY sha256(text)),
       scored AS (SELECT source,
           sha256(text) AS h,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           (${TextStats.qualitySqlExpr}) >= ${IngestGate.MinQuality} AS q_pass,
           (${Selection.gopherPassSql}) AS g_pass,
           (${IngestGate.emailsSql}) > 0 AS has_pii
         FROM base)
       SELECT source, count(*) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN q_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_quality,
         CAST(sum(CASE WHEN g_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_gopher,
         CAST(sum(CASE WHEN has_pii THEN 1 ELSE 0 END) AS BIGINT) AS n_with_pii,
         CAST(sum(CASE WHEN grp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_dup_groups
       FROM scored JOIN dup USING (h)
       GROUP BY source ORDER BY source"""
  }

  // ---------------------------------------------------------------- x91
  /** x91 — the per-document ATTRIBUTES sidecar (the Dolma pattern,
    * Soldaini et al. 2024: curation signals ship in a doc_id-keyed
    * attributes file BESIDE the immutable text, and every downstream
    * mixer/filter joins on it instead of re-deriving signals): one
    * frame carrying, per document, every per-doc signal this engine
    * registers — provenance (source, lang), size (chars, whitespace
    * tokens), integer quality basis points, the quality-floor and
    * Gopher-battery verdicts, PII incidence, the pinned classifier's
    * keep decision, the content sha256, and the exact-dup group size.
    * Every column is the SAME single-sourced definition its home
    * operator registers ([[Sampling.qualityBpColumn]],
    * [[TextStats.qualityColumn]] + x24's floor,
    * [[Selection.gopherPassColumn]], [[PiiPatterns.emailCount]],
    * [[Selection.classifierKeepColumn]], B27's sha grouping), so the
    * sidecar can never disagree with the gates — x70 aggregates these
    * signals per source; x91 EXPORTS them per document.
    *
    * Scale: every signal but the dup size is a map-side expression in
    * ONE checkpointed corpus pass (the x70 frame discipline); the dup
    * size adds B27's uniform sha shuffle joined back at doc grain.
    * The sidecar is the join target for every later mixing decision —
    * at 100 TB that is the point: signals are computed once, stored
    * columnar, and re-scanned instead of re-derived. */
  def docAttributes(s: SparkSession, dir: String): DataFrame = {
    val scored = attrFrame(s, dir)
    val dup = scored.groupBy("h").agg(count(lit(1)).as("dup_group_size"))
    scored.join(dup, "h")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        col("n_tok"), col("quality_bp"), col("q_pass"), col("g_pass"),
        col("n_emails"), col("clf_keep"), col("h"), col("dup_group_size"))
      .orderBy("doc_id")
  }

  /** The x91 attributes frame — one checkpointed corpus pass computing
    * every single-sourced per-doc signal map-side. Shared verbatim by
    * x91 (which adds the dup-group size) and x92 (which adds the
    * canonical-representative id and folds the signals into a verdict),
    * so the mixer can never disagree with the sidecar it reads. */
  private def attrFrame(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.t(s, dir, "documents")
      .withColumn("text", coalesce(col("text"), lit("")))
      .select(col("doc_id"), col("source"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        Sampling.qualityBpColumn.as("quality_bp"),
        (TextStats.qualityColumn >= graft.streaming.IngestGate.MinQuality)
          .as("q_pass"),
        Selection.gopherPassColumn.as("g_pass"),
        PiiPatterns.emailCount.cast("long").as("n_emails"),
        Selection.classifierKeepColumn.as("clf_keep"),
        sha2(col("text"), 256).as("h"))
      .transform(Checkpoints.stable)
  }

  /** The oracle-side mirror of [[attrFrame]]: the x64 pinned-classifier
    * CTE chain plus the `attr` CTE carrying the same columns. */
  private lazy val attrCtesSql = {
    import graft.streaming.IngestGate
    s"""${Selection.clfPinnedScoreCtes},
       base AS (SELECT doc_id, source, lang, coalesce(text, '') AS text
                FROM documents),
       attr AS (SELECT b.doc_id, b.source, b.lang,
           CAST(length(b.text) AS BIGINT) AS n_chars,
           CAST(len(string_split(b.text, ' ')) AS BIGINT) AS n_tok,
           (${Sampling.qualityBpSqlExpr}) AS quality_bp,
           (${TextStats.qualitySqlExpr}) >= ${IngestGate.MinQuality} AS q_pass,
           (${Selection.gopherPassSql}) AS g_pass,
           CAST(len(regexp_extract_all(b.text, '${PiiPatterns.EmailSql}'))
             AS BIGINT) AS n_emails,
           sw.sumw > ${Selection.ClfThresholdMilli} * len(t.t) AS clf_keep,
           sha256(b.text) AS h
         FROM base b JOIN t USING (doc_id) JOIN sw USING (doc_id))"""
  }

  private lazy val x91Sql =
    s"""WITH $attrCtesSql,
       dup AS (SELECT h, count(*) AS dup_group_size FROM attr GROUP BY h)
       SELECT doc_id, source, lang, n_chars, n_tok,
         CAST(quality_bp AS BIGINT) AS quality_bp, q_pass, g_pass,
         n_emails, clf_keep, h,
         CAST(dup_group_size AS BIGINT) AS dup_group_size
       FROM attr JOIN dup USING (h)
       ORDER BY doc_id"""

  // ---------------------------------------------------------------- x92
  /** x92 — the MIXER's drop ledger (the second half of the Dolma
    * tagger→mixer split, Soldaini et al. 2024: the mixer consumes the
    * attributes sidecar, applies a declarative rule battery, and
    * materializes the output corpus — and every production run keeps a
    * ledger of WHY each dropped document was dropped, because a mixture
    * you cannot audit is a mixture you cannot debug): per document, the
    * bitmask of failing rules in the engine's fixed battery order —
    * quality floor (bit 0), Gopher battery (bit 1), fitted classifier
    * (bit 2), PII incidence (bit 3), exact-duplicate non-canonical
    * (bit 4, keep = min doc_id per sha256 group, B27's representative
    * discipline) — the keep verdict (mask == 0), and the FIRST failing
    * rule by battery order (the headline a drop dashboard groups by;
    * 'none' for kept docs). Every rule reads the SAME single-sourced
    * signal x91 exports — the ledger consumes [[attrFrame]] verbatim —
    * so sidecar and mixer verdicts cannot drift.
    *
    * Scale: the one checkpointed attributes pass, B27's uniform sha
    * shuffle for the canonical id, then map-only bit arithmetic; the
    * ledger is columnar output at doc grain, the exact thing a 100 TB
    * run writes next to its output shards so that "why did my doc
    * disappear" is a point lookup, not a pipeline re-run. */
  def mixerLedger(s: SparkSession, dir: String): DataFrame = {
    val a = attrFrame(s, dir)
    val canon = a.groupBy("h").agg(min("doc_id").as("canon_id"))
    val mask =
      (when(!col("q_pass"), 1L).otherwise(0L)
        + when(!col("g_pass"), 2L).otherwise(0L)
        + when(!col("clf_keep"), 4L).otherwise(0L)
        + when(col("n_emails") > lit(0L), 8L).otherwise(0L)
        + when(col("doc_id") =!= col("canon_id"), 16L).otherwise(0L))
    a.join(canon, "h")
      .select(col("doc_id"), col("source"), col("n_tok"),
        mask.as("fail_mask"))
      .withColumn("kept", col("fail_mask") === 0L)
      .withColumn("first_fail",
        when(col("fail_mask").bitwiseAND(1L) =!= 0L, "quality")
          .when(col("fail_mask").bitwiseAND(2L) =!= 0L, "gopher")
          .when(col("fail_mask").bitwiseAND(4L) =!= 0L, "classifier")
          .when(col("fail_mask").bitwiseAND(8L) =!= 0L, "pii")
          .when(col("fail_mask").bitwiseAND(16L) =!= 0L, "duplicate")
          .otherwise("none"))
      .orderBy("doc_id")
  }

  private lazy val x92Sql =
    s"""WITH $attrCtesSql,
       canon AS (SELECT h, min(doc_id) AS canon_id FROM attr GROUP BY h),
       ledger AS (SELECT a.doc_id, a.source, a.n_tok,
           (CASE WHEN NOT a.q_pass THEN 1 ELSE 0 END
            + CASE WHEN NOT a.g_pass THEN 2 ELSE 0 END
            + CASE WHEN NOT a.clf_keep THEN 4 ELSE 0 END
            + CASE WHEN a.n_emails > 0 THEN 8 ELSE 0 END
            + CASE WHEN a.doc_id <> c.canon_id THEN 16 ELSE 0 END) AS fail_mask
         FROM attr a JOIN canon c USING (h))
       SELECT doc_id, source, n_tok, CAST(fail_mask AS BIGINT) AS fail_mask,
         fail_mask = 0 AS kept,
         CASE WHEN (fail_mask & 1) <> 0 THEN 'quality'
              WHEN (fail_mask & 2) <> 0 THEN 'gopher'
              WHEN (fail_mask & 4) <> 0 THEN 'classifier'
              WHEN (fail_mask & 8) <> 0 THEN 'pii'
              WHEN (fail_mask & 16) <> 0 THEN 'duplicate'
              ELSE 'none' END AS first_fail
       FROM ledger ORDER BY doc_id"""

  // --------------------------------------------------------------- x107
  /** x107 — data-quality verification in the Deequ discipline (Schelter
    * et al., VLDB 2018: declare constraints, compute the metrics they
    * need in ONE pass, emit verdicts): per `source` — the unit at which
    * a crawl or upstream feed breaks — profile the documents table and
    * check the constraints an ingestion contract would declare:
    * completeness(text) (null count + basis points), uniqueness(doc_id)
    * within the source, consistency(n_chars == length(text)) — the
    * denormalized-column drift check — plus the observability metrics
    * (distinct langs, realized n_chars range). Verdicts are plain
    * booleans per source and one conjunction, so a scheduler can fail
    * the ingestion batch on `pass_all = false` rows exactly as Deequ's
    * VerificationSuite does.
    *
    * x70 reports CONTENT health (quality/PII/dup mass) — this checks
    * STRUCTURAL integrity; a feed can be structurally perfect and full
    * of spam, or clean text with broken plumbing. Both engines count
    * with pure integers (null-vs-null mismatch handled by the
    * coalesce(-1) sentinel, valid because real lengths are ≥ 0).
    *
    * Scale: ONE partial+final agg on source; the two count-distincts
    * expand the input ×2 but stay source-keyed (no global state); all
    * verdicts derive from the aggregated row (PlanSpec-gated: no
    * window, no product). */
  def qualityVerification(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_ids"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_text_null"),
        countDistinct(col("lang")).as("n_langs"),
        min("n_chars").as("chars_min"), max("n_chars").as("chars_max"),
        sum(when(coalesce(length(col("text")), lit(-1L)) =!=
          coalesce(col("n_chars"), lit(-1L)), 1L).otherwise(0L))
          .as("n_chars_drift"))
      .select(col("source"), col("n_rows"), col("n_ids"), col("n_text_null"),
        expr("((n_rows - n_text_null) * 10000) div n_rows")
          .as("text_complete_bp"),
        col("n_langs"), col("chars_min"), col("chars_max"),
        col("n_chars_drift"),
        (col("n_ids") === col("n_rows")).as("chk_unique_ids"),
        (col("n_text_null") === 0L).as("chk_text_complete"),
        (col("n_chars_drift") === 0L).as("chk_chars_consistent"))
      .withColumn("pass_all",
        col("chk_unique_ids") && col("chk_text_complete") &&
          col("chk_chars_consistent"))
      .orderBy("source")

  private val x107Sql =
    """WITH a AS (SELECT source,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids,
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_text_null,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           min(n_chars) AS chars_min, max(n_chars) AS chars_max,
           CAST(sum(CASE WHEN coalesce(length(text), -1)
                         <> coalesce(n_chars, -1) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_chars_drift
         FROM documents GROUP BY source)
       SELECT source, n_rows, n_ids, n_text_null,
         CAST(((n_rows - n_text_null) * 10000) // n_rows AS BIGINT)
           AS text_complete_bp,
         n_langs, chars_min, chars_max, n_chars_drift,
         n_ids = n_rows AS chk_unique_ids,
         n_text_null = 0 AS chk_text_complete,
         n_chars_drift = 0 AS chk_chars_consistent,
         (n_ids = n_rows AND n_text_null = 0 AND n_chars_drift = 0)
           AS pass_all
       FROM a ORDER BY source"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x70_corpus_report", corpusReport, Some(x70Sql)),
    QueryDef("x91_doc_attributes", docAttributes, Some(x91Sql)),
    QueryDef("x92_mixer_ledger", mixerLedger, Some(x92Sql)),
    QueryDef("x107_quality_verification", qualityVerification, Some(x107Sql)))
}
