package graft.streaming

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{HashConstants, PiiPatterns, Sampling, TextStats}

/** Ingest-time curation gate: the quality / PII / sampling decisions of
  * the batch curation family (x01/x19/x21) as COLUMN EXPRESSIONS over any
  * frame with (doc_id, text, lang) — which makes the same gate run
  * unchanged under `readStream` (a stateless projection: no watermark, no
  * state store, nothing to checkpoint beyond source offsets). That is the
  * shape a 100 TB pipeline wants at the ingest edge: score and drop
  * BEFORE the data lands in the lake, one pass, no shuffle, and the batch
  * backfill provably computes the identical decision (batch ≡ stream
  * gated in StreamingSpec, decision parity with the DuckDB oracle gated
  * by the driver).
  *
  * All decisions reuse the curation family's exact formulas and integer
  * hash (same salt as x21), so gate membership agrees with the batch
  * sample — a doc admitted at ingest time is the same doc the batch
  * pipeline would have kept. */
object IngestGate {
  /** Quality floor: ~median of the synthetic corpus (see OPERATORS.md). */
  val MinQuality = 0.53
  private val Knuth = HashConstants.Knuth
  private val HashPrime = HashConstants.HashPrime

  /** x01's quality formula — THE SAME Column definition
    * ([[TextStats.qualityColumn]]), not a copy. */
  private def quality: Column = TextStats.qualityColumn

  /** x19's email count — THE SAME Column definition
    * ([[PiiPatterns.emailCount]]), not a copy. PiiPatterns is a LEAF
    * module: referencing Curation here would close an init cycle with
    * Curation.x25Sql → [[admitCondSql]] and null-corrupt whichever
    * object initializes second. */
  private def nEmails: Column = PiiPatterns.emailCount

  /** x21's sampling decision — THE SAME Column definition, not a copy, so
    * gate membership and batch-sample membership cannot drift. */
  private def sampled: Column = Sampling.sampleKeep

  /** Score every doc — batch or streaming; stateless. */
  def score(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("lang"), quality.as("quality"),
      nEmails.as("n_emails"), sampled.as("sampled"))

  /** Admit a doc iff it clears the quality floor, carries no email-shaped
    * PII, and survives its language's sampling rate. */
  def gate(df: DataFrame): DataFrame =
    score(df).filter(col("quality") >= MinQuality &&
      col("n_emails") === 0 && col("sampled"))

  /** The admission decision as one predicate over the ORIGINAL columns —
    * for pipelines that need the admitted rows themselves (x25), not the
    * score projection. Same expressions as [[gate]]. */
  def admitCond: Column =
    quality >= MinQuality && nEmails === 0 && sampled

  /** The CLEANLINESS tiers of the gate alone — quality floor + PII, no
    * sampling. This is the gate the x46 curation pipeline runs: rate
    * sampling is a mixture/budget decision (x21–x23 territory, certified
    * with the full gate in x25), not a cleanliness one, and thinning the
    * corpus before dedup would weaken every downstream cross-doc signal
    * for no hygiene gain. Same single-sourced expressions as [[gate]]. */
  def cleanCond: Column =
    quality >= MinQuality && nEmails === 0

  /** The original frame filtered to admitted docs. */
  def admit(df: DataFrame): DataFrame = df.filter(admitCond)

  // Registered batch artifact: admitted docs with their scores.
  private def x24(s: SparkSession, dir: String): DataFrame =
    gate(Tables.t(s, dir, "documents")).drop("sampled").orderBy("doc_id")

  // DuckDB fragments over a docs-shaped relation (doc_id, text, lang) —
  // single-sourced from the home modules' own oracle fragments, shared
  // with x24Sql AND the x25 pipeline oracle, so none of them can drift.
  private[graft] val qualitySql: String = TextStats.qualitySqlExpr
  private[graft] val emailsSql: String =
    s"CAST(len(regexp_extract_all(text, '${PiiPatterns.EmailSql}')) AS INT)"
  private[graft] val sampledSql: String = {
    val rateCase = Sampling.StratumRatesBp.toSeq.sortBy(_._1)
      .map { case (l, bp) => s"WHEN lang = '$l' THEN $bp" }
      .mkString("CASE ", " ", s" ELSE ${Sampling.DefaultRateBp} END")
    s"""(((doc_id + ${Sampling.SampleSalt}) % $HashPrime) * $Knuth % $HashPrime) % 10000
       < ($rateCase)"""
  }
  private[graft] val admitCondSql: String =
    s"($qualitySql) >= $MinQuality AND ($emailsSql) = 0 AND ($sampledSql)"
  private[graft] val cleanCondSql: String =
    s"($qualitySql) >= $MinQuality AND ($emailsSql) = 0"

  private val x24Sql =
    s"""WITH scored AS (SELECT doc_id, lang,
           $qualitySql AS quality,
           $emailsSql AS n_emails,
           $sampledSql AS sampled
         FROM documents)
       SELECT doc_id, lang, quality, n_emails FROM scored
       WHERE quality >= $MinQuality AND n_emails = 0 AND sampled
       ORDER BY doc_id"""

  // ---------------------------------------------------------------- x57
  /** Registered x57: [[Stateful.budgetAdmissions]]'s BATCH form — the
    * SAME flatMapGroupsWithState function the streaming edge runs, here
    * seeing each source's full arrival history (seq = doc_id) in one
    * iterator — aggregated to per-source admission totals. The DuckDB
    * oracle states the semantics declaratively: exclusive-prefix window
    * over x56's subword counts in doc_id order. An oracle hash match
    * therefore certifies the stateful function's admission logic, and
    * StreamingSpec separately proves chunked-stream ≡ batch. */
  private def x57(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val arrivals = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("doc_id").as("seq"), col("text"))
      .as[DocArrival]
    Stateful.budgetAdmissions(arrivals).toDF()
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("admitted"), col("n_tok")).otherwise(0L)).as("admitted_tokens"),
        sum(when(col("admitted"), col("doc_id")).otherwise(0L)).as("id_checksum"))
      .orderBy("source")
  }

  private val x57Sql =
    s"""WITH RECURSIVE ${graft.pipeline.Bpe.bpeCountCtes},
       t AS (SELECT doc_id, source, n_subword_tok AS n_tok
             FROM bpe JOIN documents USING (doc_id)),
       c AS (SELECT doc_id, source, n_tok,
               coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 < ${Stateful.AdmitBudget} AS admitted
             FROM t)
       SELECT source, count(*) AS n_total,
              CAST(sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
              CAST(sum(CASE WHEN admitted THEN n_tok ELSE 0 END) AS BIGINT) AS admitted_tokens,
              CAST(sum(CASE WHEN admitted THEN doc_id ELSE 0 END) AS BIGINT) AS id_checksum
       FROM c GROUP BY source ORDER BY source"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x24_ingest_gate", x24, Some(x24Sql)),
    QueryDef("x57_budget_admit", x57, Some(x57Sql)))
}
