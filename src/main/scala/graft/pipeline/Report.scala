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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x70_corpus_report", corpusReport, Some(x70Sql)))
}
