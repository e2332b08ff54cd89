package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{expr, size}

/** PII regexp patterns as a LEAF object (no references to other graft
  * modules): both [[Curation]] (x19) and [[graft.streaming.IngestGate]]
  * (x24) consume these, and Curation's x25 oracle in turn interpolates
  * IngestGate's admission SQL — hosting the shared constants here keeps
  * that dependency chain acyclic (a Curation↔IngestGate edge pair would
  * make object initialization order-dependent: the second object's
  * in-progress init would read the first's still-null vals, silently
  * corrupting the oracle SQL for the JVM's lifetime).
  *
  * The Spark form carries the doubled backslash the SQL-expression
  * parser unescapes; the DuckDB form the literal one. */
object PiiPatterns {
  val EmailSpark = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\\\.[a-z][a-z]+"
  val EmailSql = """(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"""

  /** `n_emails` as a reusable Column over `text` (x19's first output —
    * the same definition the ingest gate evaluates). */
  def emailCount: Column =
    size(expr(s"regexp_extract_all(text, '$EmailSpark', 0)"))
}
