package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AsOf, Relational}
import graft.pipeline.{Bpe, Curation, Dedup, Ivf, Multimodal, Repetition, Report, Sampling, Selection, Similarity, TextStats}
import graft.operators.ZOrder
import graft.streaming.{IngestGate, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the declared operator inventory (SURVEY.md §2B) from the
  * per-family modules. Every oracle-expressible query carries matching
  * DuckDB SQL; hash-seeded / approximate ops omit it (rows-only check).
  */
object SparkEntry {
  private val modules: Seq[QueryDef] =
    Relational.defs ++ AsOf.defs ++ Dedup.defs ++ Similarity.defs ++
      Ivf.defs ++ TextStats.defs ++ Curation.defs ++ Sampling.defs ++ Selection.defs ++
      Bpe.defs ++ Multimodal.defs ++ Windows.defs ++ IngestGate.defs ++
      Repetition.defs ++ Report.defs ++ ZOrder.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.b12(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
