package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Parquet table loaders for the driver test data (TESTDATA.md).
  *
  * All queries read through here so the scan layer is a single choke point:
  * at 100 TB these would be partitioned/bucketed table locations and the
  * loader would carry bucketing metadata; locally they are single parquet
  * files. Column pruning + predicate pushdown happen automatically because
  * every query composes on the returned DataFrame lazily.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects unless
    * this flag makes it surface as a raw int64. Our own mains set it at
    * session construction; this guard exists because the external driver
    * may call queries with a session it built itself. It mutates session
    * conf at most ONCE per session (idempotent check-then-set), not per
    * read. */
  def ensureNanosConf(spark: SparkSession): Unit = {
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(k).contains("true")) spark.conf.set(k, "true")
  }

  /** The micros-NTZ → TIMESTAMP cast below reads the stored wall-clock
    * in the SESSION time zone — correct only under the UTC session every
    * main and oracle in this repo pins. Like [[ensureNanosConf]], guard
    * the externally-built-session path (check-then-set, at most once):
    * a driver session left at a machine-local zone would silently shift
    * every event instant by the zone offset. */
  def ensureUtcConf(spark: SparkSession): Unit = {
    val k = "spark.sql.session.timeZone"
    if (!spark.conf.getOption(k).contains("UTC")) spark.conf.set(k, "UTC")
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Normalize events.ts to a session-TZ microsecond TIMESTAMP
      // whatever the parquet writer produced — the driver has shipped
      // both TIMESTAMP(NANOS) (surfaced as int64 nanos under the legacy
      // conf; truncate to µs) and TIMESTAMP(MICROS) (surfaced as
      // TIMESTAMP_NTZ; cast is the identity instant under the UTC
      // session both engines pin). Either way downstream sees the same
      // µs TIMESTAMP DuckDB reads natively, so oracle comparisons stay
      // exact (SURVEY.md §7.4.2).
      ensureNanosConf(spark)
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ =>
          ensureUtcConf(spark)
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
