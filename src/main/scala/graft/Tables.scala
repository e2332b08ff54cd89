package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

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

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
      // default. Read the raw int64 nanos and truncate to a microsecond
      // timestamp — the same value DuckDB produces when casting its
      // TIMESTAMP_NS to TIMESTAMP, so oracle comparisons stay exact
      // (SURVEY.md §7.4.2; the test data is µs-precision anyway).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
