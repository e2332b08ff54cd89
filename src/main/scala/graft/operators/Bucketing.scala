package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities — the "shuffle once at ingest, never at query
  * time" path for repeated fact⋈fact joins.
  *
  * Writing both join sides bucketed (and sorted) by the join key gives
  * every subsequent equi-join/aggregation on that key a co-located,
  * exchange-free plan: at 100 TB this converts the per-query
  * orders⋈lineitem shuffle (the single largest network cost in the
  * relational inventory) into a one-time ingest cost. Bucket count should
  * approximate (table size / healthy partition size) and match across
  * co-joined tables.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (lives under
    * spark.sql.warehouse.dir). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans with zero
    * Exchange nodes when bucket specs line up. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
