package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — for the hot-key joins and aggregations
  * AQE's skew handling can't fix (e.g. a broadcast-too-big dimension with
  * one key holding 20% of a 100 TB fact table).
  *
  * `saltedJoin` splits every hot left-side key into `saltBuckets` synthetic
  * keys and replicates the right side once per bucket, so the shuffle
  * spreads a hot key over `saltBuckets` reducers. Replication cost is
  * `right × saltBuckets` — use for moderate-size right sides where
  * broadcast doesn't fit but replication does.
  *
  * `twoPhaseAgg` is the aggregation analogue: pre-aggregate on
  * (key, salt), then finish on key — two cheap shuffles instead of one
  * skewed one. Only valid for algebraic aggregates (sum/count/min/max).
  */
object SkewJoin {

  /** Inner equi-join with a salted left side. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    // fail fast instead of silently clobbering-then-dropping a caller's
    // column of the same name
    require(!left.columns.contains("__graft_salt") && !right.columns.contains("__graft_salt"),
      "input already has a __graft_salt column")
    val salted = left.withColumn("__graft_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val replicated = right
      .withColumn("__graft_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__graft_salt"), "inner").drop("__graft_salt")
  }

  /** Two-phase (salted) aggregation: `sum` of `valueCol` per `key` with
    * the first exchange spread over `saltBuckets` partial keys. */
  def twoPhaseSum(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int, resultName: String = "total"): DataFrame = {
    val salted = df.withColumn("__graft_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("__graft_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(resultName))
  }

  /** Top-k hot keys of a column — the diagnosis step before salting. */
  def hotKeys(df: DataFrame, key: String, k: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(k)
}
