package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed joins must be exchange-free: the whole point is paying the
  * shuffle once at write time. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without Exchange") {
    val o = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val l = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    Bucketing.writeBucketed(o, "b_orders", "k", 4)
    Bucketing.writeBucketed(l, "b_lineitem", "k", 4)
    try {
      // disable broadcast so the join would otherwise need a shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it must still be correct
      val viaBuckets = joined.groupBy("k").agg(sum("l_quantity").as("q"))
        .orderBy("k").limit(5).collect().toSeq
      val plain = o.join(l, "k").groupBy("k").agg(sum("l_quantity").as("q"))
        .orderBy("k").limit(5).collect().toSeq
      assert(viaBuckets == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
