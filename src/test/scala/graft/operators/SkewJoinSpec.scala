package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Salted join / two-phase aggregation must be result-identical to the
  * plain forms — salting changes the exchange, never the answer. */
class SkewJoinSpec extends SparkSpec {

  test("saltedJoin equals plain join on orders⋈customer") {
    val o = Tables.t(spark, sf, "orders").withColumnRenamed("o_custkey", "custkey")
    val c = Tables.t(spark, sf, "customer").withColumnRenamed("c_custkey", "custkey")
    val plain = o.join(c, Seq("custkey"), "inner")
      .groupBy("custkey").agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("t"))
      .orderBy("custkey").collect().toSeq
    val salted = SkewJoin.saltedJoin(o, c, "custkey", saltBuckets = 8)
      .groupBy("custkey").agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("t"))
      .orderBy("custkey").collect().toSeq
    assert(salted == plain)
  }

  test("twoPhaseSum equals plain sum") {
    val li = Tables.t(spark, sf, "lineitem")
    val plain = li.groupBy("l_returnflag").agg(round(sum("l_quantity"), 2).as("total"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val salted = SkewJoin.twoPhaseSum(li, "l_returnflag", "l_quantity", saltBuckets = 16)
      .withColumn("total", round(col("total"), 2))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(salted == plain)
  }

  test("hotKeys surfaces the heaviest keys") {
    val hot = SkewJoin.hotKeys(Tables.t(spark, sf, "lineitem"), "l_returnflag", 3)
      .collect().map(_.getString(0)).toSet
    assert(hot.subsetOf(Set("A", "N", "R")))
  }
}
