package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Semantics of the explicit runtime filter: the Bloom reduction must be
  * lossless ahead of a real join (no false negatives — the guarantee the
  * b41 oracle certifies end-to-end) while actually pruning (the point of
  * the operator at scale). */
class RuntimeFilterSpec extends SparkSpec {

  test("no false negatives: every fact row whose key is in the build side survives") {
    import spark.implicits._
    val fact = (1L to 1000L).map(k => (k, s"row$k")).toDF("k", "payload")
    val build = Seq(7L, 99L, 512L, 1000L).toDF("key")
    val kept = RuntimeFilter.bloomReduce(fact, col("k"), build, "spec-nfn")
      .select("k").as[Long].collect().toSet
    assert(Set(7L, 99L, 512L, 1000L).subsetOf(kept),
      s"a build-side key was falsely pruned: ${Set(7L, 99L, 512L, 1000L) -- kept}")
  }

  test("the filter genuinely prunes: disjoint keys survive only at the FP rate") {
    import spark.implicits._
    val fact = (1L to 20000L).map(k => (k, k % 7)).toDF("k", "v")
    val build = (1000001L to 1000016L).map(Tuple1(_)).toDF("key") // disjoint
    val kept = RuntimeFilter.bloomReduce(fact, col("k"), build, "spec-fp").count()
    // 16 keys × 3 probes set ≤ 48 of 2^18 bits → FP rate ≤ (48/262144)^3;
    // even at 1000× that bound, 20k disjoint rows keep << 100.
    assert(kept < 100, s"disjoint fact rows must be pruned, kept $kept")
  }

  test("b41: the runtime-filtered semi-join equals the unfiltered semi-join") {
    val ords = Tables.t(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    val rlines = Tables.t(spark, sf, "lineitem")
      .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    val pruned = RuntimeFilter.bloomReduce(
      rlines, col("l_orderkey"), ords.select(col("o_orderkey")), "spec-b41")
    val withFilter = ords
      .join(pruned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val plain = ords
      .join(rlines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(withFilter == plain, "the reduction must be join-lossless")
    assert(plain.nonEmpty, "fixture must exercise the join")
    // And the pruning is real on corpus data: the filtered fact side is
    // a strict subset of the returned lines.
    val before = rlines.count()
    val after = pruned.count()
    assert(after < before,
      s"quarter-keyed Bloom must prune the full returned-lines history ($after vs $before)")
  }
}
