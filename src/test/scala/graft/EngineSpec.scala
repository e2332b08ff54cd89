package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.Sinks

/** SQL facade + partitioned-layout behavior. */
class EngineSpec extends SparkSpec {

  test("attach exposes all tables and native functions to SQL") {
    Engine.attach(spark, sf)
    val n = spark.sql("SELECT count(*) FROM lineitem").collect()(0).getLong(0)
    assert(n == 6000)
    val joined = spark.sql(
      """SELECT r_name, count(*) AS n FROM customer c
         JOIN nation n ON c_nationkey = n_nationkey
         JOIN region r ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""").collect()
    assert(joined.length == 5)
    val sanitized = spark.sql("SELECT sanitize_name('Aantal bedr.')").collect()(0).getString(0)
    assert(sanitized == "aantal_bedr_")
  }

  test("attach is idempotent-cheap and re-attaches on dir or session change") {
    try {
      Engine.attach(spark, sf)
      // Same session + dir: a repeat attach must not re-register views (the
      // marker short-circuits), so a view dropped in between stays dropped;
      // reattach restores it unconditionally.
      spark.catalog.dropTempView("region")
      Engine.attach(spark, sf)
      assert(!spark.catalog.tableExists("region"), "repeat attach must be a no-op")
      Engine.reattach(spark, sf)
      assert(spark.catalog.tableExists("region"), "reattach must restore views")
      // Different dir on the same session: full re-attach, views follow.
      Engine.attach(spark, "/root/testdata/sf0.01")
      assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) == 60000L,
        "views must follow the newly attached dir")
      // A newSession has its own registry and conf: attach must re-register.
      val s2 = spark.newSession()
      Engine.attach(s2, sf)
      assert(s2.sql("SELECT count(*) FROM lineitem").head().getLong(0) == 6000L)
    } finally Engine.reattach(spark, sf) // restore even on assertion failure
  }

  test("partitioned write prunes partitions on read (PartitionFilters)") {
    val out = Files.createTempDirectory("part").resolve("docs").toString
    Sinks.writePartitioned(Tables.t(spark, sf, "documents"), out, Seq("lang"))
    val langs = Tables.t(spark, sf, "documents")
      .select("lang").distinct().collect().map(_.getString(0))
    assert(langs.length > 1)
    val pruned = spark.read.parquet(out).filter(col("lang") === langs.head)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("lang"),
      s"partition filter must reach the scan:\n$plan")
    // and partition pruning preserves correctness
    val expected = Tables.t(spark, sf, "documents")
      .filter(col("lang") === langs.head).count()
    assert(pruned.count() == expected)
  }
}
