package graft

/** Smoke: every registered query runs at sf0.001 and returns rows (the
  * oracle hash-compare itself is the driver's t2 gate + local_verify.py).
  * A few sampled/threshold queries legitimately return small or zero row
  * counts at this scale. */
class QueriesSmokeSpec extends SparkSpec {

  private val mayBeEmpty = Set("b28_jaccard_pairs", "x07_ann_lsh", "x16_dedup_clusters",
    "x17_decontamination")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("interpolated oracle fragments resolved (object-init-cycle guard)") {
    // x24/x25/x46 interpolate SQL fragments across modules (x46 pulls
    // from IngestGate, TextStats AND Similarity); a circular object
    // initialization would bake the string "null" into the WHERE clause
    // for the JVM's lifetime — assert the fragments actually landed.
    for (name <- Seq("x24_ingest_gate", "x25_curate_pipeline", "x46_curate_v2")) {
      val sql = SparkEntry.oracleSql(name)
      assert(sql.contains("regexp_extract_all") && sql.contains("NULLIF"),
        s"$name oracle lost its gate fragments")
      assert(!sql.contains("null AND") && !sql.contains("(null)"),
        s"$name oracle contains a null-corrupted fragment:\n$sql")
    }
  }
}
