package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cross-round bench drift guard's parser — pinned against the
  * artifact shapes it must read: the driver's BENCH_r*.json wrapper
  * (JSON-escaped, front-clipped tail) and Bench's own raw line. The r6
  * verdict's x16 phantom (2.30 → 5.70 s on byte-identical source) is
  * the failure class this guard exists for; a parser regression would
  * silently disable it again. */
class BenchGuardSpec extends AnyFunSuite {

  private val wrapperTail =
    """{"n": 6, "rc": 0, "sf": 0.1,
       "tail": "30_lang_stats\":0.273,\"b30b_term_freq\":0.354,\"x16_dedup_clusters\":5.703,\"fmp_recs_per_sec\":26108,\"fmp_ok\":true,\"sf\":\"/root/testdata/sf0.1\"}"}"""

  test("parses JSON-escaped wrapper tails, skipping clipped and non-query fields") {
    val m = Bench.parsePriorTimes(wrapperTail, "/root/testdata/sf0.1")
    assert(m("b30b_term_freq") == 0.354)
    assert(m("x16_dedup_clusters") == 5.703)
    // The front-clipped pair parses under a mangled name that can never
    // match a registered query — present but harmless.
    assert(m.contains("30_lang_stats") && !m.contains("b30_lang_stats"))
    // Integer-valued fields (fmp_recs_per_sec) and the headline "value"
    // must not be mistaken for query times.
    assert(!m.contains("fmp_recs_per_sec") && !m.contains("value"))
  }

  test("returns empty for a different scale factor (local iteration vs driver artifact)") {
    assert(Bench.parsePriorTimes(wrapperTail, "/root/testdata/sf0.001").isEmpty)
  }

  test("parses a raw (unescaped) bench line too") {
    val raw = """{"metric":"total","value":104.885,"unit":"sec","failed":0,"queries":{"b05_select_rename_cast":0.452,"x25_curate_pipeline":8.270},"sf":"/root/testdata/sf0.1"}"""
    val m = Bench.parsePriorTimes(raw, "/root/testdata/sf0.1")
    assert(m == Map("b05_select_rename_cast" -> 0.452, "x25_curate_pipeline" -> 8.27))
  }

  test("the actual BENCH_r06.json artifact yields prior times for the guard") {
    val p = java.nio.file.Paths.get("BENCH_r06.json")
    assume(java.nio.file.Files.exists(p), "driver artifact present in repo root")
    val m = Bench.parsePriorTimes(java.nio.file.Files.readString(p), "/root/testdata/sf0.1")
    assert(m.size > 40, s"expected a broad per-query map, got ${m.size}")
    assert(m.get("x16_dedup_clusters").contains(5.703),
      s"the r6 phantom the guard exists for must be readable: ${m.get("x16_dedup_clusters")}")
  }
}
