package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Targeted semantics checks for relational queries whose registered form
  * is rows-only (no DuckDB oracle). */
class RelationalSpec extends SparkSpec {

  test("b12d approx percentiles track the exact b12b form within sketch error") {
    def byFlag(name: String): Map[String, Seq[Double]] =
      SparkEntry.queries(name)(spark, sf).collect().map { r =>
        r.getString(0) -> (1 to 3).map(i => r.get(i) match {
          case d: java.math.BigDecimal => d.doubleValue()
          case d: Double => d
          case other => other.toString.toDouble
        })
      }.toMap
    val exact = byFlag("b12b_percentiles")
    val approx = byFlag("b12d_approx_percentiles")
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, es) =>
      es.zip(approx(flag)).foreach { case (e, a) =>
        assert(math.abs(e - a) <= 0.01 * math.max(1.0, math.abs(e)),
          s"group $flag: approx $a strayed from exact $e")
      }
    }
  }
}
