package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-certification condenser (graft.tools.TestReport) and the
  * gate over the committed TESTREPORT.json artifact: the green claim
  * must survive checkout AND a red/stale artifact must fail the build
  * rather than silently certify. */
class TestReportSpec extends AnyFunSuite {
  import graft.tools.TestReport

  test("parses a JUnit testsuite header exactly") {
    val xml =
      """<?xml version='1.0' encoding='UTF-8'?>
        |<testsuite hostname="vm" name="graft.FooSpec" tests="42" errors="1" failures="2" skipped="0" time="1.012" timestamp="2026-08-15T15:20:12">
        |</testsuite>""".stripMargin
    val s = TestReport.parseSuite(xml).get
    assert(s == TestReport.Suite("graft.FooSpec", 42, 1, 2, "2026-08-15T15:20:12"))
    assert(TestReport.parseSuite("<notareport/>").isEmpty)
  }

  test("parses attributes in ANY order (r14 advice: fixed-order regex dropped suites)") {
    val xml =
      """<testsuite timestamp="2026-08-15T15:20:12" failures="2" errors="1" tests="42" name="graft.FooSpec">
        |</testsuite>""".stripMargin
    assert(TestReport.parseSuite(xml).contains(
      TestReport.Suite("graft.FooSpec", 42, 1, 2, "2026-08-15T15:20:12")))
    // A header missing a required attribute parses to None (main fails loudly).
    assert(TestReport.parseSuite("""<testsuite name="x" tests="1">""").isEmpty)
  }

  test("render sums totals, sorts suites, and keeps the newest timestamp") {
    val json = TestReport.render(Seq(
      TestReport.Suite("b.Spec", 2, 0, 1, "2026-08-15T10:00:00"),
      TestReport.Suite("a.Spec", 3, 1, 0, "2026-08-15T11:00:00")))
    assert(json.contains(""""total_tests": 5"""))
    assert(json.contains(""""total_errors": 1"""))
    assert(json.contains(""""total_failures": 1"""))
    assert(json.contains(""""n_suites": 2"""))
    assert(json.contains(""""newest_report": "2026-08-15T11:00:00""""))
    assert(json.indexOf("a.Spec") < json.indexOf("b.Spec"), "suites sorted")
  }

  test("committed TESTREPORT.json certifies a green suite of real classes") {
    val p = java.nio.file.Paths.get("TESTREPORT.json")
    assume(java.nio.file.Files.exists(p),
      "TESTREPORT.json present (written at each round close)")
    val txt = java.nio.file.Files.readString(p)
    assert("\"total_errors\": 0".r.findFirstIn(txt).isDefined,
      "committed certification must carry zero errors")
    assert("\"total_failures\": 0".r.findFirstIn(txt).isDefined,
      "committed certification must carry zero failures")
    // Every certified suite must be a real test class in this tree —
    // a renamed/deleted spec invalidates the artifact loudly.
    val names = """"(graft[\w.]*)": \{""".r
      .findAllMatchIn(txt).map(_.group(1)).toSeq
    assert(names.nonEmpty, "certification must list suites")
    names.foreach { n =>
      val f = "src/test/scala/" + n.replace('.', '/') + ".scala"
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(f)),
        s"certified suite $n has no source file $f — stale artifact")
    }
    // And the artifact must certify a non-trivial share of the on-disk
    // suites: only suites ADDED after the last round close may miss.
    val onDisk = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get("src/test/scala"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.toString)
          .count(_.endsWith("Spec.scala"))
      } finally s.close()
    }
    assert(names.size >= onDisk - 3,
      s"certification covers ${names.size} suites but ${onDisk} spec files exist — " +
        "regenerate TESTREPORT.json at round close")
  }
}
