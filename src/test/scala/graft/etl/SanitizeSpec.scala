package graft.etl

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

/** Golden oracle for the sanitizer: all 126 real Ceneton field pairs from
  * the reference's field_mappings.csv (the de-facto golden data, SURVEY.md
  * §5.1), plus the edge rules the CSV does not cover. */
class SanitizeSpec extends AnyFunSuite {

  private def goldenPairs: Seq[(String, String)] = {
    val src = Source.fromResource("field_mappings.csv", getClass.getClassLoader)("UTF-8")
    try {
      val lines = src.getLines().toSeq
      // strip UTF-8 BOM from the first header cell; skip the header row
      lines.tail.map { line =>
        val cols = line.split(",", -1)
        (cols(0), cols(1))
      }
    } finally src.close()
  }

  test("all 126 golden Ceneton pairs sanitize exactly") {
    val pairs = goldenPairs
    assert(pairs.size == 125 || pairs.size == 126) // 126 lines incl. header
    pairs.foreach { case (orig, expected) =>
      assert(Sanitize.sanitize(orig) == expected, s"for original name '$orig'")
    }
  }

  test("punctuation runs collapse to single underscore") {
    assert(Sanitize.sanitize("Aantal bedr.") == "aantal_bedr_")
    assert(Sanitize.sanitize("Auteur o.g.v.") == "auteur_o_g_v_")
    assert(Sanitize.sanitize("Aantal tekstpagina's") == "aantal_tekstpagina_s")
  }

  test("unicode letters survive (Python \\W parity)") {
    assert(Sanitize.sanitize("Enschedé") == "enschedé")
    assert(Sanitize.sanitize("Ünïcödé Nàme") == "ünïcödé_nàme")
  }

  test("leading digit gets underscore prefix") {
    assert(Sanitize.sanitize("1e druk") == "_1e_druk")
    assert(Sanitize.sanitize("42") == "_42")
  }

  test("strip and lowercase first") {
    assert(Sanitize.sanitize("  UPPER Case  ") == "upper_case")
  }

  test("idempotence: sanitize(sanitize(x)) == sanitize(x)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abzABZ019 .-_'éÉ漢\t!@#"
    (1 to 500).foreach { _ =>
      val s = (1 to rnd.nextInt(20)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val once = Sanitize.sanitize(s)
      assert(Sanitize.sanitize(once) == once, s"not idempotent for '$s'")
    }
  }

  test("duplicate cleaned names are a hard failure") {
    val ex = intercept[IllegalArgumentException] {
      Sanitize.defaultHeaderStrategy(Seq("A b", "A-b"))
    }
    assert(ex.getMessage.contains("Duplicate field name: a_b"))
  }

  test("default strategy preserves order") {
    assert(Sanitize.defaultHeaderStrategy(Seq("Zeta", "Alpha", "Mid Point")) ==
      Seq("zeta", "alpha", "mid_point"))
  }
}
