package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row

/** x58 family — the Gopher repetition battery on a planted corpus with
  * hand-computed signal values (Rae et al. Table A1 semantics, the
  * deviations documented on [[Repetition]]). */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("repet").toString
    Seq(
      (1L, "a b c a b c a b c"),
      (2L, "one two three four five six seven eight"),
      (3L, "x"),
      (4L, "")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def row(df: org.apache.spark.sql.DataFrame, id: Long): Row =
    df.filter($"doc_id" === id).collect().head

  test("x58 battery: periodic doc — duplicate lines and top grams by hand") {
    val b = Repetition.repetitionBattery(spark, dir)
    val r = row(b, 1L)
    // lines = three identical "a b c" spans
    assert(r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[Double]("dup_line_frac") == 0.6667)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.6667)
    // 17 chars; top 2-gram "b c" (count 3 x 3 chars), top 3-gram
    // "a b c" (3 x 5), top 4-gram "c a b c" (2 x 7)
    assert(r.getAs[Double]("top_2gram_frac") == 0.5294)
    assert(r.getAs[Double]("top_3gram_frac") == 0.8824)
    assert(r.getAs[Double]("top_4gram_frac") == 0.8235)
  }

  test("x58 battery: all-distinct doc — zero duplicate mass, longest-gram tiebreak") {
    val b = Repetition.repetitionBattery(spark, dir)
    val r = row(b, 2L)
    assert(r.getAs[Double]("dup_line_frac") == 0.0)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.0)
    // every gram count = 1; the (count, len, gram)-max picks the longest
    // ("seven eight" 11/39, "three four five" 15/39,
    //  "five six seven eight" 20/39)
    assert(r.getAs[Double]("top_2gram_frac") == 0.2821)
    assert(r.getAs[Double]("top_3gram_frac") == 0.3846)
    assert(r.getAs[Double]("top_4gram_frac") == 0.5128)
  }

  test("x58 battery: single-token and empty docs — guards, not nulls or NaNs") {
    val b = Repetition.repetitionBattery(spark, dir)
    for (id <- Seq(3L, 4L)) {
      val r = row(b, id)
      assert(r.getAs[Long]("n_lines") == 1L) // the lone (possibly empty) span
      for (c <- Seq("dup_line_frac", "dup_line_char_frac", "top_2gram_frac",
        "top_3gram_frac", "top_4gram_frac"))
        assert(r.getAs[Double](c) == 0.0, s"doc $id $c")
    }
  }

  test("x58b coverage: periodic doc covers fully at n=5,6 and not at all at n>=7") {
    val c = Repetition.dupNgramCoverage(spark, dir)
    val r = row(c, 1L)
    // "a b c" period 3: 5-grams repeat at offsets 0/3, 6-grams at 0/3,
    // union of covered positions is the whole doc; 7..10-grams are all
    // distinct (or absent), so coverage drops to zero exactly there.
    assert(r.getAs[Double]("dup_5gram_frac") == 1.0)
    assert(r.getAs[Double]("dup_6gram_frac") == 1.0)
    for (n <- 7 to 10) assert(r.getAs[Double](s"dup_${n}gram_frac") == 0.0, s"n=$n")
    // distinct doc and short docs: zero everywhere
    for (id <- Seq(2L, 3L, 4L); n <- 5 to 10)
      assert(row(c, id).getAs[Double](s"dup_${n}gram_frac") == 0.0, s"doc $id n=$n")
  }

  test("x58c gate: thresholds verdict on rounded signals, conjunction agrees") {
    val g = Repetition.repetitionGate(spark, dir)
    val r1 = row(g, 1L)
    assert(!r1.getAs[Boolean]("pass_dup_line"))   // 0.6667 > 0.30
    assert(!r1.getAs[Boolean]("pass_top_2gram"))  // 0.5294 > 0.20
    assert(!r1.getAs[Boolean]("pass_dup_5gram"))  // 1.0 > 0.15
    assert(!r1.getAs[Boolean]("pass_all"))
    // doc 2 fails only the top-gram rules that key on LENGTH of a
    // once-occurring gram — 0.2821 > 0.20, 0.3846 > 0.18, 0.5128 > 0.16
    val r2 = row(g, 2L)
    assert(r2.getAs[Boolean]("pass_dup_line") && r2.getAs[Boolean]("pass_dup_10gram"))
    assert(!r2.getAs[Boolean]("pass_top_2gram") && !r2.getAs[Boolean]("pass_all"))
    // degenerate docs pass everything
    for (id <- Seq(3L, 4L)) assert(row(g, id).getAs[Boolean]("pass_all"), s"doc $id")
  }

  test("x58c gateOf: a null-text doc still gets a verdict (left-join contract)") {
    // posexplode over null tokens emits no rows, so the doc never reaches
    // the coverage frame — the gate must still emit one passing verdict
    // per doc instead of silently dropping it (r10 ADVICE).
    val in = Seq((1L, "a b c a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val g = Repetition.gateOf(in).collect().map(r => r.getLong(0) -> r).toMap
    assert(g.keySet == Set(1L, 2L))
    assert(g(2L).getAs[Boolean]("pass_all"))
    for (n <- 5 to 10) assert(g(2L).getAs[Boolean](s"pass_dup_${n}gram"))
  }

  test("x58d lineSignalsOf: hand-computed dup-line signals on planted real newlines") {
    // lines: [nav, body one, nav, footer] -> n=4, dup=1 (one repeat of
    // nav), chars: 3*2 + 8 + 6 = 20, dup chars = 3.
    val in = Seq(
      (1L, "nav\nbody one\nnav\nfooter"),
      (2L, "only line")).toDF("doc_id", "text")
    val out = Repetition.lineSignalsOf(in, org.apache.spark.sql.functions.split($"text", "\n"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_lines") == 4L)
    assert(out(1L).getAs[Double]("dup_line_frac") == 0.25)
    assert(out(1L).getAs[Double]("dup_line_char_frac") == 0.15)
    assert(out(2L).getAs[Long]("n_lines") == 1L)
    assert(out(2L).getAs[Double]("dup_line_frac") == 0.0)
    assert(out(2L).getAs[Double]("dup_line_char_frac") == 0.0)
  }

  test("x58d: newline variant emits one row per derived multi-line document") {
    val n = graft.Tables.t(spark, sf, "documents").count()
    val d = Repetition.dupLinesNewline(spark, sf)
    assert(d.count() == n)
    // The derived corpus has >= 3 lines per doc (header, body, footer).
    assert(d.agg(org.apache.spark.sql.functions.min("n_lines")).head().getLong(0) >= 3L)
  }

  test("x58 runs on the real corpus with one row per document") {
    val n = graft.Tables.t(spark, sf, "documents").count()
    assert(Repetition.repetitionBattery(spark, sf).count() == n)
    assert(Repetition.dupNgramCoverage(spark, sf).count() == n)
    assert(Repetition.repetitionGate(spark, sf).count() == n)
  }
}
