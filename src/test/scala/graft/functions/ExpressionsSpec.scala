package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.Sanitize

/** Native Catalyst expression semantics: interpreted and codegen paths
  * must agree, nulls propagate, and sanitize_name matches the driver-side
  * sanitizer exactly. */
class ExpressionsSpec extends SparkSpec {

  test("rolling_hash matches the reference fold and handles nulls") {
    assert(RollingHash.hash("abc") == 96354L)
    assert(RollingHash.hash("") == 0L)
    GraftFunctions.register(spark)
    import spark.implicits._
    val got = Seq(("abc"), (null: String)).toDF("s")
      .select(expr("rolling_hash(s)").as("h")).collect()
    assert(got(0).getLong(0) == 96354L)
    assert(got(1).isNullAt(0), "null in → null out")
  }

  test("rolling_hash on non-ASCII text folds UTF-16 code units (oracle parity is ASCII-only)") {
    // 'é' is U+00E9 = 233: the Spark fold is (0*31 + 233) % p = 233, then
    // 233*31 + 'x'(120). DuckDB's mirrored oracles fold ascii(c), which
    // returns the CODEPOINT for 'é' too — but for any char above U+FFFF
    // (surrogate pairs) or combining sequences the two diverge, so the
    // x03b/x40/x42 oracle-parity contract is pinned to ASCII corpora
    // (see the chunkCtes/winnowCtes scaladocs). This test pins the Spark
    // side's definition so a change to byte-level folding is caught.
    assert(RollingHash.hash("é") == 233L)
    assert(RollingHash.hash("éx") == 233L * 31 + 120)
    // A surrogate-pair char (U+1F600) folds as TWO code units — the
    // documented divergence from any codepoint-based fold.
    val smiley = new String(Character.toChars(0x1F600))
    assert(smiley.length == 2)
    assert(RollingHash.hash(smiley) ==
      (0xD83D.toLong * 31 + 0xDE00) % 1000000007L)
  }

  test("rolling_hash runs inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // parquet-backed source so the projection isn't constant-folded away
    val df = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"), expr("rolling_hash(text)").as("h"))
    val rows = df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "expression must not break codegen")
    // codegen result equals the interpreted reference fold
    rows.take(50).foreach { r =>
      assert(r.getLong(2) == RollingHash.hash(r.getString(1)))
    }
  }

  test("sanitize_name expression == driver-side Sanitize on golden cases") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val cases = Seq("Aantal bedr.", "Auteur o.g.v.", "Enschedé", "1e druk", "  UPPER Case  ")
    val got = cases.toDF("s").select(expr("sanitize_name(s)").as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(Sanitize.sanitize))
  }

  test("B35 showcase scalar UDF matches the native expression") {
    import spark.implicits._
    val got = Seq("Aantal bedr.", "1e druk").toDF("s")
      .select(GraftFunctions.sanitizeUdf(col("s")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("aantal_bedr_", "_1e_druk"))
  }

  test("CollapseSanitize rule folds nested sanitize_name applications") {
    GraftFunctions.register(spark)
    val df = graft.Tables.t(spark, sf, "documents")
      .select(expr("sanitize_name(sanitize_name(source))").as("s"))
    val analyzed = df.queryExecution.analyzed
    val before = analyzed.toString
    assert("sanitize_name".r.findAllIn(before).size >= 2, before)
    val after = CollapseSanitize(analyzed).toString
    assert("sanitize_name".r.findAllIn(after).size == 1,
      s"nested calls must collapse to one:\n$after")
    // and the rewrite is semantics-preserving (idempotence)
    val single = graft.Tables.t(spark, sf, "documents")
      .select(expr("sanitize_name(source)").as("s"))
    assert(df.collect().toSeq == single.collect().toSeq)
  }

  test("token_hash expression equals the interpreted ascii-fold it replaced") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    import spark.implicits._
    val toks = Seq("a", "the", "spark", "", "a b", "zzzzzzzzzz", "Enschedé").toDF("tok")
    val both = toks.select(
      call_function("token_hash", col("tok")).as("native"),
      (aggregate(transform(split(col("tok"), ""), c => ascii(c).cast("long")),
        lit(0L), (a, c) => (a * 31L + c) % 1000000007L) * 2654435761L % 1000000007L).as("hof"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), s"mismatch: $r"))
    // and it must execute inside whole-stage codegen (a parquet scan, not
    // the literal table above, which ConvertToLocalRelation pre-evaluates)
    val plan = graft.Tables.t(spark, sf, "documents")
      .select(call_function("token_hash", col("text")))
    plan.collect()
    assert(plan.queryExecution.executedPlan.toString.contains("*("))
  }

  test("shingle_hashes equals the HOF shingle chain it replaced, on the real corpus") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val n = 3
    val t = split(coalesce(col("text"), lit("")), " ")
    val refGrams = when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
    val both = graft.Tables.t(spark, sf, "documents")
      .select(
        call_function("shingle_hashes", coalesce(col("text"), lit("")), lit(n)).as("native"),
        transform(refGrams, sh => call_function("rolling_hash", sh)).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // edge cases: short doc, empty doc, repeated shingle — the SAME
    // unresolved reference columns as above, resolved against this frame
    import spark.implicits._
    val edges = Seq("", "one two", "a b c a b c a b c", "x y z").toDF("text")
    val e = edges.select(
      call_function("shingle_hashes", coalesce(col("text"), lit("")), lit(n)).as("native"),
      transform(refGrams, sh => call_function("rolling_hash", sh)).as("hof"))
      .collect()
    e.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch: $r"))
  }

  test("vec_dot/vec_norm2 equal the zip_with/aggregate folds they replaced") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val e = graft.Tables.t(spark, sf, "embeddings").limit(50)
    val q = e.select(col("embedding").as("b")).limit(1)
    val both = e.crossJoin(broadcast(q)).select(
      call_function("vec_dot", col("embedding"), col("b")).as("nd"),
      aggregate(zip_with(col("embedding"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v).as("hd"),
      call_function("vec_norm2", col("embedding")).as("nn"),
      aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")).as("hn"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"dot mismatch: $r")
      assert(r.getDouble(2) == r.getDouble(3), s"norm mismatch: $r")
    }
  }

  test("vec_dot_long equals the integer zip_with/aggregate fold it replaced") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val e = graft.Tables.t(spark, sf, "embeddings").limit(50)
      .select(graft.pipeline.Ivf.intMillionths(col("embedding")).as("xi"))
    val q = e.select(col("xi").as("b")).limit(1)
    val both = e.crossJoin(broadcast(q)).select(
      call_function("vec_dot_long", col("xi"), col("b")).as("nd"),
      aggregate(zip_with(col("xi"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("hd"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), s"long dot mismatch: $r"))
    import spark.implicits._
    val ragged = Seq((Array(1L, 2L, 3L), Array(1L, 2L))).toDF("a", "b")
      .select(call_function("vec_dot_long", col("a"), col("b"))).collect()
    assert(ragged(0).isNullAt(0),
      "ragged integer vectors must surface as null, not a truncated sum")
  }

  test("vec_dot yields NULL for mismatched vector lengths (zip_with parity)") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val out = df.select(call_function("vec_dot", col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0),
      "ragged embeddings must surface as null, not a truncated dot product")
  }

  test("set_jaccard equals the array_intersect division it replaced") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val docs = graft.Tables.t(spark, sf, "documents").limit(40)
    val keys = array_sort(array_distinct(split(col("text"), " ")))
    val sets = docs.select(col("doc_id"), keys.as("k"))
    val both = sets.as("a").crossJoin(sets.as("b"))
      .select(
        call_function("set_jaccard", col("a.k"), col("b.k")).as("nj"),
        (size(array_intersect(col("a.k"), col("b.k"))).cast("double") /
          (size(col("a.k")) + size(col("b.k")) -
            size(array_intersect(col("a.k"), col("b.k"))))).as("hj"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"jaccard mismatch: $r")
    }
    // Disjoint, identical, empty-vs-nonempty, and empty-vs-empty edges.
    // Empty∩empty is DEFINED as 1.0 — not the 0/0 NaN whose `NaN >= t`
    // quirk would silently pass a dedup threshold filter.
    import spark.implicits._
    val edges = Seq(
      (Seq("a", "b"), Seq("c", "d")), (Seq("a", "b"), Seq("a", "b")),
      (Seq[String](), Seq("a")), (Seq[String](), Seq[String]())).toDF("x", "y")
      .select(call_function("set_jaccard", col("x"), col("y"))).collect()
    assert(edges(0).getDouble(0) == 0.0)
    assert(edges(1).getDouble(0) == 1.0)
    assert(edges(2).getDouble(0) == 0.0)
    assert(edges(3).getDouble(0) == 1.0, "empty vs empty must be 1.0, not NaN")
  }

  test("set_overlap equals the array_intersect size it replaces") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val docs = graft.Tables.t(spark, sf, "documents").limit(30)
    val keys = array_sort(array_distinct(split(col("text"), " ")))
    val sets = docs.select(col("doc_id"), keys.as("k"))
    sets.as("a").crossJoin(sets.as("b"))
      .select(
        call_function("set_overlap", col("a.k"), col("b.k")).as("no"),
        size(array_intersect(col("a.k"), col("b.k"))).cast("long").as("ho"))
      .collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1), s"overlap mismatch: $r"))
    import spark.implicits._
    val edges = Seq(
      (Seq("a", "b"), Seq("b", "c")), (Seq[String](), Seq("a")),
      (Seq[String](), Seq[String]())).toDF("x", "y")
      .select(call_function("set_overlap", col("x"), col("y"))).collect()
    assert(edges.map(_.getLong(0)).toSeq == Seq(1L, 0L, 0L))
  }

  test("pq_encode/adc_score/bloom_hits reject degenerate foldable args at ANALYSIS") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Seq(1L, 2L)).toDF("v")
    def analysisFails(sel: String, fragment: String): Unit = {
      val e = intercept[Exception] {
        df.selectExpr(sel).queryExecution.analyzed
      }
      assert(e.getMessage != null && e.getMessage.toLowerCase.contains(fragment),
        s"$sel: expected a clean type-check error mentioning '$fragment', " +
          s"got ${e.getClass.getName}: ${e.getMessage}")
    }
    // r11 ADVICE regressions: each of these previously threw
    // ArithmeticException or NPE from inside checkInputDataTypes instead
    // of a TypeCheckFailure.
    analysisFails("pq_encode(v, array(1L, 2L), 0, 2)", "m >= 1")
    analysisFails("pq_encode(v, array(1L, 2L), 2, 0)", "m >= 1")
    analysisFails("pq_encode(v, CAST(NULL AS ARRAY<BIGINT>), 2, 2)", "null")
    // a bare array() is ArrayType(NullType) — rejected by the type
    // pattern itself; the emptiness guard needs a TYPED empty array.
    analysisFails("pq_encode(v, CAST(array() AS ARRAY<BIGINT>), 2, 2)", "non-empty")
    // Int m*k overflow (65536·65536 = 0 in Int) previously threw
    // ArithmeticException from the modulo; the check multiplies in Long.
    analysisFails("pq_encode(v, array(1L, 2L), 65536, 65536)", "multiple of m*k")
    analysisFails("adc_score(array(0), CAST(NULL AS ARRAY<BIGINT>))", "null")
    analysisFails("bloom_hits(v, CAST(NULL AS ARRAY<BIGINT>), 3, 97)", "null")
    analysisFails("bloom_hits(v, CAST(array() AS ARRAY<BIGINT>), 3, 97)", "non-empty")
  }

  test("two adc_score calls over a NON-nullable column share a codegen scope cleanly") {
    // r11 ADVICE regression: AdcScore.doGenCode declared a fixed local
    // `adcRes`; with a non-nullable child, nullSafeExec emits the snippet
    // unbraced, so two calls in one projection declared it twice and the
    // generated Java failed to compile (silent interpreted fallback).
    // fallback=false makes any codegen failure fatal so the regression
    // cannot hide.
    GraftFunctions.register(spark)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("codes",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType, containsNull = false),
          nullable = false)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row(Seq(0, 1)),
          org.apache.spark.sql.Row(Seq(1, 0))), 1), schema)
      val out = df.selectExpr(
        "adc_score(codes, array(10L, 20L, 30L, 40L)) AS a",
        "adc_score(codes, array(1L, 2L, 3L, 4L)) AS b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // table layout is (m=2, k=2): row [0,1] -> t[0]+t[3], row [1,0] -> t[1]+t[2]
      assert(out == Set((10L + 40L, 1L + 4L), (20L + 30L, 2L + 3L)), s"got $out")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("extensions entry point registers every native function") {
    val s2 = spark.newSession()
    // Run the injectFunction path against a raw SparkSessionExtensions:
    // this constructs every ExpressionInfo (whose ctor VALIDATES the
    // usage/source strings), so a malformed registration fails here
    // rather than at a deployment's session build.
    new graft.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // injectFunction path needs a fresh builder; the registry path is the
    // session-level equivalent — assert every function resolves through
    // SQL on a NON-active session (regression: vec ops once registered on
    // SparkSession.active only).
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT rolling_hash('abc')").collect()(0).getLong(0) == 96354L)
    assert(s2.sql("SELECT sanitize_name('A b.C')").collect()(0).getString(0) == "a_b_c")
    assert(s2.sql("SELECT token_hash('abc')").collect()(0).getLong(0) ==
      TokenHash.hash("abc"))
    assert(s2.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
      .collect()(0).getDouble(0) == 2.0)
    assert(s2.sql("SELECT vec_norm2(array(CAST(3.0 AS FLOAT)))")
      .collect()(0).getDouble(0) == 9.0)
    assert(s2.sql("SELECT set_jaccard(array('a','b','c'), array('b','c','d'))")
      .collect()(0).getDouble(0) == 0.5)
    assert(s2.sql("SELECT set_overlap(array('a','b','c'), array('b','c','d'))")
      .collect()(0).getLong(0) == 2L)
    // null elements (sorted last by array_sort) must not NPE and match
    // each other as a set element
    assert(s2.sql("SELECT set_jaccard(array('a', NULL), array('a', NULL))")
      .collect()(0).getDouble(0) == 1.0)
  }

  test("char_entropy: native equals the reference fold corpus-wide and on planted unicode") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // Planted edge battery: repeats, empty -> NULL, NULL -> NULL, single
    // char (entropy 0), multi-byte latin, CJK, and a SUPPLEMENTARY-plane
    // character (surrogate pair counts as ONE code point, matching
    // length/replace semantics on UTF8String).
    val planted = Seq(
      (1L, "aab"), (2L, ""), (3L, null.asInstanceOf[String]), (4L, "x"),
      (5L, "h\u00e9llo w\u00f6rld h\u00e9llo"), (6L, "\u4e2d\u6587\u4e2d\u6587 mixed \u4e2d"),
      (7L, "a\uD834\uDD1E\uD834\uDD1Eb")).toDF("doc_id", "text")
    val both = planted.select(col("doc_id"),
      call_function("char_entropy", col("text")).as("native"),
      graft.pipeline.TextStats.charEntropyColumn.as("fold")).collect()
    both.foreach { r =>
      val n = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val f = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(n == f, s"doc ${r.getLong(0)}: native $n vs fold $f")
    }
    assert(both.find(_.getLong(0) == 4L).exists(_.getLong(1) == 0L),
      "single-char doc has exactly zero entropy")
    assert(both.find(_.getLong(0) == 2L).exists(_.isNullAt(1)) &&
      both.find(_.getLong(0) == 3L).exists(_.isNullAt(1)),
      "empty and NULL score NULL")
    // Corpus-wide bit equality at sf (null-safe compare).
    val mismatches = graft.Tables.t(spark, sf, "documents")
      .select(call_function("char_entropy", col("text")).as("native"),
        graft.pipeline.TextStats.charEntropyColumn.as("fold"))
      .filter(!(col("native") <=> col("fold"))).count()
    assert(mismatches == 0, s"$mismatches corpus rows disagree with the fold")
  }
}
