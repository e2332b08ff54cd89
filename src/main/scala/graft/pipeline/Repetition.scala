package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full Gopher repetition battery (Rae et al. 2021, Table A1) — the
  * published per-document repetition signals a production quality filter
  * keys on, complementing x18's summary ratio and x51's non-repetition
  * rules:
  *
  *   - duplicate line fraction and duplicate line CHARACTER fraction
  *     (here over the same non-overlapping 3-token spans x30/x39 segment
  *     on, because the raw corpus is single-line; the NEWLINE-faithful
  *     published form is registered as x58d over the derived multi-line
  *     corpus — see [[lineSignalsOf]] — so the deviation is confined to
  *     this battery's convenience form. Paragraph variants remain N/A:
  *     the corpus has no paragraph structure to derive);
  *   - top n-gram character fraction for n ∈ {2,3,4} — characters claimed
  *     by the most frequent n-gram (count × chars of the gram, over doc
  *     chars; overlapping occurrences each count, per the published
  *     definition, so a pathological doc can exceed 1.0);
  *   - duplicate n-gram character fraction for n ∈ {5..10} — characters
  *     COVERED by any n-gram occurring more than once, position-exact
  *     (covered token positions are deduplicated before weighing, so
  *     overlap never double-counts), over the doc's token character mass.
  *
  * Deviation from the paper, stated: "duplicate" mass for lines counts
  * occurrences beyond the first (the removable mass, x18's convention);
  * the dup-n-gram denominators weigh token characters (sum of token
  * lengths, excluding separators) rather than raw text length — separator
  * chars belong to no token, so attributing them to coverage would be
  * arbitrary.
  *
  * Scale shape: everything is explode → (doc_id, key)-keyed partial+final
  * aggregation — map-side combinable, uniform keys (a gram hot across the
  * corpus is still aggregated per doc). The dup-coverage join of grams to
  * their duplicated keys is an equi-join on the SAME (doc_id, gram) key
  * as the aggregation, so it reuses the exchange; coverage dedup and char
  * weighting are (doc_id, pos)-keyed. Per-doc state never exceeds one
  * document's grams. No window over the corpus, no product, no collect.
  * The final assembly is a doc_id-keyed multi-way left join — one shuffle
  * class, AQE-coalesced. */
object Repetition {
  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  /** The ONE tokenization/projection every x58 frame derives from — a
    * single definition so battery, coverage and gate can never drift. */
  private def baseOf(docsDf: DataFrame): DataFrame =
    docsDf.select(col("doc_id"),
      length(col("text")).cast("long").as("n_char"),
      split(col("text"), " ").as("t"))

  private def base(s: SparkSession, dir: String): DataFrame =
    baseOf(docs(s, dir))

  /** Overlapping n-grams with their 0-based start position. */
  private def grams(b: DataFrame, n: Int): DataFrame =
    b.filter(size(col("t")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), (size(col("t")) - n).cast("int")),
        i => struct(i.as("pos"), concat_ws(" ", slice(col("t"), i + 1, lit(n))).as("g"))))
        .as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.g").as("g"))

  /** (doc_id, numN) — characters claimed by the most frequent n-gram:
    * count × len(gram), tie-broken (count, len, gram) descending so both
    * engines pick the identical gram. */
  private def topGramNum(b: DataFrame, n: Int, name: String): DataFrame =
    grams(b, n).groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(struct(col("c"), length(col("g")).cast("long").as("l"), col("g"))).as("m"))
      .select(col("doc_id"), (col("m.c") * col("m.l")).as(name))

  /** (doc_id, cmN) — token character mass covered by duplicated n-grams.
    * Positions are deduplicated BEFORE weighing (overlap-exact).
    * Duplicate detection is a COUNT WINDOW over (doc_id, g), not a
    * groupBy + join-back: the join-back form evaluated the gram explode
    * twice per n (12 explodes across the 5..10 battery) and shuffled
    * the gram stream twice (once into the aggregate, once into the
    * join); the window keeps every instance row — positions included —
    * so one shuffle serves detection AND coverage. Same per-doc
    * duplicate semantics, same masses. */
  private def dupCoverMass(b: DataFrame, tl: DataFrame, n: Int, name: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    grams(b, n)
      .withColumn("c", count(lit(1)).over(Window.partitionBy("doc_id", "g")))
      .filter(col("c") > 1)
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos"))
      .distinct()
      .join(tl, Seq("doc_id", "pos"))
      .groupBy("doc_id").agg(sum("tl").as(name))
  }

  /** Token lengths by position — the char-weighting side of coverage. */
  private def tokLens(b: DataFrame): DataFrame =
    b.select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), length(col("tok")).cast("long").as("tl"))

  /** Line-level duplicate mass over x30's non-overlapping 3-token spans. */
  private def lineStats(b: DataFrame): DataFrame =
    b.select(col("doc_id"), explode(transform(
        sequence(lit(0), floor((size(col("t")) - 1).cast("long") / lit(3L)).cast("int")),
        i => concat_ws(" ", slice(col("t"), i * 3 + 1, lit(3))))).as("line"))
      .groupBy("doc_id", "line").agg(count(lit(1)).as("c"))
      .withColumn("lc", length(col("line")).cast("long"))
      .groupBy("doc_id").agg(
        sum("c").as("n_lines"),
        sum(when(col("c") > 1, col("c") - 1).otherwise(0L)).as("dup_lines"),
        sum(col("c") * col("lc")).as("line_chars"),
        sum(when(col("c") > 1, (col("c") - 1) * col("lc")).otherwise(0L)).as("dup_line_chars"))

  private def frac(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
    round(when(den.isNull || den === 0, 0.0)
      .otherwise(coalesce(num, lit(0L)).cast("double") / den), 4)

  // --------------------------------------------------------------- x58
  /** Un-ordered battery frame over ANY (doc_id, text) frame — the
    * reusable form (x30's *Of pattern); per-doc and stateless across
    * docs, so a streaming foreachBatch body can run it verbatim. */
  def batteryOf(docsDf: DataFrame): DataFrame =
    batteryFrame(baseOf(docsDf))

  private def batteryFrame(s: SparkSession, dir: String): DataFrame =
    batteryFrame(base(s, dir))

  private def batteryFrame(b: DataFrame): DataFrame = {
    val withTops = Seq(2, 3, 4).map(n => topGramNum(b, n, s"num$n"))
      .foldLeft(b.select(col("doc_id"), col("n_char")).join(lineStats(b), Seq("doc_id"), "left")) {
        (acc, t) => acc.join(t, Seq("doc_id"), "left")
      }
    withTops.select(col("doc_id"),
      coalesce(col("n_lines"), lit(0L)).as("n_lines"),
      frac(col("dup_lines"), col("n_lines")).as("dup_line_frac"),
      frac(col("dup_line_chars"), col("line_chars")).as("dup_line_char_frac"),
      frac(col("num2"), col("n_char")).as("top_2gram_frac"),
      frac(col("num3"), col("n_char")).as("top_3gram_frac"),
      frac(col("num4"), col("n_char")).as("top_4gram_frac"))
  }

  def repetitionBattery(s: SparkSession, dir: String): DataFrame =
    batteryFrame(s, dir).orderBy("doc_id")

  // -------------------------------------------------------------- x58b
  /** [[batteryOf]]'s counterpart for the dup-n-gram coverage signals. */
  def coverageOf(docsDf: DataFrame): DataFrame =
    coverageFrame(baseOf(docsDf))

  private def coverageFrame(s: SparkSession, dir: String): DataFrame =
    coverageFrame(base(s, dir))

  /** Un-ordered coverage frame: dup-n-gram char fractions, n = 5..10. */
  private def coverageFrame(b: DataFrame): DataFrame = {
    // Checkpointed once: the token-length frame feeds the total mass AND
    // all six coverage joins — unmaterialized, the posexplode re-ran 7×.
    val tl = Checkpoints.stable(tokLens(b))
    val tm = tl.groupBy("doc_id").agg(sum("tl").as("tm"))
    val joined = (5 to 10).map(n => dupCoverMass(b, tl, n, s"cm$n"))
      .foldLeft(tm)((acc, c) => acc.join(c, Seq("doc_id"), "left"))
    joined.select(col("doc_id") +: (5 to 10).map(n =>
      frac(col(s"cm$n"), col("tm")).as(s"dup_${n}gram_frac")): _*)
  }

  def dupNgramCoverage(s: SparkSession, dir: String): DataFrame =
    coverageFrame(s, dir).orderBy("doc_id")

  // -------------------------------------------------------------- x58c
  /** Pass verdicts at the PUBLISHED Gopher thresholds (Rae et al. Table
    * A1): dup-line ≤ 0.30, dup-line-chars ≤ 0.20, top-{2,3,4}-gram ≤
    * {0.20, 0.18, 0.16}, dup-{5..10}-gram ≤ {0.15, 0.14, 0.13, 0.12,
    * 0.11, 0.10}. Verdicts compare the ROUNDED signals the battery
    * queries emit (x51's discipline — the gate and the diagnostic columns
    * can never disagree), one boolean per rule plus the conjunction. */
  def repetitionGate(s: SparkSession, dir: String): DataFrame = {
    // The battery + coverage composition fans the tokenized base out to
    // ~10 signal subtrees (3 top-gram, 6 dup-coverage, line stats), each
    // of which would otherwise re-scan and re-tokenize the corpus; one
    // eager checkpoint bounds that to a single tokenization (the
    // curateV2 multi-consumer discipline). gateOf — the streaming
    // admission form — stays checkpoint-free: a micro-batch is small
    // and the extra materialization per batch would cost more than the
    // recompute.
    val b = base(s, dir).transform(Checkpoints.stable)
    gateFrom(batteryFrame(b), coverageFrame(b)).orderBy("doc_id")
  }

  /** The gate over ANY (doc_id, text) frame — per-doc and stateless, so
    * it slots into a foreachBatch admission body unchanged. Un-ordered:
    * this is the hot admission-path form (StreamingJobs.ingestAdmit),
    * where a global sort would serialize every micro-batch for nothing;
    * the registered x58c keeps its own oracle-mandated ORDER BY. */
  def gateOf(docsDf: DataFrame): DataFrame =
    gateFrom(batteryOf(docsDf), coverageOf(docsDf))

  private def gateFrom(battery: DataFrame, coverage: DataFrame): DataFrame = {
    // LEFT join + coalesce-to-0 coverage: a doc whose text tokenizes to
    // nothing (null/empty — posexplode emits no rows, so it never reaches
    // the coverage frame's token-mass root) must still get a verdict; an
    // inner join would silently shrink the gate's one-verdict-per-doc
    // contract while the battery still emits the doc. Zero coverage
    // trivially passes every dup-gram threshold, which is the right
    // verdict for a doc with no n-grams to duplicate.
    val passes =
      Seq(col("dup_line_frac") <= 0.30, col("dup_line_char_frac") <= 0.20,
          col("top_2gram_frac") <= 0.20, col("top_3gram_frac") <= 0.18,
          col("top_4gram_frac") <= 0.16) ++
        DupGramThresholds.map { case (n, th) =>
          coalesce(col(s"dup_${n}gram_frac"), lit(0.0)) <= th }
    val names =
      Seq("pass_dup_line", "pass_dup_line_char", "pass_top_2gram",
          "pass_top_3gram", "pass_top_4gram") ++
        DupGramThresholds.map { case (n, _) => s"pass_dup_${n}gram" }
    battery.join(coverage, Seq("doc_id"), "left")
      .select(col("doc_id") +:
        (passes.zip(names).map { case (p, nm) => p.as(nm) } :+
          passes.reduce(_ && _).as("pass_all")): _*)
  }

  private val DupGramThresholds =
    Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  // -------------------------------------------------------------- x58d
  /** The two Gopher LINE signals over an arbitrary line expression —
    * [[batteryOf]]'s counterpart freed from the 3-token-span
    * segmentation. Scale shape identical to [[lineStats]]: one explode,
    * two (doc, line)- then doc-keyed map-side-combinable aggregations. */
  def lineSignalsOf(docsDf: DataFrame, lines: org.apache.spark.sql.Column): DataFrame =
    docsDf.select(col("doc_id"), explode(lines).as("line"))
      .groupBy("doc_id", "line").agg(count(lit(1)).as("c"))
      .withColumn("lc", length(col("line")).cast("long"))
      .groupBy("doc_id").agg(
        sum("c").as("n_lines"),
        sum(when(col("c") > 1, col("c") - 1).otherwise(0L)).as("dup_lines"),
        sum(col("c") * col("lc")).as("line_chars"),
        sum(when(col("c") > 1, (col("c") - 1) * col("lc")).otherwise(0L)).as("dup_line_chars"))
      .select(col("doc_id"), col("n_lines"),
        frac(col("dup_lines"), col("n_lines")).as("dup_line_frac"),
        frac(col("dup_line_chars"), col("line_chars")).as("dup_line_char_frac"))

  /** x58d: duplicate-line fraction and duplicate-line CHARACTER fraction
    * over REAL newline lines (Rae et al. Table A1 as published), on the
    * derived multi-line corpus ([[Curation.multiLineDocs]]) — closes the
    * single-line deviation disclosed in this file's header: "lines" here
    * are genuine newline-delimited lines, including the planted
    * header/footer boilerplate and split bodies. */
  def dupLinesNewline(s: SparkSession, dir: String): DataFrame =
    lineSignalsOf(Curation.multiLineDocs(docs(s, dir)), split(col("text"), "\n"))
      .orderBy("doc_id")

  private val x58dSql =
    s"""WITH ${Curation.mdCte},
       nlines AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM md),
       lg AS (SELECT doc_id, line, count(*) AS c, len(line) AS lc
              FROM nlines GROUP BY doc_id, line),
       ls AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
                sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS dup_lines,
                sum(c * lc) AS line_chars,
                sum(CASE WHEN c > 1 THEN (c - 1) * lc ELSE 0 END) AS dup_line_chars
              FROM lg GROUP BY doc_id)
       SELECT doc_id, n_lines,
         ${fracSql("dup_lines", "n_lines")} AS dup_line_frac,
         ${fracSql("dup_line_chars", "line_chars")} AS dup_line_char_frac
       FROM ls ORDER BY doc_id"""

  // ------------------------------------------------------------ oracles
  private val ttCte =
    """tt AS (SELECT doc_id, length(text) AS n_char, string_split(text, ' ') AS t
       FROM documents)"""

  private val lineCtes =
    """lines AS (SELECT doc_id, array_to_string(t[(i*3+1):(i*3+3)], ' ') AS line
                 FROM tt, unnest(generate_series(0,
                   CAST(floor((len(t) - 1) / 3) AS BIGINT))) u(i)),
       lg AS (SELECT doc_id, line, count(*) AS c, len(line) AS lc
              FROM lines GROUP BY doc_id, line),
       ls AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
                sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS dup_lines,
                sum(c * lc) AS line_chars,
                sum(CASE WHEN c > 1 THEN (c - 1) * lc ELSE 0 END) AS dup_line_chars
              FROM lg GROUP BY doc_id)"""

  private def gramCte(n: Int): String =
    s"""g$n AS (SELECT doc_id, i AS pos, array_to_string(t[(i+1):(i+$n)], ' ') AS g
        FROM tt, unnest(generate_series(0, len(t) - $n)) u(i)
        WHERE len(t) >= $n)"""

  private def topCtes(n: Int): String =
    s"""${gramCte(n)},
       c$n AS (SELECT doc_id, g, count(*) AS c FROM g$n GROUP BY doc_id, g),
       m$n AS (SELECT doc_id, num FROM
                 (SELECT doc_id, c * len(g) AS num,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY c DESC, len(g) DESC, g DESC) AS rk
                  FROM c$n)
               WHERE rk = 1)"""

  private def covCtes(n: Int): String =
    s"""${gramCte(n)},
       d$n AS (SELECT doc_id, g FROM g$n GROUP BY doc_id, g HAVING count(*) > 1),
       q$n AS (SELECT DISTINCT a.doc_id, a.pos + k AS p
               FROM g$n a JOIN d$n USING (doc_id, g),
                 unnest(generate_series(0, ${n - 1})) v(k)),
       m$n AS (SELECT q$n.doc_id, CAST(sum(tl.tl) AS BIGINT) AS cm
               FROM q$n JOIN tl ON q$n.doc_id = tl.doc_id AND q$n.p = tl.pos
               GROUP BY q$n.doc_id)"""

  private val tlCtes =
    """tl AS (SELECT doc_id, i AS pos, len(t[i+1]) AS tl
              FROM tt, unnest(generate_series(0, len(t) - 1)) u(i)),
       tm AS (SELECT doc_id, CAST(sum(tl) AS BIGINT) AS tm FROM tl GROUP BY doc_id)"""

  private def fracSql(num: String, den: String): String =
    s"round(CASE WHEN coalesce($den, 0) = 0 THEN 0.0 ELSE CAST(coalesce($num, 0) AS DOUBLE) / $den END, 4)"

  private val batterySelect =
    s"""SELECT tt.doc_id, coalesce(ls.n_lines, 0) AS n_lines,
         ${fracSql("ls.dup_lines", "ls.n_lines")} AS dup_line_frac,
         ${fracSql("ls.dup_line_chars", "ls.line_chars")} AS dup_line_char_frac,
         ${fracSql("m2.num", "tt.n_char")} AS top_2gram_frac,
         ${fracSql("m3.num", "tt.n_char")} AS top_3gram_frac,
         ${fracSql("m4.num", "tt.n_char")} AS top_4gram_frac
       FROM tt LEFT JOIN ls USING (doc_id)
         LEFT JOIN m2 USING (doc_id) LEFT JOIN m3 USING (doc_id)
         LEFT JOIN m4 USING (doc_id)"""

  private val coverageSelect =
    s"""SELECT tm.doc_id,
         ${(5 to 10).map(n => s"${fracSql(s"m$n.cm", "tm.tm")} AS dup_${n}gram_frac").mkString(",\n         ")}
       FROM tm ${(5 to 10).map(n => s"LEFT JOIN m$n USING (doc_id)").mkString(" ")}"""

  private val x58Sql =
    s"""WITH $ttCte, $lineCtes, ${topCtes(2)}, ${topCtes(3)}, ${topCtes(4)}
       $batterySelect ORDER BY doc_id"""

  private val x58bSql =
    s"""WITH $ttCte, $tlCtes, ${(5 to 10).map(covCtes).mkString(", ")}
       $coverageSelect ORDER BY doc_id"""

  private val x58cSql = {
    val passes =
      Seq("b.dup_line_frac <= 0.30 AS pass_dup_line",
        "b.dup_line_char_frac <= 0.20 AS pass_dup_line_char",
        "b.top_2gram_frac <= 0.20 AS pass_top_2gram",
        "b.top_3gram_frac <= 0.18 AS pass_top_3gram",
        "b.top_4gram_frac <= 0.16 AS pass_top_4gram") ++
        DupGramThresholds.map { case (n, th) =>
          s"coalesce(c.dup_${n}gram_frac, 0) <= $th AS pass_dup_${n}gram" }
    val conj =
      (Seq("b.dup_line_frac <= 0.30", "b.dup_line_char_frac <= 0.20",
        "b.top_2gram_frac <= 0.20", "b.top_3gram_frac <= 0.18",
        "b.top_4gram_frac <= 0.16") ++
        DupGramThresholds.map { case (n, th) =>
          s"coalesce(c.dup_${n}gram_frac, 0) <= $th" })
        .mkString(" AND ")
    s"""WITH $ttCte, $lineCtes, ${topCtes(2)}, ${topCtes(3)}, ${topCtes(4)},
       $tlCtes, ${(5 to 10).map(covCtes).mkString(", ")},
       battery AS ($batterySelect),
       coverage AS ($coverageSelect)
       SELECT b.doc_id, ${passes.mkString(",\n         ")},
         ($conj) AS pass_all
       FROM battery b LEFT JOIN coverage c USING (doc_id) ORDER BY doc_id"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x58_repetition_battery", repetitionBattery, Some(x58Sql)),
    QueryDef("x58b_dup_ngram_coverage", dupNgramCoverage, Some(x58bSql)),
    QueryDef("x58c_repetition_gate", repetitionGate, Some(x58cSql)),
    QueryDef("x58d_dup_lines_newline", dupLinesNewline, Some(x58dSql)))
}
