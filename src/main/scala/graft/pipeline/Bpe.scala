package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subword (BPE-style) tokenization as pure integer/array expressions —
  * tokenizer-faithful token counting for the budget/packing family.
  *
  * Every budget operator so far (x15/x22/x41/x54/x55) counts WHITESPACE
  * tokens, but real training-data budgets are stated in model (BPE)
  * tokens, and whitespace counts systematically misprice code and
  * non-Latin text. x56 closes that unit gap with the WordPiece
  * algorithm — greedy longest-match against a fixed subword vocabulary
  * (Schuster & Nakajima 2012; the BERT tokenizer's inference rule, which
  * is also how a trained BPE merge table is APPLIED at inference when
  * expressed as its resulting vocabulary) — over a vocabulary of the
  * published highest-frequency English n-grams (Norvig 2013, "English
  * Letter Frequency Counts: Mayzner Revisited" — Google Books corpus),
  * with the implicit single-character fallback that makes tokenization
  * total. Fixed public vocabulary + deterministic greedy rule = both
  * engines derive identical counts with no model file involved.
  *
  * Implementation is expression-only (no UDF): per word, a fold over
  * character positions whose accumulator packs (next-position, count)
  * into one BIGINT — `acc = pos·2²⁰ + count` — advancing by the longest
  * vocabulary hit at each position (4 → 3 → 2 → single char). Two forms:
  * the nested-higher-order-function fold ([[subwordCountRef]] —
  * `transform` over words, `aggregate` over positions; pure expressions,
  * no registration, but HOF lambdas run interpreted per position) and
  * the PRODUCTION native codegen'd expression
  * ([[graft.functions.SubwordCount]], hash-set lookups inside
  * whole-stage codegen — measured ~4× the HOF form at sf0.1;
  * property-tested equal in BpeSpec). Either way: one map-only
  * projection, NO explode, no shuffle before the output sort; at 100 TB
  * this runs at scan speed and composes with any budget operator as a
  * drop-in token expression.
  *
  * The DuckDB oracle deliberately avoids `list_reduce` ENTIRELY: DuckDB
  * 1.0.0 miscompiles this fold both nested inside `list_transform` (an
  * inner lambda combining the guard-CASE with `substr`+`list_contains`
  * on the outer lambda variable returns element 0's result for later
  * elements) and — worse — FLAT under vectorized execution (the same
  * word folds to different counts depending on its batch neighbors:
  * 'customer' → 6 standalone, 5 mid-batch; measured against an
  * independent Python reference during round 8). The oracle instead
  * runs a RECURSIVE CTE over the corpus's DISTINCT words — (word, pos,
  * count) advancing by the longest hit per step, no lambdas anywhere —
  * which matches the reference on every word, then joins counts back to
  * word occurrences. Words are assumed < 2²⁰ chars (the pack
  * precondition; the corpus max is 3 orders of magnitude under it).
  */
object Bpe {
  /** Pack base for (pos, count) — positions/counts < 2^20. */
  private val M = 1L << 20

  /** Subword vocabulary by length — the Mayzner–Norvig most-frequent
    * English 4/3/2-grams (word-internal ones for length 4). Single
    * characters are the implicit fallback, so tokenization is total. */
  val Vocab4: Seq[String] = Seq("tion", "atio", "that", "ther", "with")
  val Vocab3: Seq[String] = Seq(
    "the", "and", "ing", "ion", "tio", "ent", "ati", "for", "her", "ter",
    "hat", "tha", "ere", "ate", "his", "con", "res", "ver", "all", "ons")
  val Vocab2: Seq[String] = Seq(
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea")
  require((Vocab4 ++ Vocab3 ++ Vocab2).distinct.size ==
    Vocab4.size + Vocab3.size + Vocab2.size, "subword vocabulary must be duplicate-free")
  require(Vocab4.forall(_.length == 4) && Vocab3.forall(_.length == 3) &&
    Vocab2.forall(_.length == 2), "vocabulary buckets must hold their stated lengths")

  /** Greedy longest-match subword count of ONE word (≥ 1 char): the
    * (pos, count) fold. `pos = shiftright(acc, 20)`, `count = acc % 2²⁰`;
    * positions not equal to `pos` are interior to an already-matched
    * token and pass the accumulator through. */
  private def wordTokCount(w: Column): Column = {
    val n = length(w)
    // matchLen at position x: longest vocabulary hit starting there.
    def matchLenAt(x: Column): Column = {
      def hitAt(len: Int, vocab: Seq[String]): Column =
        (x + lit(len - 1) <= n) &&
          array_contains(typedLit(vocab), w.substr(x.cast("int"), lit(len)))
      when(hitAt(4, Vocab4), 4L)
        .when(hitAt(3, Vocab3), 3L)
        .when(hitAt(2, Vocab2), 2L)
        .otherwise(1L)
    }
    aggregate(
      sequence(lit(1L), n.cast("long")),
      lit(M), // pos = 1, count = 0
      (acc, x) => when(x =!= shiftright(acc, 20), acc)
        .otherwise(shiftleft(shiftright(acc, 20) + matchLenAt(x), 20) + acc % M + 1L)
    ) % M
  }

  /** Per-document subword token count over `text` as nested HOFs — the
    * pure-expression REFERENCE form (needs no function registration;
    * BpeSpec property-tests the native expression against it). Null-safe;
    * empty words (from runs of spaces or empty text) count zero. */
  def subwordCountRef(text: Column): Column =
    aggregate(
      transform(
        filter(split(coalesce(text, lit("")), " "), w => length(w) > 0),
        w => wordTokCount(w)),
      lit(0L), (a, b) => a + b)

  /** Per-document subword token count — the PRODUCTION path: the native
    * codegen'd [[graft.functions.SubwordCount]] expression (hash-set
    * lookups inside whole-stage codegen; the HOF fold above runs
    * interpreted per position). Caller's session must have
    * `GraftFunctions.register`-ed (every registered query here does). */
  def subwordCount(text: Column): Column =
    call_function("subword_count", coalesce(text, lit("")))

  // ---------------------------------------------------------------- x56
  /** Registered x56: per-document whitespace vs subword counts plus the
    * tokens-per-whitespace-word ratio — the unit-conversion table every
    * whitespace-budget operator needs to be read in model tokens. */
  def tokenCounts(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.t(s, dir, "documents")
      // coalesce BOTH token columns: size(split(null)) is -1 in Spark
      // (the repo's documented size(null) trap) while the oracle's
      // len(string_split(NULL)) is NULL — null text must read as the
      // empty doc (1 whitespace token [''], 0 subwords) on both sides.
      .select(col("doc_id"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_ws_tok"),
        subwordCount(col("text")).as("n_subword_tok"))
      .withColumn("tok_ratio",
        round(col("n_subword_tok").cast("double") / col("n_ws_tok"), 4))
      .orderBy("doc_id")
  }

  private def sqlList(v: Seq[String]): String = v.map(w => s"'$w'").mkString("[", ", ", "]")

  /** CTE chain ending in `bpe(doc_id, n_subword_tok)` — shared by the
    * x56 and x56b oracles; must follow a `WITH RECURSIVE` keyword. The
    * recursion tokenizes each DISTINCT word once — (pos, cnt) advance by
    * the longest vocabulary hit; a word's final row is the one whose pos
    * passed its length, so max(cnt) is its token count — and the left
    * join spreads counts back over occurrences (empty words → 0). */
  private[graft] val bpeCountCtes =
    s"""w AS (SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS w
             FROM documents),
       words AS (SELECT DISTINCT w FROM w WHERE len(w) > 0),
       rec AS (
         SELECT w, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS cnt FROM words
         UNION ALL
         SELECT w, pos + step, cnt + 1 FROM (
           SELECT w, pos, cnt,
             CASE WHEN pos + 3 <= len(w) AND list_contains(${sqlList(Vocab4)}, substr(w, CAST(pos AS INT), 4)) THEN 4
                  WHEN pos + 2 <= len(w) AND list_contains(${sqlList(Vocab3)}, substr(w, CAST(pos AS INT), 3)) THEN 3
                  WHEN pos + 1 <= len(w) AND list_contains(${sqlList(Vocab2)}, substr(w, CAST(pos AS INT), 2)) THEN 2
                  ELSE 1 END AS step
           FROM rec WHERE pos <= len(w))
       ),
       wtok AS (SELECT w, max(cnt) AS n FROM rec GROUP BY w),
       bpe AS (SELECT doc_id, CAST(sum(coalesce(n, 0)) AS BIGINT) AS n_subword_tok
               FROM w LEFT JOIN wtok USING (w) GROUP BY doc_id)"""

  private val x56Sql =
    s"""WITH RECURSIVE $bpeCountCtes
       SELECT doc_id,
              CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_ws_tok,
              n_subword_tok,
              round(CAST(n_subword_tok AS DOUBLE)
                / len(string_split(coalesce(text, ''), ' ')), 4) AS tok_ratio
       FROM bpe JOIN documents USING (doc_id) ORDER BY doc_id"""

  // --------------------------------------------------------------- x56b
  /** Registered x56b: x55's exact Hamilton apportionment re-keyed on
    * SUBWORD token mass — the budget family stated in the unit real
    * training budgets use. Same machinery ([[Sampling.budgetApportionOf]]
    * and the shared math CTEs), different availability column; the
    * allocations genuinely differ from x55's because subword mass is not
    * proportional to whitespace mass across languages (BpeSpec pins
    * that). Scale shape is x55's: one map-side subword projection into a
    * partial+final agg on lang, then stratum-level window math. */
  def budgetApportionBpe(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Sampling.budgetApportionOf(
      Tables.t(s, dir, "documents")
        .groupBy("lang")
        .agg(sum(subwordCount(col("text"))).as("avail_tokens")))
  }

  private val x56bSql =
    s"""WITH RECURSIVE $bpeCountCtes,
       avail AS (SELECT lang, CAST(sum(n_subword_tok) AS BIGINT) AS avail_tokens
                 FROM bpe JOIN documents USING (doc_id) GROUP BY lang),
       ${Sampling.apportionMathCtes}
       SELECT lang, avail_tokens, floor_quota, remainder, alloc_tokens
       FROM alloc ORDER BY lang"""

  // ---------------------------------------------------------------- x65
  /** Merge candidates emitted by x65 — the top-K adjacent pairs. */
  val BpePairTopK = 20

  /** x65 — the TRAINING side of BPE (Sennrich et al. 2016, "Neural
    * Machine Translation of Rare Words with Subword Units"): corpus-scale
    * adjacent-pair statistics, whose argmax IS the next merge rule. x56
    * runs the trained tokenizer; this computes what a trainer learns
    * from, at the scale where it actually hurts (pair counting is the
    * per-iteration cost of BPE training, and naive trainers re-scan the
    * corpus per merge).
    *
    * DISCLOSED SIMPLIFICATIONS vs the paper's loop: first iteration only
    * (symbols are raw characters; the registered query emits the top-K
    * candidates rather than applying merges — the iteration is
    * vocabulary-sized bookkeeping once these counts exist) and no
    * end-of-word marker (the corpus is space-tokenized; a marker is a
    * constant concat both engines would share).
    *
    * Scale shape — the reason trainers survive 100 TB: the corpus
    * collapses to the DISTINCT-WORD frequency table first (one
    * content-keyed partial+final agg — the combiner absorbs every
    * repeated word per partition), and pair explosion runs over the
    * VOCABULARY weighted by freq, never over the corpus. Pair mass is
    * Σ_vocab (len−1), independent of corpus row count; the top-K is a
    * TakeOrderedAndProject on the (cnt DESC, pair) total order both
    * engines share. */
  def pairCounts(s: SparkSession, dir: String): DataFrame =
    pairCountsOf(Tables.t(s, dir, "documents"), BpePairTopK)

  private[graft] def pairCountsOf(corpus: DataFrame, k: Int): DataFrame = {
    val wf = corpus
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    wf.select(col("freq"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
      .orderBy(col("cnt").desc, col("pair"))
  }

  private val x65Sql =
    s"""WITH w AS (SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w
               FROM documents),
       wf AS (SELECT w, count(*) AS freq FROM w WHERE len(w) >= 2 GROUP BY w),
       p AS (SELECT w[i:i+1] AS pair, freq
             FROM wf, unnest(generate_series(1, len(w) - 1)) u(i)),
       c AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM p GROUP BY pair)
       SELECT pair, cnt FROM c ORDER BY cnt DESC, pair LIMIT $BpePairTopK"""

  // --------------------------------------------------------------- x65b
  /** Fixed iteration count of the registered merge loop (the x60/x62
    * fixed-iteration discipline — the oracle interpolates the same K). */
  val BpeMergeIters = 5

  /** Symbol delimiter for the merge loop's string-encoded symbol
    * sequences: U+001F (unit separator). PRECONDITION: corpus text is
    * free of U+001F (true of the synthetic corpus and essentially all
    * real text — it is a C0 control char). */
  private val Sep = "\u001f"

  /** x65b — the BPE TRAINING LOOP (Sennrich et al. 2016 §3): K=[[
    * BpeMergeIters]] iterations of count-adjacent-pairs → take the
    * argmax as the next merge rule → apply it everywhere → recount.
    * x65 computes one iteration's statistics; this runs the actual
    * loop and emits the MERGE TABLE — the artifact a trainer ships
    * (it, lhs, rhs, merged, cnt), the table whose resulting vocabulary
    * x56 applies at inference.
    *
    * Symbol sequences are encoded as fully-delimited strings —
    * `␟c␟␟a␟␟t␟` for the symbols [c, a, t] — so applying a merge
    * (a, b)→ab is ONE literal string replace of `␟a␟␟b␟` with
    * `␟ab␟`: because every symbol is individually wrapped, a pair
    * pattern can never match across symbol boundaries (a-as-suffix /
    * b-as-prefix of longer symbols), and both engines' left-to-right
    * non-overlapping replace IS the paper's greedy scan (`aaa` under
    * (a,a) → [aa, a], pinned in BpeSpec). No list-fold anywhere — the
    * documented DuckDB `list_reduce` miscompilation stays avoided.
    *
    * Scale shape — why BPE training survives 100 TB: the corpus
    * collapses ONCE to the distinct-word frequency table (checkpointed
    * — the only corpus-scale pass), and every iteration is (a) a
    * vocabulary-sized pair explode + partial+final agg, (b) ONE driver
    * collect of the single argmax row (bounded trainer bookkeeping, K
    * rows total), (c) a map-only string replace over the vocabulary.
    * Per-iteration cost is independent of corpus row count. Ties on
    * the pair count break by (lhs, rhs) — a total order both engines
    * share (NOT the concatenated string, which cannot distinguish
    * ("ab","c") from ("a","bc")). Fewer than K possible merges ends
    * the loop early on both sides. */
  def bpeMerges(s: SparkSession, dir: String): DataFrame =
    bpeMergesOf(s, Tables.t(s, dir, "documents"), BpeMergeIters)

  private[graft] def bpeMergesOf(s: SparkSession, corpus: DataFrame,
      iters: Int): DataFrame = {
    val (merges, _) = bpeTrain(s, corpus, iters)
    import s.implicits._
    merges.toDF("it", "lhs", "rhs", "merged", "cnt").orderBy("it")
  }

  /** The training loop's core: returns the merge rows AND the final
    * per-word state frame (w, s, freq) — x65b registers the merges,
    * x65c tokenizes with the final state. */
  private[graft] def bpeTrain(s: SparkSession, corpus: DataFrame, iters: Int)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    val wf = corpus
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      // (?s): Java '.' excludes CR, LF, NEL, LS, PS while RE2's '.'
      // excludes only \n — without DOTALL on BOTH engines, a word
      // containing a line terminator gets that char left UNWRAPPED,
      // corrupting the delimited encoding (a "symbol" containing the
      // delimiter) and, on \r, diverging from the oracle outright
      // (round-12 review finding). (?s) is valid in both regex dialects.
      .select(col("w"), regexp_replace(col("w"), "(?s)(.)", Sep + "$1" + Sep).as("s"),
        col("freq"))
    var state = Checkpoints.stable(wf)
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    var it = 1
    var exhausted = false
    while (it <= iters && !exhausted) {
      val withSyms = state.select(col("freq"),
        split(col("s").substr(lit(2), length(col("s")) - 2), Sep + Sep).as("syms"))
      val best = withSyms
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("pa"),
            element_at(col("syms"), i + 1).as("pb")))).as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pa"), col("pb"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (pa, pb, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((it.toLong, pa, pb, pa + pb, cnt))
        state = state.withColumn("s", call_function("replace", col("s"),
          lit(Sep + pa + Sep + Sep + pb + Sep), lit(Sep + pa + pb + Sep)))
        it += 1
      }
    }
    (merges.toSeq, state)
  }

  /** The trainer's state chain ending in `mg(s, freq, k)` — shared by
    * the x65b and x65c oracles (the applied tokenizer must use exactly
    * the merges the trainer reports); must follow `WITH RECURSIVE`. */
  private val bpeMergeCtes = {
    val sep = "chr(31)"
    val sep2 = s"$sep || $sep"
    s"""wx AS (SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w
              FROM documents),
       wf AS (SELECT w, count(*) AS freq FROM wx WHERE len(w) >= 2 GROUP BY w),
       init AS (SELECT regexp_replace(w, '(?s)(.)', $sep || '\\1' || $sep, 'g') AS s,
                       freq FROM wf),
       mg AS (
         SELECT s, freq, 0 AS k FROM init
         UNION ALL
         SELECT CASE WHEN best IS NULL THEN s
                     ELSE replace(s, $sep || best.pa || $sep2 || best.pb || $sep,
                                     $sep || best.pa || best.pb || $sep) END AS s,
                freq, k + 1 AS k
         FROM (
           SELECT s, freq, k, any_value(best) AS best FROM (
             SELECT s, freq, k,
               min(CASE WHEN pb IS NOT NULL
                        THEN {'nc': -cnt, 'pa': pa, 'pb': pb} END) OVER () AS best
             FROM (
               SELECT s, freq, k, pa, pb,
                 sum(CASE WHEN pb IS NOT NULL THEN freq END)
                   OVER (PARTITION BY pa, pb) AS cnt
               FROM (
                 SELECT s, freq, k, syms[i] AS pa, syms[i + 1] AS pb
                 FROM (SELECT s, freq, k,
                         string_split(s[2:len(s) - 1], $sep2) AS syms
                       FROM mg WHERE k < $BpeMergeIters),
                   unnest(generate_series(1, greatest(len(syms) - 1, 1))) u(i)
               )
             )
           ) GROUP BY s, freq, k
         )
       )"""
  }

  private val x65bSql = {
    val sep = "chr(31)"
    val sep2 = s"$sep || $sep"
    s"""WITH RECURSIVE $bpeMergeCtes,
       px AS (SELECT k, syms[i] AS pa, syms[i + 1] AS pb, freq
              FROM (SELECT k, freq,
                      string_split(s[2:len(s) - 1], $sep2) AS syms
                    FROM mg WHERE k < $BpeMergeIters),
                unnest(generate_series(1, len(syms) - 1)) u(i)),
       pc AS (SELECT k, pa, pb, CAST(sum(freq) AS BIGINT) AS cnt
              FROM px GROUP BY k, pa, pb)
       SELECT CAST(k + 1 AS BIGINT) AS it, pa AS lhs, pb AS rhs,
              pa || pb AS merged, cnt
       FROM (SELECT *, row_number()
               OVER (PARTITION BY k ORDER BY cnt DESC, pa, pb) AS rn FROM pc)
       WHERE rn = 1 ORDER BY it"""
  }

  // --------------------------------------------------------------- x65c
  /** x65c — APPLY the x65b-trained merge table as a tokenizer,
    * closing the train→deploy loop (x65 = one iteration's statistics,
    * x65b = the training loop, x65c = inference with what it learned):
    * per document, the character-symbol mass, the post-merge BPE token
    * count, and tokens-per-char — the compression the K merges actually
    * bought on this corpus. Tokenization state is the trainer's own
    * final state (the [[bpeTrain]] frame / the oracle's `mg` at k=K),
    * so the applied vocabulary can never drift from the reported
    * merges. Token counts are pure string arithmetic on the delimited
    * encoding — n_sym = (len(s) − len(strip(s)))/2, each symbol
    * contributing exactly two U+001F wrappers — integer-exact on both
    * engines. Words under 2 chars never trained: 1-char words are 1
    * token, empty words 0 (the x56 null/empty discipline).
    *
    * Scale shape: training as x65b (vocab-sized iterations); inference
    * is one token explode + a content-keyed equi-join of the corpus
    * word stream against the vocab-sized token-count table (broadcast
    * when it fits, hash otherwise — AQE's call) + a per-doc
    * partial+final agg. The same join class x56's oracle and x44 use;
    * no product anywhere. */
  def bpeApplyCounts(s: SparkSession, dir: String): DataFrame = {
    val (_, fin) = bpeTrain(s, Tables.t(s, dir, "documents"), BpeMergeIters)
    val wtok = fin.select(col("w"),
      ((length(col("s")) -
        length(call_function("replace", col("s"), lit(Sep), lit("")))) / 2)
        .cast("long").as("n_sym"))
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .join(wtok, Seq("w"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sym"),
          when(length(col("w")) >= 1, 1L).otherwise(0L)).as("n"),
        length(col("w")).cast("long").as("nc"))
      .groupBy("doc_id")
      .agg(sum("nc").as("n_char_sym"), sum("n").as("n_bpe_tok"))
      .withColumn("tok_per_char",
        round(col("n_bpe_tok").cast("double") / nullif(col("n_char_sym"), lit(0L)), 4))
      .orderBy("doc_id")
  }

  private val x65cSql = {
    val sep = "chr(31)"
    s"""WITH RECURSIVE $bpeMergeCtes,
       wtok AS (SELECT replace(s, $sep, '') AS w,
                  (len(s) - len(replace(s, $sep, ''))) // 2 AS n_sym
                FROM mg WHERE k = $BpeMergeIters),
       wd AS (SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS w
              FROM documents),
       j AS (SELECT doc_id,
               CAST(coalesce(n_sym,
                 CASE WHEN len(w) >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n,
               CAST(len(w) AS BIGINT) AS nc
             FROM wd LEFT JOIN wtok USING (w))
       SELECT doc_id, CAST(sum(nc) AS BIGINT) AS n_char_sym,
              CAST(sum(n) AS BIGINT) AS n_bpe_tok,
              round(CAST(sum(n) AS DOUBLE) / nullif(sum(nc), 0), 4) AS tok_per_char
       FROM j GROUP BY doc_id ORDER BY doc_id"""
  }

  // ---------------------------------------------------------------- x71
  /** x71 — per-language tokenizer compression & parity report (the
    * tokenizer-fairness table of Petrov et al. 2023, "Language Model
    * Tokenizers Introduce Unfairness Between Languages", restated over
    * non-parallel corpora): for each language, document/char/word/subword
    * mass plus three derived rates — subword tokens per whitespace word,
    * characters per subword token, and the TOKEN PREMIUM relative to
    * English (this language's tokens-per-char over English's; > 1 means
    * the tokenizer spends more budget per character of this language).
    * The premium is what a mixture designer needs before trusting
    * token-denominated budgets (x55/x56b) across languages: a lang with
    * premium 1.3 consumes 30% more of a token budget per char of content.
    *
    * Scale shape: one map-only projection (codegen'd subword_count +
    * length + word count — no explode, no per-word shuffle) into a
    * partial+final agg keyed on lang (vocabulary-sized output), then a
    * single global-agg scalar for the English baseline joined back by
    * literal cross join (1 row — Spark plans a BroadcastNestedLoopJoin
    * over a broadcast of one row). All integer sums are exact BIGINTs;
    * the three doubles are single divisions of those integers, so both
    * engines derive bit-identical rates. NULL guards: a lang of only
    * empty docs divides by nullif-0 words/tokens → NULL on both engines;
    * a corpus with no 'en' rows yields NULL premiums rather than an
    * empty report. */
  def tokenizerFairness(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val perDoc = Tables.t(s, dir, "documents").select(
      col("lang"),
      length(coalesce(col("text"), lit(""))).cast("long").as("chars"),
      size(filter(split(coalesce(col("text"), lit("")), " "),
        w => length(w) > 0)).cast("long").as("words"),
      subwordCount(col("text")).as("subtok"))
    val agg = perDoc.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum("chars").as("n_chars"),
      sum("words").as("n_words"),
      sum("subtok").as("n_subword_tok"))
    // English tokens-per-char baseline as a 1-row global agg (NULL when
    // absent or charless — max over an empty/NULL set, never a 0-row frame).
    val en = agg.select(max(when(col("lang") === "en",
      col("n_subword_tok").cast("double") / nullif(col("n_chars"), lit(0L))))
      .as("en_tok_per_char"))
    agg.crossJoin(broadcast(en))
      .select(col("lang"), col("n_docs"), col("n_chars"), col("n_words"),
        col("n_subword_tok"),
        round(col("n_subword_tok").cast("double")
          / nullif(col("n_words"), lit(0L)), 4).as("tok_per_word"),
        round(col("n_chars").cast("double")
          / nullif(col("n_subword_tok"), lit(0L)), 4).as("chars_per_tok"),
        round((col("n_subword_tok").cast("double")
          / nullif(col("n_chars"), lit(0L))) / col("en_tok_per_char"), 4)
          .as("premium_vs_en"))
      .orderBy("lang")
  }

  private val x71Sql =
    s"""WITH RECURSIVE $bpeCountCtes,
       wd AS (SELECT doc_id, count(*) FILTER (WHERE len(w) > 0) AS words
              FROM w GROUP BY doc_id),
       a AS (SELECT lang, count(*) AS n_docs,
               CAST(sum(len(coalesce(text, ''))) AS BIGINT) AS n_chars,
               CAST(sum(wd.words) AS BIGINT) AS n_words,
               CAST(sum(bpe.n_subword_tok) AS BIGINT) AS n_subword_tok
             FROM documents JOIN wd USING (doc_id) JOIN bpe USING (doc_id)
             GROUP BY lang),
       e AS (SELECT max(CASE WHEN lang = 'en'
               THEN CAST(n_subword_tok AS DOUBLE) / nullif(n_chars, 0) END)
               AS en_tok_per_char FROM a)
       SELECT lang, n_docs, n_chars, n_words, n_subword_tok,
              round(CAST(n_subword_tok AS DOUBLE) / nullif(n_words, 0), 4)
                AS tok_per_word,
              round(CAST(n_chars AS DOUBLE) / nullif(n_subword_tok, 0), 4)
                AS chars_per_tok,
              round((CAST(n_subword_tok AS DOUBLE) / nullif(n_chars, 0))
                / e.en_tok_per_char, 4) AS premium_vs_en
       FROM a, e ORDER BY lang"""

  // ---------------------------------------------------------------- x82
  /** Unigram-LM (SentencePiece) Viterbi segmentation — the OTHER major
    * subword algorithm (Kudo 2018, "Subword Regularization", §3.1),
    * closing the tokenizer family: x56 applies a BPE-style vocabulary
    * greedily, x65b trains BPE merges; x82 segments each word OPTIMALLY
    * against a unigram vocabulary by dynamic programming, the inference
    * rule SentencePiece's unigram model uses.
    *
    * Vocabulary + costs, pinned and corpus-derived IN-ENGINE on both
    * sides (no driver artifact): candidate pieces are all substrings of
    * length 1..[[UniMaxPiece]] of the corpus's DISTINCT words weighted
    * by word frequency (the x65 vocab-collapse — per-corpus cost is
    * independent of row count); the vocabulary keeps the
    * [[UniVocabTop]] most frequent multi-char pieces ((f DESC, piece)
    * total order) plus ALL single characters, Kudo's coverage rule that
    * makes segmentation total. Piece cost is the INTEGER information
    * content floor(log₂(T/f)) + 1 = length of the binary expansion of
    * T div f (T = vocabulary mass) — a disclosed integer stand-in for
    * the paper's float −log p that both engines compute exactly
    * (Spark `bin`, DuckDB `printf('%b', …)`).
    *
    * Objective, engine-exact: each piece contributes cost·64 + 1 to a
    * PACKED accumulator, so one integer min is lexicographic in
    * (total cost, piece count) — the same pack discipline as x42's
    * (hash, −pos) key. Output per distinct word: total_cost = v div 64,
    * n_pieces = v mod 64 (words are bounded at [[UniMaxWordLen]] chars,
    * loudly — raise_error rides the word column, the x42 discipline).
    * BpeSpec reconstructs the actual segmentation on fixtures and pins
    * hand-computed DPs.
    *
    * Engine side: one `aggregate` fold per distinct word over a
    * broadcast piece→cost map — map-only after the two vocabulary aggs,
    * no explode in the DP. Oracle side: the x56 lesson (DuckDB 1.0
    * miscompiles list_reduce folds under vectorized execution) rules
    * out the lambda fold, so the DP unrolls into [[UniMaxWordLen]]
    * join-based CTEs (dp_i = min over the ≤[[UniMaxPiece]] predecessor
    * positions; a piece absent from the vocabulary is an absent JOIN
    * row, which is min-plus-equivalent to the engine's +INF arm because
    * single-char coverage guarantees a finite path from every prefix).
    *
    * Scale: everything before the DP is two partial+final aggs over
    * vocabulary-sized frames; the DP is O(L·[[UniMaxPiece]]) integer
    * ops per DISTINCT word inside one projection; at 100 TB the whole
    * query's corpus-dependent cost is the word-count scan. */
  val UniMaxPiece = 4
  val UniVocabTop = 64
  val UniMaxWordLen = 20
  private val UniInf = 1L << 40

  def unigramViterbi(s: SparkSession, dir: String): DataFrame =
    unigramViterbiOf(Tables.t(s, dir, "documents"))

  /** (word, wfreq) with the loud length guard — the shared base of x82
    * and x95. The oracle unrolls the DP to [[UniMaxWordLen]] positions;
    * a longer word must fail LOUDLY, not silently diverge (raise_error
    * rides the word column so pruning cannot skip it). */
  private def uniWords(docsDf: DataFrame): DataFrame =
    docsDf
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wfreq"))
      .withColumn("word",
        when(length(col("word")) <= UniMaxWordLen, col("word"))
          .otherwise(raise_error(concat(
            lit(s"x82: word longer than $UniMaxWordLen chars: "), col("word")))))

  /** (piece, cost) — Kudo's coverage vocabulary (top-[[UniVocabTop]]
    * multi-char pieces + all single chars) with the integer
    * information-content cost; shared by x82's DP and x95's E-step. */
  private def uniVocabCosts(words: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pieces = words.select(col("word"), col("wfreq"),
        explode(expr(s"""flatten(transform(sequence(0, length(word) - 1),
          i -> transform(sequence(1, least($UniMaxPiece, length(word) - i)),
            k -> substring(word, i + 1, k))))""")).as("piece"))
      .groupBy("piece").agg(sum("wfreq").as("f"))
    val multi = pieces.filter(length(col("piece")) >= 2)
      .withColumn("r", row_number().over(Window.orderBy(col("f").desc, col("piece"))))
      .filter(col("r") <= UniVocabTop).drop("r")
    val vocab = multi.unionByName(pieces.filter(length(col("piece")) === 1))
    val tot = vocab.agg(sum("f").as("tf"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"), length(bin(expr("tf div f"))).cast("long").as("cost"))
  }

  /** The broadcast piece→cost map column frame (1 row). */
  private def uniVocabMap(vc: DataFrame): DataFrame =
    vc.agg(map_from_entries(collect_list(struct(col("piece"), col("cost"))))
      .as("vm"))

  /** The packed-DP accumulator over one word: dp[i] = min over the
    * ≤[[UniMaxPiece]] predecessors of dp[j] + cost·64 + 1 — the FULL
    * array (x82 reads only the last element; x95's backtrack needs all
    * of it). Requires `word` and the broadcast `vm` in scope. */
  private val uniDpExpr = s"""
    aggregate(sequence(1, length(word)), array(CAST(0 AS BIGINT)),
      (acc, i) -> concat(acc, array(array_min(transform(
        sequence(greatest(i - $UniMaxPiece, 0), i - 1),
        j -> element_at(acc, CAST(j + 1 AS INT)) + coalesce(
          try_element_at(vm, substring(word, CAST(j + 1 AS INT), CAST(i - j AS INT)))
            * CAST(64 AS BIGINT) + CAST(1 AS BIGINT),
          CAST($UniInf AS BIGINT)))))))"""

  /** Library form over any docs-shaped frame (spec fixtures). */
  private[graft] def unigramViterbiOf(docsDf: DataFrame): DataFrame = {
    val words = uniWords(docsDf)
    words.crossJoin(broadcast(uniVocabMap(uniVocabCosts(words))))
      .withColumn("v", expr(s"element_at($uniDpExpr, CAST(length(word) + 1 AS INT))"))
      .select(col("word"), col("wfreq"),
        expr("v div 64").as("total_cost"),
        (col("v") % 64).as("n_pieces"))
      .orderBy("word")
  }

  /** (word, wfreq, pieces) — the actual optimal segmentation recovered
    * by backtracking the packed DP: fold the cut positions down from
    * length(word) (each step the SMALLEST predecessor j whose
    * dp[j] + cost(piece) reproduces dp[pos] — both engines' tie rule),
    * then read pieces off consecutive cuts. private[graft] so BpeSpec
    * can pin lossless reassembly and packed-cost agreement with x82. */
  private[graft] def uniSegmentsOf(docsDf: DataFrame): DataFrame = {
    val words = uniWords(docsDf)
    words.crossJoin(broadcast(uniVocabMap(uniVocabCosts(words))))
      .withColumn("dp", expr(uniDpExpr))
      // Cut positions: [L, j1, j2, …, 0]; once 0 is reached further
      // iterations no-op (path length ≤ L, so L folds always suffice).
      .withColumn("cuts", expr(s"""
        aggregate(sequence(1, length(word)),
          array(CAST(length(word) AS BIGINT)),
          (acc, x) -> IF(element_at(acc, -1) <= 0, acc,
            concat(acc, array(element_at(filter(
              sequence(greatest(element_at(acc, -1) - $UniMaxPiece, CAST(0 AS BIGINT)),
                element_at(acc, -1) - 1),
              j -> element_at(dp, CAST(j + 1 AS INT)) + coalesce(
                try_element_at(vm, substring(word, CAST(j + 1 AS INT),
                  CAST(element_at(acc, -1) - j AS INT)))
                  * CAST(64 AS BIGINT) + CAST(1 AS BIGINT),
                CAST($UniInf AS BIGINT))
                = element_at(dp, CAST(element_at(acc, -1) + 1 AS INT))), 1)))))"""))
      // cuts descend from L to 0, so read pieces back-to-front and
      // reverse into reading order (the spec's reassembly pin caught
      // the reversed form).
      .withColumn("pieces", expr(s"""
        reverse(transform(sequence(1, CAST(size(cuts) - 1 AS BIGINT)),
          i -> substring(word, CAST(element_at(cuts, CAST(i + 1 AS INT)) + 1 AS INT),
            CAST(element_at(cuts, CAST(i AS INT)) - element_at(cuts, CAST(i + 1 AS INT)) AS INT))))"""))
      .select(col("word"), col("wfreq"), col("pieces"))
  }

  /** The shared oracle CTE prefix — corpus words, the coverage
    * vocabulary with integer costs, and the unrolled packed DP
    * dp0..dp[[UniMaxWordLen]] — single source for the x82 AND x95
    * oracles (the Spark side single-sources the same pieces through
    * [[uniWords]]/[[uniVocabCosts]]/[[uniDpExpr]]). */
  private val uniDpCtesSql = {
    val dpCtes = (1 to UniMaxWordLen).map { i =>
      val branches = (math.max(0, i - UniMaxPiece) until i).map { j =>
        s"""SELECT d.word, d.c + (cv.cost * 64 + 1) AS c
           FROM dp$j d JOIN vc cv ON cv.piece = substr(d.word, ${j + 1}, ${i - j})
           WHERE length(d.word) >= $i"""
      }.mkString("\n UNION ALL\n")
      // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and a
      // chain where dp_i references dp_{i-4}..dp_{i-1} inlines into a
      // 4^L-node plan — the first run hung before materialization.
      s"dp$i AS MATERIALIZED (SELECT word, min(c) AS c FROM (\n$branches\n) GROUP BY word)"
    }.mkString(",\n")
    s"""words AS MATERIALIZED (SELECT word, count(*) AS wfreq FROM
           (SELECT unnest(string_split(coalesce(text, ''), ' ')) AS word
            FROM documents)
         WHERE length(word) > 0 GROUP BY word),
       pieces AS (SELECT piece, sum(wfreq) AS f FROM
           (SELECT substr(word, CAST(i + 1 AS INT), CAST(k AS INT)) AS piece, wfreq
            FROM words, unnest(generate_series(0, length(word) - 1)) u(i),
                 unnest(generate_series(1, $UniMaxPiece)) v(k)
            WHERE i + k <= length(word))
         GROUP BY piece),
       multi AS (SELECT piece, f FROM
           (SELECT piece, f, row_number() OVER (ORDER BY f DESC, piece) AS r
            FROM pieces WHERE length(piece) >= 2)
         WHERE r <= $UniVocabTop),
       vocab AS (SELECT piece, f FROM multi
                 UNION ALL
                 SELECT piece, f FROM pieces WHERE length(piece) = 1),
       tot AS (SELECT CAST(sum(f) AS BIGINT) AS tf FROM vocab),
       vc AS MATERIALIZED (SELECT piece,
                CAST(length(printf('%b', CAST(tf // f AS BIGINT))) AS BIGINT) AS cost
              FROM vocab CROSS JOIN tot),
       wl AS (SELECT word, length(word) AS l FROM words),
       dp0 AS (SELECT word, CAST(0 AS BIGINT) AS c FROM words),
       $dpCtes"""
  }

  private val x82Sql = {
    val finals = (1 to UniMaxWordLen).map(i =>
      s"SELECT word, c FROM dp$i JOIN wl USING (word) WHERE l = $i")
      .mkString("\n UNION ALL\n")
    s"""WITH $uniDpCtesSql,
       fin AS ($finals)
       SELECT w.word, w.wfreq,
         CAST(f.c // 64 AS BIGINT) AS total_cost,
         CAST(f.c % 64 AS BIGINT) AS n_pieces
       FROM words w JOIN fin f USING (word) ORDER BY word"""
  }

  // ---------------------------------------------------------------- x95
  /** x95 — one hard-EM (Viterbi) re-estimation step of the unigram LM
    * trainer (Kudo 2018 §3.2's EM with the E-step's expectation
    * replaced by the Viterbi path — the standard hard-EM variant;
    * SentencePiece itself ships `--use_viterbi` style estimation):
    * segment every distinct word optimally under the CURRENT costs
    * (x82's DP, backtracked to actual pieces), count each piece's
    * occurrences across the corpus weighted by word frequency (the
    * E-step), and re-derive each surviving piece's integer
    * information-content cost from the new totals (the M-step; the
    * same floor(log₂(T′/f′)) + 1 discipline as the initial costs).
    * Vocabulary pieces on no Viterbi path drop out — Kudo's prune step
    * falls out of the counts for free. x65b completed BPE's training
    * loop; x95 completes the unigram side.
    *
    * Engine-exactness: the backtrack re-applies the DP's own min rule
    * and breaks ties by the SMALLEST predecessor position on both
    * sides (Spark: ascending `filter(...)[1]`; oracle: NOT EXISTS on a
    * smaller matching j), so the recovered path — not just its cost —
    * is identical in both engines; counts and new costs are then pure
    * integer arithmetic.
    *
    * Scale: everything corpus-sized is the word-count scan (the x65
    * vocab collapse); the DP + backtrack is O(L·[[UniMaxPiece]]) per
    * DISTINCT word inside one projection; the E-step agg and M-step
    * total are vocabulary-sized partial+final aggs. One EM iteration's
    * cost is independent of corpus row count beyond the word scan —
    * the property that makes in-corpus tokenizer training viable at
    * 100 TB. */
  def unigramViterbiEm(s: SparkSession, dir: String): DataFrame =
    unigramViterbiEmOf(Tables.t(s, dir, "documents"))

  private[graft] def unigramViterbiEmOf(docsDf: DataFrame): DataFrame = {
    val vc = uniVocabCosts(uniWords(docsDf))
    val cnt = uniSegmentsOf(docsDf)
      .select(col("wfreq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("wfreq").as("f"))
    val tot2 = cnt.agg(sum("f").as("tf2"))
    cnt.join(vc, Seq("piece"))
      .withColumnRenamed("cost", "old_cost")
      .crossJoin(broadcast(tot2))
      .select(col("piece"), col("f"), col("old_cost"),
        length(bin(expr("tf2 div f"))).cast("long").as("new_cost"))
      .orderBy("piece")
  }

  private val x95Sql = {
    val dpall = (0 to UniMaxWordLen).map(i =>
      s"SELECT word, CAST($i AS BIGINT) AS p, c FROM dp$i")
      .mkString("\n UNION ALL\n")
    s"""WITH RECURSIVE $uniDpCtesSql,
       dpall AS MATERIALIZED ($dpall),
       back AS (SELECT word, CAST(length(word) AS BIGINT) AS pos,
                  CAST(NULL AS VARCHAR) AS piece
                FROM words
                UNION ALL
                SELECT b.word, dj.p AS pos,
                  substr(b.word, CAST(dj.p + 1 AS INT), CAST(b.pos - dj.p AS INT)) AS piece
                FROM back b
                JOIN dpall di ON di.word = b.word AND di.p = b.pos
                JOIN dpall dj ON dj.word = b.word
                  AND dj.p >= b.pos - $UniMaxPiece AND dj.p < b.pos
                JOIN vc v ON v.piece =
                  substr(b.word, CAST(dj.p + 1 AS INT), CAST(b.pos - dj.p AS INT))
                WHERE b.pos > 0 AND dj.c + v.cost * 64 + 1 = di.c
                  AND NOT EXISTS (SELECT 1 FROM dpall dj2 JOIN vc v2
                        ON v2.piece = substr(b.word, CAST(dj2.p + 1 AS INT),
                             CAST(b.pos - dj2.p AS INT))
                      WHERE dj2.word = b.word AND dj2.p >= b.pos - $UniMaxPiece
                        AND dj2.p < dj.p AND dj2.c + v2.cost * 64 + 1 = di.c)),
       cnt AS (SELECT bk.piece, CAST(sum(w.wfreq) AS BIGINT) AS f
               FROM back bk JOIN words w USING (word)
               WHERE bk.piece IS NOT NULL GROUP BY bk.piece),
       tot2 AS (SELECT CAST(sum(f) AS BIGINT) AS tf2 FROM cnt)
       SELECT c.piece, c.f, v.cost AS old_cost,
         CAST(length(printf('%b', CAST(tf2 // f AS BIGINT))) AS BIGINT) AS new_cost
       FROM cnt c JOIN vc v ON c.piece = v.piece CROSS JOIN tot2
       ORDER BY c.piece"""
  }

  // ----------------------------------------------------------------
  val defs: Seq[QueryDef] = Seq(
    QueryDef("x82_unigram_viterbi", unigramViterbi, Some(x82Sql)),
    QueryDef("x95_unigram_viterbi_em", unigramViterbiEm, Some(x95Sql)),
    QueryDef("x56_bpe_token_count", tokenCounts, Some(x56Sql)),
    QueryDef("x56b_budget_apportion_bpe", budgetApportionBpe, Some(x56bSql)),
    QueryDef("x65_bpe_pair_counts", pairCounts, Some(x65Sql)),
    QueryDef("x65b_bpe_merges", bpeMerges, Some(x65bSql)),
    QueryDef("x65c_bpe_apply", bpeApplyCounts, Some(x65cSql)),
    QueryDef("x71_tokenizer_fairness", tokenizerFairness, Some(x71Sql)))
}
