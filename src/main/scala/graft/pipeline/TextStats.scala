package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines (SURVEY.md §2B B30 +
  * B37 and the language-ID / quality-score / token-count / fingerprint
  * extensions).
  *
  * All operators are pure column-expression pipelines (split/explode/HOFs)
  * — no UDFs, fully inside whole-stage codegen, shuffling only for the
  * final aggregations. `explode` output is a generator, so token streams
  * never materialize per-document arrays beyond the row batch.
  */
object TextStats {
  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  private val toks = split(col("text"), " ")

  // ---------------------------------------------------------------- B30
  /** Per-language corpus statistics. */
  def langStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("n_chars"), 2).as("avg_chars"),
        round(avg(size(toks).cast("double")), 2).as("avg_tokens"),
        max("n_chars").as("max_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")

  private val b30Sql =
    """SELECT lang, count(*) AS n_docs,
       round(avg(n_chars), 2) AS avg_chars,
       round(avg(CAST(len(string_split(text, ' ')) AS DOUBLE)), 2) AS avg_tokens,
       max(n_chars) AS max_chars,
       count(DISTINCT source) AS n_sources
       FROM documents GROUP BY lang ORDER BY lang"""

  /** Global term frequencies (tokenize → explode → count), top 25. */
  def termFreq(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("tok"))
      .limit(25)
      .orderBy(col("tf").desc, col("tok"))

  private val b30bSql =
    """SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       GROUP BY tok ORDER BY tf DESC, tok LIMIT 25"""

  // ---------------------------------------------------------------- B37
  /** Generator/UDTF analogue: 3-token shingles via sequence+transform then
    * explode (the built-in Generator), global shingle frequencies. */
  def shingleFreq(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("t")) - 3),
          i => concat_ws(" ", slice(col("t"), i + 1, lit(3))))).as("shingle"))
      .groupBy("shingle")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("nd"))
      .orderBy(col("n").desc, col("shingle"))
      .limit(20)
      .orderBy(col("n").desc, col("shingle"))

  private val b37Sql =
    """SELECT shingle, count(*) AS n, count(DISTINCT doc_id) AS nd
       FROM (SELECT doc_id,
               unnest(list_transform(range(len(t) - 2),
                 i -> array_to_string(t[(i+1):(i+3)], ' '))) AS shingle
             FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
             WHERE len(t) >= 3)
       GROUP BY shingle ORDER BY n DESC, shingle LIMIT 20"""

  // ---------------------------------------------------------------- x01
  private[graft] val Stopwords = Seq("the", "a", "of", "and", "to", "in")

  // nullif guards the empty-text denominator; DuckDB's IEEE 0.0/0
  // would yield NaN where Spark yields NULL — NULLIF aligns both on NULL
  private def stopRatio: Column =
    size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / size(toks)
  private def digitRatio: Column =
    length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
      nullif(length(col("text")), lit(0))

  /** The x01 quality score as ONE reusable Column over `text` — the
    * single definition x01 AND the streaming ingest gate (x24) evaluate,
    * so the two cannot drift. */
  private[graft] def qualityColumn: Column =
    round(lit(0.5) * stopRatio + lit(0.5) * (lit(1.0) - digitRatio), 4)

  /** The same formula as a DuckDB expression over a docs-shaped relation
    * — shared by x01Sql and the x24/x25 oracles. */
  private[graft] val qualitySqlExpr: String = {
    val stop = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""round(0.5 * (CAST(len(list_filter(string_split(text, ' '),
           t -> list_contains([$stop], t))) AS DOUBLE)
         / len(string_split(text, ' ')))
       + 0.5 * (1.0 - CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
         / NULLIF(length(text), 0)), 4)"""
  }

  // ---------------------------------------------------------------- x28
  /** Unigram log-probability score — the perplexity-proxy quality filter
    * (CCNet-style): train a unigram LM on the corpus itself (token
    * frequency / total tokens), then score each document by the mean
    * negative log-probability of its tokens (with repetition). Unusually
    * probable docs are boilerplate, unusually improbable ones are noise;
    * production pipelines threshold both tails.
    *
    * Scale: one explode feeds BOTH the per-(doc,tok) counts and the
    * corpus LM (two partial+final aggs on (doc_id,tok) then tok — the
    * same shuffle key chain as TF-IDF); the total-token count joins as a
    * broadcast 1-row scalar, and scoring is one equi-join on tok (the LM
    * side is vocabulary-sized, far smaller than the corpus) + one final
    * per-doc agg. Everything map-side combinable, no corpus product.
    * ln() parity Spark↔DuckDB holds at the emitted 4-decimal rounding
    * (same precedent as x13's tfidf). */
  /** The corpus UNIGRAM LM (tok → cf) — a per-snapshot index artifact
    * like the codebooks and label maps: a trained LM table is built once
    * per corpus and read by every scoring job (x28/x38/x77/x96/x119/
    * x123/x124 all consume it), so it is memoized/checkpointed under the
    * [[Ivf.memoModel]] discipline and timed as its own idx_* bench line.
    * Content-identical to deriving it from the per-doc counts (Σ per-doc
    * c = direct count). */
  private[pipeline] def unigramLmFrame(s: SparkSession, dir: String): DataFrame =
    Ivf.memoModel(docs(s, dir),
        "x28unilm") {
      Checkpoints.stable(docs(s, dir).select(explode(toks).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cf")))
    }

  /** The corpus BIGRAM LM ((w1, w2) → cb) — same artifact discipline;
    * the context marginal (ctx) and continuation counts derive from it
    * with vocabulary-sized aggs per consumer. */
  private[pipeline] def bigramLmFrame(s: SparkSession, dir: String): DataFrame =
    Ivf.memoModel(docs(s, dir),
        "x38biglm") {
      Checkpoints.stable(docs(s, dir)
        .select(toks.as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(transform(sequence(lit(0), size(col("t")) - 2),
          i => struct(element_at(col("t"), i + 1).as("w1"),
            element_at(col("t"), i + 2).as("w2")))).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("cb")))
    }

  // ---------------------------------------------------------------- x133
  /** x133 — incremental LM-TABLE maintenance: merge a batch's token
    * counts into a standing unigram LM table without re-reading the old
    * corpus — the x121/x129 append-only discipline applied to the THIRD
    * kind of standing artifact this engine builds (cluster indexes,
    * perceptual-hash tables, LM tables). Counts are additive, so the
    * merge is one union + re-aggregate of two VOCABULARY-sized frames
    * (the batch's counts and the old table) — the mergeable-aggregate-
    * state algebra every partial+final agg already relies on, here made
    * a first-class cross-snapshot operation. At 100 TB this is the
    * difference between touching ΔN documents per wave and re-counting
    * the corpus for every LM-scored gate (x28/x38/x77/x96/x119/x123/
    * x124 all read this table).
    *
    * The oracle is a FULL RECOUNT of the whole corpus, so the hash
    * match certifies merged ≡ rebuilt exactly — the same
    * incremental-equals-full contract as x121/x129, closing the
    * maintenance story for every frame-shaped artifact family. */
  def incrementalUnigramLm(newDocs: DataFrame, oldLm: DataFrame): DataFrame =
    newDocs.select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cf"))
      .unionByName(oldLm)
      .groupBy("tok").agg(sum("cf").as("cf"))

  /** The registered x133's STANDING table — the even-doc half's unigram
    * counts, memoized per snapshot like [[unigramLmFrame]] and timed as
    * its own `idx_x133_old_lm` bench line (production reads it from the
    * snapshot store; see IndexExport). */
  private[pipeline] def x133OldLm(s: SparkSession, dir: String): DataFrame =
    Ivf.memoModel(docs(s, dir),
        "x133oldlm") {
      Checkpoints.stable(docs(s, dir).filter(col("doc_id") % 2 === 0)
        .select(explode(toks).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cf")))
    }

  private def x133(s: SparkSession, dir: String): DataFrame =
    incrementalUnigramLm(
      docs(s, dir).filter(col("doc_id") % 2 === 1), x133OldLm(s, dir))
      .orderBy("tok")

  private val x133Sql =
    """SELECT tok, CAST(count(*) AS BIGINT) AS cf
       FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       GROUP BY tok ORDER BY tok"""

  def unigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val lm = unigramLmFrame(s, dir)
    val total = lm.agg(sum("cf").as("n_total"))
    tok.join(lm, "tok").crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tok"),
        round((-sum(col("c") * log(col("cf").cast("double") / col("n_total"))) /
          sum("c")), 4).as("avg_neg_logp"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- x77
  /** x77 — CCNet's perplexity binning (Wenzek et al. 2020 §4.3): per
    * language, split the corpus into head/middle/tail TERTILES of the
    * x28 perplexity proxy — head (lowest avg −log p) is the cleanest
    * band, tail the noisiest; production keeps head+middle for most
    * languages. The cut is RANK-deterministic: rows rank per language
    * on (score, doc_id) — the 4-decimal score makes ties exact in both
    * engines and the id breaks them totally — and the tertile test is
    * pure integer (rn·3 vs n, no float thresholds anywhere). Artifact
    * is the per-(lang, bin) manifest with the x22 id-checksum
    * membership pin plus the realized score bounds.
    *
    * Scale: x28's chain + one doc_id equi-join to recover lang + one
    * lang-keyed rank window (the x32 shape — per-language partitions,
    * no global window) + a bin-sized agg. */
  def perplexityBins(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = unigramLogprob(s, dir)
      .join(docs(s, dir).select("doc_id", "lang"), "doc_id")
    val w = Window.partitionBy("lang")
      .orderBy(col("avg_neg_logp"), col("doc_id"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .withColumn("bin",
        when(col("rn") * 3 <= col("n"), "head")
          .when(col("rn") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_checksum"),
        min("avg_neg_logp").as("score_min"), max("avg_neg_logp").as("score_max"))
      .orderBy("lang", "bin")
  }

  /** x28's unigram-LM scoring chain (tok/lm/tot + the per-doc rounded
    * mean −ln p), single-sourced: x28's oracle reports it directly and
    * x77's tertile cut consumes it, so the binning can never drift from
    * the score it claims to bin. */
  private val unigramScoreCtes =
    """tok AS (SELECT doc_id, tok, count(*) AS c
               FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                     FROM documents)
               GROUP BY doc_id, tok),
       lm AS (SELECT tok, sum(c) AS cf FROM tok GROUP BY tok),
       tot AS (SELECT sum(cf) AS n_total FROM lm),
       sc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
                round(-sum(c * ln(CAST(cf AS DOUBLE) / (SELECT n_total FROM tot)))
                      / sum(c), 4) AS avg_neg_logp
              FROM tok JOIN lm USING (tok) GROUP BY doc_id)"""

  private val x77Sql =
    s"""WITH $unigramScoreCtes,
       sl AS (SELECT sc.doc_id, d.lang, sc.avg_neg_logp,
                CAST(row_number() OVER (PARTITION BY d.lang
                  ORDER BY sc.avg_neg_logp, sc.doc_id) AS BIGINT) AS rn,
                count(*) OVER (PARTITION BY d.lang) AS n
              FROM sc JOIN documents d USING (doc_id)),
       binned AS (SELECT lang, doc_id, avg_neg_logp,
                    CASE WHEN rn * 3 <= n THEN 'head'
                         WHEN rn * 3 <= n * 2 THEN 'middle'
                         ELSE 'tail' END AS bin
                  FROM sl)
       SELECT lang, bin, count(*) AS n_docs,
              CAST(sum(doc_id) AS BIGINT) AS id_checksum,
              min(avg_neg_logp) AS score_min, max(avg_neg_logp) AS score_max
       FROM binned GROUP BY lang, bin ORDER BY lang, bin"""

  private val x28Sql =
    s"""WITH $unigramScoreCtes
       SELECT doc_id, n_tok, avg_neg_logp FROM sc ORDER BY doc_id"""

  // ---------------------------------------------------------------- x38
  /** Interpolated bigram log-probability score — x28's perplexity proxy
    * one order up (the CCNet/KenLM shape at the order this engine can
    * train in-corpus): score each doc by the mean negative log of
    * λ·P(w_i|w_{i−1}) + (1−λ)·P(w_i), bigram MLE interpolated with the
    * unigram so the score stays finite for any bigram the corpus has
    * seen only in other contexts (self-trained MLE alone can't produce
    * an unseen bigram, but the interpolation is what makes the operator
    * correct when the LM table comes from a DIFFERENT corpus — the
    * production deployment). Fluent boilerplate scores low, shuffled or
    * noisy text scores high — a sharper signal than x28 because word
    * ORDER now matters.
    *
    * Scale shape (x28's chain plus one join): one bigram explode feeds
    * the per-(doc,w1,w2) counts; the bigram LM and its left-context
    * marginal are two partial+final aggs on content keys ((w1,w2) then
    * w1); the unigram LM reuses x28's shape; scoring is equi-joins
    * against vocabulary-sized sides + one per-doc agg. No corpus
    * product; everything map-side combinable. Docs with < 2 tokens have
    * no bigrams and score NULL (corpus row count preserved via left
    * join — the planted spec pins this). */
  val BigramLambda = 0.7
  // Explicit complement: the expression 1 - 0.7 is 0.30000000000000004 in
  // IEEE doubles, and while both engines would agree on that value, a
  // literal 0.3 in only one of them would NOT be the same number. One
  // constant, used verbatim on both sides.
  val BigramLambdaC = 0.3
  // The two constants are an interpolation: editing one without the other
  // silently breaks the λ·P2 + (1−λ)·P1 semantics while the mirrored
  // oracle still matches. Fail object init instead. (Tolerance, not ==:
  // 0.7 + 0.3 is 0.9999999999999999 in IEEE doubles.)
  require(math.abs(BigramLambda + BigramLambdaC - 1.0) < 1e-12,
    s"BigramLambda ($BigramLambda) + BigramLambdaC ($BigramLambdaC) must sum to 1.0")

  def bigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
    val big = base
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(transform(sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("w1"),
          element_at(col("t"), i + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("c"))
    val bigLm = bigramLmFrame(s, dir)
    val ctx = bigLm.groupBy("w1").agg(sum("cb").as("cw1"))
    val uni = unigramLmFrame(s, dir)
    val total = uni.agg(sum("cf").as("n_total"))
    val scored = big
      .join(bigLm, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("cf")), Seq("w2"))
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"),
        round(-sum(col("c") * log(
          lit(BigramLambda) * (col("cb").cast("double") / col("cw1")) +
            lit(BigramLambdaC) * (col("cf").cast("double") / col("n_total")))) /
          sum("c"), 4).as("avg_neg_logp2"))
    base.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_neg_logp2"))
      .orderBy("doc_id")
  }

  /** x38's interpolated-bigram scoring chain ending in `sc2(doc_id,
    * n_bigrams, avg_neg_logp2)`, single-sourced for x38's oracle AND
    * x119's context-gain oracle (aliases are disjoint from
    * [[unigramScoreCtes]] — tot2/sc2 vs tot/sc — so the two chains
    * compose in one WITH). */
  private val bigramScoreCtes =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       big AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2, count(*) AS c
               FROM t, unnest(generate_series(1, len(t) - 1)) u(i)
               WHERE len(t) >= 2 GROUP BY doc_id, t[i], t[i+1]),
       biglm AS (SELECT w1, w2, sum(c) AS cb FROM big GROUP BY w1, w2),
       ctx AS (SELECT w1, sum(cb) AS cw1 FROM biglm GROUP BY w1),
       uni AS (SELECT tok, count(*) AS cf
               FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
               GROUP BY tok),
       tot2 AS (SELECT sum(cf) AS n_total FROM uni),
       sc2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                round(-sum(c * ln($BigramLambda * (CAST(cb AS DOUBLE) / cw1)
                    + $BigramLambdaC * (CAST(cf AS DOUBLE) / (SELECT n_total FROM tot2))))
                  / sum(c), 4) AS avg_neg_logp2
              FROM big JOIN biglm USING (w1, w2) JOIN ctx USING (w1)
                   JOIN uni ON big.w2 = uni.tok
              GROUP BY doc_id)"""

  private val x38Sql =
    s"""WITH $bigramScoreCtes
       SELECT d.doc_id, coalesce(sc2.n_bigrams, 0) AS n_bigrams, sc2.avg_neg_logp2
       FROM documents d LEFT JOIN sc2 USING (doc_id) ORDER BY doc_id"""

  // ---------------------------------------------------------------- x96
  /** Interpolated Kneser–Ney bigram scoring — the smoothing the
    * production LM filters actually run (Kneser & Ney 1995; the
    * interpolated form of Chen & Goodman 1999 §3; KenLM's default,
    * which is what CCNet's perplexity filter loads): x38's interpolation
    * weights the unigram by RAW frequency, so "Francisco" — frequent but
    * only ever after "San" — gets a large backoff share it never earns;
    * KN replaces the unigram with the CONTINUATION probability (in how
    * many distinct left contexts does this word appear / total distinct
    * bigram types), the novel-continuation estimate:
    *
    *   P_KN(w₂|w₁) = (c(w₁w₂) − D)/c(w₁)
    *               + (D·N₊(w₁·)/c(w₁)) · (N₊(·w₂)/B)
    *
    * with absolute discount D = [[KnDiscount]]. Scored bigrams come
    * from the training corpus itself, so c(w₁w₂) ≥ 1 > D and the
    * max(·,0) clamp is vacuous (the deployment against a foreign LM
    * table would restore it). D = 0.75 = 3/4 is exact in binary, every
    * count is an exact integer, and the float chain is parenthesized
    * identically on both sides (the x38 discipline), so ln() parity at
    * the emitted 4-decimal rounding carries over from x28/x38.
    *
    * Scale shape: exactly x38's — the bigram explode feeds per-(doc,w₁,
    * w₂) counts; the LM, its left marginal + follower count (one GROUP
    * BY w₁), the continuation count (one GROUP BY w₂), and the type
    * total are all vocabulary-sized partial+final aggs; scoring is
    * equi-joins + one per-doc agg; docs with < 2 tokens keep their row
    * (n_bigrams 0, NULL score) via the left join. */
  val KnDiscount = 0.75

  def knBigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
    val big = base
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(transform(sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("w1"),
          element_at(col("t"), i + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("c"))
    val bigLm = bigramLmFrame(s, dir)
    val ctx = bigLm.groupBy("w1")
      .agg(sum("cb").as("cw1"), count(lit(1)).as("nf"))
    val cont = bigLm.groupBy("w2").agg(count(lit(1)).as("np"))
    val btot = bigLm.agg(count(lit(1)).as("bt"))
    val scored = big
      .join(bigLm, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(broadcast(btot))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"),
        round(-sum(col("c") * log(
          ((col("cb").cast("double") - lit(KnDiscount)) / col("cw1")) +
            (((lit(KnDiscount) * col("nf")) / col("cw1")) *
              (col("np").cast("double") / col("bt"))))) /
          sum("c"), 4).as("avg_neg_logp_kn"))
    base.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_neg_logp_kn"))
      .orderBy("doc_id")
  }

  private val x96Sql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       big AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2, count(*) AS c
               FROM t, unnest(generate_series(1, len(t) - 1)) u(i)
               WHERE len(t) >= 2 GROUP BY doc_id, t[i], t[i+1]),
       biglm AS (SELECT w1, w2, sum(c) AS cb FROM big GROUP BY w1, w2),
       ctx AS (SELECT w1, sum(cb) AS cw1, count(*) AS nf FROM biglm GROUP BY w1),
       cont AS (SELECT w2, count(*) AS np FROM biglm GROUP BY w2),
       btot AS (SELECT count(*) AS bt FROM biglm),
       sc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                round(-sum(c * ln(
                    ((CAST(cb AS DOUBLE) - $KnDiscount) / cw1)
                    + ((($KnDiscount * nf) / cw1)
                       * (CAST(np AS DOUBLE) / (SELECT bt FROM btot)))))
                  / sum(c), 4) AS avg_neg_logp_kn
              FROM big JOIN biglm USING (w1, w2) JOIN ctx USING (w1)
                   JOIN cont USING (w2)
              GROUP BY doc_id)
       SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams, sc.avg_neg_logp_kn
       FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY doc_id"""

  /** Quality scoring: token/char ratios of the kind used to filter LLM
    * training corpora (length, stopword density, digit density). */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val nTokens = size(toks)
    docs(s, dir).select(
      col("doc_id"),
      nTokens.as("n_tokens"),
      round((length(col("text")) - (nTokens - 1)).cast("double") / nTokens, 4).as("avg_tok_len"),
      round(stopRatio, 4).as("stop_ratio"),
      round(digitRatio, 4).as("digit_ratio"),
      qualityColumn.as("quality"))
      .orderBy("doc_id")
  }

  private val x01Sql = {
    val stop = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS avg_tok_len,
       round(CAST(len(list_filter(string_split(text, ' '),
               t -> list_contains([$stop], t))) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS stop_ratio,
       round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / NULLIF(length(text), 0), 4) AS digit_ratio,
       $qualitySqlExpr AS quality
       FROM documents ORDER BY doc_id"""
  }

  // ---------------------------------------------------------------- x32
  /** Per-language quality-quantile filter (Gopher/FineWeb-style): keep
    * each language's top half by the x01 quality score. Absolute score
    * thresholds don't transfer across languages — a stopword-ratio floor
    * tuned on English rejects most of everything else — so production
    * filters threshold per stratum.
    *
    * The cut is PURE INTEGER: row_number (ordered by the 4-decimal
    * quality both engines compute identically, doc_id tiebreak — a total
    * order) against 2·rn ≤ count, so there is no float edge at the
    * median and no percent_rank division. One hash exchange on lang for
    * the window.
    *
    * Scale note: a per-stratum window has the same whale-stratum shape as
    * x22; the x22b remedy (sub-stratum pre-prune, lossless for rank
    * cuts bounded by a per-substratum budget) applies here too when one
    * language is the corpus. For a quantile (fraction, not fixed budget)
    * the 100 TB form is two-phase: approx per-lang threshold from a
    * sample/sketch, broadcast, map-only filter — the exact window form
    * is the oracle artifact. */
  def qualityQuantileFilter(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs(s, dir)
      .select(col("doc_id"), col("lang"), qualityColumn.as("quality"))
    val w = Window.partitionBy("lang")
      .orderBy(col("quality").desc_nulls_last, col("doc_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
      .filter(col("rn") * 2 <= col("cnt"))
      .select(col("doc_id"), col("lang"), col("quality"))
      .orderBy("doc_id")
  }

  private val x32Sql =
    s"""WITH scored AS (SELECT doc_id, lang, $qualitySqlExpr AS quality
                        FROM documents),
       r AS (SELECT doc_id, lang, quality,
               row_number() OVER (PARTITION BY lang
                 ORDER BY quality DESC NULLS LAST, doc_id) AS rn,
               count(*) OVER (PARTITION BY lang) AS cnt
             FROM scored)
       SELECT doc_id, lang, quality FROM r
       WHERE rn * 2 <= cnt ORDER BY doc_id"""

  // ---------------------------------------------------------------- x02
  /** The language profiles x02 (document grain) and x100 (line grain)
    * both vote with — single-sourced so the two grains cannot drift. */
  private val LangLexEn = Seq("the", "a", "of")
  private val LangLexData = Seq("data", "row", "table")
  private val LangLexQuery = Seq("query", "scan", "join")

  /** Language-ID heuristic: stopword-set voting (n-gram-profile style, one
    * profile per candidate language, argmax with fixed tie order). */
  def langIdHeuristic(s: SparkSession, dir: String): DataFrame = {
    def score(words: Seq[String]) = size(filter(toks, t => t.isin(words: _*)))
    val en = score(LangLexEn)
    val dataish = score(LangLexData)
    val queryish = score(LangLexQuery)
    docs(s, dir).select(
      col("doc_id"), col("lang"),
      en.as("s_en"), dataish.as("s_data"), queryish.as("s_query"),
      when(en >= dataish && en >= queryish, "en")
        .when(dataish >= queryish, "datalang")
        .otherwise("querylang").as("lang_pred"))
      .orderBy("doc_id")
  }

  private val x02Sql =
    """SELECT doc_id, lang,
       CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['the', 'a', 'of'], t))) AS INT) AS s_en,
       CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['data', 'row', 'table'], t))) AS INT) AS s_data,
       CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['query', 'scan', 'join'], t))) AS INT) AS s_query,
       CASE WHEN len(list_filter(string_split(text, ' '), t -> list_contains(['the', 'a', 'of'], t)))
                 >= len(list_filter(string_split(text, ' '), t -> list_contains(['data', 'row', 'table'], t)))
             AND len(list_filter(string_split(text, ' '), t -> list_contains(['the', 'a', 'of'], t)))
                 >= len(list_filter(string_split(text, ' '), t -> list_contains(['query', 'scan', 'join'], t)))
            THEN 'en'
            WHEN len(list_filter(string_split(text, ' '), t -> list_contains(['data', 'row', 'table'], t)))
                 >= len(list_filter(string_split(text, ' '), t -> list_contains(['query', 'scan', 'join'], t)))
            THEN 'datalang'
            ELSE 'querylang' END AS lang_pred
       FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------------------- x100
  /** x100 — LINE-level language identification with a per-document
    * majority vote: the granularity the OSCAR/CCNet pipelines actually
    * classify at (Ortiz Suárez et al. 2019; Wenzek et al. 2020 run
    * fastText per LINE/paragraph, then keep or re-label the document
    * from the line votes), where x02 classifies whole documents. The
    * payoff is mixed-language pages: a document whose header/footer
    * speak one language and body another gets a purity score — the
    * signal CCNet thresholds to drop boilerplate-wrapped pages.
    *
    * Runs over the derived multi-line corpus ([[Curation.multiLineDocs]]
    * — the x30b/x58d convention, single-sourced with its oracle CTE)
    * and votes with x02's OWN lexica and tie rule (single-sourced
    * constants), so line grain and document grain cannot drift. Output
    * per doc: line count, distinct predictions seen, the majority
    * language (ties break on lang asc — deterministic), its votes, and
    * purity_bp = votes·10⁴ div n_lines.
    *
    * Scale: one bounded explode (lines per doc), ONE partial+final agg
    * on (doc_id, pred), and per-doc windows over ≤ |languages| vote
    * rows — the x32 per-key shape, never a global window. */
  def lineLangVote(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lineToks = split(col("line"), " ")
    def sc(words: Seq[String]) = size(filter(lineToks, t => t.isin(words: _*)))
    val en = sc(LangLexEn); val da = sc(LangLexData); val qu = sc(LangLexQuery)
    val votes = Curation.multiLineDocs(docs(s, dir))
      .select(col("doc_id"), explode(split(col("text"), "\n")).as("line"))
      .select(col("doc_id"),
        when(en >= da && en >= qu, "en")
          .when(da >= qu, "datalang")
          .otherwise("querylang").as("pred"))
      .groupBy("doc_id", "pred").agg(count(lit(1)).as("votes"))
    val byDoc = Window.partitionBy("doc_id")
    votes
      .withColumn("n_lines", sum("votes").over(byDoc))
      .withColumn("n_preds", count(lit(1)).over(byDoc))
      .withColumn("rn", row_number().over(
        byDoc.orderBy(col("votes").desc, col("pred"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n_lines"), col("n_preds"),
        col("pred").as("lang_major"), col("votes"),
        expr("(votes * 10000) div n_lines").as("purity_bp"))
      .orderBy("doc_id")
  }

  private lazy val x100Sql = {
    def lex(words: Seq[String]) = words.map(w => s"'$w'").mkString(", ")
    s"""WITH ${Curation.mdCte},
       ln AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
              FROM md),
       pr AS (SELECT doc_id,
                CASE WHEN e >= d AND e >= q THEN 'en'
                     WHEN d >= q THEN 'datalang'
                     ELSE 'querylang' END AS pred
              FROM (SELECT doc_id,
                      len(list_filter(string_split(line, ' '),
                        t -> list_contains([${lex(LangLexEn)}], t))) AS e,
                      len(list_filter(string_split(line, ' '),
                        t -> list_contains([${lex(LangLexData)}], t))) AS d,
                      len(list_filter(string_split(line, ' '),
                        t -> list_contains([${lex(LangLexQuery)}], t))) AS q
                    FROM ln)),
       v AS (SELECT doc_id, pred, CAST(count(*) AS BIGINT) AS votes
             FROM pr GROUP BY doc_id, pred),
       wv AS (SELECT *,
                CAST(sum(votes) OVER (PARTITION BY doc_id) AS BIGINT)
                  AS n_lines,
                CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT)
                  AS n_preds,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY votes DESC, pred) AS rn
              FROM v)
       SELECT doc_id, n_lines, n_preds, pred AS lang_major, votes,
         CAST((votes * 10000) // n_lines AS BIGINT) AS purity_bp
       FROM wv WHERE rn = 1 ORDER BY doc_id"""
  }

  // ---------------------------------------------------------------- x03
  /** Content fingerprint: order-insensitive token-set digest + raw digest.
    * (A rolling-hash variant lives in graft.functions as a custom
    * expression; this form is oracle-expressible.) */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(toks)))).as("token_fp"),
      sha2(col("text"), 256).as("raw_fp"))
      .orderBy("doc_id")

  private val x03Sql =
    """SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS token_fp,
       sha256(text) AS raw_fp
       FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------------------- x04
  /** Token counting: whitespace tokens vs a BPE-ish regex tokenizer
    * (letter runs / digit runs as separate tokens). */
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(toks).as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("re_tokens"),
      length(regexp_replace(col("text"), " ", "")).as("chars_nospace"))
      .orderBy("doc_id")

  private val x04Sql =
    """SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INT) AS re_tokens,
       CAST(length(replace(text, ' ', '')) AS INT) AS chars_nospace
       FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------------------- x03b
  /** Fingerprinting via the engine's native Catalyst expressions
    * ([[graft.functions.RollingHash]] / [[graft.functions.SanitizeName]]):
    * codegen'd per-row hashing, registered on the session at query build. */
  def nativeFingerprint(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    docs(s, dir).select(
      col("doc_id"),
      expr("rolling_hash(text)").as("roll_fp"),
      expr("sanitize_name(concat(source, ' ', lang))").as("src_tag"))
      .orderBy("doc_id")
  }

  private val x03bSql =
    """SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (a, c) -> (a * 31 + c) % 1000000007) AS roll_fp,
       regexp_replace(lower(trim(source || ' ' || lang)), '[^a-z0-9_]+', '_', 'g') AS src_tag
       FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------------------- x42
  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD'03; the MOSS
    * scheme): from each window of `WinnowW` consecutive shingle hashes,
    * select the minimum (rightmost on ties); the distinct selected
    * (position, hash) pairs are the document's fingerprint set. The
    * guarantee that makes this the copy-detection primitive: any shared
    * run of ≥ WinnowW + shingleLen − 1 tokens between two documents
    * yields at least one SHARED fingerprint hash, while only ~2/(w+1) of
    * all shingles are kept — a fixed-rate sketch with a detection
    * guarantee, unlike uniform sampling.
    *
    * Engine-exact selection: the (min hash, rightmost position) choice is
    * ONE integer min over `hash·2^21 + (2^21−1−pos)` — lexicographic in
    * (hash, −pos), so both engines pick the identical shingle with no
    * float or tie ambiguity (positions must fit 21 bits = 2M tokens/doc;
    * token_hash < 2^30 keeps the key under 2^51). Docs with fewer than
    * WinnowW shingles emit nothing (no full window exists).
    *
    * Scale shape: one shingle explode → map-side hash/key columns → TWO
    * window functions sharing ONE doc_id-keyed exchange (frame min and
    * per-doc count) → distinct agg on (doc, selected) — partial+final.
    * No join, no corpus product; same partition-local discipline as
    * x40's chunking. */
  val WinnowW = 4
  private val PosBits = 21

  def winnowFingerprints(s: SparkSession, dir: String,
      shingleLen: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import org.apache.spark.sql.expressions.Window
    val sh = docs(s, dir)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= shingleLen)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("t")) - shingleLen),
          i => concat_ws(" ", slice(col("t"), i + 1, lit(shingleLen)))))
        .as(Seq("pos", "sh")))
      // Positions must fit the PosBits field or the packed key silently
      // corrupts the min-selection; a doc beyond ~2M shingles fails
      // LOUDLY (raise_error rides the key expression itself, so column
      // pruning can never skip the check).
      .withColumn("key",
        when(col("pos") < (1L << PosBits),
          call_function("token_hash", col("sh")) * (1L << PosBits) +
            (lit((1L << PosBits) - 1) - col("pos")))
          .otherwise(raise_error(concat(
            lit(s"winnowing: doc_id="), col("doc_id"),
            lit(s" has a shingle position >= 2^$PosBits; " +
              "raise PosBits or pre-split the document")))))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    sh
      .withColumn("mk", min("key").over(byDoc.rowsBetween(0, WinnowW - 1)))
      .withColumn("m", count(lit(1)).over(Window.partitionBy("doc_id")))
      .filter(col("pos") <= col("m") - WinnowW)
      // shiftright / %: pure integer decode (Spark's `/` on longs is
      // DOUBLE division; exact here but shiftright says what it means).
      .select(col("doc_id"),
        (lit((1L << PosBits) - 1) - col("mk") % lit(1L << PosBits)).as("fp_pos"),
        shiftright(col("mk"), PosBits).as("fp_hash"))
      .distinct()
      .orderBy("doc_id", "fp_pos")
  }

  /** Shared CTE chain ending in `win(doc_id, pos, mk, m)` — single source
    * for the x42 and x42b/x42c oracles (the fingerprint join must run
    * over exactly the fingerprints x42 reports).
    *
    * Parity caveat (same convention as x03b/x40): the Spark side hashes
    * UTF-16 code units (`charAt`) while this SQL folds `ascii(c)` per
    * character — the two agree on ASCII text only (the synthetic corpus
    * is ASCII; ExpressionsSpec pins the non-ASCII divergence). A
    * multilingual deployment would hash bytes on both sides. */
  private val Pb = 1L << PosBits
  private val winnowCtes =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT doc_id, i AS pos, array_to_string(t[(i+1):(i+3)], ' ') AS sh
              FROM t, unnest(generate_series(0, len(t) - 3)) u(i)
              WHERE len(t) >= 3),
       keyed AS (SELECT doc_id, pos,
                   ((list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(sh, ''), c -> CAST(ascii(c) AS BIGINT))),
                       (a, c) -> (a * 31 + c) % ${HashConstants.HashPrime})
                     * ${HashConstants.Knuth}) % ${HashConstants.HashPrime}) * $Pb
                     + ($Pb - 1 - pos) AS key
                 FROM sh),
       win AS (SELECT doc_id, pos,
                 min(key) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS mk,
                 count(*) OVER (PARTITION BY doc_id) AS m
               FROM keyed)"""

  private val x42Sql =
    s"""WITH $winnowCtes
       SELECT DISTINCT doc_id, $Pb - 1 - (mk % $Pb) AS fp_pos, mk // $Pb AS fp_hash
       FROM win WHERE pos <= m - $WinnowW ORDER BY doc_id, fp_pos"""

  // --------------------------------------------------------------- x42b
  /** Fingerprint-join copy detection — what winnowing fingerprints are
    * FOR (the MOSS workflow): candidate copy pairs are documents sharing
    * at least `minShared` distinct fingerprint hashes. Because each
    * fingerprint survives only ~2/(w+1) of shingles, this posting join
    * runs over a fixed-rate sketch of the corpus, not the full shingle
    * stream — the cheap first pass before an exact x29-style containment
    * verify on the few candidates.
    *
    * Skew discipline is B28's: fingerprint hashes hot across more than
    * `maxDf` docs are excluded from pair generation (a hash shared by
    * half the corpus generates O(n²) pairs and identifies nothing), so
    * the self-join only probes rare-fingerprint posting lists. */
  /** x42b/x42c candidate-generation constants — single-sourced into the
    * Scala defaults AND the interpolated oracle SQL (the DefaultSourceCap
    * convention). */
  val FpMinShared = 3
  val FpMaxDf = 64

  def fingerprintPairs(s: SparkSession, dir: String,
      minShared: Int = FpMinShared, maxDf: Int = FpMaxDf): DataFrame = {
    val fps = winnowFingerprints(s, dir)
      .select(col("doc_id"), col("fp_hash")).distinct()
    val dfc = fps.groupBy("fp_hash").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fp_hash")
    val post = fps.join(dfc, "fp_hash")
    post.as("a").join(post.as("b"),
        col("a.fp_hash") === col("b.fp_hash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("da", "db")
  }

  /** Shared CTE chain extending [[winnowCtes]] to `cpairs(da, db,
    * n_shared)` — the x42b candidate pairs; single source for the x42b
    * AND x42c oracles (the exact verify must run over exactly the
    * candidates the fingerprint join reports). */
  private val fingerprintPairCtes =
    s"""$winnowCtes,
       fps AS (SELECT DISTINCT doc_id, mk // $Pb AS fp_hash
               FROM win WHERE pos <= m - $WinnowW),
       dfc AS (SELECT fp_hash FROM
                 (SELECT fp_hash, count(*) AS df FROM fps GROUP BY fp_hash)
               WHERE df <= $FpMaxDf),
       post AS (SELECT f.doc_id, f.fp_hash FROM fps f JOIN dfc USING (fp_hash)),
       cpairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_shared
                  FROM post a JOIN post b
                    ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
                  GROUP BY a.doc_id, b.doc_id HAVING count(*) >= $FpMinShared)"""

  private val x42bSql =
    s"WITH $fingerprintPairCtes SELECT da, db, n_shared FROM cpairs ORDER BY da, db"

  // --------------------------------------------------------------- x42c
  /** Confirmed copy-pair manifest — the exact-verify pass that completes
    * the MOSS workflow (fingerprint join, THEN verify): every x42b
    * candidate is re-scored on the two docs' FULL distinct token sets
    * with the native merge-pass kernels ([[graft.functions.SetOverlap]] /
    * [[graft.functions.SetJaccard]] shape — B28's verify discipline), and
    * only pairs whose overlap coefficient |A∩B| / min(|A|,|B|) clears
    * `minContainment` survive. The coefficient is the right score for
    * COPY detection (x29's argument): a passage lifted from a long doc
    * into a short one has tiny Jaccard but containment ≈ the copied
    * fraction of the smaller doc. Candidates with n_shared ≥ 3 whose
    * shared mass is only scattered common phrases are REJECTED here —
    * the planted partial-copy fixture in PipelineSpec pins that path.
    *
    * Scale shape: the sketch-rate posting join (x42b) prunes the corpus
    * to candidate pairs first, and the token-set frame is built ONLY for
    * candidate endpoints (a left-semi join against `union(da, db)`, a
    * pure restriction — every cpairs endpoint is in `sets`, so the
    * result is unchanged and the oracle needs no edit). Without the
    * restriction the per-doc distinct-token ARRAYS of the whole corpus
    * rode through both doc_id-keyed join exchanges even though only
    * candidate endpoints are ever probed — at 100 TB candidates ≪
    * corpus, so that array mass dominated the query (the r11 plan
    * audit's finding). The candidate frame is eagerly materialized once
    * ([[Checkpoints.stable]]) because it is consumed twice (endpoint
    * list + verify join); re-running the sketch join for the endpoint
    * list would spend what the restriction saves. The exact verify is
    * then two hash joins on doc_id + one codegen'd merge pass per pair,
    * all over candidate-only rows. Same two-tier economics as B28/x20:
    * cheap sketch recall, exact precision. Threshold applies to the
    * 4-decimal rounding (mirror-oracle parity, b28's convention). */
  val CopyMinContainment = 0.5

  def confirmedCopyPairs(s: SparkSession, dir: String,
      minShared: Int = FpMinShared, maxDf: Int = FpMaxDf,
      minContainment: Double = CopyMinContainment): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val cands = Checkpoints.stable(fingerprintPairs(s, dir, minShared, maxDf))
    // No distinct: the frame is only ever the build side of a left-semi
    // join, which ignores duplicate rows — a distinct here would add a
    // pointless aggregate+exchange over the endpoint union.
    val endpoints = cands.select(col("da").as("doc_id"))
      .union(cands.select(col("db").as("doc_id")))
    val sets = docs(s, dir).select(col("doc_id"),
      array_sort(array_distinct(toks)).as("keys"))
      .join(endpoints, Seq("doc_id"), "left_semi")
    cands
      .join(sets.select(col("doc_id").as("da2"), col("keys").as("ka")),
        col("da") === col("da2"))
      .join(sets.select(col("doc_id").as("db2"), col("keys").as("kb")),
        col("db") === col("db2"))
      .withColumn("shared", call_function("set_overlap", col("ka"), col("kb")))
      .withColumn("containment",
        round(col("shared").cast("double") / least(size(col("ka")), size(col("kb"))), 4))
      .filter(col("containment") >= minContainment)
      .select(col("da"), col("db"), col("n_shared"), col("containment"),
        round(col("shared").cast("double") /
          (size(col("ka")) + size(col("kb")) - col("shared")), 4).as("jaccard"))
      .orderBy("da", "db")
  }

  private val x42cSql =
    s"""WITH $fingerprintPairCtes,
       sets AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS keys
                FROM documents),
       v AS (SELECT da, db, n_shared,
               len(list_intersect(sa.keys, sb.keys)) AS shared,
               len(sa.keys) AS na, len(sb.keys) AS nb
             FROM cpairs JOIN sets sa ON da = sa.doc_id
                         JOIN sets sb ON db = sb.doc_id)
       SELECT da, db, n_shared,
              round(CAST(shared AS DOUBLE) / least(na, nb), 4) AS containment,
              round(CAST(shared AS DOUBLE) / (na + nb - shared), 4) AS jaccard
       FROM v
       WHERE round(CAST(shared AS DOUBLE) / least(na, nb), 4) >= $CopyMinContainment
       ORDER BY da, db"""

  // ---------------------------------------------------------------- x08
  /** Multimodal column plumbing, metadata side: treat the payload as an
    * opaque binary column with typed metadata. The "decode" here is the
    * deterministic fake (real codecs live behind the stub in
    * [[Multimodal]]); the Spark-side schema/partitioning is real. */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("n_chars"))
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        (col("n_chars") % 64).as("fake_width"),
        (col("n_chars") % 48).as("fake_height"))
      .orderBy("doc_id")

  private[pipeline] val x08OracleSql =
    """SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       md5(text) AS payload_md5,
       n_chars % 64 AS fake_width,
       n_chars % 48 AS fake_height
       FROM documents ORDER BY doc_id"""

  // ----------------------------------------------------------------
  // ---------------------------------------------------------------- x83
  /** Per-source document-length histogram on log₂ buckets — the "plot
    * the length distribution" first step of every corpus audit (the
    * chart behind min/max-length gate decisions like x51's 50..100k
    * band): bucket = ⌊log₂ n_tok⌋ + 1 computed EXACTLY as the binary-
    * expansion length of the whitespace-token count (the x82 integer-
    * log₂ discipline — Spark `bin`, DuckDB `printf('%b', …)`; no float
    * log whose boundary rounding could flip a bucket cross-engine).
    * Per (source, bucket): doc count, token mass, realized min/max —
    * the realized bounds let a reader verify the bucket edges without
    * trusting the formula.
    *
    * Scale: one map-only projection into a partial+final agg on
    * (source, bucket) — a frame bounded by |sources|·64 rows at ANY
    * corpus size (a BIGINT has ≤ 63 usable bits, so ≤ 63 buckets). */
  def lengthHistogram(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_tok"))
      .select(col("source"), col("n_tok"),
        length(bin(col("n_tok"))).cast("int").as("bucket"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("token_mass"),
        min("n_tok").as("min_tok"), max("n_tok").as("max_tok"))
      .orderBy("source", "bucket")

  private val x83Sql =
    """WITH s AS (SELECT source,
           CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tok
         FROM documents)
       SELECT source, CAST(length(printf('%b', n_tok)) AS INT) AS bucket,
         count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS token_mass,
         min(n_tok) AS min_tok, max(n_tok) AS max_tok
       FROM s GROUP BY source, bucket ORDER BY source, bucket"""

  // ---------------------------------------------------------------- x99
  /** Low-entropy gate: short docs are judged by other rules (length
    * gates), so the entropy cut only applies from this many chars up. */
  val CharEntropyMinLen = 50L
  /** 2 nats ≈ 2.9 bits — natural text sits near 2.8–3.0 nats of
    * character entropy, degenerate repetition far below it. */
  val MinCharEntropyUnats = 2000000L

  /** x99 — character-entropy quality gate: the Shannon entropy of a
    * document's CHARACTER distribution, the classic cheap detector for
    * degenerate text (single-char floods, keyboard mashing, base64-ish
    * uniform noise reads HIGH, repeated-char padding reads ~0) used in
    * web-corpus cleaning batteries alongside the x01/x51/x79 rules —
    * it catches repetition at a granularity the word-level x58 battery
    * can't see (a document of one repeated CHARACTER has no repeated
    * words to count).
    *
    * Engine-exact float discipline: each distinct char contributes
    * term_u = round(10⁶ · (cnt/len) · ln(len/cnt)) — an integer
    * micro-nat, computed from the same integer (cnt, len) pair by the
    * same parenthesized expression in both engines (the x28 ln-parity
    * precedent) — and the per-doc entropy is the INTEGER sum of terms,
    * so summation order can never desync the engines. cnt comes from
    * the length-minus-replace identity (len − len(text without c)),
    * not from counting split cells, so both engines agree by
    * construction. keep = entropy present AND (short-doc exemption OR
    * above [[MinCharEntropyUnats]]); empty/NULL text scores NULL and
    * is never kept.
    *
    * Scale: the cheapest gate in the library — ONE map-only projection
    * (distinct-char fold via codegen'd HOFs, O(distinct·len) per doc),
    * no shuffle before the output sort, no join, no agg, no window
    * (PlanSpec-gated). */
  /** The x99 entropy value as ONE reusable Column over `text` — the
    * single expression the registered query AND the streaming keep
    * predicate ([[charEntropyKeepColumn]]) evaluate. */
  private[graft] def charEntropyColumn: Column =
    expr(s"""CASE WHEN text IS NULL OR length(text) = 0 THEN NULL ELSE
        aggregate(
          transform(filter(array_distinct(split(text, '')), c -> c != ''),
            d -> CAST(round(1000000 *
                   (CAST(length(text) - length(replace(text, d, '')) AS DOUBLE)
                      / length(text))
                   * ln(CAST(length(text) AS DOUBLE)
                      / (length(text) - length(replace(text, d, '')))))
                 AS BIGINT)),
          0L, (acc, x) -> acc + x) END""")

  /** x99's keep decision as a per-row predicate for the streaming
    * ingest edge ([[graft.streaming.StreamingJobs.ingestAdmit]]'s
    * qualityGate hook) — built on [[charEntropyColumn]] with the same
    * short-doc exemption and floor as the registered query;
    * StreamingSpec gates batch ≡ stream and PipelineSpec pins gate
    * membership ≡ x99's own keep rows. */
  private[graft] def charEntropyKeepColumn: Column =
    // The O(distinct_chars × len) entropy fold is bound ONCE per row via
    // a single-element transform (Spark SQL has no scalar LET): embedding
    // charEntropyColumn in both the null check and the threshold compare
    // ran the fold twice on the streaming ingest edge unless the
    // optimizer happened to CSE it.
    transform(array(charEntropyColumn), e =>
      e.isNotNull &&
        (length(coalesce(col("text"), lit(""))) < CharEntropyMinLen ||
          e >= MinCharEntropyUnats)).getItem(0)

  def charEntropy(s: SparkSession, dir: String): DataFrame = {
    // The registered query computes the entropy NATIVELY
    // ([[graft.functions.CharEntropy]] — one O(len) pass inside
    // whole-stage codegen) instead of the O(distinct_chars × len)
    // interpreted fold; [[charEntropyColumn]] stays the session-free
    // reference form (and the streaming keep predicate), with
    // bit-equality gated corpus-wide in ExpressionsSpec.
    graft.functions.GraftFunctions.register(s)
    docs(s, dir)
      .select(col("doc_id"),
        length(coalesce(col("text"), lit(""))).cast("long").as("n_chars"),
        expr("""CAST(size(filter(array_distinct(split(coalesce(text, ''), '')),
                 c -> c != '')) AS BIGINT)""").as("n_distinct"),
        call_function("char_entropy", col("text")).as("entropy_unats"))
      .withColumn("keep",
        col("entropy_unats").isNotNull &&
          (col("n_chars") < CharEntropyMinLen ||
            col("entropy_unats") >= MinCharEntropyUnats))
      .orderBy("doc_id")
  }

  private lazy val x99Sql =
    s"""WITH ch AS (SELECT doc_id, text, length(text) AS len,
             unnest(list_distinct(string_split(text, ''))) AS d
           FROM documents WHERE length(coalesce(text, '')) > 0),
       t AS (SELECT doc_id, len,
               CAST(length(text) - length(replace(text, d, '')) AS BIGINT)
                 AS cnt
             FROM ch),
       h AS (SELECT doc_id, len, CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(CAST(round(1000000 *
                      (CAST(cnt AS DOUBLE) / len)
                      * ln(CAST(len AS DOUBLE) / cnt)) AS BIGINT)) AS BIGINT)
                 AS entropy_unats
             FROM t GROUP BY doc_id, len)
       SELECT d.doc_id, CAST(length(coalesce(d.text, '')) AS BIGINT) AS n_chars,
         CAST(coalesce(h.n_distinct, 0) AS BIGINT) AS n_distinct,
         h.entropy_unats,
         coalesce(h.entropy_unats IS NOT NULL AND
           (length(coalesce(d.text, '')) < $CharEntropyMinLen
            OR h.entropy_unats >= $MinCharEntropyUnats), false) AS keep
       FROM documents d LEFT JOIN h USING (doc_id)
       ORDER BY doc_id"""

  // --------------------------------------------------------------- x113
  /** x113 — vocabulary growth curve with Heaps'-law exponents (Heaps
    * 1978; Herdan 1960): distinct-type count V as a function of token
    * mass N over 10 nested corpus prefixes — the curve that forecasts
    * vocabulary size at 10× the data, the input to tokenizer capacity
    * and OOV planning. Prefixes nest by the deterministic doc selector
    * (the x21 hashBp family under its own salt, so prefix membership
    * is decorrelated from every other sampling decision), and prefix f
    * contains prefix f−1 by construction; a token's FIRST prefix is
    * the bucket of its minimum doc selector, so ONE token-keyed min
    * aggregation + a 10-row cumulative sum yields every V_f — the
    * corpus is never re-scanned per prefix. The local Heaps exponent
    * β_f = (ln V_f − ln V_{f−1}) / (ln N_f − ln N_{f−1}) emits at 4dp
    * (the x28 ln-parity precedent; sublinear β < 1 is the law's
    * signature, spec-gated).
    *
    * Scale: one token explode → tok-keyed partial+final min agg +
    * one doc-keyed projection; everything after runs on 10 rows
    * (windows over the 10-row frame only — PlanSpec gates no corpus
    * window). */
  def heapsVocabGrowth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs(s, dir).select(col("doc_id"),
      Sampling.prefixSelector.as("dsel"),
      split(coalesce(col("text"), lit("")), " ").as("t"))
    val docSide = base
      .select(expr("dsel div 1000").as("bucket"),
        expr("CAST(size(t) AS BIGINT)").as("n_tok"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("nd"), sum("n_tok").as("nt"))
    val tokSide = base
      .select(col("dsel"), explode(col("t")).as("tok"))
      .groupBy("tok").agg(min("dsel").as("msel"))
      .select(expr("msel div 1000").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("nv"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spine = s.range(1)
      .select(explode(expr("sequence(0L, 9L)")).as("bucket"))
    val cum = spine
      .join(docSide, Seq("bucket"), "left").join(tokSide, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("nd"), lit(0L)).as("nd"),
        coalesce(col("nt"), lit(0L)).as("nt"),
        coalesce(col("nv"), lit(0L)).as("nv"))
      .withColumn("n_docs", sum("nd").over(w))
      .withColumn("n_tokens", sum("nt").over(w))
      .withColumn("v_types", sum("nv").over(w))
    cum
      .withColumn("pn", lag("n_tokens", 1).over(Window.orderBy("bucket")))
      .withColumn("pv", lag("v_types", 1).over(Window.orderBy("bucket")))
      .select(expr("(bucket + 1) * 1000").as("f_bp"),
        col("n_docs"), col("n_tokens"), col("v_types"),
        expr("""CASE WHEN pn IS NULL OR pn = 0 OR n_tokens = pn THEN NULL
                ELSE round((ln(CAST(v_types AS DOUBLE)) - ln(CAST(pv AS DOUBLE)))
                   / (ln(CAST(n_tokens AS DOUBLE)) - ln(CAST(pn AS DOUBLE))), 4)
                END""").as("beta"))
      .orderBy("f_bp")
  }

  private lazy val x113Sql =
    s"""WITH b AS (SELECT doc_id,
           CAST(${Sampling.prefixSelectorSql} AS BIGINT) AS dsel,
           string_split(coalesce(text, ''), ' ') AS t
         FROM documents),
       ds AS (SELECT dsel // 1000 AS bucket, CAST(count(*) AS BIGINT) AS nd,
                CAST(sum(len(t)) AS BIGINT) AS nt
              FROM b GROUP BY dsel // 1000),
       ts AS (SELECT msel // 1000 AS bucket, CAST(count(*) AS BIGINT) AS nv
              FROM (SELECT tok, min(dsel) AS msel
                    FROM (SELECT dsel, unnest(t) AS tok FROM b)
                    GROUP BY tok)
              GROUP BY msel // 1000),
       spine AS (SELECT CAST(unnest(generate_series(0, 9)) AS BIGINT)
                   AS bucket),
       cum AS (SELECT s.bucket,
                 CAST(sum(coalesce(ds.nd, 0)) OVER (ORDER BY s.bucket)
                   AS BIGINT) AS n_docs,
                 CAST(sum(coalesce(ds.nt, 0)) OVER (ORDER BY s.bucket)
                   AS BIGINT) AS n_tokens,
                 CAST(sum(coalesce(ts.nv, 0)) OVER (ORDER BY s.bucket)
                   AS BIGINT) AS v_types
               FROM spine s LEFT JOIN ds ON s.bucket = ds.bucket
                 LEFT JOIN ts ON s.bucket = ts.bucket),
       lg AS (SELECT *, lag(n_tokens) OVER (ORDER BY bucket) AS pn,
                lag(v_types) OVER (ORDER BY bucket) AS pv
              FROM cum)
       SELECT (bucket + 1) * 1000 AS f_bp, n_docs, n_tokens, v_types,
         CASE WHEN pn IS NULL OR pn = 0 OR n_tokens = pn THEN NULL
              ELSE round((ln(CAST(v_types AS DOUBLE)) - ln(CAST(pv AS DOUBLE)))
                 / (ln(CAST(n_tokens AS DOUBLE)) - ln(CAST(pn AS DOUBLE))), 4)
              END AS beta
       FROM lg ORDER BY f_bp"""

  // --------------------------------------------------------------- x114
  /** Ranks emitted by the Zipf curve (the head is where the law and
    * its deviations live; Piantadosi 2014 reviews why the head bends). */
  val ZipfTopK = 50

  /** x114 — Zipf rank–frequency curve with local exponents (Zipf 1949;
    * the dual of x113's Heaps law — the two exponents are analytically
    * linked, β ≈ 1/s): the [[ZipfTopK]] most frequent tokens with
    * rank, count, corpus share in ppm, and the local exponent
    * s_r = (ln f_{r−1} − ln f_r)/(ln r − ln(r−1)) at 4dp (the x28
    * ln-parity discipline) — the statistic that validates a corpus
    * looks like natural language (s ≈ 1) versus template spam (flat
    * head) or token floods (cliff), and that x113's vocabulary
    * forecast quietly assumes. Ties rank on (count DESC, token) — the
    * b37 total order.
    *
    * Scale: ONE vocabulary-sized partial+final agg, a
    * TakeOrderedAndProject heap for the head, and windows over the
    * 50-row result only (PlanSpec-gated). */
  def zipfRankFrequency(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs(s, dir)
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("n_total"))
    val top = counts.orderBy(col("cnt").desc, col("tok")).limit(ZipfTopK)
    val byRank = Window.orderBy(col("cnt").desc, col("tok"))
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(byRank).cast("long"))
      .withColumn("share_ppm", expr("(cnt * 1000000) div n_total"))
      .withColumn("pc", lag("cnt", 1).over(byRank))
      .select(col("rank"), col("tok"), col("cnt"), col("share_ppm"),
        expr("""CASE WHEN pc IS NULL OR rank = 1 THEN NULL
                ELSE round((ln(CAST(pc AS DOUBLE)) - ln(CAST(cnt AS DOUBLE)))
                   / (ln(CAST(rank AS DOUBLE)) - ln(CAST(rank - 1 AS DOUBLE))),
                   4) END""").as("zipf_s"))
      .orderBy("rank")
  }

  private lazy val x114Sql =
    s"""WITH c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
           FROM (SELECT unnest(string_split(coalesce(text, ''), ' ')) AS tok
                 FROM documents)
           GROUP BY tok),
       tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM c),
       top AS (SELECT tok, cnt FROM c
               ORDER BY cnt DESC, tok LIMIT $ZipfTopK),
       r AS (SELECT tok, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT)
                 AS rank,
               lag(cnt) OVER (ORDER BY cnt DESC, tok) AS pc
             FROM top)
       SELECT rank, tok, cnt,
         CAST((cnt * 1000000) // n_total AS BIGINT) AS share_ppm,
         CASE WHEN pc IS NULL OR rank = 1 THEN NULL
              ELSE round((ln(CAST(pc AS DOUBLE)) - ln(CAST(cnt AS DOUBLE)))
                 / (ln(CAST(rank AS DOUBLE)) - ln(CAST(rank - 1 AS DOUBLE))), 4)
              END AS zipf_s
       FROM r CROSS JOIN tot ORDER BY rank"""

  // --------------------------------------------------------------- x110
  /** x110 — quality-gate tuning curve (the x105 pattern on the quality
    * axis): for every candidate floor on the 0–10⁴ bp grid, how many
    * docs survive, what token mass they carry, and the survivors' mean
    * quality — the keep-rate-vs-strictness trade-off behind choosing
    * x24's ingest floor or x32's quantile cut, in one reproducible
    * table (FineWeb-style ablations pick thresholds from exactly this
    * curve before spending any training compute). Quality is the
    * single-sourced x01 Column ([[qualityColumn]]/[[qualitySqlExpr]]),
    * integerized at its emitted 4dp (the x105 jbp discipline); the
    * mean is an integer division of BIGINT sums, so every cell is
    * engine-exact. Zero-survivor grid rows stay present with zeroed
    * metrics and a NULL mean.
    *
    * Scale: |docs| × 21 grid rows from one bounded explode → ONE
    * partial+final agg on the 21-key grid + the spine left join;
    * a deployment sweeps the materialized attributes sidecar (x91)
    * instead of re-deriving quality. */
  def qualitySweep(s: SparkSession, dir: String): DataFrame = {
    val grid = "sequence(0L, 10000L, 500L)"
    val base = docs(s, dir)
      .select(qualityColumn.as("q"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long")
          .as("n_tok"))
      .select(expr("CAST(round(q * 10000) AS BIGINT)").as("q_bp"),
        col("n_tok"))
    val hits = base.select(col("q_bp"), col("n_tok"),
        explode(expr(grid)).as("t_bp"))
      .filter(col("q_bp") >= col("t_bp"))
      .groupBy("t_bp")
      .agg(count(lit(1)).as("n_kept"), sum("n_tok").as("tok_kept"),
        sum("q_bp").as("qsum"))
    s.range(1).select(explode(expr(grid)).as("t_bp"))
      .join(hits, Seq("t_bp"), "left")
      .select(col("t_bp"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tok_kept"), lit(0L)).as("tok_kept"),
        expr("qsum div n_kept").as("mean_q_bp"))
      .orderBy("t_bp")
  }

  private lazy val x110Sql =
    s"""WITH b AS (SELECT CAST(round(($qualitySqlExpr) * 10000) AS BIGINT)
             AS q_bp,
           CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tok
         FROM documents),
       spine AS (SELECT CAST(unnest(generate_series(0, 10000, 500))
                   AS BIGINT) AS t_bp),
       h AS (SELECT t_bp, CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(n_tok) AS BIGINT) AS tok_kept,
               CAST(sum(q_bp) AS BIGINT) AS qsum
             FROM spine JOIN b ON q_bp >= t_bp GROUP BY t_bp)
       SELECT s.t_bp, coalesce(h.n_kept, 0) AS n_kept,
         coalesce(h.tok_kept, 0) AS tok_kept,
         CAST(qsum // n_kept AS BIGINT) AS mean_q_bp
       FROM spine s LEFT JOIN h ON s.t_bp = h.t_bp
       ORDER BY s.t_bp"""

  // --------------------------------------------------------------- x108
  /** x108 — Flesch reading-ease scoring (Flesch 1948; the Kincaid 1975
    * recalibration family), the readability signal education-targeted
    * corpus filters rank on: FRE = 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/word). Everything integerizes: fre_milli =
    * 206835 − (1015·W) div S − (84600·Y) div W with W = whitespace
    * words (≥ 1 by the split convention), S = terminal-mark count
    * ([.!?], floored at 1 so fragment docs divide safely), Y = vowel
    * RUNS corpus-wide plus one per vowel-less word (the standard
    * "every word has at least one syllable" fix) — the canonical cheap
    * syllable estimator (disclosed: vowel runs, not dictionary
    * syllabification; and integer div truncates the two ratios, a
    * ≤ 1-milli deviation from the float formula). Both engines count
    * with the same explicit [aeiouAEIOU] class (no (?i) dialect risk)
    * so every column is BIGINT-exact. The 4-band reading level uses
    * the published 90/60/30 cuts.
    *
    * Scale: map-only regexp/HOF projection, no shuffle before the
    * output sort (PlanSpec-gated) — the x51/x79/x99 gate cost class. */
  def fleschReadability(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("w"),
        greatest(lit(1L), size(expr(
          "regexp_extract_all(coalesce(text, ''), '[.!?]', 0)")).cast("long"))
          .as("s"),
        (size(expr("regexp_extract_all(coalesce(text, ''), '[aeiouAEIOU]+', 0)"))
          .cast("long") +
          size(expr("""filter(split(coalesce(text, ''), ' '),
            t -> NOT t RLIKE '[aeiouAEIOU]')""")).cast("long")).as("y"))
      .select(col("doc_id"), col("w").as("n_words"), col("s").as("n_sentences"),
        col("y").as("n_syllables"),
        expr("206835 - (1015 * w) div s - (84600 * y) div w").as("fre_milli"))
      .withColumn("band",
        when(col("fre_milli") >= 90000L, "very_easy")
          .when(col("fre_milli") >= 60000L, "plain")
          .when(col("fre_milli") >= 30000L, "difficult")
          .otherwise("very_difficult"))
      .orderBy("doc_id")

  private lazy val x108Sql =
    """WITH b AS (SELECT doc_id,
           CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS w,
           greatest(1, CAST(len(regexp_extract_all(coalesce(text, ''),
             '[.!?]')) AS BIGINT)) AS s,
           CAST(len(regexp_extract_all(coalesce(text, ''), '[aeiouAEIOU]+'))
             AS BIGINT)
           + CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
               t -> NOT regexp_matches(t, '[aeiouAEIOU]'))) AS BIGINT) AS y
         FROM documents)
       SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
         CAST(206835 - (1015 * w) // s - (84600 * y) // w AS BIGINT)
           AS fre_milli,
         CASE WHEN 206835 - (1015 * w) // s - (84600 * y) // w >= 90000
              THEN 'very_easy'
              WHEN 206835 - (1015 * w) // s - (84600 * y) // w >= 60000
              THEN 'plain'
              WHEN 206835 - (1015 * w) // s - (84600 * y) // w >= 30000
              THEN 'difficult'
              ELSE 'very_difficult' END AS band
       FROM b ORDER BY doc_id"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x83_length_histogram", lengthHistogram, Some(x83Sql)),
    QueryDef("x99_char_entropy", charEntropy, Some(x99Sql)),
    QueryDef("x108_flesch_readability", fleschReadability, Some(x108Sql)),
    QueryDef("x110_quality_sweep", qualitySweep, Some(x110Sql)),
    QueryDef("x113_heaps_vocab_growth", heapsVocabGrowth, Some(x113Sql)),
    QueryDef("x114_zipf_curve", zipfRankFrequency, Some(x114Sql)),
    QueryDef("b30_lang_stats", langStats, Some(b30Sql)),
    QueryDef("b30b_term_freq", termFreq, Some(b30bSql)),
    QueryDef("b37_shingle_freq", shingleFreq, Some(b37Sql)),
    QueryDef("x01_quality_score", qualityScore, Some(x01Sql)),
    QueryDef("x02_langid", langIdHeuristic, Some(x02Sql)),
    QueryDef("x100_line_lang_vote", lineLangVote, Some(x100Sql)),
    QueryDef("x03_fingerprint", fingerprint, Some(x03Sql)),
    QueryDef("x03b_rolling_hash", nativeFingerprint, Some(x03bSql)),
    QueryDef("x42_winnow_fingerprints", (s, d) => winnowFingerprints(s, d), Some(x42Sql)),
    QueryDef("x42b_fingerprint_pairs", (s, d) => fingerprintPairs(s, d), Some(x42bSql)),
    QueryDef("x42c_confirmed_copies", (s, d) => confirmedCopyPairs(s, d), Some(x42cSql)),
    QueryDef("x04_token_counts", tokenCounts, Some(x04Sql)),
    QueryDef("x28_unigram_logprob", unigramLogprob, Some(x28Sql)),
    QueryDef("x133_incremental_unigram_lm", x133, Some(x133Sql)),
    QueryDef("x77_perplexity_bins", perplexityBins, Some(x77Sql)),
    QueryDef("x38_bigram_logprob", bigramLogprob, Some(x38Sql)),
    QueryDef("x96_kneser_ney", knBigramLogprob, Some(x96Sql)),
    QueryDef("x32_quality_quantile", qualityQuantileFilter, Some(x32Sql)),
    QueryDef("x118_source_divergence", sourceDivergence, Some(x118Sql)),
    QueryDef("x134_ingest_drift_gate", x134, Some(x134Sql)),
    QueryDef("x119_context_gain", contextGain, Some(x119Sql)),
    QueryDef("x123_holdout_perplexity", holdoutPerplexity, Some(x123Sql)),
    QueryDef("x128_quality_jackknife", qualityJackknife, Some(x128Sql)))

  // ---------------------------------------------------------------- x128
  /** x128 — delete-one-bucket JACKKNIFE error bar for the corpus mean
    * quality: corpus dashboards report point estimates (x70, x91); a
    * drift alarm needs to know whether this week's mean moved by more
    * than the ESTIMATOR'S noise. Docs hash into 100 integer buckets
    * (the x14 Knuth chain — engine/run-exact membership), each bucket
    * is deleted in turn, and the spread of the leave-one-out means
    * gives the classic jackknife standard error
    * SE² = (B−1)/B · Σ(θ₍ᵢ₎ − θ̄)² (Tukey 1958) — the
    * resampling-without-randomness shape that works distributed,
    * because bucket sums are one partial+final agg (a bootstrap's
    * random resamples would need per-replica corpus passes or Poisson
    * weights; delete-one over hash buckets needs nothing but the 100
    * bucket sums).
    *
    * Integer discipline: per-doc quality (already 4dp) integerizes to
    * basis points exactly; bucket sums, leave-one-out means (micro-bp
    * by floor division), and the squared deviations are all BIGINT —
    * order-free; the ONE float op is the final sqrt of a single
    * integer-derived value (identical expression both engines).
    * Disclosed bounds: docs with NULL quality (null text) are outside
    * the estimate; deviations are exact while |θ₍ᵢ₎ − θ̄| < 3·10⁹
    * micro-bp (leave-one-bucket deviations sit orders below that). */
  def qualityJackknife(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.HashConstants.{HashPrime, Knuth}
    val bucket = pmod(pmod(col("doc_id"), lit(HashPrime)) * lit(Knuth),
      lit(HashPrime)) % 100
    val scored = docs(s, dir)
      .select(col("doc_id"), qualityColumn.as("q"))
      .filter(col("q").isNotNull)
      .select(bucket.as("b"),
        expr("CAST(round(q * 10000) AS BIGINT)").as("q_bp"))
    val perBucket = scored.groupBy("b")
      .agg(count(lit(1)).as("n_b"), sum("q_bp").as("s_b"))
    val tot = perBucket.agg(sum("n_b").as("n"), sum("s_b").as("s"),
      count(lit(1)).as("n_buckets"))
    val theta = perBucket.crossJoin(broadcast(tot))
      .filter(col("n") > col("n_b"))
      .select(col("n"), col("s"), col("n_buckets"),
        expr("((s - s_b) * 1000000) div (n - n_b)").as("theta"))
    val thetaBar = theta.groupBy("n", "s", "n_buckets")
      .agg(sum("theta").as("sum_theta"), count(lit(1)).as("bb"))
      .select(col("n"), col("s"), col("n_buckets"),
        expr("sum_theta div bb").as("theta_bar"), col("bb"))
    theta.join(broadcast(thetaBar), Seq("n", "s", "n_buckets"))
      .groupBy("n", "s", "n_buckets", "bb")
      .agg(sum(expr("(theta - theta_bar) * (theta - theta_bar)")).as("ssq"))
      .select(col("n").as("n_docs"), col("n_buckets"),
        expr("(s * 1000000) div n").as("mean_micro_bp"),
        expr("CAST(round(sqrt(CAST((bb - 1) * ssq AS DOUBLE) / bb)) AS BIGINT)")
          .as("se_micro_bp"))
      .orderBy("n_docs")
  }

  private lazy val x128Sql = {
    import graft.pipeline.HashConstants.{HashPrime, Knuth}
    s"""WITH sc AS (SELECT ((doc_id % $HashPrime) * $Knuth % $HashPrime) % 100 AS b,
             CAST(round(($qualitySqlExpr) * 10000) AS BIGINT) AS q_bp
           FROM documents WHERE ($qualitySqlExpr) IS NOT NULL),
       pb AS (SELECT b, CAST(count(*) AS BIGINT) AS n_b,
                CAST(sum(q_bp) AS BIGINT) AS s_b FROM sc GROUP BY b),
       tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS n, CAST(sum(s_b) AS BIGINT) AS s,
                CAST(count(*) AS BIGINT) AS n_buckets FROM pb),
       th AS (SELECT t.n, t.s, t.n_buckets,
                CAST(((t.s - pb.s_b) * 1000000) // (t.n - pb.n_b) AS BIGINT) AS theta
              FROM pb CROSS JOIN tot t WHERE t.n > pb.n_b),
       tb AS (SELECT n, s, n_buckets,
                CAST(sum(theta) // count(*) AS BIGINT) AS theta_bar,
                CAST(count(*) AS BIGINT) AS bb
              FROM th GROUP BY n, s, n_buckets)
       SELECT th.n AS n_docs, th.n_buckets,
         CAST((th.s * 1000000) // th.n AS BIGINT) AS mean_micro_bp,
         CAST(round(sqrt(CAST((tb.bb - 1)
             * sum((th.theta - tb.theta_bar) * (th.theta - tb.theta_bar))
             AS DOUBLE) / tb.bb)) AS BIGINT) AS se_micro_bp
       FROM th JOIN tb USING (n, s, n_buckets)
       GROUP BY th.n, th.n_buckets, th.s, tb.bb ORDER BY n_docs"""
  }

  // ---------------------------------------------------------------- x123
  /** x123 — holdout perplexity under a TRAIN-SPLIT-ONLY language model:
    * x28's perplexity proxy with the train/eval asymmetry every real
    * evaluation has — the LM is fit on x14's train bucket (< 90) alone
    * and scores the held-out test bucket (≥ 95), with Laplace smoothing
    * p(tok) = (c+1)/(N+V+1) so out-of-vocabulary eval tokens score
    * finitely (c = 0) instead of blowing up. The per-doc OOV count
    * rides along. This is the leakage-sensitive eval loop a pipeline
    * closes after decontamination: a held-out doc whose perplexity is
    * SUSPICIOUSLY low under the train LM is evidence its content leaked
    * into train (x17/x27/x122 exist to prevent exactly that), and a
    * high OOV rate flags an eval slice that drifted from the corpus.
    * Split membership is x14's integer bucket hash — single-sourced
    * constants, engine-exact.
    *
    * Scale: one train-side token agg (vocabulary-sized LM), the (N, V)
    * scalars as a broadcast 1-row frame, one eval-side explode + LEFT
    * join against the LM + per-doc agg. The eval slice is ~5% of the
    * corpus, so the scoring side is eval-sized; ln parity at the 4dp
    * rounding (the x28 precedent). */
  def holdoutPerplexity(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.HashConstants.{HashPrime, Knuth}
    val bucket = pmod(pmod(col("doc_id"), lit(HashPrime)) * lit(Knuth),
      lit(HashPrime)) % 100
    val base = docs(s, dir)
    val train = base.filter(bucket < 90)
    val ev = base.filter(bucket >= 95)
    val lm = train.select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val nv = lm.agg(sum("c").as("n_total"), count(lit(1)).as("v_size"))
    ev.select(col("doc_id"), explode(toks).as("tok"))
      .join(lm, Seq("tok"), "left")
      .crossJoin(broadcast(nv))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("c").isNull, 1L).otherwise(0L)).as("n_oov"),
        round(-sum(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("n_total") + col("v_size") + 1))) / count(lit(1)), 4)
          .as("avg_neg_logp"))
      .orderBy("doc_id")
  }

  private lazy val x123Sql = {
    import graft.pipeline.HashConstants.{HashPrime, Knuth}
    val b = s"((doc_id % $HashPrime) * $Knuth % $HashPrime) % 100"
    s"""WITH tr AS (SELECT doc_id, text FROM documents WHERE $b < 90),
       ev AS (SELECT doc_id, text FROM documents WHERE $b >= 95),
       lm AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
              FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM tr)
              GROUP BY tok),
       nv AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
                CAST(count(*) AS BIGINT) AS v_size FROM lm),
       et AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM ev)
       SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum(CASE WHEN lm.c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         round(-sum(ln(CAST(coalesce(lm.c, 0) + 1 AS DOUBLE) /
             ((SELECT n_total FROM nv) + (SELECT v_size FROM nv) + 1)))
           / count(*), 4) AS avg_neg_logp
       FROM et e LEFT JOIN lm USING (tok)
       GROUP BY e.doc_id ORDER BY e.doc_id"""
  }

  // ---------------------------------------------------------------- x119
  /** x119 — context-gain (learnability) score: per document, the mean
    * information ONE TOKEN OF CONTEXT buys — x28's unigram mean −ln p
    * minus x38's interpolated-bigram mean −ln p. The excess-loss-
    * between-reference-models selection signal (RHO-loss, Mindermann
    * et al. 2022, at the smallest model pair this engine can train
    * in-corpus): compositional, structured text gains a lot from
    * context (high delta — the model has something to LEARN from word
    * order), while bag-of-words spam, tag soup, and shuffled-token
    * noise gain nothing (delta ≈ 0) even when either absolute
    * perplexity looks unremarkable. Production stacks threshold the
    * delta, not the absolutes, to keep "hard but structured" documents
    * a pure perplexity filter would throw away.
    *
    * Both inputs are the SINGLE-SOURCED registered scores (x28's chain,
    * x38's chain — [[unigramScoreCtes]]/[[bigramScoreCtes]] compose in
    * one oracle WITH), already 4dp-rounded, so the subtraction sees
    * identical doubles in both engines and the re-rounded delta is
    * engine-exact. Docs with < 2 tokens have no bigram score → NULL
    * gain (row preserved). Scale = x28's chain + x38's chain + one
    * doc-keyed equi-join; nothing new shuffles. */
  def contextGain(s: SparkSession, dir: String): DataFrame =
    unigramLogprob(s, dir)
      .join(bigramLogprob(s, dir), Seq("doc_id"))
      .select(col("doc_id"), col("n_tok"), col("n_bigrams"),
        col("avg_neg_logp").as("unigram_nll"),
        col("avg_neg_logp2").as("bigram_nll"),
        round(col("avg_neg_logp") - col("avg_neg_logp2"), 4).as("context_gain"))
      .orderBy("doc_id")

  /** The combined unigram + bigram scoring chains (aliases disjoint) —
    * single-sourced for x119's oracle and x124's gain subquery. */
  private[pipeline] lazy val contextGainCtes: String =
    s"""$unigramScoreCtes,
       $bigramScoreCtes"""

  private lazy val x119Sql =
    s"""WITH $contextGainCtes
       SELECT sc.doc_id, sc.n_tok, coalesce(sc2.n_bigrams, 0) AS n_bigrams,
         sc.avg_neg_logp AS unigram_nll,
         sc2.avg_neg_logp2 AS bigram_nll,
         round(sc.avg_neg_logp - sc2.avg_neg_logp2, 4) AS context_gain
       FROM sc LEFT JOIN sc2 USING (doc_id) ORDER BY sc.doc_id"""

  // ---------------------------------------------------------------- x118
  /** x118 — pairwise Jensen–Shannon divergence between the token
    * distributions of every source pair: the DISTRIBUTION-level
    * complement of x74's shingle-overlap matrix (x74 asks "do these
    * sources share content", x118 asks "do they speak the same
    * language") — the statistic mixture designers read to pick
    * deduplication partners, spot a source whose register drifted
    * between snapshots, and sanity-check that "diverse" sources are
    * actually diverse before spending mixing weights on them (D4/DoReMi
    * practice). JSD = ½KL(P‖M) + ½KL(Q‖M) with M = (P+Q)/2; symmetric,
    * bounded by ln 2, zero iff identical distributions.
    *
    * Engine-exactness discipline (the x28/x102 ln-parity precedent):
    * each per-token term ½p·ln(2p/(p+q)) is computed by BOTH engines
    * from the same BIGINT counts with the same parenthesized double
    * expression, rounded HALF_UP to integer NANO-nats, and only the
    * resulting BIGINTs are summed — so aggregation order is irrelevant
    * and the result is bit-exact across engines, clusters, and runs.
    * The statistic is therefore DEFINED as nano-nat-rounded JSD
    * (per-token rounding error ≤ 0.5 nano·|vocab| — ~10⁻⁵ nats at a
    * 10⁴ vocabulary; the tradeoff that buys exactness).
    *
    * Scale shape: one (source, token) partial+final agg (corpus-sized
    * scan, vocabulary-sized result), a tiny source-totals crossJoin
    * scaffold (|sources|² rows — broadcast-seed pattern), and per-pair
    * token joins keyed on token — traffic is |pairs|·|vocab| (id,
    * long) rows, never documents. The final matrix is |pairs| rows. */
  // lazy: `defs` (declared above) forces x118Sql at object init, BEFORE a
  // plain val declared here would be assigned — a plain val interpolates
  // as "null" into the oracle.
  private lazy val JsdTermSql =
    """CASE WHEN ca > 0 THEN CAST(round(500000000 * ((CAST(ca AS DOUBLE) / na)
         * ln((2 * (CAST(ca AS DOUBLE) / na))
             / ((CAST(ca AS DOUBLE) / na) + (CAST(cb AS DOUBLE) / nb)))))
         AS BIGINT) ELSE CAST(0 AS BIGINT) END
     + CASE WHEN cb > 0 THEN CAST(round(500000000 * ((CAST(cb AS DOUBLE) / nb)
         * ln((2 * (CAST(cb AS DOUBLE) / nb))
             / ((CAST(ca AS DOUBLE) / na) + (CAST(cb AS DOUBLE) / nb)))))
         AS BIGINT) ELSE CAST(0 AS BIGINT) END"""

  def sourceDivergence(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir).select(col("source"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val c = tok.groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
    val tot = c.groupBy("source").agg(sum("cnt").as("n"))
    val pairs = tot.as("ta").crossJoin(tot.as("tb"))
      .filter(col("ta.source") < col("tb.source"))
      .select(col("ta.source").as("sa"), col("tb.source").as("sb"),
        col("ta.n").as("na"), col("tb.n").as("nb"))
    val left = pairs
      .join(c.select(col("source").as("sa"), col("tok"), col("cnt").as("ca")), Seq("sa"))
      .select(col("sa"), col("sb"), col("tok"), col("na"), col("nb"), col("ca"))
    val right = pairs
      .join(c.select(col("source").as("sb"), col("tok"), col("cnt").as("cb")), Seq("sb"))
      .select(col("sa"), col("sb"), col("tok"),
        col("na").as("na2"), col("nb").as("nb2"), col("cb"))
    left.join(right, Seq("sa", "sb", "tok"), "full_outer")
      .select(col("sa"), col("sb"),
        coalesce(col("na"), col("na2")).as("na"),
        coalesce(col("nb"), col("nb2")).as("nb"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .withColumn("term", expr(JsdTermSql))
      .groupBy(col("sa").as("source_a"), col("sb").as("source_b"))
      .agg(max("na").as("n_tok_a"), max("nb").as("n_tok_b"),
        count(lit(1)).as("vocab_union"),
        sum("term").as("jsd_nanonats"))
      .orderBy("source_a", "source_b")
  }

  private lazy val x118Sql =
    s"""WITH tk AS (SELECT source, unnest(string_split(coalesce(text, ''), ' ')) AS tok
           FROM documents),
       c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
             FROM tk WHERE length(tok) > 0 GROUP BY source, tok),
       tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY source),
       pairs AS (SELECT ta.source AS sa, tb.source AS sb, ta.n AS na, tb.n AS nb
                 FROM tot ta, tot tb WHERE ta.source < tb.source),
       l AS (SELECT p.sa, p.sb, c.tok, p.na, p.nb, c.cnt AS ca
             FROM pairs p JOIN c ON c.source = p.sa),
       r AS (SELECT p.sa, p.sb, c.tok, p.na AS na2, p.nb AS nb2, c.cnt AS cb
             FROM pairs p JOIN c ON c.source = p.sb),
       b AS (SELECT coalesce(l.sa, r.sa) AS sa, coalesce(l.sb, r.sb) AS sb,
               coalesce(l.na, r.na2) AS na, coalesce(l.nb, r.nb2) AS nb,
               CAST(coalesce(l.ca, 0) AS BIGINT) AS ca,
               CAST(coalesce(r.cb, 0) AS BIGINT) AS cb
             FROM l FULL OUTER JOIN r
               ON l.sa = r.sa AND l.sb = r.sb AND l.tok = r.tok),
       t2 AS (SELECT sa, sb, na, nb, $JsdTermSql AS term FROM b)
       SELECT sa AS source_a, sb AS source_b,
         max(na) AS n_tok_a, max(nb) AS n_tok_b,
         CAST(count(*) AS BIGINT) AS vocab_union,
         CAST(sum(term) AS BIGINT) AS jsd_nanonats
       FROM t2 GROUP BY sa, sb ORDER BY source_a, source_b"""

  // ---------------------------------------------------------------- x134
  /** Drift alarm threshold: 0.005 nats of decile-histogram JSD. A batch
    * drawn from the corpus distribution measures ~0 (ln(1) terms); a
    * batch whose quality profile genuinely moved (a new crawl source, a
    * broken extractor) clears it by orders of magnitude. */
  // `final` + literal ⇒ compile-time constant, safe to reference from
  // x134Sql even though `defs` (declared above) forces that lazy val at
  // object init, before later plain vals would initialize.
  final val DriftAlarmNanonats = 5000000L

  /** Per-side decile histogram of the x01 quality signal: qbp =
    * quality·10⁴ (integer-exact — the quality column is 4dp-rounded),
    * bin = min(qbp div 1000, 9). NULL-quality docs excluded (x128's
    * disclosed convention). */
  private def qualityBins(d: DataFrame): DataFrame =
    // round BEFORE the cast: Spark's double→long cast truncates while
    // DuckDB's rounds, and 0.1234·10⁴ can land at 1233.999… in binary.
    d.select(qualityColumn.as("q")).filter(col("q").isNotNull)
      .select(round(col("q") * 10000, 0).cast("long").as("qbp"))
      .select(least(expr("qbp div 1000"), lit(9L)).as("bin"), col("qbp"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"), sum("qbp").as("sq"))

  /** x134 — ingest DISTRIBUTION-drift gate: before merging a batch into
    * the standing corpus (and into every standing artifact x121/x129/
    * x131/x133 maintain), compare the batch's QUALITY distribution
    * against the corpus's — Jensen–Shannon divergence over the ten
    * quality deciles plus the mean shift — and emit the verdict a
    * pipeline wires into its admission control. This is the
    * distribution-level complement of x132 (which watches the CLUSTER
    * structure move): a broken extractor or a new low-quality source
    * shifts this histogram wholesale long before it shows up as
    * duplication. Same nano-nat integerization as x118 (terms rounded
    * to integers BEFORE the sum, so the statistic is
    * aggregation-order-free and engine-exact); the mean shift is
    * integer bp arithmetic on the exact 4dp quality.
    *
    * Scale: two corpus scans into 10-row histograms (partial+final
    * aggs), then constant-size arithmetic — the cheapest possible gate;
    * at 100 TB the REF histogram is itself a standing artifact
    * refreshed by the same mergeable-counts algebra as x133. */
  def ingestDriftGate(newDocs: DataFrame, refDocs: DataFrame): DataFrame = {
    val a = qualityBins(newDocs)
      .select(col("bin"), col("cnt").as("ca"), col("sq").as("sqa"))
    val b = qualityBins(refDocs)
      .select(col("bin"), col("cnt").as("cb"), col("sq").as("sqb"))
    val joined = a.join(b, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"),
        coalesce(col("sqa"), lit(0L)).as("sqa"),
        coalesce(col("sqb"), lit(0L)).as("sqb"))
    val tot = joined.agg(sum("ca").as("na"), sum("cb").as("nb"),
      sum("sqa").as("tsqa"), sum("sqb").as("tsqb"))
    joined.crossJoin(broadcast(tot))
      .withColumn("term", expr(JsdTermSql))
      .agg(max("na").as("n_batch"), max("nb").as("n_ref"),
        sum("term").as("jsd_nanonats"),
        expr("max(tsqa) div max(na)").as("mean_batch_qbp"),
        expr("max(tsqb) div max(nb)").as("mean_ref_qbp"))
      .withColumn("mean_shift_qbp",
        col("mean_batch_qbp") - col("mean_ref_qbp"))
      .withColumn("alarm", col("jsd_nanonats") > DriftAlarmNanonats)
  }

  /** Registered x134: the %5 == 0 slice arrives as the batch against
    * the rest — same-distribution draw, so the registered row is the
    * HEALTHY baseline (alarm false, JSD ≈ 0); PipelineSpec plants the
    * broken-extractor wave that trips the alarm. */
  private def x134(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    ingestDriftGate(d.filter(col("doc_id") % 5 === 0),
      d.filter(col("doc_id") % 5 =!= 0))
  }

  private lazy val x134Sql =
    s"""WITH qa AS (SELECT CAST(round($qualitySqlExpr * 10000) AS BIGINT) AS qbp
             FROM documents WHERE doc_id % 5 = 0 AND $qualitySqlExpr IS NOT NULL),
       qb AS (SELECT CAST(round($qualitySqlExpr * 10000) AS BIGINT) AS qbp
             FROM documents WHERE doc_id % 5 <> 0 AND $qualitySqlExpr IS NOT NULL),
       ha AS (SELECT least(qbp // 1000, 9) AS bin, CAST(count(*) AS BIGINT) AS ca,
                CAST(sum(qbp) AS BIGINT) AS sqa FROM qa GROUP BY 1),
       hb AS (SELECT least(qbp // 1000, 9) AS bin, CAST(count(*) AS BIGINT) AS cb,
                CAST(sum(qbp) AS BIGINT) AS sqb FROM qb GROUP BY 1),
       j AS (SELECT coalesce(ha.bin, hb.bin) AS bin,
               coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb,
               coalesce(sqa, 0) AS sqa, coalesce(sqb, 0) AS sqb
             FROM ha FULL OUTER JOIN hb ON ha.bin = hb.bin),
       t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
               CAST(sum(sqa) AS BIGINT) AS tsqa, CAST(sum(sqb) AS BIGINT) AS tsqb
             FROM j),
       terms AS (SELECT j.*, t.na, t.nb, t.tsqa, t.tsqb, $JsdTermSql AS term
                 FROM j CROSS JOIN t)
       SELECT max(na) AS n_batch, max(nb) AS n_ref,
         CAST(sum(term) AS BIGINT) AS jsd_nanonats,
         max(tsqa) // max(na) AS mean_batch_qbp,
         max(tsqb) // max(nb) AS mean_ref_qbp,
         max(tsqa) // max(na) - max(tsqb) // max(nb) AS mean_shift_qbp,
         CAST(sum(term) AS BIGINT) > $DriftAlarmNanonats AS alarm
       FROM terms"""
}
