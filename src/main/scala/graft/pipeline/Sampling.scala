package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling & mixture operators for LLM training-data pipelines — the
  * steps that turn a curated corpus into a training distribution:
  * per-stratum downsampling (cap the dominant language/source),
  * per-source token-budget selection (bound any one source's share), and
  * weighted mixture materialization with fractional upsampling (emit each
  * doc `w` times in expectation, deterministically).
  *
  * Everything is pure integer/hash arithmetic over the existing columns,
  * so every query is oracle-exact in DuckDB AND every decision is
  * engine/cluster/run-independent — the reproducibility property dataset
  * versioning needs: re-running the pipeline on a different cluster
  * yields byte-identical sample membership.
  *
  * Scale: x21/x23 are map-only projections + one map-side-combinable
  * aggregation (no shuffle of the corpus). x22's window partitions by
  * `source` — fine when strata are numerous (the normal case: thousands
  * of domains/sources at 100 TB); a single whale stratum funnels into one
  * task, the same caveat as any per-group top-k, mitigated by splitting
  * whales upstream or pre-aggregating to (source, doc) grain first.
  */
object Sampling {
  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  private val Knuth = HashConstants.Knuth
  private val HashPrime = HashConstants.HashPrime
  /** Selection decisions are made in basis points (1/10000ths). */
  private[pipeline] val Bp = 10000L

  /** Deterministic uniform-ish selector in [0, 10000): a Knuth-spread
    * integer hash of (doc_id + salt). The salt DECORRELATES independent
    * sampling decisions — x14's train/val/test split hashes bare doc_id,
    * and reusing its value here would make "sampled" correlate with
    * "test split", quietly biasing held-out evaluation.
    *
    * PRECONDITION: doc_id ≥ 0 and doc_id + salt does not overflow Long.
    * The Spark side uses `pmod` but the mirrored oracle SQL uses DuckDB's
    * sign-preserving `%`; the two agree only on non-negative inputs
    * (Java/DuckDB remainder: (-5) % 2 = -1, pmod gives 1 — the same
    * divergence x26 defends against for hash-derived ids, Dedup.scala).
    * Holds for every real id space this library targets and for the
    * synthetic corpus; callers sampling a HASHED id space (xxhash64 is
    * negative half the time) must pmod their ids into [0, 2^62) first. */
  /** Selector for x113's nested vocabulary-growth prefixes — its own
    * salt keeps prefix membership independent of x14/x21/x102. */
  private[pipeline] val PrefixSalt = 52711L
  private[pipeline] def prefixSelector: Column = hashBp(PrefixSalt)
  private[pipeline] lazy val prefixSelectorSql: String = hashBpSql(PrefixSalt)

  private[pipeline] def hashBp(salt: Long): Column =
    pmod(pmod(col("doc_id") + salt, lit(HashPrime)) * lit(Knuth), lit(HashPrime)) % Bp

  private[pipeline] def hashBpSql(salt: Long): String =
    s"(((doc_id + $salt) % $HashPrime) * $Knuth % $HashPrime) % $Bp"

  // ---------------------------------------------------------------- x21
  /** Per-language sampling rates in basis points: downsample the dominant
    * language, keep the rest — the classic rebalancing move. */
  val StratumRatesBp: Map[String, Long] =
    Map("en" -> 2500L, "de" -> 5000L, "fr" -> 5000L, "es" -> 5000L)
  val DefaultRateBp: Long = Bp // unknown strata pass through untouched
  private[graft] val SampleSalt = 7919L

  /** The x21 keep decision as a reusable Column over (doc_id, lang) — the
    * single definition both the batch sample and the streaming ingest
    * gate evaluate, so their memberships cannot drift. */
  private[graft] def sampleKeep: Column = {
    val rate = StratumRatesBp.foldLeft(lit(DefaultRateBp)) {
      case (acc, (lang, bp)) => when(col("lang") === lang, bp).otherwise(acc)
    }
    hashBp(SampleSalt) < rate
  }

  /** Stratified downsampling: keep a doc iff its hash falls under its
    * language's rate. Per-doc assignment is the inner projection; the
    * registered artifact is the per-stratum summary with a membership
    * checksum (sum of selected doc_ids) so the oracle compare pins the
    * exact selected SET, not just its size. Map-only + one agg. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        sampleKeep.as("keep"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("keep"), col("n_tok")).otherwise(0L)).as("sampled_tokens"),
        sum(when(col("keep"), col("doc_id")).otherwise(0L)).as("id_checksum"))
      .orderBy("lang")
  }

  private val x21Sql = {
    val rateCase = StratumRatesBp.toSeq.sortBy(_._1)
      .map { case (l, bp) => s"WHEN lang = '$l' THEN $bp" }
      .mkString("CASE ", " ", s" ELSE $DefaultRateBp END")
    s"""WITH a AS (SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           ${hashBpSql(SampleSalt)} < ($rateCase) AS keep
         FROM documents)
       SELECT lang, count(*) AS n_total,
              CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
              CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS sampled_tokens,
              CAST(sum(CASE WHEN keep THEN doc_id ELSE 0 END) AS BIGINT) AS id_checksum
       FROM a GROUP BY lang ORDER BY lang"""
  }

  // ---------------------------------------------------------------- x22
  /** Per-source token budget (largest-first selection): within each
    * source, take docs by (n_tok DESC, doc_id) while the EXCLUSIVE
    * running token sum is under `budget` — same convention as x15's shard
    * pack, so every source keeps ≥ 1 doc and a source's kept tokens
    * overshoot by less than its largest kept doc. Bounds any one
    * source's share of the training mix. Output: per-source manifest
    * with a kept-set checksum. */
  def sourceBudgetSelect(s: SparkSession, dir: String, budget: Long = 800L): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("n_tok").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs(s, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("kept", coalesce(sum("n_tok").over(w), lit(0L)) < budget)
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("kept_tokens"),
        sum(when(col("kept"), col("doc_id")).otherwise(0L)).as("id_checksum"))
      .orderBy("source")
  }

  /** Whale-safe form of [[sourceBudgetSelect]] — IDENTICAL output (same
    * oracle), bounded per-source window input. Phase 1 pre-prunes inside
    * `subStrata` hash sub-strata: a doc kept by the GLOBAL largest-first
    * rule has global exclusive prefix sum < budget, and its LOCAL prefix
    * sum (a subset of its global predecessors) can only be smaller, so
    * every globally-kept doc survives local pruning — lossless. Each
    * sub-stratum passes at most budget+1 docs (every doc has ≥ 1 token),
    * so phase 2's exact per-source window runs over ≤ subStrata·(budget+1)
    * rows no matter how large the source is. Totals come from a plain
    * map-side aggregation over the full corpus — no window. */
  def sourceBudgetSelectScalable(s: SparkSession, dir: String,
      budget: Long = 800L, subStrata: Int = 16): DataFrame = {
    val base = docs(s, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val order = Seq(col("n_tok").desc, col("doc_id"))
    val wLocal = Window
      .partitionBy(col("source"), pmod(col("doc_id"), lit(subStrata)))
      .orderBy(order: _*).rowsBetween(Window.unboundedPreceding, -1)
    val candidates = base
      .withColumn("lp", coalesce(sum("n_tok").over(wLocal), lit(0L)))
      .filter(col("lp") < budget)
      .drop("lp")
    val wGlobal = Window.partitionBy("source").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val kept = candidates
      .withColumn("kept", coalesce(sum("n_tok").over(wGlobal), lit(0L)) < budget)
      .filter(col("kept"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("n_tok").as("kept_tokens"),
        sum("doc_id").as("id_checksum"))
    base.groupBy("source").agg(count(lit(1)).as("n_total"))
      .join(kept, "source") // inner: every source keeps >= 1 doc
      .select("source", "n_total", "n_kept", "kept_tokens", "id_checksum")
      .orderBy("source")
  }

  private def x22Sql(budget: Long) =
    s"""WITH t AS (SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
       c AS (SELECT doc_id, source, n_tok,
           coalesce(sum(n_tok) OVER (PARTITION BY source
             ORDER BY n_tok DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) < $budget AS kept
         FROM t)
       SELECT source, count(*) AS n_total,
              CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              CAST(sum(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
              CAST(sum(CASE WHEN kept THEN doc_id ELSE 0 END) AS BIGINT) AS id_checksum
       FROM c GROUP BY source ORDER BY source"""

  // ---------------------------------------------------------------- x41
  /** Per-source document cap, quality-ranked — the per-domain cap every
    * web-corpus pipeline applies (no single domain may contribute more
    * than `cap` documents, and the ones it does contribute should be its
    * BEST): keep each source's top `cap` docs by (x01 quality DESC,
    * doc_id). Complements x22, which bounds a source's TOKEN mass
    * largest-first — this bounds its document count best-first. Output
    * is the kept manifest with the per-source rank as the audit column.
    *
    * Scale: one window shuffle on the source key; the whale remedy for
    * a mega-source is [[sourceCapByQualityScalable]] — count caps
    * pre-prune even more simply than x22b's budget (global rank ≤ cap
    * implies sub-stratum rank ≤ cap, so each of the `subStrata` hash
    * sub-strata forwards at most `cap` rows and the exact window sees
    * ≤ subStrata·cap rows per source regardless of source size). */
  /** The registered x41/x41b cap — ONE constant feeding both the Scala
    * default parameter and the interpolated oracle SQL, so editing it
    * cannot desynchronize the query from its oracle. */
  val DefaultSourceCap = 10

  def sourceCapByQuality(s: SparkSession, dir: String,
      cap: Int = DefaultSourceCap): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("quality").desc_nulls_last, col("doc_id"))
    docs(s, dir)
      .select(col("doc_id"), col("source"), TextStats.qualityColumn.as("quality"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
      .orderBy("doc_id")
  }

  /** Whale-safe form — IDENTICAL output (same oracle): pre-prune to the
    * top `cap` inside each doc_id-hash sub-stratum (lossless: a doc in
    * the global top-cap has < cap better docs in its whole source, so
    * certainly < cap in its own sub-stratum), then the exact window
    * ranks ≤ subStrata·cap survivors per source. */
  def sourceCapByQualityScalable(s: SparkSession, dir: String,
      cap: Int = DefaultSourceCap, subStrata: Int = 16): DataFrame = {
    val order = Seq(col("quality").desc_nulls_last, col("doc_id"))
    val base = docs(s, dir)
      .select(col("doc_id"), col("source"), TextStats.qualityColumn.as("quality"))
    val wLocal = Window
      .partitionBy(col("source"), pmod(col("doc_id"), lit(subStrata)))
      .orderBy(order: _*)
    val wGlobal = Window.partitionBy("source").orderBy(order: _*)
    base
      .withColumn("lrk", row_number().over(wLocal))
      .filter(col("lrk") <= cap)
      .drop("lrk")
      .withColumn("rk", row_number().over(wGlobal).cast("long"))
      .filter(col("rk") <= cap)
      .orderBy("doc_id")
  }

  private def x41Sql(cap: Int) =
    s"""WITH scored AS (SELECT doc_id, source,
           ${TextStats.qualitySqlExpr} AS quality FROM documents),
       ranked AS (SELECT doc_id, source, quality,
           row_number() OVER (PARTITION BY source
             ORDER BY quality DESC NULLS LAST, doc_id) AS rk
         FROM scored)
       SELECT doc_id, source, quality, rk FROM ranked
       WHERE rk <= $cap ORDER BY doc_id"""

  // ---------------------------------------------------------------- x23
  /** Per-language mixture weights ×100 (integer): zh is upsampled 2.5×,
    * fr 1.5×, the rest pass through — the "data mixture" step that turns
    * curated corpora into the training distribution. */
  val MixWeightsX100: Map[String, Long] = Map("zh" -> 250L, "fr" -> 150L)
  val DefaultWeightX100: Long = 100L
  private[graft] val MixSalt = 104729L

  /** Weighted mixture materialization with deterministic fractional
    * upsampling: a doc with weight w is emitted ⌊w⌋ times, plus one more
    * iff its hash falls under frac(w) — so exactly-w in expectation and
    * byte-identical membership on every engine/run. The explode is
    * `sequence(1, n_rep)`, map-only; the registered artifact aggregates
    * the emitted stream per language with an (id × epoch) checksum that
    * pins every emitted copy, not just the counts. */
  def mixtureMaterialize(s: SparkSession, dir: String): DataFrame = {
    val wX100 = MixWeightsX100.foldLeft(lit(DefaultWeightX100)) {
      case (acc, (lang, w)) => when(col("lang") === lang, w).otherwise(acc)
    }
    val whole = (col("w") / 100L).cast("long")
    val extra = when(hashBp(MixSalt) * 100L < (col("w") % 100L) * Bp, 1L).otherwise(0L)
    docs(s, dir)
      .select(col("doc_id"), col("lang"), wX100.as("w"))
      .withColumn("n_rep", whole + extra)
      .filter(col("n_rep") > 0)
      .select(col("doc_id"), col("lang"), explode(sequence(lit(1L), col("n_rep"))).as("epoch"))
      .groupBy("lang")
      // n_docs counts epoch-1 copies — every emitted doc has exactly one —
      // instead of countDistinct(doc_id), whose distinct expansion would
      // cost a third exchange on (lang, doc_id) (PlanSpec-gated).
      .agg(sum(when(col("epoch") === 1L, 1L).otherwise(0L)).as("n_docs"),
        count(lit(1)).as("n_emitted"),
        sum(col("doc_id") * col("epoch")).as("emit_checksum"))
      .orderBy("lang")
  }

  private val x23Sql = {
    val wCase = MixWeightsX100.toSeq.sortBy(_._1)
      .map { case (l, w) => s"WHEN lang = '$l' THEN $w" }
      .mkString("CASE ", " ", s" ELSE $DefaultWeightX100 END")
    s"""WITH a AS (SELECT doc_id, lang, ($wCase) AS w FROM documents),
       r AS (SELECT doc_id, lang,
           w // 100 + (CASE WHEN ${hashBpSql(MixSalt)} * 100 < (w % 100) * $Bp
                       THEN 1 ELSE 0 END) AS n_rep
         FROM a),
       e AS (SELECT doc_id, lang, unnest(generate_series(1, n_rep)) AS epoch
             FROM r WHERE n_rep > 0)
       SELECT lang,
              CAST(sum(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
              count(*) AS n_emitted,
              CAST(sum(doc_id * epoch) AS BIGINT) AS emit_checksum
       FROM e GROUP BY lang ORDER BY lang"""
  }

  // ----------------------------------------------------------------
  // ---------------------------------------------------------------- x55
  /** Token budget to apportion across languages. */
  val ApportionBudget = 100000L

  /** Largest-remainder (Hamilton) budget apportionment: split an exact
    * integer token budget across languages proportional to their corpus
    * token mass — quota_i = ⌊B·avail_i/total⌋ plus one extra token of
    * budget for the R = B − Σ⌊·⌋ largest remainders (ties by lang, so
    * the allocation is total and engine-exact). Closes the gap x21–x23
    * leave open: rates and weights produce EXPECTED sizes; a training
    * run that must consume exactly B tokens (reproducible data cards,
    * fixed eval carve-outs) needs integer allocations that sum to B
    * exactly, which naive per-stratum rounding does not give.
    *
    * Everything is BIGINT arithmetic (B·avail_i is ≤ 10⁵·total — far
    * under Long overflow for any realistic token count; the product form
    * avoids float division entirely), so both engines derive identical
    * allocations with no rounding conventions involved.
    *
    * Scale: one partial+final agg on lang (stratum-sized output), one
    * window over the ≤ |strata| rows — the heavy lifting is the corpus
    * agg; the apportionment itself is stratum-level. Downstream, x22's
    * per-source budget machinery consumes the per-stratum numbers. */
  def budgetApportion(s: SparkSession, dir: String): DataFrame =
    budgetApportionOf(docs(s, dir)
      .groupBy("lang")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("avail_tokens")))

  /** The Hamilton machinery over ANY (lang, avail_tokens) frame — the
    * single implementation x55 (whitespace tokens) and x56b (subword
    * tokens, [[Bpe]]) both consume, so the two cannot drift. */
  private[pipeline] def budgetApportionOf(avail: DataFrame): DataFrame = {
    val tot = avail.agg(sum("avail_tokens").as("total_tokens"))
    // `div`, not `/`: Spark's / on longs is DOUBLE division (and floor()
    // of it would silently lose exactness past 2^53).
    val quotas = avail.crossJoin(broadcast(tot))
      .withColumn("floor_quota",
        expr(s"($ApportionBudget * avail_tokens) div total_tokens"))
      .withColumn("remainder", (lit(ApportionBudget) * col("avail_tokens")) % col("total_tokens"))
    val w = Window.orderBy(col("remainder").desc, col("lang"))
    quotas
      .withColumn("rem_rank", row_number().over(w).cast("long"))
      .withColumn("leftover",
        lit(ApportionBudget) - sum(col("floor_quota")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("alloc_tokens",
        col("floor_quota") + when(col("rem_rank") <= col("leftover"), 1L).otherwise(0L))
      .select(col("lang"), col("avail_tokens"), col("floor_quota"),
        col("remainder"), col("alloc_tokens"))
      .orderBy("lang")
  }

  /** The apportionment chain as a shared WITH-prefix ending in
    * `alloc(lang, avail_tokens, floor_quota, remainder, alloc_tokens)` —
    * x55's oracle and x55b's carve-out oracle consume this single
    * fragment, so the two cannot drift. */
  /** The apportionment math as a WITH-body suffix over an `avail(lang,
    * avail_tokens)` CTE the caller supplies — x55/x55b prepend the
    * whitespace-token availability, x56b ([[Bpe]]) the subword one. */
  private[pipeline] val apportionMathCtes = apportionMathCtesFor("")

  /** [[apportionMathCtes]] with every CTE name suffixed, so ONE oracle
    * can run the Hamilton machinery twice (x86 apportions the same
    * probability budget under two weight laws); reads `avail$suffix`,
    * ends in `alloc$suffix`. */
  private[pipeline] def apportionMathCtesFor(suffix: String): String =
    s"""tot$suffix AS (SELECT sum(avail_tokens) AS total_tokens FROM avail$suffix),
       q$suffix AS (SELECT lang, avail_tokens,
               -- CAST: the BIGINT product widens to HUGEINT, which pandas
               -- reads as float64 and desyncs the dtype compare.
               CAST(($ApportionBudget * avail_tokens) // total_tokens AS BIGINT)
                 AS floor_quota,
               CAST(($ApportionBudget * avail_tokens) % total_tokens AS BIGINT)
                 AS remainder
             FROM avail$suffix CROSS JOIN tot$suffix),
       r$suffix AS (SELECT *,
               CAST(row_number() OVER (ORDER BY remainder DESC, lang) AS BIGINT) AS rem_rank,
               $ApportionBudget - sum(floor_quota) OVER () AS leftover
             FROM q$suffix),
       alloc$suffix AS (SELECT lang, avail_tokens, floor_quota, remainder,
           CAST(floor_quota + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_tokens
         FROM r$suffix)"""

  private val apportionCtes =
    s"""WITH avail AS (SELECT lang,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
         FROM documents GROUP BY lang),
       $apportionMathCtes"""

  private val x55Sql =
    s"""$apportionCtes
       SELECT lang, avail_tokens, floor_quota, remainder, alloc_tokens
       FROM alloc ORDER BY lang"""

  // --------------------------------------------------------------- x55b
  /** Carve-out selection salt — fresh prime, decorrelated from every
    * other sampling decision (the hashBp discipline). */
  val CarveSalt = 32452843L

  /** Budget carve-out materialization: consume x55's exact per-language
    * allocations with x22's exclusive-prefix selection, docs ordered by
    * a decorrelated hash (an eval slice must not be quality- or
    * length-biased, so the order is deterministic-uniform, not
    * largest-first) — the composed "compute the budget, then cut the
    * slice" flow, under ONE oracle. Same overshoot contract as x22:
    * kept_tokens − alloc < the last kept doc's tokens; ≥ 1 doc per
    * stratum (ENFORCED: the rank-1 doc is force-kept even when a
    * stratum's largest-remainder allocation floors to 0 tokens). The
    * id_checksum pins exact membership cross-engine.
    *
    * Scale: x55's corpus agg + one lang-keyed window over the corpus —
    * the same shuffle classes as x22; the alloc side is stratum-sized
    * and broadcasts. */
  def budgetCarveout(s: SparkSession, dir: String): DataFrame = {
    val alloc = budgetApportion(s, dir).select(col("lang"), col("alloc_tokens"))
    val t = docs(s, dir).select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      hashBp(CarveSalt).as("hsel"))
    val ord = Window.partitionBy("lang").orderBy(col("hsel"), col("doc_id"))
    val w = ord.rowsBetween(Window.unboundedPreceding, -1)
    t.join(broadcast(alloc), Seq("lang"))
      // `OR rank 1`: a stratum whose largest-remainder share floors to 0
      // tokens (share < 1/B with no remainder seat) would otherwise keep
      // ZERO docs — the exclusive prefix 0 < 0 fails for the first doc —
      // breaking the documented ">= 1 doc per stratum" contract. The
      // rank-1 doc is force-kept, matching x22's stated behavior; both
      // windows share the ONE lang-keyed exchange.
      .withColumn("kept",
        coalesce(sum(col("n_tok")).over(w), lit(0L)) < col("alloc_tokens") ||
          row_number().over(ord) === 1)
      .groupBy("lang")
      .agg(first(col("alloc_tokens")).as("alloc_tokens"),
        count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("kept_tokens"),
        sum(when(col("kept"), col("doc_id")).otherwise(0L)).as("id_checksum"))
      .orderBy("lang")
  }

  private val x55bSql =
    s"""$apportionCtes,
       t AS (SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               ${hashBpSql(CarveSalt)} AS hsel
             FROM documents),
       c AS (SELECT t.lang, t.doc_id, t.n_tok, alloc_tokens,
               (coalesce(sum(n_tok) OVER (PARTITION BY t.lang
                 ORDER BY hsel, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 < alloc_tokens
                OR row_number() OVER (PARTITION BY t.lang
                 ORDER BY hsel, doc_id) = 1) AS kept
             FROM t JOIN alloc USING (lang))
       SELECT lang, CAST(max(alloc_tokens) AS BIGINT) AS alloc_tokens,
              count(*) AS n_total,
              CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              CAST(sum(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
              CAST(sum(CASE WHEN kept THEN doc_id ELSE 0 END) AS BIGINT) AS id_checksum
       FROM c GROUP BY lang ORDER BY lang"""

  // ---------------------------------------------------------------- x86
  /** x86 — temperature-scaled source sampling: the α-sampling law of
    * multilingual pretraining (Lample & Conneau 2019 §3.1; mT5's
    * UNIMAX lineage) with α = 1/2 — sampling mass q_s ∝ n_s^α flattens
    * the natural distribution toward uniform so low-resource sources
    * are seen more than their raw share without drowning the big ones.
    * x23 hand-sets mixture weights; x86 DERIVES them from corpus
    * statistics under the published law.
    *
    * Engine-exact despite the fractional exponent: α = 1/2 makes
    * n^α an INTEGER sqrt — computed as float sqrt plus a ±1 integer
    * fixup against s² ≤ n < (s+1)², so IEEE rounding can never decide
    * a digit (n < 2⁵⁰ keeps double sqrt within 1 ulp, the fixup
    * absorbs it). Both probability vectors (tempered and natural) are
    * normalized by the SAME Hamilton largest-remainder machinery as
    * x55 ([[budgetApportionOf]] — single-sourced), so each sums to
    * exactly [[ApportionBudget]] with no float division anywhere;
    * boost_bp = q·10⁴ div max(p,1) is the realized up/down-sampling
    * factor per source (smallest source > 10⁴ > largest, the
    * flattening direction SamplingSpec gates).
    *
    * Scale: ONE corpus partial+final agg on source (checkpointed for
    * its two consumers — the plan carries no second scan); everything
    * after runs on |sources| rows. */
  def temperatureSampling(s: SparkSession, dir: String): DataFrame = {
    val base = Checkpoints.stable(
      docs(s, dir).groupBy(col("source").as("lang"))
        .agg(sum(size(split(coalesce(col("text"), lit("")), " "))
          .cast("long")).as("n_tok")))
    val sq = base
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(n_tok AS DOUBLE))) AS BIGINT)"))
      .withColumn("sqrt_tok", expr(
        """CASE WHEN (s0 + 1) * (s0 + 1) <= n_tok THEN s0 + 1
                WHEN s0 * s0 > n_tok THEN s0 - 1 ELSE s0 END"""))
      .drop("s0")
    val tempered = budgetApportionOf(
      sq.select(col("lang"), col("sqrt_tok").as("avail_tokens")))
      .select(col("lang"), col("alloc_tokens").as("p_alpha"))
    val natural = budgetApportionOf(
      base.select(col("lang"), col("n_tok").as("avail_tokens")))
      .select(col("lang"), col("alloc_tokens").as("p_natural"))
    sq.join(tempered, Seq("lang")).join(natural, Seq("lang"))
      .select(col("lang").as("source"), col("n_tok"), col("sqrt_tok"),
        col("p_alpha"), col("p_natural"),
        expr("(p_alpha * 10000) div greatest(p_natural, 1L)").as("boost_bp"))
      .orderBy("source")
  }

  private lazy val x86Sql =
    s"""WITH base AS (SELECT source AS lang,
           CAST(sum(len(string_split(coalesce(text, ''), ' '))) AS BIGINT) AS n_tok
         FROM documents GROUP BY source),
       sq AS (SELECT lang, n_tok,
           CASE WHEN (s0 + 1) * (s0 + 1) <= n_tok THEN s0 + 1
                WHEN s0 * s0 > n_tok THEN s0 - 1 ELSE s0 END AS sqrt_tok
         FROM (SELECT lang, n_tok,
                 CAST(floor(sqrt(CAST(n_tok AS DOUBLE))) AS BIGINT) AS s0
               FROM base)),
       avail AS (SELECT lang, sqrt_tok AS avail_tokens FROM sq),
       ${apportionMathCtesFor("")},
       availn AS (SELECT lang, n_tok AS avail_tokens FROM base),
       ${apportionMathCtesFor("n")}
       SELECT sq.lang AS source, n_tok, sqrt_tok,
         a.alloc_tokens AS p_alpha,
         an.alloc_tokens AS p_natural,
         CAST((a.alloc_tokens * 10000) // greatest(an.alloc_tokens, 1) AS BIGINT)
           AS boost_bp
       FROM sq JOIN alloc a ON sq.lang = a.lang
         JOIN allocn an ON sq.lang = an.lang
       ORDER BY source"""

  // ---------------------------------------------------------------- x87
  /** x87 — UNIMAX budget allocation (Chung et al., ICLR 2023): the
    * successor to x86's α-sampling for a FIXED total budget. Uniform
    * share for every language, except a language whose full corpus ×
    * epoch cap cannot absorb its share gets capped at that capacity
    * and the surplus waterfills the rest — fairer than any power law
    * at the low-resource end while never repeating a language past
    * [[MaxEpochs]] (the same cap x73 uses; paper budgets characters,
    * this engine's unit is whitespace tokens — disclosed).
    *
    * The sequential waterfill has a closed form under ascending caps:
    * with languages sorted by capacity (ties by lang) and prefix_i the
    * running capacity mass, language i is capped iff
    * cap_i·(L−i+1) + prefix_{i−1} < B — the condition is monotone in i
    * (cap_{i+1}·(L−i) < cap_i·(L−i) would need cap_{i+1} < cap_i), so
    * the capped set is exactly the sorted prefix and ONE window pass
    * decides it; water = (B − capped mass) div (survivors), with the
    * mod-remainder granted +1 to the smallest-capacity survivors so
    * Σ alloc ≡ B exactly (the x55 exactness contract, x22's exclusive-
    * prefix spirit). B = 3·Σn keeps the budget scale-relative and —
    * since Σcap = 4·Σn > B — provably leaves the largest language
    * uncapped, so the water divisor can never hit zero.
    *
    * All BIGINT; epochs_bp = alloc·10⁴ div n ≤ 4·10⁴ rides far under
    * the x73 overflow bound. Scale: ONE corpus partial+final agg on
    * lang (checkpointed for its two consumers); the window and the
    * 2-row reduction run on |langs| rows. */
  def unimaxAllocation(s: SparkSession, dir: String): DataFrame = {
    val base = Checkpoints.stable(
      docs(s, dir).groupBy("lang")
        .agg(sum(size(split(coalesce(col("text"), lit("")), " "))
          .cast("long")).as("n_tok")))
    val tot = base.agg(sum("n_tok").as("total_tok"),
      count(lit(1)).cast("long").as("n_langs"))
    val ord = Window.orderBy(col("cap"), col("lang"))
    val f = base.crossJoin(broadcast(tot))
      .withColumn("budget", expr("3 * total_tok"))
      .withColumn("cap", expr(s"n_tok * $MaxEpochs"))
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("prefix", coalesce(
        sum("cap").over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("capped", expr("cap * (n_langs - i + 1) + prefix < budget"))
    val sums = f.agg(
      sum(when(col("capped"), col("cap")).otherwise(0L)).as("capped_mass"),
      sum(when(col("capped"), 1L).otherwise(0L)).as("k"))
    f.crossJoin(broadcast(sums))
      .withColumn("water", expr("(budget - capped_mass) div (n_langs - k)"))
      .withColumn("extra", expr("(budget - capped_mass) % (n_langs - k)"))
      .withColumn("alloc_tokens", expr(
        "CASE WHEN capped THEN cap ELSE water + (CASE WHEN i - k <= extra THEN 1 ELSE 0 END) END"))
      .select(col("lang"), col("n_tok"), col("cap").as("cap_tokens"),
        col("capped"), col("alloc_tokens"),
        expr("(alloc_tokens * 10000) div n_tok").as("epochs_bp"))
      .orderBy("lang")
  }

  private lazy val x87Sql =
    s"""WITH base AS (SELECT lang,
           CAST(sum(len(string_split(coalesce(text, ''), ' '))) AS BIGINT) AS n_tok
         FROM documents GROUP BY lang),
       tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total_tok,
                      count(*) AS n_langs FROM base),
       f AS (SELECT lang, n_tok, 3 * total_tok AS budget, n_langs,
               n_tok * $MaxEpochs AS cap,
               CAST(row_number() OVER (ORDER BY n_tok * $MaxEpochs, lang) AS BIGINT) AS i,
               CAST(coalesce(sum(n_tok * $MaxEpochs) OVER (
                 ORDER BY n_tok * $MaxEpochs, lang
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS prefix
             FROM base CROSS JOIN tot),
       c AS (SELECT *, cap * (n_langs - i + 1) + prefix < budget AS capped FROM f),
       s AS (SELECT CAST(coalesce(sum(CASE WHEN capped THEN cap END), 0) AS BIGINT)
                      AS capped_mass,
                    CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS k
             FROM c)
       SELECT lang, n_tok, CAST(cap AS BIGINT) AS cap_tokens, capped,
         CAST(CASE WHEN capped THEN cap
              ELSE (budget - capped_mass) // (n_langs - k)
                   + (CASE WHEN i - k <= (budget - capped_mass) % (n_langs - k)
                      THEN 1 ELSE 0 END) END AS BIGINT) AS alloc_tokens,
         CAST((CASE WHEN capped THEN cap
              ELSE (budget - capped_mass) // (n_langs - k)
                   + (CASE WHEN i - k <= (budget - capped_mass) % (n_langs - k)
                      THEN 1 ELSE 0 END) END * 10000) // n_tok AS BIGINT) AS epochs_bp
       FROM c CROSS JOIN s
       ORDER BY lang"""

  // ---------------------------------------------------------------- x73
  /** Epoch cap: repeating data past ~4 epochs adds almost no value
    * (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    * Models" — the RHS of their data-constrained scaling law flattens
    * there), so extra-epoch rounds stop at 4 total. */
  val MaxEpochs = 4

  /** x73 — epoch allocation under a data-constrained token budget: when
    * the training budget EXCEEDS the unique corpus (the regime every
    * frontier run is now in), decide how many epochs of each source to
    * take. Published recipe shape (Muennighoff et al. 2023): repeat the
    * best data first, cap at [[MaxEpochs]]. Deterministic integer rule:
    *
    *  1. per source: unique whitespace tokens u_s and a PURE-INTEGER
    *     source-level quality — x01's 50/50 stopword/digit blend
    *     re-stated at source granularity in basis points,
    *     qd = (stop_rate + (10⁴ − digit_rate)) div 2 with each rate an
    *     integer ratio of per-source BIGINT sums (aggregate rate, not a
    *     mean of per-doc floats — floats never enter the rank key, so
    *     the allocation is engine/cluster/run-exact). The 10⁴ scale is
    *     the overflow headroom choice (the mix32 constant discipline):
    *     sum·10⁴ stays under 2⁶³ up to ~9·10¹⁴ stopword tokens / digit
    *     chars PER SOURCE — ~300× past a 100 TB corpus — where a
    *     millionths scale would wrap at ~9·10¹², inside the target
    *     regime; quality ties at 4 decimal digits break on the source
    *     tiebreak, deterministically;
    *  2. everyone gets epoch 1 (unique data is always worth one pass);
    *     the leftover L = B − Σu_s with B = (5·Σu_s) div 2 (a 2.5-epoch
    *     budget, scale-relative so every SF exercises the repetition
    *     regime);
    *  3. extra-epoch candidates (source, r ∈ 2..4) cost u_s each,
    *     ordered by (round ASC, qd DESC, source) — breadth-first so
    *     round 3 of a good source never starves round 2 of a lesser
    *     one, and granting round r implies r−1 was granted (the order
    *     makes epoch counts automatically contiguous);
    *  4. grant by the x22 exclusive-prefix rule: a candidate is taken
    *     iff the cost of everything ordered before it is < L. Overshoot
    *     ≤ the last granted round's u_s; later smaller candidates are
    *     NOT back-filled (prefix rule, not knapsack — same disclosed
    *     trade as x22).
    *
    * Scale: one corpus partial+final agg on source; everything after
    * runs on the source-cardinality frame (the candidate lattice is
    * 3 rows per source), so the global window is bounded by the source
    * list, never the corpus — the x55b alloc-side shape. */
  def epochAllocation(s: SparkSession, dir: String): DataFrame = {
    val per = docs(s, dir).groupBy("source").agg(
      sum(size(split(col("text"), " ")).cast("long")).as("uniq_tokens"),
      sum(size(filter(split(col("text"), " "),
        t => t.isin(TextStats.Stopwords: _*))).cast("long")).as("stop_sum"),
      sum(length(regexp_replace(col("text"), "[^0-9]", "")).cast("long"))
        .as("digit_sum"),
      sum(length(col("text")).cast("long")).as("char_sum"))
      .withColumn("qd", expr(
        """((stop_sum * 10000) div uniq_tokens
           + (10000 - (digit_sum * 10000) div char_sum)) div 2"""))
      .select("source", "uniq_tokens", "qd")
    val tot = per.agg(sum("uniq_tokens").as("total_uniq"))
    val cand = per.crossJoin(broadcast(tot))
      .withColumn("leftover", expr("(total_uniq * 5) div 2 - total_uniq"))
      .withColumn("r", explode(sequence(lit(2), lit(MaxEpochs))))
    val w = Window.orderBy(col("r"), col("qd").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cand
      .withColumn("prior", coalesce(sum("uniq_tokens").over(w), lit(0L)))
      .groupBy("source", "uniq_tokens", "qd")
      .agg((lit(1L) + sum(when(col("prior") < col("leftover"), 1L)
        .otherwise(0L))).as("epochs"))
      .withColumn("alloc_tokens", col("epochs") * col("uniq_tokens"))
      .orderBy("source")
  }

  private val x73Sql =
    s"""WITH per AS (SELECT source,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS uniq_tokens,
           CAST(sum(len(list_filter(string_split(text, ' '),
             t -> list_contains([${TextStats.Stopwords.map(w => s"'$w'").mkString(", ")}], t)))) AS BIGINT) AS stop_sum,
           CAST(sum(length(regexp_replace(text, '[^0-9]', '', 'g'))) AS BIGINT) AS digit_sum,
           CAST(sum(length(text)) AS BIGINT) AS char_sum
         FROM documents GROUP BY source),
       per2 AS (SELECT source, uniq_tokens,
           CAST(((stop_sum * 10000) // uniq_tokens
             + (10000 - (digit_sum * 10000) // char_sum)) // 2 AS BIGINT) AS qd
         FROM per),
       tot AS (SELECT sum(uniq_tokens) AS total_uniq FROM per2),
       cand AS (SELECT source, uniq_tokens, qd,
           CAST((total_uniq * 5) // 2 - total_uniq AS BIGINT) AS leftover,
           unnest(generate_series(2, $MaxEpochs)) AS r
         FROM per2 CROSS JOIN tot),
       g AS (SELECT *, coalesce(sum(uniq_tokens) OVER (ORDER BY r, qd DESC, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
         FROM cand)
       SELECT source, uniq_tokens, qd,
         CAST(1 + sum(CASE WHEN prior < leftover THEN 1 ELSE 0 END) AS BIGINT)
           AS epochs,
         CAST((1 + sum(CASE WHEN prior < leftover THEN 1 ELSE 0 END))
           * uniq_tokens AS BIGINT) AS alloc_tokens
       FROM g GROUP BY source, uniq_tokens, qd ORDER BY source"""

  // ---------------------------------------------------------------- x76
  /** Curriculum phases. */
  val CurriculumPhases = 4

  /** x76 — curriculum phase manifest (Bengio et al. 2009: present
    * easier/cleaner data first): split the corpus into quality
    * quartiles WITHOUT a corpus-wide rank window — the scalable
    * alternative to x32's per-stratum ranking for a GLOBAL cut.
    *
    * Machinery: per-doc integer quality in basis points (the x73
    * integer-blend at doc granularity: (stop·10⁴ div tok + (10⁴ −
    * dig·10⁴ div len)) div 2 — deviates from x01's float round by
    * < 1 bp, disclosed, so no float ever decides a phase), then a
    * VALUE histogram — the key insight: the basis-point domain is
    * ≤ 10⁴+1 distinct values, so the full histogram is a bounded
    * partial+final agg at any corpus size, and the quartile cut runs
    * as a window over that bounded frame, never the corpus. Each
    * distinct quality value gets phase = 1 + Σ_k [cum > ⌈k·n/4⌉]
    * (cum = docs at-or-above it), docs map to phases by a broadcast
    * join, and the artifact is the per-phase manifest: doc count,
    * whitespace-token mass, id checksum (the x22 membership pin),
    * quality bounds. Value ties share a phase, so phases can deviate
    * from n/4 by the tie mass — the standard histogram-cut trade,
    * spec'd in SamplingSpec. */
  /** Per-doc integer quality in basis points — the x73 blend at doc
    * granularity, SINGLE-SOURCED for x76 (curriculum phases) and x80
    * (topic mixture) in both engines.
    *
    * coalesce + greatest: the x69 NULL-text lesson and the //0 guard —
    * an empty/NULL doc scores digit-free, never errors or drops. The
    * BIGINT casts BEFORE the ×10⁴ multiplies are load-bearing: size/
    * length are Int, and a >214 KB digit run would wrap 32-bit where
    * DuckDB's len() is already BIGINT (the x73 cast discipline). */
  private[pipeline] def qualityBpColumn: Column = {
    val stopList = graft.pipeline.TextStats.Stopwords.map(w => s"'$w'").mkString(", ")
    expr(
      s"""((cast(size(filter(split(coalesce(text, ''), ' '), t -> t IN ($stopList))) as bigint) * 10000)
           div size(split(coalesce(text, ''), ' '))
         + (10000 - (cast(length(regexp_replace(coalesce(text, ''), '[^0-9]', '')) as bigint) * 10000)
           div greatest(length(coalesce(text, '')), 1))) div 2""")
  }

  /** [[qualityBpColumn]] as a DuckDB expression over a docs-shaped
    * relation, verbatim arithmetic. */
  private[pipeline] def qualityBpSqlExpr: String =
    s"""CAST(((len(list_filter(string_split(coalesce(text, ''), ' '),
          t -> list_contains([${graft.pipeline.TextStats.Stopwords.map(w => s"'$w'").mkString(", ")}], t))) * 10000)
        // len(string_split(coalesce(text, ''), ' '))
      + (10000 - (length(regexp_replace(coalesce(text, ''), '[^0-9]', '', 'g')) * 10000)
        // greatest(length(coalesce(text, '')), 1))) // 2 AS BIGINT)"""

  def curriculumPhases(s: SparkSession, dir: String): DataFrame = {
    val q = qualityBpColumn
    val scored = docs(s, dir).select(col("doc_id"),
      size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_tok"),
      q.as("qbp"))
    val hist = scored.groupBy("qbp").agg(count(lit(1)).as("c"))
    val tot = hist.agg(sum("c").as("n_total"))
    val wDesc = Window.orderBy(col("qbp").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val phases = hist.crossJoin(broadcast(tot))
      .withColumn("cum", sum("c").over(wDesc))
      .withColumn("phase", lit(1) +
        (1 until CurriculumPhases).map(k =>
          when(col("cum") >
            expr(s"(n_total * $k + ${CurriculumPhases - 1}) div $CurriculumPhases"),
            1).otherwise(0)).reduce(_ + _))
      .select("qbp", "phase")
    scored.join(broadcast(phases), "qbp")
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("token_mass"),
        sum("doc_id").as("id_checksum"),
        min("qbp").as("q_min"), max("qbp").as("q_max"))
      .orderBy("phase")
  }

  private def x76Sql(n: String = "(SELECT count(*) FROM documents)") =
    s"""WITH scored AS (SELECT doc_id,
           CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tok,
           $qualityBpSqlExpr AS qbp
         FROM documents),
       hist AS (SELECT qbp, count(*) AS c FROM scored GROUP BY qbp),
       cums AS (SELECT qbp, sum(c) OVER (ORDER BY qbp DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM hist),
       ph AS (SELECT qbp, CAST(1 +
           ${(1 until CurriculumPhases).map(k =>
             s"(CASE WHEN cum > ($n * $k + ${CurriculumPhases - 1}) // $CurriculumPhases THEN 1 ELSE 0 END)")
             .mkString(" + ")} AS INT) AS phase
         FROM cums)
       SELECT phase, count(*) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS token_mass,
         CAST(sum(doc_id) AS BIGINT) AS id_checksum,
         min(qbp) AS q_min, max(qbp) AS q_max
       FROM scored JOIN ph USING (qbp)
       GROUP BY phase ORDER BY phase"""

  // --------------------------------------------------------------- x102
  /** Sample size for the weighted priority sample. */
  val PrioritySampleK = 100
  /** Salt decorrelating the priority draw from x14/x21/x23 decisions.
    * Must differ from every other registered salt (SamplingSpec gates
    * pairwise distinctness): round 12 shipped 104729 here, identical to
    * [[MixSalt]], making the priority draw bit-equal to x23's
    * fractional-upsampling draw — deterministically anti-correlated
    * sampling decisions, exactly what per-operator salting exists to
    * prevent. */
  private[graft] val PrioritySalt = 2750159L

  /** x102 — weighted random sampling without replacement by PRIORITY
    * (Efraimidis & Spirakis 2006): each item draws u ~ U(0,1) and takes
    * key u^(1/w); the k LARGEST keys are a weighted sample without
    * replacement — the one-pass, fully parallel primitive for "give me
    * k docs, token-weighted" that needs no per-stratum machinery and no
    * second corpus pass (the x50b resampler materializes expected
    * multiplicities instead; this draws an exact-size sample).
    *
    * Integerized end to end: u = (sel+1)/10002 from the deterministic
    * [[hashBp]] selector (never 0 or 1, so ln is finite); maximizing
    * u^(1/w) ⇔ minimizing (−ln u)/w, so the sort key is
    * prio = (nlu_u · 10⁹) div w with nlu_u = round(−10⁶·ln u) — BIGINT
    * division, ties broken by doc_id, max value ≈ 9.2·10¹⁵ (no
    * overflow). Both engines compute ln from the same integer sel by
    * the same parenthesized expression (the x28 parity precedent), so
    * membership is engine/cluster/run-exact — the reproducibility
    * contract of this module. Weight = whitespace token count (≥ 1 by
    * the split convention, so every doc has a finite priority).
    *
    * Scale: map-only projection + ONE TakeOrderedAndProject heap — no
    * shuffle, no window, no agg (PlanSpec-gated); the classic
    * distributed-sample shape (per-partition heaps, driver merges k). */
  /** The per-doc priority frame (doc_id, source, w, sel, nlu_u, prio)
    * — the ONE chain x102 (global heap) and x102b (per-stratum rank)
    * both consume, so the two sample laws cannot drift. */
  private def priorityFrame(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("source"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("w"))
      .withColumn("sel", hashBp(PrioritySalt))
      .withColumn("nlu_u", expr(
        "CAST(round(-1000000 * ln((CAST(sel AS DOUBLE) + 1) / 10002.0)) AS BIGINT)"))
      .withColumn("prio", expr("(nlu_u * 1000000000) div w"))

  /** The same chain as a WITH-body fragment ending in
    * `k(doc_id, source, w, sel, nlu_u, prio)`. */
  private lazy val prioCtesSql =
    s"""b AS (SELECT doc_id, source,
           CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS w,
           CAST(${hashBpSql(PrioritySalt)} AS BIGINT) AS sel
         FROM documents),
       k AS (SELECT doc_id, source, w, sel,
           CAST(round(-1000000 * ln((CAST(sel AS DOUBLE) + 1) / 10002.0))
             AS BIGINT) AS nlu_u,
           CAST((CAST(round(-1000000 * ln((CAST(sel AS DOUBLE) + 1)
                / 10002.0)) AS BIGINT) * 1000000000) // w AS BIGINT) AS prio
         FROM b)"""

  def prioritySample(s: SparkSession, dir: String): DataFrame =
    priorityFrame(s, dir)
      .orderBy(col("prio"), col("doc_id"))
      .limit(PrioritySampleK)
      .orderBy(col("prio"), col("doc_id"))

  private lazy val x102Sql =
    s"""WITH $prioCtesSql
       SELECT doc_id, source, w, sel, nlu_u, prio
       FROM k ORDER BY prio, doc_id LIMIT $PrioritySampleK"""

  // -------------------------------------------------------------- x102b
  /** Per-stratum sample size for the stratified priority sample. */
  val StratPriorityK = 20L

  /** x102b — the STRATIFIED form of x102: the k best priorities PER
    * SOURCE instead of one global heap (Efraimidis–Spirakis §4 runs
    * independently per stratum because priorities are independent
    * uniforms — the restriction of the global draw to a stratum IS a
    * weighted sample of that stratum). This is the form quota-balanced
    * pipelines run ("20 token-weighted docs from every source,
    * whatever the source sizes"), where x102 would let a whale source
    * crowd the sample. Same priority chain, single-sourced
    * ([[priorityFrame]]/`prioCtesSql`), so x102b's winners within a
    * source are exactly x102's order restricted to it (gated in
    * SamplingSpec).
    *
    * Scale: the rank window partitions by source — the x22 per-stratum
    * shape, never global; whale-stratum caveat and remedies documented
    * there. */
  def prioritySampleStratified(s: SparkSession, dir: String): DataFrame =
    priorityFrame(s, dir)
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("prio"), col("doc_id")))
        .cast("long"))
      .filter(col("rk") <= StratPriorityK)
      .select("source", "rk", "doc_id", "w", "sel", "nlu_u", "prio")
      .orderBy("source", "rk")

  private lazy val x102bSql =
    s"""WITH $prioCtesSql,
       r AS (SELECT source, doc_id, w, sel, nlu_u, prio,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY prio, doc_id) AS BIGINT) AS rk
             FROM k)
       SELECT source, rk, doc_id, w, sel, nlu_u, prio
       FROM r WHERE rk <= $StratPriorityK
       ORDER BY source, rk"""

  // --------------------------------------------------------------- x103
  /** x103 — length-bucketed batching report: the padding-waste
    * accounting behind bucket-by-sequence-length batching (the
    * tensor2tensor/fairseq dynamic-batching discipline — batches pad
    * every sequence to the batch max, so batching docs of similar
    * length is a direct FLOP saving). Docs land in power-of-two token
    * buckets (bucket = floor(log₂ n_tok), computed as
    * length(bin(n)) − 1 — a pure integer/string identity, no float
    * log2 anywhere); per bucket the report emits doc count, realized
    * length range, token mass, the padded cost when padding to the
    * bucket's observed max, its waste in basis points, and the waste
    * the same docs would suffer under one global pad-to-corpus-max
    * batch — the saving bucketing buys, per bucket, in one number.
    * waste_bp ≤ naive_bp for every bucket by construction (bucket max
    * ≤ global max; SamplingSpec pins it and recomputes a planted
    * two-bucket fixture by hand).
    *
    * Scale: ONE corpus partial+final agg on the bucket key (≤ ~40
    * buckets ever) + a broadcast 1-row global max; everything after
    * runs on |buckets| rows. Map-side combinable, no window, no
    * product (PlanSpec-gated). Overflow bound: the ×10⁴ bp numerators
    * need a bucket's padded cost (n_docs·len_max, and n_docs·gmax for
    * the naive column) under 2⁶³/10⁴ ≈ 9.2·10¹⁴ — about a petabyte of
    * padded tokens in ONE bucket, ~40× past the 100 TB regime; a
    * corpus beyond that splits the report by source first. */
  def lengthBucketBatching(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(
      size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_tok"))
      .withColumn("bucket", expr("CAST(length(bin(n_tok)) - 1 AS BIGINT)"))
    val g = base.agg(max("n_tok").as("gmax"))
    base.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("n_tok").as("len_min"), max("n_tok").as("len_max"),
        sum("n_tok").as("token_mass"))
      .crossJoin(broadcast(g))
      .select(col("bucket"), col("n_docs"), col("len_min"), col("len_max"),
        col("token_mass"),
        expr("n_docs * len_max").as("padded_cost"),
        expr("((n_docs * len_max - token_mass) * 10000) div (n_docs * len_max)")
          .as("waste_bp"),
        expr("((n_docs * gmax - token_mass) * 10000) div (n_docs * gmax)")
          .as("naive_bp"))
      .orderBy("bucket")
  }

  private lazy val x103Sql =
    """WITH b AS (SELECT CAST(len(string_split(coalesce(text, ''), ' '))
             AS BIGINT) AS n_tok
         FROM documents),
       k AS (SELECT n_tok, CAST(length(bin(n_tok)) - 1 AS BIGINT) AS bucket
             FROM b),
       g AS (SELECT max(n_tok) AS gmax FROM k),
       a AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
               min(n_tok) AS len_min, max(n_tok) AS len_max,
               CAST(sum(n_tok) AS BIGINT) AS token_mass
             FROM k GROUP BY bucket)
       SELECT bucket, n_docs, len_min, len_max, token_mass,
         CAST(n_docs * len_max AS BIGINT) AS padded_cost,
         CAST(((n_docs * len_max - token_mass) * 10000)
              // (n_docs * len_max) AS BIGINT) AS waste_bp,
         CAST(((n_docs * gmax - token_mass) * 10000)
              // (n_docs * gmax) AS BIGINT) AS naive_bp
       FROM a CROSS JOIN g ORDER BY bucket"""

  // --------------------------------------------------------------- x112
  /** Salt for the within-source shuffle of the interleave order. */
  private[graft] val InterleaveSalt = 7717L

  /** x112 — deterministic round-robin source interleave: the ORDER a
    * data loader feeds training examples in when the mixture must stay
    * locally uniform (the T5/task-mixing discipline: consecutive
    * batches cycle the sources, so no gradient window over-exposes one
    * domain — a global shuffle gives this in expectation; the
    * interleave gives it by CONSTRUCTION, reproducibly). Docs shuffle
    * WITHIN their source by the deterministic Knuth selector (own
    * salt), sources get alphabetical indices 0..S−1, and the global
    * position is (rank−1)·S + source_index — a bijection whose
    * consecutive positions cycle through sources for as long as every
    * source has documents left; once a source exhausts, its slots stay
    * EMPTY (positions are an ordering key, not an array index —
    * relative order is what the loader consumes, and compacting would
    * need a global window; disclosed).
    *
    * Scale: one per-source rank window (the x22 stratum shape), one
    * |sources|-row broadcast for the indices; no global window over
    * the corpus anywhere (PlanSpec-gated). */
  def interleaveOrder(s: SparkSession, dir: String): DataFrame = {
    val srcIdx = docs(s, dir).select("source").distinct()
      .withColumn("si",
        (row_number().over(Window.orderBy("source")) - 1).cast("long"))
    val ranked = docs(s, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("shuffle_key", hashBp(InterleaveSalt))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("shuffle_key"), col("doc_id"))).cast("long"))
    val nSrc = srcIdx.agg(count(lit(1)).as("n_src"))
    ranked.join(broadcast(srcIdx), "source")
      .crossJoin(broadcast(nSrc))
      .select(col("doc_id"), col("source"), col("shuffle_key"), col("rk"),
        col("si"), expr("(rk - 1) * n_src + si").as("pos"))
      .orderBy("pos")
  }

  private lazy val x112Sql =
    s"""WITH si AS (SELECT source,
           CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS si
         FROM (SELECT DISTINCT source FROM documents)),
       ns AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM si),
       r AS (SELECT doc_id, source,
               CAST(${hashBpSql(InterleaveSalt)} AS BIGINT) AS shuffle_key
             FROM documents),
       rk AS (SELECT doc_id, source, shuffle_key,
                CAST(row_number() OVER (PARTITION BY source
                  ORDER BY shuffle_key, doc_id) AS BIGINT) AS rk
              FROM r)
       SELECT rk.doc_id, rk.source, rk.shuffle_key, rk.rk, si.si,
         CAST((rk.rk - 1) * ns.n_src + si.si AS BIGINT) AS pos
       FROM rk JOIN si USING (source) CROSS JOIN ns
       ORDER BY pos"""

  // ---------------------------------------------------------------- x98
  /** x98 — DoReMi-style domain reweighting (Xie et al., NeurIPS 2023):
    * upweight the domains where a GENERALIST model underperforms a
    * domain SPECIALIST — the paper's excess loss ℓ_proxy − ℓ_ref per
    * domain, driving a multiplicative-weights (exponentiated-gradient)
    * update on the mixture. x23 hand-sets weights, x86/x87 derive them
    * from SIZE alone; x98 derives them from modeling DIFFICULTY, the
    * published third law.
    *
    * Proxy pair here (disclosed stand-in for the paper's trained
    * transformers): the generalist is x28's corpus-wide unigram LM, the
    * specialist each source's OWN unigram LM (MLE on that source, so
    * per-source total NLL under it is optimal — excess ≥ 0 up to the
    * 4-decimal per-doc rounding, clamped at 0). One Group-DRO step with
    * the update LINEARIZED (exp(η·e) → 1 + η·e, η = 1 — the
    * mirror-descent/χ² form of the same ascent direction): transcendental
    * exp would break integer-exactness, and at |e| ≪ 1 nat the two agree
    * to second order. Per-doc scores integerize at the emitted 4-decimal
    * rounding (the x28 ln-parity precedent), so domain means
    * (micro-nats, integer div), excess, factors, and the final weights
    * are pure BIGINT; normalization is the x55 Hamilton machinery
    * ([[budgetApportionOf]] — single-sourced), so Σ weight_alloc is
    * exactly [[ApportionBudget]].
    *
    * Scale: ONE corpus explode feeds the per-(doc,source,tok) counts
    * (checkpointed — three consumers, one scan); both LMs are
    * vocabulary-sized partial+final aggs; scoring is equi-joins on
    * tok/(source,tok) with the 1-row global total and |sources|-row
    * per-source totals broadcast; everything after the per-source agg
    * runs on |sources| rows. No driver collect, no product. */
  def doremiWeights(s: SparkSession, dir: String): DataFrame = {
    val tok = Checkpoints.stable(
      docs(s, dir)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "source", "tok").agg(count(lit(1)).as("c")))
    val lmG = tok.groupBy("tok").agg(sum("c").as("cf"))
    val totG = lmG.agg(sum("cf").as("n_total"))
    val lmS = tok.groupBy("source", "tok").agg(sum("c").as("cfs"))
    val totS = lmS.groupBy("source").agg(sum("cfs").as("n_src"))
    val scored = tok
      .join(lmG, "tok")
      .join(lmS, Seq("source", "tok"))
      .join(broadcast(totS), "source")
      .crossJoin(broadcast(totG))
      .groupBy("doc_id", "source")
      .agg(
        round((-sum(col("c") * log(col("cf").cast("double") / col("n_total"))) /
          sum(col("c"))), 4).as("nll_gen"),
        round((-sum(col("c") * log(col("cfs").cast("double") / col("n_src"))) /
          sum(col("c"))), 4).as("nll_dom"))
    val perSrc = scored
      .withColumn("g4", expr("CAST(round(nll_gen * 10000) AS BIGINT)"))
      .withColumn("d4", expr("CAST(round(nll_dom * 10000) AS BIGINT)"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("g4").as("sg"), sum("d4").as("sd"))
      .withColumn("mean_gen_u", expr("(sg * 100) div n_docs"))
      .withColumn("mean_dom_u", expr("(sd * 100) div n_docs"))
      .withColumn("excess_u",
        greatest(col("mean_gen_u") - col("mean_dom_u"), lit(0L)))
      .withColumn("factor_ppm", lit(1000000L) + col("excess_u"))
    val alloc = budgetApportionOf(
      perSrc.select(col("source").as("lang"),
        col("factor_ppm").as("avail_tokens")))
      .select(col("lang").as("source"), col("alloc_tokens").as("weight_alloc"))
    perSrc.join(alloc, "source")
      .select(col("source"), col("n_docs"), col("mean_gen_u"),
        col("mean_dom_u"), col("excess_u"), col("factor_ppm"),
        col("weight_alloc"))
      .orderBy("source")
  }

  private lazy val x98Sql =
    s"""WITH tok AS (SELECT doc_id, source, tok, count(*) AS c
             FROM (SELECT doc_id, source,
                     unnest(string_split(text, ' ')) AS tok
                   FROM documents)
             GROUP BY doc_id, source, tok),
       lmg AS (SELECT tok, sum(c) AS cf FROM tok GROUP BY tok),
       totg AS (SELECT sum(cf) AS n_total FROM lmg),
       lms AS (SELECT source, tok, sum(c) AS cfs
               FROM tok GROUP BY source, tok),
       tots AS (SELECT source, sum(cfs) AS n_src FROM lms GROUP BY source),
       sc AS (SELECT doc_id, t.source,
                round(-sum(c * ln(CAST(cf AS DOUBLE)
                      / (SELECT n_total FROM totg))) / sum(c), 4) AS nll_gen,
                round(-sum(c * ln(CAST(cfs AS DOUBLE) / n_src))
                      / sum(c), 4) AS nll_dom
              FROM tok t JOIN lmg USING (tok)
                JOIN lms USING (source, tok) JOIN tots USING (source)
              GROUP BY doc_id, t.source),
       per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CAST(round(nll_gen * 10000) AS BIGINT)) AS BIGINT)
                   AS sg,
                 CAST(sum(CAST(round(nll_dom * 10000) AS BIGINT)) AS BIGINT)
                   AS sd
               FROM sc GROUP BY source),
       m AS (SELECT source, n_docs,
               CAST((sg * 100) // n_docs AS BIGINT) AS mean_gen_u,
               CAST((sd * 100) // n_docs AS BIGINT) AS mean_dom_u
             FROM per),
       e AS (SELECT source, n_docs, mean_gen_u, mean_dom_u,
               CAST(greatest(mean_gen_u - mean_dom_u, 0) AS BIGINT)
                 AS excess_u,
               CAST(1000000 + greatest(mean_gen_u - mean_dom_u, 0) AS BIGINT)
                 AS factor_ppm
             FROM m),
       avail AS (SELECT source AS lang, factor_ppm AS avail_tokens FROM e),
       ${apportionMathCtesFor("")}
       SELECT e.source, n_docs, mean_gen_u, mean_dom_u, excess_u, factor_ppm,
         a.alloc_tokens AS weight_alloc
       FROM e JOIN alloc a ON e.source = a.lang
       ORDER BY source"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x21_stratified_sample", stratifiedSample, Some(x21Sql)),
    QueryDef("x73_epoch_alloc", epochAllocation, Some(x73Sql)),
    QueryDef("x76_curriculum_phases", curriculumPhases, Some(x76Sql())),
    QueryDef("x55_budget_apportion", budgetApportion, Some(x55Sql)),
    QueryDef("x55b_budget_carveout", budgetCarveout, Some(x55bSql)),
    QueryDef("x22_source_budget", (s, d) => sourceBudgetSelect(s, d), Some(x22Sql(800L))),
    QueryDef("x22b_source_budget_scalable",
      (s, d) => sourceBudgetSelectScalable(s, d), Some(x22Sql(800L))),
    QueryDef("x23_mixture", mixtureMaterialize, Some(x23Sql)),
    QueryDef("x86_temperature_sampling", temperatureSampling, Some(x86Sql)),
    QueryDef("x87_unimax_alloc", unimaxAllocation, Some(x87Sql)),
    QueryDef("x98_doremi_weights", doremiWeights, Some(x98Sql)),
    QueryDef("x102_priority_sample", prioritySample, Some(x102Sql)),
    QueryDef("x102b_priority_stratified", prioritySampleStratified, Some(x102bSql)),
    QueryDef("x103_length_buckets", lengthBucketBatching, Some(x103Sql)),
    QueryDef("x112_interleave_order", interleaveOrder, Some(x112Sql)),
    QueryDef("x41_source_cap", (s, d) => sourceCapByQuality(s, d),
      Some(x41Sql(DefaultSourceCap))),
    QueryDef("x41b_source_cap_scalable",
      (s, d) => sourceCapByQualityScalable(s, d), Some(x41Sql(DefaultSourceCap))))
}
