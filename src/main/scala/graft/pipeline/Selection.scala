package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted data-selection operators — the steps that pick WHICH curated
  * documents feed a training run, as opposed to the dedup/decon passes
  * that decide which to drop:
  *
  *   - x49 Okapi BM25 retrieval: rank the corpus against a query-term set
  *     (the sparse-retrieval primitive behind benchmark-targeted data
  *     selection and "retrieve training data relevant to task X").
  *   - x50 DSIR importance weights: hashed-n-gram importance resampling
  *     (Xie et al., "Data Selection for Language Models via Importance
  *     Resampling", NeurIPS 2023) — score every raw document by how much
  *     more likely its features are under a target-domain bag-of-hashed-
  *     n-grams model than under the raw-corpus model.
  *   - x51 Gopher rule battery: the published per-document quality rules
  *     of Rae et al. 2021 (MassiveText, appendix A) as one map-only pass
  *     emitting per-rule verdicts.
  *
  * Scale shapes: all three are one-explode pipelines whose model/statistic
  * sides collapse to vocabulary-, bucket-, or single-row-sized frames that
  * broadcast; the corpus itself never joins corpus-to-corpus and never
  * shuffles except for the per-(doc, key) partial+final aggregations.
  * x51 is map-only (zero shuffles beyond the output sort).
  *
  * Reference scope note: the reference
  * (/root/reference/src/ceneton_database_utils, 495-line FMP-XML ETL) has
  * no retrieval/selection surface; these extend SURVEY.md §2B's
  * training-data-pipeline mandate alongside x21–x23/x41 (sampling/caps).
  */
object Selection {
  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  private val toks = split(col("text"), " ")

  /** The x03b polynomial ascii fold as DuckDB SQL over expression `e` —
    * identical to [[graft.functions.RollingHash]] on ASCII text (the
    * x03b/x40/x42 parity convention; non-ASCII caveat documented there). */
  private def rollFoldSql(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))),
        (a, c) -> (a * 31 + c) % 1000000007)"""

  // ---------------------------------------------------------------- x49
  /** BM25 parameters — the Robertson/Sparck-Jones defaults used by Lucene. */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  /** Query terms: two mid-probability content terms plus the one genuinely
    * rare term in this corpus ("dup", df ≈ 5%), so idf — not just tf —
    * visibly drives the ranking at every SF (measured 2026-08-13: top-50
    * spans scores 5.76→4.30 at sf0.1 with 36 distinct rounded scores). */
  val Bm25Query: Seq[String] = Seq("spark", "join", "dup")
  val Bm25TopK = 50

  /** Okapi BM25 top-k retrieval: score = Σ_t idf(t) · tf·(k1+1) /
    * (tf + k1·(1 − b + b·dl/avgdl)), idf(t) = ln(1 + (N − df + 0.5) /
    * (df + 0.5)) — the probabilistic-relevance form that never goes
    * negative. Both engines rank on the ROUNDED score with doc_id as the
    * tiebreak, so the top-k cut is total and engine-exact (the same
    * determinism discipline as x13/b19).
    *
    * Scale: the corpus-wide explode immediately filters to the query
    * terms, so the per-(doc, term) aggregation shuffles only matching
    * postings (|q| terms × matching docs, not the corpus); df and the
    * (N, avgdl) statistics are |q|-row / 1-row frames that broadcast; dl
    * joins on doc_id at posting grain. The final top-k is a
    * TakeOrderedAndProject (per-partition heaps + driver merge of k·p
    * rows), never a full sort — the b19 discipline, gated in PlanSpec. */
  def bm25TopK(s: SparkSession, dir: String): DataFrame =
    bm25Of(docs(s, dir), Bm25Query, Bm25TopK)

  /** The BM25 sum over a group of scored postings (columns tf/df/dl/
    * n_docs/avgdl in scope) — the ONE scoring definition x49 and x49b
    * aggregate, so the two registered forms cannot drift. */
  private def bm25ScoreAgg: Column =
    round(sum(
      log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
        col("tf") * (Bm25K1 + 1.0) /
        (col("tf") + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl")))), 4)

  /** Scored postings for `terms`: one corpus explode filtered to the
    * terms, aggregated to (doc_id, tok, tf, dl) — `dl` rides the explode
    * (first() per group) instead of joining a corpus-sized length frame
    * back onto the postings — joined with the broadcast |terms|-row df
    * side and the broadcast 1-row (N, avgdl) statistics. */
  private def bm25Postings(corpus: DataFrame, terms: Seq[String]): DataFrame = {
    val stats = corpus
      .select(size(toks).cast("double").as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val tf = corpus
      .select(col("doc_id"), size(toks).cast("double").as("dl"), explode(toks).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"), first("dl").as("dl"))
    val df_ = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df_), Seq("tok")).crossJoin(broadcast(stats))
  }

  /** Library form over any (doc_id, text) frame — the registered x49 plus
    * the planted-fixture surface SelectionSpec hand-checks. */
  private[graft] def bm25Of(corpus: DataFrame, terms: Seq[String], topK: Int): DataFrame =
    bm25Postings(corpus, terms)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_terms"), bm25ScoreAgg.as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
      .orderBy(col("bm25").desc, col("doc_id"))

  private val x49Sql = {
    val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS DOUBLE) AS dl
                   FROM documents),
       stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
       tf AS (SELECT doc_id, tok, count(*) AS tf
              FROM (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents)
              WHERE tok IN ($terms) GROUP BY doc_id, tok),
       df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok)
       SELECT doc_id, CAST(count(*) AS INT) AS n_terms,
         round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
               tf * ($Bm25K1 + 1.0) /
               (tf + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * dl / avgdl))), 4) AS bm25
       FROM tf JOIN df USING (tok) JOIN d USING (doc_id) CROSS JOIN stats
       GROUP BY doc_id
       ORDER BY bm25 DESC, doc_id LIMIT $Bm25TopK"""
  }

  // --------------------------------------------------------------- x49b
  /** The benchmark-suite batch: several named queries retrieved in ONE
    * pass (per-task training-data selection runs hundreds of these). */
  val Bm25Queries: Seq[(Int, String)] = Seq(
    1 -> "spark", 1 -> "join",
    2 -> "dup",
    3 -> "window", 3 -> "scan", 3 -> "fast")
  val Bm25BatchK = 10

  /** Batch BM25: a (query_id, term) table joined against the corpus in
    * one pass, per-query top-k via a rank window — the grouped-top-k
    * shape that scales to hundreds of concurrent queries where x49's
    * global TakeOrdered serves one. Terms are deduplicated BEFORE the
    * corpus explode filter (a term shared by two queries is counted
    * once), df/dl/stats fragments are x49's, and the rank window
    * partitions by query_id on the rounded score with doc_id tiebreak —
    * total, engine-exact, and per-query parallel.
    *
    * Scale: postings = matching (doc, term) rows across the UNION of
    * query vocabularies — one corpus explode serves every query (the
    * batch amortization that makes per-benchmark selection affordable);
    * the query table and df are broadcast-sized; the only corpus-keyed
    * shuffle is the per-(query, doc) aggregation, partitioned by
    * query_id × doc — no whale unless one query matches everything, the
    * stopword caveat x49 documents. */
  def bm25Batch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val queries = Bm25Queries.toDF("query_id", "tok")
    val scored = bm25Postings(docs(s, dir), Bm25Queries.map(_._2).distinct)
      .join(broadcast(queries), Seq("tok"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).cast("int").as("n_terms"), bm25ScoreAgg.as("bm25"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("bm25").desc, col("doc_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= Bm25BatchK)
      .orderBy("query_id", "rnk")
  }

  private val x49bSql = {
    val vals = Bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""WITH queries AS (SELECT * FROM (VALUES $vals) v(query_id, tok)),
       d AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS DOUBLE) AS dl
             FROM documents),
       stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
       tf AS (SELECT doc_id, tok, count(*) AS tf
              FROM (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents)
              WHERE tok IN (SELECT DISTINCT tok FROM queries) GROUP BY doc_id, tok),
       df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       scored AS (
         SELECT query_id, doc_id, CAST(count(*) AS INT) AS n_terms,
           round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
                 tf * ($Bm25K1 + 1.0) /
                 (tf + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * dl / avgdl))), 4) AS bm25
         FROM tf JOIN queries USING (tok) JOIN df USING (tok)
              JOIN d USING (doc_id) CROSS JOIN stats
         GROUP BY query_id, doc_id)
       SELECT query_id, doc_id, n_terms, bm25, rnk FROM (
         SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY bm25 DESC, doc_id) AS INT) AS rnk
         FROM scored) t
       WHERE rnk <= $Bm25BatchK
       ORDER BY query_id, rnk"""
  }

  // ---------------------------------------------------------------- x49c
  /** Root for the at-rest token-partitioned posting index (the lexical
    * sibling of [[Ivf.partitionedIndexPath]]'s IVF root). */
  private val LexIndexRoot = "tmp/idx"

  /** Write-once paths of the at-rest LEXICAL posting index for the
    * corpus at `dir` — the x138 layout discipline applied to the
    * retrieval side (r15 ask #6): `postings/` holds (doc_id, tf, dl)
    * parquet PARTITIONED BY tok, `stats/` the 1-row (n_docs, avgdl)
    * scalars a pruned read cannot re-derive. A BM25 probe becomes
    * `read.parquet(postings).filter(tok IN terms)` — Catalyst resolves
    * the literal IN against the partition directories at PLANNING time,
    * so the scan touches |terms|/|vocab| of the files and none of the
    * rest (PlanSpec gates PartitionFilters). The partition DIRECTORY
    * value is the inference-proof encoded token ([[PartitionKeys]]);
    * the raw token rides in the data files. Directory count is
    * vocabulary-bounded here (31 words); at 100 TB
    * the same layout keys on a token-hash bucket so directory counts
    * stay bounded — a constant swap, same plan shape. Memoized per
    * corpus snapshot; timed as `idx_lex_postings`. */
  private[graft] def lexPostingsIndexPath(s: SparkSession, dir: String): (String, String) = {
    val d = docs(s, dir)
    graft.pipeline.Ivf.memoModel(d, "lexpostpath") {
      val name = new java.io.File(dir).getName
      val root = s"$LexIndexRoot/lex_post_${name}_${math.abs(dir.hashCode)}"
      d.select(col("doc_id"), size(toks).cast("double").as("dl"),
          explode(toks).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"), first("dl").as("dl"))
        // Directory value is the inference-proof encoded token; the raw
        // token stays as a data column ([[PartitionKeys]], r17 ADVICE).
        .withColumn("tokh", PartitionKeys.encode(col("tok")))
        // Cluster rows by the partition column before the partitioned
        // write: without this every task writes a sliver into every
        // token directory (|tasks| × |vocab| small files — measured
        // 18.6 s at sf1); clustered, each directory gets one file.
        .repartition(col("tokh"))
        .write.mode("overwrite").partitionBy("tokh").parquet(s"$root/postings")
      d.select(size(toks).cast("double").as("dl"))
        .agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
        .write.mode("overwrite").parquet(s"$root/stats")
      (s"$root/postings", s"$root/stats")
    }
  }

  /** x49c — x49's BM25 top-k re-expressed as a PARTITION-PRUNED scan of
    * the at-rest posting index: tf and dl come from the pruned posting
    * read, df re-aggregates from those same postings (bit-identical to
    * x49's term-filtered df), and (n_docs, avgdl) come from the stored
    * scalars (doubles round-trip parquet exactly). Results are
    * bit-identical to x49, so the registration reuses x49's DuckDB
    * oracle verbatim — the hash match certifies the whole
    * write→prune→scan→score path, exactly as x138 did for the IVF
    * probe. The r15 sf0.1 economics this converts: the per-run posting
    * explode becomes a write-once artifact, and every query-time read
    * touches 3 of 31 token directories. */
  def bm25IndexedQuery(s: SparkSession, dir: String): DataFrame = {
    val (postPath, statsPath) = lexPostingsIndexPath(s, dir)
    val post = s.read.parquet(postPath)
      // Prune on the encoded PARTITION column (planning-time directory
      // selection); consume the raw token data column.
      .filter(col("tokh").isin(Bm25Query.map(PartitionKeys.encodeLiteral): _*))
      .select(col("doc_id"), col("tok"), col("tf"), col("dl"))
    val df_ = post.groupBy("tok").agg(count(lit(1)).as("df"))
    post.join(broadcast(df_), Seq("tok"))
      .crossJoin(broadcast(s.read.parquet(statsPath)))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_terms"), bm25ScoreAgg.as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(Bm25TopK)
      .orderBy(col("bm25").desc, col("doc_id"))
  }

  // ---------------------------------------------------------------- x50
  /** Number of hashed-feature buckets. 256 deliberately collides this
    * corpus's ~31-word vocabulary + bigrams — feature hashing WITH
    * collisions is the published DSIR design (it regularizes the density
    * ratio); production would use 10k–100k buckets, a constant swap. */
  val DsirBuckets = 256
  /** The target-domain predicate: documents whose distribution we want
    * more of. `lang = 'en'` mirrors the paper's formal-text target and is
    * measurably distinct here (per-token probabilities differ ~25%
    * relative across langs; measured mean log-weight at sf0.001:
    * en +0.37 vs −0.9..−1.0 for the other four langs). */
  private val dsirTarget: Column = col("lang") === "en"

  /** DSIR importance weight: features are hashed unigrams + bigrams
    * (rolling_hash(feat) mod B — the engine's oracle-exact x03b fold);
    * both the raw corpus and the target slice reduce to B-bucket
    * histograms with add-one smoothing, and each document scores
    * log w(d) = Σ_f c_f(d) · (ln p̂_target(b_f) − ln p̂_raw(b_f)).
    * Positive ⇒ the doc looks more target-like than the corpus average;
    * the paper then samples ∝ w (our deterministic x21/x22 machinery —
    * thresholding logw — is the resampling step, kept separate so the
    * weight itself stays oracle-checkable).
    *
    * Scale: ONE explode feeds the per-(doc, bucket) counts (partial+final
    * agg on a composite content key); both histograms are ≤ B rows —
    * broadcast joins, never a corpus shuffle; totals ride a broadcast
    * 1-row frame. The target model in production comes from a separate
    * (small) corpus — same plan, the histogram side stays tiny. */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    dsirWeightsOf(docs(s, dir), dsirTarget)
  }

  /** The paper's actual deployment shape: the target distribution comes
    * from a SEPARATE (small, curated) corpus — e.g. weight a web crawl
    * against Wikipedia — rather than a slice predicate. Union the two
    * with a flag and reuse the sliced form verbatim: the raw model is
    * then trained on crawl ∪ target, which is the published estimator
    * (the target corpus is part of the data universe; at crawl ≫ target
    * size the difference from crawl-only is negligible and the union
    * keeps every target feature present in the raw histogram, so no
    * bucket is target-only). Target doc_ids are remapped below any real
    * id so they can't collide with crawl ids; only crawl docs are
    * returned. PRECONDITION: crawl doc_id ≥ 0 (the same id-space
    * discipline as [[Sampling.hashBp]]). */
  private[graft] def dsirWeightsAgainst(crawl: DataFrame, targetCorpus: DataFrame): DataFrame = {
    val union = crawl.select(col("doc_id"), col("text"), lit(false).as("is_tgt"))
      .unionByName(targetCorpus.select(
        (lit(Long.MinValue) + monotonically_increasing_id()).as("doc_id"),
        col("text"), lit(true).as("is_tgt")))
    dsirWeightsOf(union, col("is_tgt")).filter(col("doc_id") >= 0)
  }

  /** Library form: importance-weight `corpus` (doc_id, text, + whatever
    * `target` reads) against the slice `target` selects. Registers the
    * native functions on the corpus frame's OWN session (the x36
    * cloned-session lesson: under foreachBatch the micro-batch frame is
    * bound to a cloned session). */
  private[graft] def dsirWeightsOf(corpus: DataFrame, target: Column): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val base = corpus.select(col("doc_id"), target.as("is_target"), toks.as("t"))
    val feats = base.select(col("doc_id"), col("is_target"),
      explode(concat(col("t"),
        when(size(col("t")) >= 2,
          transform(sequence(lit(0), size(col("t")) - 2),
            i => concat_ws(" ", element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
          .otherwise(array().cast("array<string>")))).as("feat"))
    val fb = feats
      .select(col("doc_id"), col("is_target"),
        (call_function("rolling_hash", col("feat")) % DsirBuckets).as("bucket"))
      .groupBy("doc_id", "is_target", "bucket").agg(count(lit(1)).as("c"))
    val raw = fb.groupBy("bucket").agg(sum("c").as("cr"))
    val tgt = fb.filter(col("is_target")).groupBy("bucket").agg(sum("c").as("ct"))
    val tot = raw.agg(sum("cr").as("tot_r"))
      .crossJoin(tgt.agg(coalesce(sum("ct"), lit(0L)).as("tot_t")))
    fb.join(broadcast(raw), Seq("bucket"))
      .join(broadcast(tgt), Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(sum("c").as("n_feats"),
        round(sum(col("c") * (
          log((coalesce(col("ct"), lit(0L)) + 1.0) / (col("tot_t") + DsirBuckets)) -
            log((col("cr") + 1.0) / (col("tot_r") + DsirBuckets)))), 4).as("log_weight"))
      .orderBy("doc_id")
  }

  /** The x50 weight chain as a shared WITH-prefix ending in `w(doc_id,
    * n_feats, log_weight)` — x50's oracle and x50b's resampling oracle
    * score from this single fragment, so the two cannot drift. `fb` is
    * referenced three times and marked MATERIALIZED (DuckDB inlines
    * otherwise — the x46 lesson: the explode would run per reference). */
  private def dsirCtes(rel: String = "documents", prefix: String = "") =
    s"""WITH $prefix t AS (SELECT doc_id, lang, string_split(text,' ') AS t FROM $rel),
       feat AS (
         SELECT doc_id, lang, unnest(t) AS feat FROM t
         UNION ALL
         SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS feat
         FROM t, unnest(generate_series(1, len(t) - 1)) u(i) WHERE len(t) >= 2),
       fb AS MATERIALIZED (
         SELECT doc_id, lang, (${rollFoldSql("feat")}) % $DsirBuckets AS bucket,
                count(*) AS c
         FROM feat
         GROUP BY doc_id, lang, (${rollFoldSql("feat")}) % $DsirBuckets),
       raw AS (SELECT bucket, sum(c) AS cr FROM fb GROUP BY bucket),
       tgt AS (SELECT bucket, sum(c) AS ct FROM fb WHERE lang = 'en' GROUP BY bucket),
       tot AS (SELECT (SELECT sum(cr) FROM raw) AS tot_r,
                      (SELECT coalesce(sum(ct), 0) FROM tgt) AS tot_t),
       w AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
               round(sum(c * (ln((coalesce(ct, 0) + 1.0) / (tot_t + $DsirBuckets.0))
                          -   ln((cr + 1.0) / (tot_r + $DsirBuckets.0)))), 4) AS log_weight
             FROM fb LEFT JOIN tgt USING (bucket) JOIN raw USING (bucket) CROSS JOIN tot
             GROUP BY doc_id)"""

  private val x50Sql =
    s"${dsirCtes()} SELECT doc_id, n_feats, log_weight FROM w ORDER BY doc_id"

  // ---------------------------------------------------------------- x50b
  /** How many documents the resampling step keeps. */
  val DsirSampleK = 100
  /** Gumbel-noise salt — a fresh prime, decorrelated from x14's bare
    * doc_id split, x21's 7919 and x23's 104729 (the [[Sampling.hashBp]]
    * decorrelation discipline: reusing a salt would correlate "sampled
    * into training" with an unrelated earlier decision). */
  val DsirSalt = 15485863L

  /** DSIR's resampling step — the second half of the published algorithm:
    * sample k documents without replacement with probability ∝ exp(log w)
    * via the Gumbel-top-k trick (key = log w + G, G ~ Gumbel(0,1); the
    * top-k keys are exactly a weighted sample without replacement). The
    * Gumbel variate is DETERMINISTIC: G = −ln(−ln(u)) with u = (h + 0.5)
    * / 10000 from the engine's integer hash of (doc_id + salt) — so
    * membership is engine/cluster/run-independent (the x21/x22
    * reproducibility contract), yet distributed Gumbel(0,1) over the id
    * space. Both engines rank on the ROUNDED key with doc_id tiebreak
    * (the x49 determinism discipline).
    *
    * Scale: x50's chain plus one map-only key projection and a
    * TakeOrderedAndProject — no new shuffle class. */
  def dsirResample(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    dsirResampleOf(docs(s, dir), dsirTarget, DsirSampleK)
  }

  /** Library form over any (doc_id, text, + target inputs) frame. */
  private[graft] def dsirResampleOf(corpus: DataFrame, target: Column, k: Int): DataFrame = {
    val u = (Sampling.hashBp(DsirSalt).cast("double") + 0.5) / Sampling.Bp.toDouble
    dsirWeightsOf(corpus, target)
      .select(col("doc_id"), col("log_weight"),
        round(col("log_weight") + -log(-log(u)), 4).as("sel_key"))
      .orderBy(col("sel_key").desc, col("doc_id"))
      .limit(k)
      .orderBy(col("sel_key").desc, col("doc_id"))
  }

  /** The Gumbel-top-k SELECT over the `w` weight CTE — shared verbatim by
    * x50b and x53 (whose only difference is the relation `w` is built
    * from). */
  private def dsirSampleSql: String =
    s"""SELECT doc_id, log_weight,
         round(log_weight + -ln(-ln((CAST(${Sampling.hashBpSql(DsirSalt)} AS DOUBLE) + 0.5)
           / ${Sampling.Bp}.0)), 4) AS sel_key
       FROM w
       ORDER BY sel_key DESC, doc_id LIMIT $DsirSampleK"""

  private val x50bSql = s"${dsirCtes()} $dsirSampleSql"

  // ---------------------------------------------------------------- x51
  /** Gopher rule thresholds (Rae et al. 2021, appendix A1.1), except the
    * stopword lexicon which is the engine's [[TextStats.Stopwords]] —
    * measured 2026-08-13: the paper's own 8-word list {the, be, to, of,
    * and, that, have, with} shares only "the" with this corpus's 31-word
    * vocabulary, so ≥2-distinct would vacuously fail every doc; the
    * engine list keeps the rule live (fails ~37%). Conversely the
    * mean-word-length, symbol-ratio and alpha-word rules are
    * corpus-VACUOUS here (synthetic all-alpha single-line text passes
    * all three by construction) — kept at published thresholds and each
    * proven to fire on planted fixtures in SelectionSpec. */
  val GopherMinTok = 50
  val GopherMaxTok = 100000
  val GopherMinMwl = 3.0
  val GopherMaxMwl = 10.0
  val GopherMaxSymbolRatio = 0.1
  val GopherMinAlphaRatio = 0.8
  val GopherMinStopwords = 2

  /** The Gopher per-document quality-rule battery: word count, mean word
    * length, symbol-to-word ratios — '#' chars per word and '...'
    * occurrences per word, EACH against the 0.1 threshold separately, as
    * Rae et al. A1.1 states it ("either") — alphabetic-word ratio,
    * distinct-stopword count — each rule a 0/1 verdict plus the
    * conjunction, so downstream can both filter on `pass_all` and
    * diagnose WHICH rule rejected (the reasons column pattern).
    * Map-only: one projection pass, no shuffle before the output sort;
    * at 100 TB this runs at scan speed. */
  def gopherRules(s: SparkSession, dir: String): DataFrame =
    gopherRulesOf(docs(s, dir))

  // The rule signals as reusable Columns over `text` — the SINGLE
  // definitions x51's per-rule verdicts AND x53's gate evaluate. The
  // pass verdicts compare the ROUNDED signals (what x51 emits), so the
  // gate and the diagnostic column can never disagree.
  private def gNTok: Column = size(toks)
  private def gMwl: Column =
    round((length(col("text")) - (gNTok - 1)).cast("double") / gNTok, 4)
  private def gHashRatio: Column = round(
    (length(col("text")) - length(regexp_replace(col("text"), "#", "")))
      .cast("double") / gNTok, 4)
  private def gEllipsisRatio: Column = round(
    ((length(col("text")) - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / lit(3))
      .cast("double") / gNTok, 4)
  private def gAlphaRatio: Column = round(
    size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") / gNTok, 4)
  private def gNStop: Column = size(array_distinct(
    filter(toks, t => t.isin(TextStats.Stopwords: _*)))).cast("int")

  /** The full-battery pass verdict as one Column — x53's gate. */
  private[graft] def gopherPassColumn: Column =
    gNTok >= GopherMinTok && gNTok <= GopherMaxTok &&
      gMwl >= GopherMinMwl && gMwl <= GopherMaxMwl &&
      gHashRatio <= GopherMaxSymbolRatio &&
      gEllipsisRatio <= GopherMaxSymbolRatio &&
      gAlphaRatio >= GopherMinAlphaRatio &&
      gNStop >= GopherMinStopwords

  /** The same verdict as a DuckDB WHERE fragment over a docs-shaped
    * relation (constants single-sourced with the Column form). */
  private[graft] def gopherPassSql: String = {
    val stop = TextStats.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""(len(string_split(text,' ')) BETWEEN $GopherMinTok AND $GopherMaxTok
       AND round(CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
         / len(string_split(text,' ')), 4) BETWEEN $GopherMinMwl AND $GopherMaxMwl
       AND round(CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
         / len(string_split(text,' ')), 4) <= $GopherMaxSymbolRatio
       AND round(CAST((length(text) - length(replace(text, '...', ''))) // 3 AS DOUBLE)
         / len(string_split(text,' ')), 4) <= $GopherMaxSymbolRatio
       AND round(CAST(len(list_filter(string_split(text,' '),
           t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
         / len(string_split(text,' ')), 4) >= $GopherMinAlphaRatio
       AND len(list_distinct(list_filter(string_split(text,' '),
         t -> list_contains([$stop], t)))) >= $GopherMinStopwords)"""
  }

  /** Library form over any (doc_id, text) frame. */
  private[graft] def gopherRulesOf(corpus: DataFrame): DataFrame = {
    val passLen = (col("n_tok") >= GopherMinTok && col("n_tok") <= GopherMaxTok)
    val passMwl = (col("mean_word_len") >= GopherMinMwl && col("mean_word_len") <= GopherMaxMwl)
    val passHash = col("hash_ratio") <= GopherMaxSymbolRatio
    val passEllipsis = col("ellipsis_ratio") <= GopherMaxSymbolRatio
    val passAlpha = col("alpha_word_ratio") >= GopherMinAlphaRatio
    val passStop = col("n_stopwords") >= GopherMinStopwords
    corpus
      .select(col("doc_id"), gNTok.cast("int").as("n_tok"), gMwl.as("mean_word_len"),
        gHashRatio.as("hash_ratio"), gEllipsisRatio.as("ellipsis_ratio"),
        gAlphaRatio.as("alpha_word_ratio"), gNStop.as("n_stopwords"))
      .select(col("*"),
        passLen.cast("int").as("pass_len"),
        passMwl.cast("int").as("pass_mwl"),
        passHash.cast("int").as("pass_hash"),
        passEllipsis.cast("int").as("pass_ellipsis"),
        passAlpha.cast("int").as("pass_alpha"),
        passStop.cast("int").as("pass_stop"),
        (passLen && passMwl && passHash && passEllipsis && passAlpha && passStop)
          .cast("int").as("pass_all"))
      .orderBy("doc_id")
  }

  private val x51Sql = {
    val stop = TextStats.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH s AS (
         SELECT doc_id,
           CAST(len(string_split(text,' ')) AS INT) AS n_tok,
           round(CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
             / len(string_split(text,' ')), 4) AS mean_word_len,
           round(CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
             / len(string_split(text,' ')), 4) AS hash_ratio,
           round(CAST((length(text) - length(replace(text, '...', ''))) // 3 AS DOUBLE)
             / len(string_split(text,' ')), 4) AS ellipsis_ratio,
           round(CAST(len(list_filter(string_split(text,' '),
               t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
             / len(string_split(text,' ')), 4) AS alpha_word_ratio,
           CAST(len(list_distinct(list_filter(string_split(text,' '),
             t -> list_contains([$stop], t)))) AS INT) AS n_stopwords
         FROM documents)
       SELECT doc_id, n_tok, mean_word_len, hash_ratio, ellipsis_ratio,
         alpha_word_ratio, n_stopwords,
         CAST(n_tok BETWEEN $GopherMinTok AND $GopherMaxTok AS INT) AS pass_len,
         CAST(mean_word_len BETWEEN $GopherMinMwl AND $GopherMaxMwl AS INT) AS pass_mwl,
         CAST(hash_ratio <= $GopherMaxSymbolRatio AS INT) AS pass_hash,
         CAST(ellipsis_ratio <= $GopherMaxSymbolRatio AS INT) AS pass_ellipsis,
         CAST(alpha_word_ratio >= $GopherMinAlphaRatio AS INT) AS pass_alpha,
         CAST(n_stopwords >= $GopherMinStopwords AS INT) AS pass_stop,
         CAST(n_tok BETWEEN $GopherMinTok AND $GopherMaxTok
           AND mean_word_len BETWEEN $GopherMinMwl AND $GopherMaxMwl
           AND hash_ratio <= $GopherMaxSymbolRatio
           AND ellipsis_ratio <= $GopherMaxSymbolRatio
           AND alpha_word_ratio >= $GopherMinAlphaRatio
           AND n_stopwords >= $GopherMinStopwords AS INT) AS pass_all
       FROM s ORDER BY doc_id"""
  }

  // ---------------------------------------------------------------- x53
  /** Composed selection pipeline: Gopher gate → DSIR weights → Gumbel
    * top-k — the "filtered importance resampling" flow production
    * selection runs (rule-filter first, THEN model the survivors). The
    * composition is semantic, not just sequenced: the DSIR histograms
    * are trained on the GATED corpus, so both the raw and target models
    * differ from x50's and so do the weights — SelectionSpec pins that
    * the selected set genuinely differs from x50b's whole-corpus sample,
    * and that every selected doc passes the gate. All fragments are
    * single-sourced: the gate is [[gopherPassColumn]]/[[gopherPassSql]]
    * (x51's constants), the chain is [[dsirCtes]] re-rooted at the gated
    * relation, the sampling key is x50b's.
    *
    * Scale: the gate is a map-only predicate fused into the scan
    * (filter pushdown — no materialization of the gated corpus), and
    * everything downstream is x50/x50b's broadcast-histogram shape. */
  def selectionPipeline(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    dsirResampleOf(docs(s, dir).filter(gopherPassColumn), dsirTarget, DsirSampleK)
  }

  private val x53Sql =
    s"""${dsirCtes("gated", s"gated AS (SELECT * FROM documents WHERE $gopherPassSql),")}
       $dsirSampleSql"""

  // ---------------------------------------------------------------- x64
  /** Hashed-feature buckets of the x64 classifier. Deliberately a
    * different size from [[DsirBuckets]] (512 vs 256) so the two
    * feature spaces cannot be confused; hash collisions are part of the
    * fastText design (Joulin et al. 2016), not a defect. */
  val ClfBuckets = 512
  /** Keep threshold in weight milli-units per token: keep ⇔
    * sumw > threshold · n, evaluated in INTEGER arithmetic so the
    * boundary decision is engine-exact (never a float comparison). */
  val ClfThresholdMilli = 50L

  /** Pinned integer weight (milli-units, range [-1000, 1000]) of hash
    * bucket `b` — derived from the bucket id by the engine's Knuth
    * spread, so any SQL engine re-derives the whole weight table from
    * the formula (the oracle does exactly that; the Spark side inlines
    * the 512 values as a literal array, which is also the deployment
    * reality — classifier weights ship as an artifact). */
  private[graft] def clfWeight(b: Long): Long =
    (((b + 1L) * HashConstants.Knuth) % HashConstants.HashPrime) % 2001L - 1000L

  /** x64 — model-based quality filtering in the fastText shape (Joulin
    * et al. 2016, "Bag of Tricks for Efficient Text Classification"; the
    * filter class used by GPT-3/LLaMA-style "quality classifier" stages):
    * a linear model over hashed bag-of-words features, applied as pure
    * INFERENCE — score = w · φ(doc) / n_tokens, keep = score > τ.
    *
    * DISCLOSED DEVIATION: the weights are pinned (hash-derived, formula
    * above), not trained — the container has no labeled corpus and a
    * trained float model would be engine-irreproducible anyway. The
    * OPERATOR is the deployment-side artifact: hashing, lookup,
    * accumulation, thresholding — all integer-exact, full DuckDB oracle.
    * Swapping real trained weights in is a constant-table change.
    *
    * Scale: the ideal 100 TB shape — map-only (the weight table is a
    * 4 KB literal riding the closure; no join, no shuffle, no explode);
    * the per-row work is one codegen'd [[graft.functions.TokenHash]] +
    * array lookup per token inside a single HOF fold. The output sort is
    * oracle-facing only. */
  /** NULL text reads as the empty doc on BOTH engines (the x56
    * coalesce discipline): Spark's split(NULL) would keep the row with
    * NULL score while DuckDB's unnest(string_split(NULL)) emits no
    * token rows and an inner join would DROP the doc — divergent row
    * counts the moment the corpus gains a null. */
  private val clfToks = split(coalesce(col("text"), lit("")), " ")

  /** Single-sourced classifier accumulation over the `text` column:
    * Σ_tok weights[token_hash(tok) mod B] for ANY weight table —
    * x64's pinned table and x64b's fitted one share this fold, so the
    * scoring arithmetic cannot drift between them. Requires
    * [[graft.functions.GraftFunctions.register]] on the session that
    * ANALYZES the expression (x64/x64b and the ingest edge all do). */
  private def clfSumwOf(weights: Seq[Long]): Column =
    aggregate(clfToks, lit(0L), (acc, t) =>
      acc + element_at(typedLit(weights),
        (call_function("token_hash", t) % ClfBuckets).cast("int") + 1))

  private def clfSumw: Column =
    clfSumwOf((0L until ClfBuckets.toLong).map(clfWeight))

  /** Shared scoring projection over (doc_id, n_tokens, sumw): the
    * 6-decimal integer half-away-from-zero logit (numerator scale =
    * 2·(weight unit per micro), i.e. 2000 for milli-unit weights, 2 for
    * micro-unit) and the keep threshold `sumw > thresholdPerTok · n`.
    * One copy of the rounding trick — x64 and x64b both project through
    * it (round-12 review: the hand-kept second copy is the drift risk). */
  private def clfScored(scored: DataFrame, numeratorScale: Long,
      thresholdPerTok: Long): DataFrame = {
    val n = col("n_tokens")
    val mag = floor((abs(col("sumw")) * lit(numeratorScale) + n) / (n * lit(2L)))
      .cast("long")
    scored.select(col("doc_id"), col("n_tokens"),
      ((signum(col("sumw")).cast("long") * mag).cast("double") / lit(1000000.0))
        .as("logit"),
      (col("sumw") > lit(thresholdPerTok) * col("n_tokens")).as("keep"))
      .orderBy("doc_id")
  }

  /** The x64 keep decision as a stateless per-row predicate over a
    * docs-shaped frame — the form [[graft.streaming.StreamingJobs
    * .ingestAdmit]]'s `qualityGate` hook takes, so the classifier tier
    * runs at the ingestion edge with batch ≡ stream by construction
    * (same Column, same integer threshold; no state, no shuffle). */
  def classifierKeepColumn: Column =
    clfSumw > lit(ClfThresholdMilli) * size(clfToks).cast("long")

  private[graft] def classifierQualityOf(corpus: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // 6-decimal logit via INTEGER half-away-from-zero rounding of the
    // exact rational sumw/(1000·n): round(x,6) on the double is NOT
    // engine-exact at decimal-half boundaries (Spark rounds the decimal
    // string, DuckDB the binary value — measured divergence at
    // 1041/16000). |micro| = floor((|sumw|·2000 + n) / (2n)) is exact in
    // both engines: operands < 2^53 and a rational with denominator
    // 2n ≤ 2·10^5 is never within a double ulp of an integer unless it
    // IS one, so floor(double-division) = true floor. (The floor lives
    // in [[clfScored]], shared with x64b.)
    clfScored(
      corpus.select(col("doc_id"), size(clfToks).cast("long").as("n_tokens"),
        clfSumw.as("sumw")),
      numeratorScale = 2000L, thresholdPerTok = ClfThresholdMilli)
  }

  def classifierQuality(s: SparkSession, dir: String): DataFrame =
    classifierQualityOf(docs(s, dir))

  /** The x64 pinned-weight scoring chain, ending in `sw(doc_id, sumw)`
    * beside `t(doc_id, t)` — single-sourced for x64's oracle AND the
    * x91 attributes sidecar, so the sidecar's `clf_keep` can never
    * drift from the registered classifier. */
  private[pipeline] lazy val clfPinnedScoreCtes = {
    import HashConstants.{HashPrime, Knuth}
    s"""t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
              FROM documents),
       tok AS (SELECT doc_id, unnest(t) AS tok FROM t),
       hb AS (SELECT doc_id,
                (((${rollFoldSql("tok")}) * $Knuth) % $HashPrime) % $ClfBuckets AS b
              FROM tok),
       sw AS (SELECT doc_id,
                sum((((b + 1) * $Knuth) % $HashPrime) % 2001 - 1000) AS sumw
              FROM hb GROUP BY doc_id)"""
  }

  private lazy val x64Sql =
    s"""WITH $clfPinnedScoreCtes
       SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
         CAST(sign(sumw) AS BIGINT)
           * CAST(floor((abs(sumw) * 2000 + len(t.t)) / (2 * len(t.t))) AS BIGINT)
           / 1000000.0 AS logit,
         sumw > $ClfThresholdMilli * len(t.t) AS keep
       FROM t JOIN sw USING (doc_id)
       ORDER BY doc_id"""

  // --------------------------------------------------------------- x64b
  /** Weight scale of the fitted classifier: micro-units — each bucket
    * weight is a per-million token-frequency difference between
    * classes, so per-token scores live in [-1e6, 1e6]. */
  val ClfFitScale = 1000000L

  /** Closed-form-FITTED weights for the x64 architecture (the r11
    * verdict's ask): weight(b) = per-million frequency of bucket b
    * among tokens of GOOD docs minus its per-million frequency among
    * tokens of BAD docs — the class-centroid difference over hashed
    * bag-of-words features, the classic closed-form linear fit (a
    * Rocchio/naive-Bayes-style classifier; no iterative training). The
    * label is one the engine already computes: x51's Gopher `pass_all`
    * ([[gopherPassColumn]], single-sourced — NULL text fails the gate
    * on both engines). All arithmetic is non-negative BIGINT with floor
    * division, so any SQL engine re-derives the identical table and the
    * query keeps a full oracle.
    *
    * Scale shape: the fit is ONE corpus pass (token explode → 512-row
    * (bucket, class) partial+final agg) whose 512-long result is a
    * bounded driver collect, memoized per corpus snapshot exactly like
    * the IVF/PQ codebooks ([[Ivf.memoModel]]) — an index-build
    * artifact, built once and shipped to inference as a literal. An
    * absent class (all-good or all-bad corpus) zeroes its term rather
    * than dividing by zero. */
  private[graft] def clfFitWeights(corpus: DataFrame): Array[Long] =
    Ivf.memoModel(corpus, "clffit") {
      // The gopher label is computed on a PER-DOC frame and re-attached
      // to the exploded token rows by doc_id, NOT projected alongside
      // the explode: in the single-projection form the optimizer
      // collapses the label into the post-Generate projection, where
      // the whole rule battery (two splits + two regex HOF filters per
      // rule) re-evaluates PER TOKEN — measured 7.1 s vs 0.4 s for the
      // same pass at sf0.1 (~700× redundant work per doc). The join is
      // a per-doc (doc_id, 0/1) side — AQE broadcasts it at small
      // scale; at 100 TB it is a plain equi-join, still paying the
      // label once per doc instead of once per token.
      val good = corpus.select(col("doc_id"),
        when(gopherPassColumn, 1L).otherwise(0L).as("good"))
      val cnt = corpus
        .select(col("doc_id"), explode(clfToks).as("tok"))
        .select(col("doc_id"),
          (call_function("token_hash", col("tok")) % ClfBuckets).as("b"))
        .join(good, "doc_id")
        .groupBy("b")
        .agg(sum(col("good")).as("cg"), sum(lit(1L) - col("good")).as("cb"))
        .collect()
      val tg = cnt.map(_.getLong(1)).sum
      val tb = cnt.map(_.getLong(2)).sum
      val w = Array.fill(ClfBuckets)(0L)
      cnt.foreach { r =>
        val b = r.getLong(0).toInt
        val g = if (tg > 0) r.getLong(1) * ClfFitScale / tg else 0L
        val bd = if (tb > 0) r.getLong(2) * ClfFitScale / tb else 0L
        w(b) = g - bd
      }
      w
    }

  /** x64b — x64's inference architecture with the placeholder weights
    * replaced by [[clfFitWeights]]: score = Σ_tok w[hash(tok) mod B],
    * logit = sumw/(1e6·n) (6-decimal integer half-up rounding — the
    * x64 exactness argument verbatim, numerator scaled by 2 instead of
    * 2000 because the weights are micro- not milli-units), keep ⇔
    * sumw > 0 (positive = the doc's token mass is more good-like than
    * bad-like — the natural threshold of a frequency-difference model).
    * DISCLOSED: fit and inference run over the same corpus (the query
    * shows the full train+deploy cycle; a deployment fits on a labeled
    * sample and ships the table — which is exactly the memoized driver
    * array). SelectionSpec shows the fitted gate separates planted and
    * real good/bad docs far better than chance; the oracle re-derives
    * the weights in SQL and stays hash-exact. */
  private[graft] def classifierFitQualityOf(corpus: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    clfScored(
      corpus.select(col("doc_id"), size(clfToks).cast("long").as("n_tokens"),
        clfSumwOf(clfFitWeights(corpus).toSeq).as("sumw")),
      numeratorScale = 2L, thresholdPerTok = 0L)
  }

  def classifierFitQuality(s: SparkSession, dir: String): DataFrame =
    classifierFitQualityOf(docs(s, dir))

  /** The x64b keep decision as a stateless per-row predicate FIT on a
    * reference corpus — the ingest-edge form of the production cycle:
    * fit the table on the curated corpus, ship it, gate arrivals with
    * pure inference (the same [[graft.streaming.StreamingJobs
    * .ingestAdmit]] `qualityGate` hook x64's pinned column takes, so
    * batch ≡ stream by construction; StreamingSpec gates it). The fit
    * is one bounded collect on the REFERENCE — the stream never pays
    * it per batch (memoized for file-backed references). */
  def classifierFitKeepColumn(reference: DataFrame): Column = {
    graft.functions.GraftFunctions.register(reference.sparkSession)
    clfSumwOf(clfFitWeights(reference).toSeq) > lit(0L)
  }

  /** The x64b fit-and-score chain (tokenize → hash buckets → class
    * frequencies → fitted weights → per-doc sumw), ending in
    * `sw(doc_id, sumw)` beside `t(doc_id, t, good)` — single-sourced
    * for x64b's scoring oracle AND x90's calibration oracle, so the
    * report can never drift from the classifier it evaluates. */
  private lazy val clfFitScoreCtes = {
    import HashConstants.{HashPrime, Knuth}
    s"""t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t,
              CASE WHEN $gopherPassSql THEN 1 ELSE 0 END AS good
            FROM documents),
       tok AS (SELECT doc_id, good, unnest(t) AS tok FROM t),
       hb AS (SELECT doc_id, good,
                (((${rollFoldSql("tok")}) * $Knuth) % $HashPrime) % $ClfBuckets AS b
              FROM tok),
       cnt AS (SELECT b, CAST(sum(good) AS BIGINT) AS cg,
                 CAST(sum(1 - good) AS BIGINT) AS cb
               FROM hb GROUP BY b),
       tot AS (SELECT CAST(sum(cg) AS BIGINT) AS tg,
                 CAST(sum(cb) AS BIGINT) AS tb FROM cnt),
       w AS (SELECT b,
               (CASE WHEN tg > 0 THEN (cg * $ClfFitScale) // tg ELSE 0 END)
             - (CASE WHEN tb > 0 THEN (cb * $ClfFitScale) // tb ELSE 0 END) AS w
             FROM cnt, tot),
       sw AS (SELECT hb.doc_id, CAST(sum(w.w) AS BIGINT) AS sumw
              FROM hb JOIN w USING (b) GROUP BY hb.doc_id)"""
  }

  private lazy val x64bSql =
    s"""WITH $clfFitScoreCtes
       SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
         CAST(sign(sumw) AS BIGINT)
           * CAST(floor((abs(sumw) * 2 + len(t.t)) / (2 * len(t.t))) AS BIGINT)
           / 1000000.0 AS logit,
         sumw > 0 AS keep
       FROM t JOIN sw USING (doc_id)
       ORDER BY doc_id"""

  // ---------------------------------------------------------------- x90
  /** Calibration bin width in logit micro-units: 100 fixed-width bins
    * over the [-1e6, 1e6] score range (bin = (micro+10⁶) div 2·10⁴,
    * top edge clamped into bin 99) — fine enough to resolve a
    * frequency-difference model whose mass sits near zero, still a
    * bounded ≤ 100-group agg at any corpus size. */
  val ClfCalBinMicro = 20000L

  /** x90 — classifier calibration and precision/recall report: the
    * evaluation step every deployed quality classifier ships with
    * (fastText-gate practice; DCLM and FineWeb-Edu publish exactly
    * this table for their filters). Per fixed-width score bin of x64b's fitted
    * logit: document count, Gopher-pass count and rate (the
    * CALIBRATION curve — a healthy model's rate rises with the bin),
    * plus cumulative-from-the-top precision and recall treating x51
    * `pass_all` as truth — the operating points a threshold choice
    * trades between.
    *
    * All integer: micro-logit = sign·⌊(|sumw|·2+n)/2n⌋ (x64b's exact
    * rounding verbatim), fixed-width bins, rates in basis points by
    * BIGINT floor division. The per-bin agg is ≤ 100 groups at any
    * corpus size; the cumulative window orders those ≤ 100 rows.
    * DISCLOSED like x64b: fit and evaluation share the corpus here —
    * a deployment evaluates on a held-out slice (x14's hash split
    * composes for that).
    *
    * Scale: x64b's one-pass scoring chain (the fit table is the
    * memoized driver array) + a 10-group partial+final agg + a
    * 10-row window. */
  def classifierCalibration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val corpus = docs(s, dir)
    val scored = corpus.select(col("doc_id"),
        when(gopherPassColumn, 1L).otherwise(0L).as("good"),
        size(clfToks).cast("long").as("n"),
        clfSumwOf(clfFitWeights(corpus).toSeq).as("sumw"))
      .withColumn("micro", expr(
        "CAST(sign(sumw) AS BIGINT) * CAST(floor((abs(sumw) * 2 + n) / (2 * n)) AS BIGINT)"))
      .withColumn("bin",
        expr(s"least((micro + 1000000) div $ClfCalBinMicro, 99)"))
    val g = scored.groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("good").as("n_good"))
    val tot = g.agg(sum("n_docs").as("td"), sum("n_good").as("tg"))
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    g.withColumn("cum_docs", sum("n_docs").over(w))
      .withColumn("cum_good", sum("n_good").over(w))
      .crossJoin(broadcast(tot))
      .select(col("bin"),
        expr(s"bin * $ClfCalBinMicro - 1000000").as("lo_micro"),
        col("n_docs"), col("n_good"),
        expr("(n_good * 10000) div n_docs").as("rate_bp"),
        col("cum_docs"), col("cum_good"),
        expr("(cum_good * 10000) div cum_docs").as("precision_bp"),
        expr("CASE WHEN tg > 0 THEN (cum_good * 10000) div tg ELSE 0 END")
          .as("recall_bp"))
      .orderBy("bin")
  }

  private lazy val x90Sql =
    s"""WITH $clfFitScoreCtes,
       mic AS (SELECT t.doc_id, t.good,
                 CAST(sign(sumw) AS BIGINT)
                   * CAST(floor((abs(sumw) * 2 + len(t.t)) / (2 * len(t.t)))
                       AS BIGINT) AS micro
               FROM t JOIN sw USING (doc_id)),
       bs AS (SELECT least((micro + 1000000) // $ClfCalBinMicro, 99) AS bin,
                good FROM mic),
       g AS (SELECT bin, count(*) AS n_docs,
               CAST(sum(good) AS BIGINT) AS n_good
             FROM bs GROUP BY bin),
       c AS (SELECT *,
               CAST(sum(n_docs) OVER (ORDER BY bin DESC) AS BIGINT) AS cum_docs,
               CAST(sum(n_good) OVER (ORDER BY bin DESC) AS BIGINT) AS cum_good
             FROM g),
       tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
                CAST(sum(n_good) AS BIGINT) AS tg FROM g)
       SELECT CAST(bin AS BIGINT) AS bin,
         CAST(bin * $ClfCalBinMicro - 1000000 AS BIGINT) AS lo_micro,
         CAST(n_docs AS BIGINT) AS n_docs, n_good,
         CAST((n_good * 10000) // n_docs AS BIGINT) AS rate_bp,
         cum_docs, cum_good,
         CAST((cum_good * 10000) // cum_docs AS BIGINT) AS precision_bp,
         CAST(CASE WHEN tg > 0 THEN (cum_good * 10000) // tg ELSE 0 END
           AS BIGINT) AS recall_bp
       FROM c CROSS JOIN tt ORDER BY bin"""

  // --------------------------------------------------------------- x104
  /** RETRO chunks this many whitespace tokens long (the paper uses 64
    * BERT tokens; scaled to this corpus's 35–80-token docs so every
    * doc yields 2–4 chunks and cross-document neighbors exist). */
  val RetroChunkLen = 20
  /** A token generates candidates only if it appears in at most this
    * many chunks (the x11 df-cap discipline — hot tokens pair
    * everything with everything and carry no signal). */
  val RetroDfCap = 30L
  /** Neighbors retrieved per chunk (RETRO uses k=2 at training). */
  val RetroTopK = 2

  /** x104 — RETRO-style chunk-neighbor retrieval (Borgeaud et al.,
    * ICML 2022): split every document into fixed-length chunks and
    * retrieve, for each chunk, its top-k nearest neighbor chunks from
    * OTHER documents — the retrieval-augmented-pretraining preprocessing
    * step, including the paper's two signature rules: neighbors from
    * the SAME document are excluded (trivial self-retrieval teaches
    * copying), and each neighbor reports whether its CONTINUATION chunk
    * exists (RETRO prepends neighbor+continuation so the model sees
    * what follows the match).
    *
    * Disclosed stand-in: the paper ranks by L2 over frozen-BERT chunk
    * embeddings; with no pretrained encoder in scope the metric here is
    * exact token-set Jaccard at chunk grain — the same substitution
    * x43 discloses for SemDeDup, and a constant swap if embeddings
    * arrive. Candidates come from a df-capped posting self-join (the
    * x11/B28 discipline: a pair must share a sub-[[RetroDfCap]]-df
    * token), so no chunk-level corpus product ever plans; scoring uses
    * the native two-pointer `set_overlap` on sorted distinct arrays
    * (the Dedup verify-stage lesson: array_intersect costs ~3 s per
    * evaluation at sf0.1). Continuation existence is pure arithmetic
    * (nbr_win + 1 < its doc's chunk count) — no extra join.
    *
    * Scale: chunking is a map-only generator explode; postings/df are
    * (chunk, tok)-keyed partial+final aggs; candidates are equi-joins
    * on tok with the df cap bounding fan-out; the rank window
    * partitions on (doc_id, win_id) — never global. The checkpointed
    * chunk frame feeds terms and both scoring sides from ONE corpus
    * scan (PlanSpec-gated). */
  def retroNeighbors(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import org.apache.spark.sql.expressions.Window
    val ch = Checkpoints.stable(
      docs(s, dir)
        .select(col("doc_id"), split(coalesce(col("text"), lit("")), " ").as("t"))
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0), size(col("t")) - 1, lit(RetroChunkLen)))
            .as("off"))
        .select(col("doc_id"),
          expr(s"CAST(off div $RetroChunkLen AS BIGINT)").as("win_id"),
          array_sort(array_distinct(
            slice(col("t"), col("off") + 1, lit(RetroChunkLen)))).as("keys"),
          expr(s"CAST((size(t) + ${RetroChunkLen - 1}) div $RetroChunkLen AS BIGINT)")
            .as("n_chunks")))
    val terms = ch.select(col("doc_id"), col("win_id"),
      explode(col("keys")).as("tok"))
    val dfc = terms.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") <= RetroDfCap)
    val rare = terms.join(dfc.select("tok"), "tok")
    val cand = rare.as("a").join(rare.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("a.win_id").as("win_id"),
        col("b.doc_id").as("nbr_doc"), col("b.win_id").as("nbr_win"))
      .distinct()
    val qs = ch.select(col("doc_id"), col("win_id"), col("keys").as("ka"))
    val ns = ch.select(col("doc_id").as("nbr_doc"), col("win_id").as("nbr_win"),
      col("keys").as("kb"), col("n_chunks").as("nbr_chunks"))
    val w = Window.partitionBy("doc_id", "win_id")
      .orderBy(col("jac").desc, col("nbr_doc"), col("nbr_win"))
    cand.join(qs, Seq("doc_id", "win_id")).join(ns, Seq("nbr_doc", "nbr_win"))
      .withColumn("shared", call_function("set_overlap", col("ka"), col("kb")))
      .withColumn("na", size(col("ka")).cast("long"))
      .withColumn("nb", size(col("kb")).cast("long"))
      .withColumn("jac", round(col("shared").cast("double") /
        (col("na") + col("nb") - col("shared")), 4))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= RetroTopK)
      .select(col("doc_id"), col("win_id"), col("rn"), col("nbr_doc"),
        col("nbr_win"), col("shared"), col("jac"),
        (col("nbr_win") + 1 < col("nbr_chunks")).as("has_cont"))
      .orderBy("doc_id", "win_id", "rn")
  }

  private lazy val x104Sql =
    s"""WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
           FROM documents),
       ch AS (SELECT doc_id, CAST(off // $RetroChunkLen AS BIGINT) AS win_id,
                list_distinct(t[(off + 1):(off + $RetroChunkLen)]) AS keys,
                CAST((len(t) + ${RetroChunkLen - 1}) // $RetroChunkLen AS BIGINT)
                  AS n_chunks
              FROM t, unnest(generate_series(0, len(t) - 1, $RetroChunkLen))
                u(off)),
       terms AS (SELECT doc_id, win_id, unnest(keys) AS tok FROM ch),
       dfc AS (SELECT tok FROM (SELECT tok, count(*) AS df FROM terms
                                GROUP BY tok)
               WHERE df <= $RetroDfCap),
       rare AS (SELECT tm.* FROM terms tm JOIN dfc USING (tok)),
       cand AS (SELECT DISTINCT a.doc_id, a.win_id,
                  b.doc_id AS nbr_doc, b.win_id AS nbr_win
                FROM rare a JOIN rare b
                  ON a.tok = b.tok AND a.doc_id <> b.doc_id),
       sc AS (SELECT c.doc_id, c.win_id, c.nbr_doc, c.nbr_win,
                CAST(len(list_intersect(x.keys, y.keys)) AS BIGINT) AS shared,
                CAST(len(x.keys) AS BIGINT) AS na,
                CAST(len(y.keys) AS BIGINT) AS nb,
                y.n_chunks AS nbr_chunks
              FROM cand c
                JOIN ch x ON c.doc_id = x.doc_id AND c.win_id = x.win_id
                JOIN ch y ON c.nbr_doc = y.doc_id AND c.nbr_win = y.win_id),
       j AS (SELECT *, round(CAST(shared AS DOUBLE) / (na + nb - shared), 4)
                    AS jac
             FROM sc),
       r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id, win_id
               ORDER BY jac DESC, nbr_doc, nbr_win) AS BIGINT) AS rn
             FROM j)
       SELECT doc_id, win_id, rn, nbr_doc, nbr_win, shared, jac,
         nbr_win + 1 < nbr_chunks AS has_cont
       FROM r WHERE rn <= $RetroTopK
       ORDER BY doc_id, win_id, rn"""

  // ---------------------------------------------------------------- x139
  /** x139 — incremental BM25 INDEX-STATS maintenance: merge a batch's
    * retrieval statistics into the standing (term → df) table plus the
    * (n_docs, sumdl) scalars without re-reading the old corpus — the
    * x121/x129/x133 append-only discipline applied to the FOURTH kind
    * of standing artifact this engine maintains (cluster indexes,
    * perceptual-hash tables, LM tables, and now the retrieval index's
    * statistics, which x49/x49b re-derive per query today and a
    * production search tier keeps standing). All three pieces are
    * mergeable counts over DISJOINT doc sets: df(term) adds (a doc
    * contains a term in exactly one snapshot), n_docs and sumdl add —
    * one union + vocabulary-sized re-aggregate per wave, ΔN-document
    * cost, never a corpus recount.
    *
    * The artifact deliberately carries EXACT integers only — (tok, df,
    * n_docs, sumdl), no precomputed average — so a scoring job derives
    * avgdl = sumdl/n_docs in its own numeric width and reproduces
    * x49's live-computed scores bit for bit (SelectionSpec pins
    * [[bm25FromStats]] over this table against the registered x49
    * output). The oracle is a FULL RECOUNT of the whole corpus: the
    * hash match certifies merged ≡ rebuilt, the same
    * incremental-equals-full contract as the other index families. */
  def incrementalBm25Stats(newDocs: DataFrame, oldDf: DataFrame,
      oldScal: DataFrame): DataFrame = {
    val (vocab, scal) = incrementalBm25StatsParts(newDocs, oldDf, oldScal)
    vocab
      .crossJoin(broadcast(scal))
      .select(col("tok"), col("df"), col("n_docs"), col("sumdl"))
      .orderBy("tok")
  }

  /** The (vocab, scalars) PARTS of [[incrementalBm25Stats]] — the vocab
    * (tok, df) frame and the always-one-row (n_docs, sumdl) scalars,
    * BEFORE the denormalizing crossJoin. The maintenance stream commits
    * these as separate tables of one versioned artifact: the scalars
    * must survive a zero-vocab wave (e.g. a first wave of empty-text
    * docs), which the denormalized form cannot guarantee (r15 ADVICE —
    * max() recovery over zero vocab rows silently reset them). */
  def incrementalBm25StatsParts(newDocs: DataFrame, oldDf: DataFrame,
      oldScal: DataFrame): (DataFrame, DataFrame) = {
    val batchDf = newDocs.select(col("doc_id"), explode(toks).as("tok"))
      .distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val batchScal = newDocs.agg(count(lit(1)).cast("long").as("n_docs"),
      coalesce(sum(size(toks).cast("long")), lit(0L)).as("sumdl"))
    val scal = batchScal.unionByName(oldScal)
      .agg(sum("n_docs").as("n_docs"), sum("sumdl").as("sumdl"))
    (batchDf.unionByName(oldDf).groupBy("tok").agg(sum("df").as("df")), scal)
  }

  /** The registered x139's STANDING pieces — the even-doc half's
    * (tok, df) table and 1-row (n_docs, sumdl) scalars, memoized per
    * snapshot and timed as `idx_x139_old_stats` (production reads them
    * from the snapshot store, the x133 convention). */
  private[pipeline] def x139OldStats(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    Ivf.memoModel(docs(s, dir),
        "x139oldstats") {
      val even = docs(s, dir).filter(col("doc_id") % 2 === 0)
      (Checkpoints.stable(
        even.select(col("doc_id"), explode(toks).as("tok")).distinct()
          .groupBy("tok").agg(count(lit(1)).as("df"))),
        Checkpoints.stable(
          even.agg(count(lit(1)).cast("long").as("n_docs"),
            coalesce(sum(size(toks).cast("long")), lit(0L)).as("sumdl"))))
    }

  private def x139(s: SparkSession, dir: String): DataFrame = {
    val (oldDf, oldScal) = x139OldStats(s, dir)
    incrementalBm25Stats(docs(s, dir).filter(col("doc_id") % 2 === 1), oldDf, oldScal)
  }

  private val x139Sql =
    """WITH tf AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                   FROM documents),
       dfx AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
       st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sumdl
              FROM documents)
       SELECT tok, df, n_docs, sumdl FROM dfx CROSS JOIN st ORDER BY tok"""

  /** BM25 top-k scored FROM the standing stats table instead of live
    * corpus statistics — the production read path a search tier runs
    * against the x139-maintained artifact. avgdl derives as
    * sumdl/n_docs in double (dl values are integers, exact in double,
    * so this equals x49's live avg() bit for bit — SelectionSpec pins
    * the equality); df comes from the table's term rows. Postings are
    * x49's (explode filtered to the query terms), so only the statistic
    * SOURCE changes. */
  private[graft] def bm25FromStats(corpus: DataFrame, stats: DataFrame,
      terms: Seq[String], topK: Int): DataFrame = {
    val tf = corpus
      .select(col("doc_id"), size(toks).cast("double").as("dl"), explode(toks).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"), first("dl").as("dl"))
    val st = stats.filter(col("tok").isin(terms: _*))
      .select(col("tok"), col("df"), col("n_docs").cast("double").as("n_docs"),
        (col("sumdl").cast("double") / col("n_docs").cast("double")).as("avgdl"))
    tf.join(broadcast(st), Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_terms"), bm25ScoreAgg.as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
      .orderBy(col("bm25").desc, col("doc_id"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x139_incremental_bm25_stats", x139, Some(x139Sql)),
    QueryDef("x90_classifier_calibration", classifierCalibration, Some(x90Sql)),
    QueryDef("x104_retro_neighbors", retroNeighbors, Some(x104Sql)),
    QueryDef("x49_bm25_topk", bm25TopK, Some(x49Sql)),
    QueryDef("x49b_bm25_batch", bm25Batch, Some(x49bSql)),
    // Partition-pruned at-rest index read; x49's oracle verbatim (x138 discipline).
    QueryDef("x49c_bm25_indexed", bm25IndexedQuery, Some(x49Sql)),
    QueryDef("x50_dsir_weights", dsirWeights, Some(x50Sql)),
    QueryDef("x50b_dsir_resample", dsirResample, Some(x50bSql)),
    QueryDef("x51_gopher_rules", gopherRules, Some(x51Sql)),
    QueryDef("x53_selection_pipeline", selectionPipeline, Some(x53Sql)),
    QueryDef("x64_classifier_quality", classifierQuality, Some(x64Sql)),
    QueryDef("x64b_classifier_fitted", classifierFitQuality, Some(x64bSql)),
    QueryDef("x117_gate_agreement", gateAgreement, Some(x117Sql)),
    QueryDef("x124_rank_fusion", rankFusion, Some(x124Sql)))

  // ---------------------------------------------------------------- x124
  /** Competition rank (1 + count of strictly-better scores), DESCENDING,
    * NULLs last — computed from a DISTINCT-VALUE histogram so the global
    * window runs over the score's value set, never the corpus rows (the
    * scalable global-rank shape: a per-row `rank() OVER (ORDER BY …)` is
    * a single-partition sort at 100 TB, while the histogram is one
    * partial+final agg plus a window over ≤ |distinct scores| rows —
    * corpus-tiny for 4/6-decimal scores). Ties share a rank by
    * construction (the definition is value-based), so the result is
    * BIT-IDENTICAL to SQL's RANK() — which is exactly what the oracle
    * uses, cross-validating the scalable shape against the canonical
    * semantics. */
  private[pipeline] def compRankDesc(scores: DataFrame, scoreCol: String,
      out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = scores.filter(col(scoreCol).isNotNull)
      .groupBy(scoreCol).agg(count(lit(1)).as("cnt"))
    val ranked = hist.withColumn("r",
      sum("cnt").over(Window.orderBy(col(scoreCol).desc)) - col("cnt") + 1)
    val nn = scores.agg(
      sum(when(col(scoreCol).isNotNull, 1L).otherwise(0L)).as("nn"))
    scores.join(ranked.select(col(scoreCol), col("r")), Seq(scoreCol), "left")
      .crossJoin(broadcast(nn))
      .withColumn(out, coalesce(col("r"), col("nn") + 1))
      .drop("r", "nn")
  }

  /** x124 — rank-fusion quality ensemble: fuse the library's three
    * independent quality signals — the x01 heuristic score, the x64b
    * fitted-classifier logit, and the x119 context gain — by COMPETITION
    * RANK, not raw value (Borda-style rank fusion, the ensemble move
    * multi-classifier filter stacks make because the three scores live
    * on incomparable scales and rank fusion needs no calibration).
    * x117 measures whether the gates agree; x124 is what you ship when
    * they partially do: a document must rank well on several
    * uncorrelated signals to rank well overall, which is robust to any
    * single signal's failure mode (the x117 kappa table says how much
    * independence the fusion actually buys). Lower rank_sum = better.
    * Bigram-less docs rank last on the gain axis (NULLs last), rows
    * preserved. All ranks are exact integers; the fused sum is one
    * addition — engine-exact, no weights to tune. */
  def rankFusion(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val q = d.select(col("doc_id"), TextStats.qualityColumn.as("q"))
    val clf = classifierFitQualityOf(d).select(col("doc_id"), col("logit"))
    val gain = TextStats.contextGain(s, dir)
      .select(col("doc_id"), col("context_gain").as("gain"))
    val joined = q.join(clf, Seq("doc_id")).join(gain, Seq("doc_id"), "left")
    compRankDesc(compRankDesc(compRankDesc(
        joined, "q", "r_quality"), "logit", "r_clf"), "gain", "r_gain")
      .select(col("doc_id"), col("r_quality"), col("r_clf"), col("r_gain"),
        (col("r_quality") + col("r_clf") + col("r_gain")).as("rank_sum"))
      .orderBy("doc_id")
  }

  private lazy val x124Sql =
    s"""SELECT doc_id,
         CAST(rank() OVER (ORDER BY q DESC NULLS LAST) AS BIGINT) AS r_quality,
         CAST(rank() OVER (ORDER BY logit DESC NULLS LAST) AS BIGINT) AS r_clf,
         CAST(rank() OVER (ORDER BY gain DESC NULLS LAST) AS BIGINT) AS r_gain,
         CAST(rank() OVER (ORDER BY q DESC NULLS LAST)
            + rank() OVER (ORDER BY logit DESC NULLS LAST)
            + rank() OVER (ORDER BY gain DESC NULLS LAST) AS BIGINT) AS rank_sum
       FROM
         (SELECT doc_id, ${graft.streaming.IngestGate.qualitySql} AS q
          FROM documents) q
         JOIN (WITH $clfFitScoreCtes
               SELECT t.doc_id,
                 CAST(sign(sumw) AS BIGINT)
                   * CAST(floor((abs(sumw) * 2 + len(t.t)) / (2 * len(t.t))) AS BIGINT)
                   / 1000000.0 AS logit
               FROM t JOIN sw USING (doc_id)) c USING (doc_id)
         LEFT JOIN (WITH ${TextStats.contextGainCtes}
                    SELECT sc.doc_id,
                      round(sc.avg_neg_logp - sc2.avg_neg_logp2, 4) AS gain
                    FROM sc LEFT JOIN sc2 USING (doc_id)) g USING (doc_id)
       ORDER BY doc_id"""

  // ---------------------------------------------------------------- x117
  /** x117 — quality-gate agreement audit: pairwise Cohen's kappa (1960)
    * between the library's three registered quality verdicts — the x24
    * CLEAN gate (x01 quality floor + PII), the x51 Gopher rule battery,
    * and the x64b fitted classifier. The statistic every multi-filter
    * curation stack reads before composing gates (FineWeb/DCLM-style
    * ablations): raw agreement flatters gates that both pass almost
    * everything, kappa corrects for chance, so a near-zero kappa says
    * two gates that "agree 90% of the time" are in fact independent —
    * stacking them multiplies their keep rates — while a high kappa
    * says the second gate is redundant. Each verdict is the
    * SINGLE-SOURCED production expression (IngestGate.cleanCond,
    * gopherPassColumn, the x64b sumw > 0 rule), so the audit measures
    * the shipped gates, not copies.
    *
    * Integer-exact end to end: contingency cells are BIGINT counts;
    * agreement and kappa are reported in ppm by FLOOR division (Spark
    * side uses the pmod floor trick because kappa can be negative and
    * Spark `div` truncates toward zero while DuckDB `//` floors — the
    * b42 lesson). kappa_ppm = ⌊10⁶·(n·po_num − pe_num)/(n² − pe_num)⌋
    * with po_num = n11+n00 and pe_num = a₁b₁ + a₀b₀; NULL when a gate
    * is constant (n² = pe_num — kappa undefined).
    *
    * Scale shape: ONE corpus pass (the classifier sumw join is the
    * dominant cost and its weight table is the memoized clffit index
    * artifact) into a SINGLE 7-integer aggregate row; the 3-pair table
    * is constant-size arithmetic on that row. Disclosed bound: the
    * closed form multiplies n² — exact to n ≈ 3·10⁹ docs; past that a
    * deployment computes the one final scalar from the same exact
    * counts in unbounded precision (one row, no data motion). */
  def gateAgreement(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val base = d.select(col("doc_id"),
      when(graft.streaming.IngestGate.cleanCond, 1L).otherwise(0L).as("va"),
      when(gopherPassColumn, 1L).otherwise(0L).as("vb"))
    val clf = classifierFitQualityOf(d)
      .select(col("doc_id"), when(col("keep"), 1L).otherwise(0L).as("vc"))
    val c = base.join(clf, "doc_id").agg(
      count(lit(1)).as("n"),
      sum("va").as("sa"), sum("vb").as("sb"), sum("vc").as("sc"),
      sum(col("va") * col("vb")).as("nab"),
      sum(col("va") * col("vc")).as("nac"),
      sum(col("vb") * col("vc")).as("nbc"))
    def pairRow(ga: String, gb: String, s1: Column, s2: Column, n11: Column) =
      struct(lit(ga).as("gate_a"), lit(gb).as("gate_b"), n11.as("n11"),
        (s1 - n11).as("n10"), (s2 - n11).as("n01"),
        (col("n") - s1 - s2 + n11).as("n00"))
    c.select(col("n"), explode(array(
        pairRow("clean", "gopher", col("sa"), col("sb"), col("nab")),
        pairRow("clean", "classifier", col("sa"), col("sc"), col("nac")),
        pairRow("gopher", "classifier", col("sb"), col("sc"), col("nbc")))).as("p"))
      .select(col("p.gate_a"), col("p.gate_b"), col("p.n11"), col("p.n10"),
        col("p.n01"), col("p.n00"), col("n"))
      .withColumn("agree_ppm", expr("(1000000 * (n11 + n00)) div n"))
      .withColumn("pe_num", expr(
        "(n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)"))
      .withColumn("kappa_ppm", expr(
        """CASE WHEN n * n - pe_num = 0 THEN CAST(NULL AS BIGINT)
           ELSE (1000000 * (n * (n11 + n00) - pe_num)
                 - pmod(1000000 * (n * (n11 + n00) - pe_num), n * n - pe_num))
                div (n * n - pe_num) END"""))
      .select(col("gate_a"), col("gate_b"), col("n11"), col("n10"),
        col("n01"), col("n00"), col("agree_ppm"), col("kappa_ppm"))
      .orderBy("gate_a", "gate_b")
  }

  private lazy val x117Sql = {
    import graft.streaming.IngestGate
    s"""WITH $clfFitScoreCtes,
       v AS (SELECT t.doc_id,
               CASE WHEN ${IngestGate.cleanCondSql} THEN 1 ELSE 0 END AS va,
               t.good AS vb,
               CASE WHEN sw.sumw > 0 THEN 1 ELSE 0 END AS vc
             FROM t JOIN sw USING (doc_id) JOIN documents d USING (doc_id)),
       c AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(va) AS BIGINT) AS sa, CAST(sum(vb) AS BIGINT) AS sb,
               CAST(sum(vc) AS BIGINT) AS sc,
               CAST(sum(va * vb) AS BIGINT) AS nab,
               CAST(sum(va * vc) AS BIGINT) AS nac,
               CAST(sum(vb * vc) AS BIGINT) AS nbc
             FROM v),
       p AS (SELECT 'clean' AS gate_a, 'gopher' AS gate_b, nab AS n11,
               sa - nab AS n10, sb - nab AS n01, n - sa - sb + nab AS n00, n FROM c
         UNION ALL SELECT 'clean', 'classifier', nac,
               sa - nac, sc - nac, n - sa - sc + nac, n FROM c
         UNION ALL SELECT 'gopher', 'classifier', nbc,
               sb - nbc, sc - nbc, n - sb - sc + nbc, n FROM c)
       SELECT gate_a, gate_b, n11, n10, n01, n00,
         CAST((1000000 * (n11 + n00)) // n AS BIGINT) AS agree_ppm,
         CASE WHEN n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) = 0
           THEN CAST(NULL AS BIGINT)
           ELSE CAST((1000000 * (n * (n11 + n00)
                  - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))))
                // (n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
                AS BIGINT) END AS kappa_ppm
       FROM p ORDER BY gate_a, gate_b"""
  }
}
