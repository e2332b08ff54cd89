package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan shape assertions — the properties that decide whether
  * these queries survive a 100× scale-up: dimensions broadcast (no
  * shuffle for small sides), predicates and projections pushed into the
  * parquet scan, aggregates partial+final, top-k via TakeOrderedAndProject
  * rather than a global sort. A regression here passes correctness but
  * dies at scale, so it's gated in tests. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("b07: small dims join as BroadcastHashJoin, never SortMergeJoin") {
    val p = plan("b07_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "dims must not shuffle")
  }

  test("b06: filters push down to the lineitem parquet scan") {
    val p = plan("b06_filter_predicates")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity,10.0)")
      || p.contains("PushedFilters: [In(l_returnflag"), p)
  }

  test("b21: scan reads only the projected part columns (pruning)") {
    val p = plan("b21_string_funcs")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("p_retailprice") && !readSchema.contains("p_size"),
      s"unused columns must be pruned from the scan: $readSchema")
  }

  test("b12: aggregation is partial+final (map-side combine before exchange)") {
    val p = plan("b12_q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Exchange"), p)
  }

  test("b19: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("b19_global_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("b10: literal band table broadcasts (nested-loop on the small side)") {
    val p = plan("b10_range_join")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("x138: the IVF probe plans as a partition-pruned scan of the at-rest index") {
    val p = plan("x138_ann_ivf_partitioned")
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("list_id"),
      s"probe must carry partition filters on the list column:\n$p")
    assert(pf.toUpperCase.contains(" IN "),
      s"the literal probe list must prune at planning time: $pf")
  }

  test("x11c: the near-dup probe plans as a partition-pruned scan of the gram index") {
    val p = plan("x11c_ngram_indexed_probe")
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("gramb"),
      s"probe must carry partition filters on the gram-bucket column:\n$p")
    // Catalyst prints a literal membership predicate as IN below the
    // inSetConversionThreshold and INSET above it — both are
    // planning-time directory selection.
    assert(pf.toUpperCase.contains(" IN ") || pf.toUpperCase.contains(" INSET "),
      s"the literal query-gram list must prune at planning time: $pf")
  }

  test("x49c: the BM25 probe plans as a partition-pruned scan of the posting index") {
    val p = plan("x49c_bm25_indexed")
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("tok"),
      s"probe must carry partition filters on the token column:\n$p")
    assert(pf.toUpperCase.contains(" IN "),
      s"the literal term list must prune at planning time: $pf")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must stay a TakeOrderedAndProject over the pruned read:\n$p")
  }

  test("b29: query vector broadcasts; no shuffle before the top-k") {
    val p = plan("b29_cosine_topk")
    assert(p.contains("Broadcast"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("b08: fact-fact join shuffles on the join key once both sides are big") {
    // At sf0.001 AQE correctly broadcasts the small side; disable the
    // broadcast path to assert the large-scale plan shape is a key-shuffle
    // join, which is what a 100 TB orders⋈lineitem must produce.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("b08_shuffle_join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("b39: deep join tree mixes broadcast dims with shuffled fact joins") {
    // Disable auto-broadcast so only the EXPLICIT dim broadcasts remain —
    // the plan a 100 TB customer/orders/lineitem/supplier must produce.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("b39_q5_shape")
      assert(p.contains("BroadcastHashJoin"), s"nation⋈region dims must broadcast:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"fact⋈fact joins must shuffle on their keys:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("b38: filters push into all three scans of the Q3-shape join") {
    val p = plan("b38_q3_shape")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("LessThan(o_orderdate") || p.contains("o_orderdate"), p)
    assert(p.contains("GreaterThan(l_shipdate") || p.contains("l_shipdate"), p)
    assert(p.contains("TakeOrderedAndProject"), "top-10 must not globally sort")
  }

  test("x09: near-dup candidate generation is an equi-join, never a nested-loop product") {
    val p = plan("x09_embedding_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"all-pairs product over the corpus would not survive scale-up:\n$p")
  }

  test("x115: phash candidate generation is an equi-join on band buckets, never a product") {
    val p = plan("x115_image_phash_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"all-pairs image compare would not survive scale-up:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      s"candidates must come from a hash-bucket equi-join:\n$p")
  }

  test("x116: audio fp candidate generation is an equi-join on band buckets, never a product") {
    val p = plan("x116_audio_fingerprint_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"all-pairs clip compare would not survive scale-up:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      s"candidates must come from a hash-bucket equi-join:\n$p")
  }

  test("x117: agreement audit is one corpus pass into a single aggregate row — no product") {
    val p = plan("x117_gate_agreement")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"verdict join must stay equi-keyed:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"the 7-integer contingency agg must be partial+final:\n$p")
  }

  test("x118: JSD token joins are equi-joins; only the tiny source scaffold may nest") {
    val p = plan("x118_source_divergence")
    assert(!p.contains("CartesianProduct"),
      s"an unbounded product would not survive scale-up:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      s"per-pair token joins must be keyed on (source, token):\n$p")
  }

  test("x119: context gain composes the two LM chains with equi-joins only") {
    val p = plan("x119_context_gain")
    assert(!p.contains("CartesianProduct"),
      s"LM joins must stay keyed (the 1-row totals broadcast is the only nest):\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"vocabulary joins must be equi:\n$p")
  }

  test("x120: histogram is one bounded agg over the memoized label map — no product") {
    val p = plan("x120_cluster_size_histogram")
    assert(!p.contains("CartesianProduct"),
      s"only the 1-row total may broadcast-nest:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"the size histogram agg must be partial+final:\n$p")
  }

  test("x121: incremental cluster merge joins on tokens/ids, never a product") {
    val p = plan("x121_incremental_clusters")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix/cross candidate joins must stay equi-keyed:\n$p")
  }

  test("x129: incremental semantic merge joins on (band, bucket)/ids, never a product") {
    val p = plan("x129_incremental_semantic_clusters")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH candidate joins must stay equi-keyed on (band, bucket):\n$p")
  }

  test("x134: drift gate is two histogram aggs + constant-size arithmetic") {
    val p = plan("x134_ingest_drift_gate")
    assert(!p.contains("CartesianProduct"),
      s"only the 1-row totals and the 10-row histogram join may nest:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"both decile histograms must be partial+final:\n$p")
  }

  test("x135: semantic merge report joins stay keyed; only the 1-row counters nest") {
    val p = plan("x135_semantic_merge_report")
    assert(!p.contains("CartesianProduct"),
      s"cluster-keyed semi/anti joins must stay equi-keyed; 1-row broadcasts only:\n$p")
  }

  test("x132: merge report joins stay keyed; only the seven 1-row counters nest") {
    val p = plan("x132_incremental_merge_report")
    assert(!p.contains("CartesianProduct"),
      s"cluster-keyed semi/anti joins must stay equi-keyed; 1-row broadcasts only:\n$p")
  }

  test("x133: incremental LM merge is two partial+final aggs, no join at all") {
    val p = plan("x133_incremental_unigram_lm")
    assert(!p.contains("Join"), s"count merge must be union + re-agg, never a join:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"batch count and merge agg must each combine map-side:\n$p")
  }

  test("x130: spectral audio dedup candidates join on band buckets, never a product") {
    val p = plan("x130_audio_spectral_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banded candidate generation must stay equi-keyed:\n$p")
  }

  test("x131: near-gate candidate join is equi-keyed on band buckets, never a product") {
    val p = plan("x131_media_near_gate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"arrival×reference candidates must join on (band, bucket):\n$p")
  }

  test("x13: tf and df aggregations are partial+final; corpus count broadcasts") {
    val p = plan("x13_tfidf_top")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"tf and df aggs must each be map-side combinable:\n$p")
    assert(p.contains("Broadcast"), s"1-row corpus count must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x14: hash split is map-only + one aggregation exchange") {
    val p = plan("x14_hash_split")
    assert(!p.contains("Join"), s"split assignment must not join:\n$p")
    // Tree section lists each Exchange once as "+- Exchange": expect the
    // 3-group agg shuffle plus the deterministic-output sort, nothing else.
    assert("\\+- Exchange".r.findAllIn(p).size <= 2,
      s"one shuffle for the 3-group agg (plus the ordering exchange):\n$p")
  }

  test("x16: cluster pair generation joins on the token key, never a corpus product") {
    val pairs = graft.pipeline.Dedup.jaccardPairs(spark, sf)
    val p = pairs.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"),
      s"posting-list join must never degrade to a product:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      s"token self-join must be an equi-join:\n$p")
    // The only nested-loop allowed is the broadcast 1-row corpus count,
    // which appears once per self-join side in the plan tree.
    assert("\\+- BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p)
  }

  test("x37: survivor selection windows on cluster_id, never a corpus product") {
    val p = plan("x37_dedup_keep_best")
    assert(!p.contains("CartesianProduct"),
      s"pair generation / selection must never plan a product:\n$p")
    assert(p.contains("hashpartitioning(cluster_id"),
      s"the keep window must shuffle on cluster_id, not globally:\n$p")
  }

  test("x20: prefix-filter near-dup joins are equi-joins, never a corpus product") {
    val p = plan("x20_neardup_prefix")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      s"prefix self-join must be an equi-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no corpus product allowed:\n$p")
  }

  test("x21/x23: sampling decisions are map-only (one aggregation exchange)") {
    for (name <- Seq("x21_stratified_sample", "x23_mixture")) {
      val p = plan(name)
      assert(!p.contains("Join"), s"$name: sampling must not join:\n$p")
      // One partial+final agg pair with its hash exchange on lang; the
      // trailing orderBy adds a range exchange for the 5-row output. No
      // other shuffles of the corpus.
      assert("Exchange \\(\\d+\\)".r.findAllIn(p).size == 2,
        s"$name: expected only agg + output-sort exchanges:\n$p")
      assert(p.contains("hashpartitioning(lang"),
        s"$name: aggregation must shuffle on the stratum key:\n$p")
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$name: aggregation must be partial+final:\n$p")
    }
  }

  test("x41: source cap windows on the source key, no join, no single task") {
    val p = plan("x41_source_cap")
    assert(!p.contains("Join"), s"the cap needs no join:\n$p")
    assert(p.contains("hashpartitioning(source"),
      s"rank window must shuffle on the source key:\n$p")
    assert(!p.contains("SinglePartition"),
      s"per-source cap must never funnel to one task:\n$p")
  }

  test("x22: budget selection shuffles once on the stratum key, not globally") {
    val p = plan("x22_source_budget")
    assert(p.contains("hashpartitioning(source"),
      s"window must partition by source:\n$p")
    assert(!p.contains("SinglePartition"),
      s"no single-task global window allowed:\n$p")
  }

  test("x26/x29: cross-corpus and containment joins never plan a corpus product") {
    for (name <- Seq("x26_incremental_dedup", "x29_containment")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a product:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
        || p.contains("BroadcastHashJoin"),
        s"$name candidate generation must be an equi-join:\n$p")
    }
  }

  test("x31: PII redaction is map-only (no join, only the output-sort exchange)") {
    val p = plan("x31_pii_redact")
    assert(!p.contains("Join"), s"redaction must not join:\n$p")
    assert("Exchange \\(\\d+\\)".r.findAllIn(p).size == 1,
      s"only the final orderBy may shuffle:\n$p")
  }

  test("x32: quantile cut shuffles once on the stratum key") {
    val p = plan("x32_quality_quantile")
    assert(!p.contains("Join"), s"the cut needs no join:\n$p")
    assert(p.contains("hashpartitioning(lang"),
      s"window must shuffle on the language key:\n$p")
    // One window exchange on lang + the final orderBy range exchange.
    assert("Exchange \\(\\d+\\)".r.findAllIn(p).size == 2,
      s"expected only window + output-sort exchanges:\n$p")
    assert(!p.contains("SinglePartition"),
      s"per-stratum cut must never funnel to one task:\n$p")
  }

  test("x33: semantic-dedup pair generation is an equi-join, never a nested-loop product") {
    val p = plan("x33_semantic_dedup")
    assert(!p.contains("CartesianProduct"), s"no corpus product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no BNLJ:\n$p")
  }

  test("x35: eval side broadcasts; corpus shuffles only at the vec_id max-agg") {
    val p = plan("x35_semantic_decon")
    // max-over-all-eval-pairs has no equi-key, so the CORRECT plan is a
    // broadcast nested-loop against the corpus-tiny eval side — the train
    // corpus must stream through map-side, never shuffle into a product.
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"eval side must broadcast (BNLJ is the right plan here):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"a non-broadcast corpus product would not survive scale-up:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"per-vector max must combine map-side before the exchange:\n$p")
  }

  test("x36: batch side broadcasts; corpus streams map-side to the batch-id max-agg") {
    val p = plan("x36_incremental_semantic_dedup")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the micro-batch must broadcast (no equi-key for any-pair >= t):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"a non-broadcast corpus product would not survive scale-up:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"per-batch-vector max must combine map-side before the exchange:\n$p")
  }

  test("x43: semantic keep-best windows on cluster_id, pair generation stays equi-join") {
    val p = plan("x43_semantic_keep_best")
    assert(!p.contains("CartesianProduct"), s"no corpus product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no BNLJ:\n$p")
    assert(p.contains("hashpartitioning(cluster_id"),
      s"the keep window must shuffle on cluster_id:\n$p")
  }

  test("x30: hot-line set is built by partial+final aggregation, no corpus product") {
    val p = plan("x30_line_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"df aggregation must be partial+final:\n$p")
    assert(!p.contains("SinglePartition"),
      s"reassembly must stay partitioned by doc:\n$p")
  }

  test("x45: cross-corpus strip joins the hot set, no product, no single task") {
    val p = plan("x45_cross_strip")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"ref-side df aggregation must be partial+final:\n$p")
    assert(!p.contains("SinglePartition"),
      s"reassembly must stay partitioned by doc:\n$p")
  }

  test("x34: span masking is partial+final aggregation, no corpus product, no single task") {
    val p = plan("x34_span_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"shingle-df aggregation must be partial+final:\n$p")
    assert(!p.contains("SinglePartition"),
      s"reassembly must stay partitioned by doc:\n$p")
  }

  test("x44: novelty join is a key-shuffle equi-join, per-doc agg partial+final") {
    val p = plan("x44_novelty_score")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product — the ref shingle set joins on its content key:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"per-doc novelty count must be map-side combinable:\n$p")
  }

  test("x38: bigram LM joins are equi-joins on vocab keys; aggs partial+final") {
    val p = plan("x38_bigram_logprob")
    assert(!p.contains("CartesianProduct"), s"no corpus product:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"bigram/context/unigram aggs must be map-side combinable:\n$p")
    assert(p.contains("Broadcast"), s"1-row total must broadcast:\n$p")
  }

  test("x94: D4 prune — broadcast centroid join, cluster-partitioned window, no product") {
    val p = plan("x94_d4_prune")
    assert(!p.contains("CartesianProduct"),
      s"no corpus product — candidates come from the LSH graph:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the nlist-row centroid table must broadcast:\n$p")
    assert(p.contains("Window"), p)
  }

  test("x96: KN bigram LM joins are equi-joins on vocab keys; aggs partial+final") {
    val p = plan("x96_kneser_ney")
    assert(!p.contains("CartesianProduct"), s"no corpus product:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"bigram/context/continuation aggs must be map-side combinable:\n$p")
    assert(p.contains("Broadcast"), s"1-row type total must broadcast:\n$p")
  }

  test("x97: density sampling is two narrow key aggs — no pairs, no product, no window") {
    val p = plan("x97_density_sample")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"density needs bucket counts only, never pairs:\n$p")
    assert(!p.contains("Window"), s"no global or per-key window anywhere:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"bucket-size and per-vector density aggs must be partial+final:\n$p")
  }

  test("x39: intra-doc strip is one composite-key agg + doc-local reassembly") {
    val p = plan("x39_intradoc_dedup")
    // The only join is the doc_id-keyed stats left join — never a product.
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product:\n$p")
    assert(!p.contains("SinglePartition"),
      s"reassembly must stay partitioned by doc:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"first-occurrence agg must be partial+final:\n$p")
  }

  test("x40: chunking windows on doc_id, no join, no single task") {
    val p = plan("x40_content_chunks")
    assert(!p.contains("Join"), s"chunking needs no join at all:\n$p")
    assert(p.contains("hashpartitioning(doc_id"),
      s"running boundary count must key on doc_id:\n$p")
    assert(!p.contains("SinglePartition"),
      s"no global window allowed:\n$p")
  }

  test("x42: winnowing windows on doc_id, no join, no single task") {
    val p = plan("x42_winnow_fingerprints")
    assert(!p.contains("Join"), s"fingerprint selection needs no join:\n$p")
    assert(p.contains("hashpartitioning(doc_id"),
      s"frame-min and count windows must key on doc_id:\n$p")
    assert(!p.contains("SinglePartition"), s"no global window allowed:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"the distinct must be partial+final:\n$p")
  }

  test("x40b: chunk dedup aggregates on content keys, partial+final, no product") {
    val p = plan("x40b_chunk_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"per-(chunk,doc) and per-chunk roll-ups must be map-side combinable:\n$p")
  }

  test("x42c: copy verify joins candidates to token sets by key — no product, no re-sketch") {
    val p = plan("x42c_confirmed_copies")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the exact verify must stay candidate-pruned:\n$p")
    // The verify's two doc_id-keyed joins ride on the candidate pairs —
    // the full-corpus token sets must never self-join. The candidate
    // frame itself is pre-materialized (checkpoint scan), so the joins
    // visible here are the endpoint semi-restriction + the two set joins.
    assert("""\(\d+\) SortMergeJoin""".r.findAllIn(p).size +
      """\(\d+\) BroadcastHashJoin""".r.findAllIn(p).size +
      """\(\d+\) ShuffledHashJoin""".r.findAllIn(p).size >= 3,
      s"endpoint semi join + two set joins expected:\n$p")
    // The r11 plan-audit fix: token-set arrays are built for candidate
    // endpoints only. The LeftSemi restriction must sit in the plan so
    // no corpus-wide array exchange survives.
    assert(p.contains("LeftSemi"),
      s"token-set build must be semi-restricted to candidate endpoints:\n$p")
  }

  test("x40c: chunk-hash dedup shuffles carry the 8-byte hash, never chunk text") {
    val p = plan("x40c_chunk_dedup_hash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product:\n$p")
    assert(p.contains("hashpartitioning(chunk_hash"),
      s"the cross-doc dedup exchange must key on the hash:\n$p")
    assert(!p.contains("hashpartitioning(chunk_text"),
      s"no exchange may key on the chunk text:\n$p")
    // The only text-bearing exchange is the doc-local chunk assembly
    // (window on doc_id); after hashing, chunk_text must not survive
    // into any later exchange even as payload.
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"per-(hash,doc) and per-hash roll-ups must be map-side combinable:\n$p")
  }

  test("x34b: run-length windows shuffle on doc_id only, no corpus product, no single task") {
    val p = plan("x34b_span_dedup_minrun")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"shingle-df aggregation must be partial+final:\n$p")
    assert(!p.contains("SinglePartition"),
      s"gaps-and-islands windows must stay partitioned by doc:\n$p")
    assert(p.contains("hashpartitioning(doc_id"),
      s"run-length windows must key on doc_id:\n$p")
  }

  test("x46: composed pipeline plans no cartesian product and no single-partition funnel") {
    // Building the frame runs the two propagation loops (they act during
    // construction); the final frame's plan must still be shuffle-clean:
    // the only nested-loop join allowed is the broadcast eval-side scan
    // of the semantic decon tier (x35's correct plan — no equi-key
    // exists for max-over-all-pairs), and nothing may funnel the corpus
    // through one partition except the oracle-mandated final sort.
    val p = plan("x46_curate_v2")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // SinglePartition is allowed ONLY for Catalyst's injected runtime
    // bloom filters (a one-row bloom BUFFER aggregated then broadcast —
    // not corpus rows); anything else funneling into one partition is a
    // scale bug.
    val lines = p.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("SinglePartition")).foreach { case (_, i) =>
      val ctx = lines.slice(math.max(0, i - 12), i).mkString("\n")
      assert(ctx.contains("bloom_filter_agg"),
        s"single-partition exchange is not a runtime bloom filter:\n$ctx")
    }
    // Count plan NODES (the "(n) Op" detail headers) — the formatted
    // explain prints each node once in the tree and once in the details.
    val bnlj = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).size
    assert(bnlj <= 1, s"only the semantic-decon broadcast scan may nest-loop ($bnlj):\n$p")
  }

  test("x49: BM25 top-k heaps per partition; stats sides broadcast; no product") {
    val p = plan("x49_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-k cut must not globally sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"no corpus product:\n$p")
    // The only nested-loop join allowed is the broadcast 1-row (N, avgdl)
    // statistics frame.
    val bnlj = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).size
    assert(bnlj <= 1, s"only the 1-row stats frame may nest-loop ($bnlj):\n$p")
    assert(p.contains("BroadcastHashJoin"), s"the |q|-row df side must broadcast:\n$p")
  }

  test("x50: DSIR histograms broadcast; feature agg is partial+final; no product") {
    val p = plan("x50_dsir_weights")
    assert(!p.contains("CartesianProduct"), s"no corpus product:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the B-bucket histogram sides must broadcast:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"per-(doc,bucket) aggregation must be partial+final:\n$p")
    // Two 1-row total frames (tot_r × tot_t, then × the corpus) may
    // nest-loop; nothing else.
    val bnlj = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).size
    assert(bnlj <= 2, s"only the 1-row totals may nest-loop ($bnlj):\n$p")
  }

  test("x52: quantized ANN keeps b29's shape — broadcasts + top-k heap, no shuffle of the corpus") {
    val p = plan("x52_ann_sq8")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not globally sort:\n$p")
    assert(p.contains("Broadcast"), s"scale + query codes must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no corpus product:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus must stream map-side, never shuffle:\n$p")
  }

  test("x49b: batch retrieval ranks per query in parallel windows; no product") {
    val p = plan("x49b_bm25_batch")
    assert(!p.contains("CartesianProduct"), s"no corpus product:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the query table and df sides must broadcast:\n$p")
    assert(p.contains("hashpartitioning(query_id"),
      s"the rank window must partition by query_id (per-query parallel):\n$p")
    val bnlj = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).size
    assert(bnlj <= 1, s"only the 1-row stats frame may nest-loop ($bnlj):\n$p")
  }

  test("x111: the JL audit joins by key only — no product, no window") {
    val p = plan("x111_jl_distortion")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pairs come from the id-shift equi-join, never a product:\n$p")
    assert(!p.contains("Window"), s"no window anywhere:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"projection and dot sums must be partial+final:\n$p")
  }

  test("x101: matryoshka keeps b29's broadcast + heap shape at both stages") {
    val p = plan("x101_ann_matryoshka")
    assert(p.contains("TakeOrderedAndProject"),
      s"the shortlist cut must be a heap, not a global sort:\n$p")
    assert(p.contains("Broadcast"), s"the query row must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no corpus product:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus must stream map-side, never shuffle:\n$p")
  }

  test("x52b: composed IVF+SQ8 keeps the broadcast + heap shape") {
    val p = plan("x52b_ann_ivf_sq8")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not globally sort:\n$p")
    assert(p.contains("Broadcast"), s"query codes must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no corpus product:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus must stream map-side, never shuffle:\n$p")
  }

  test("x50b: resampling adds only a projection and a top-k heap to x50") {
    val p = plan("x50b_dsir_resample")
    assert(p.contains("TakeOrderedAndProject"),
      s"the Gumbel-top-k cut must not globally sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"no corpus product:\n$p")
  }

  test("x53: the gate fuses into the scan-side pipeline (no gated materialization)") {
    val p = plan("x53_selection_pipeline")
    assert(!p.contains("CartesianProduct"), s"no corpus product:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not globally sort:\n$p")
    // The Gopher predicate must appear as a Filter feeding the explode,
    // not as a separate shuffle-bounded stage.
    assert(p.contains("Filter"), s"gate predicate must be a plain filter:\n$p")
  }

  test("x54: context windowing is map-only (generator explode, no join, no hash exchange)") {
    val p = plan("x54_context_windows")
    assert(!p.contains("Join"), s"windowing must not join:\n$p")
    assert(p.contains("Generate"), s"the offset explode is a generator:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"map-only pass must not hash-shuffle; only the output sort may exchange:\n$p")
  }

  test("x100: line-lang vote is one vote agg + per-doc windows, never global") {
    val p = plan("x100_line_lang_vote")
    assert(!p.contains("Join"), s"voting must not join:\n$p")
    assert(p.contains("HashAggregate"),
      s"the (doc,pred) vote count must be partial+final:\n$p")
    // Both windows partition by doc_id — a global (empty-partition)
    // window would funnel the corpus into one task.
    assert(p.contains("hashpartitioning(doc_id"),
      s"vote windows must key on doc_id:\n$p")
    assert(!p.contains("SinglePartition"), s"no global window allowed:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x108: readability scoring is map-only (no join, no agg, no explode)") {
    val p = plan("x108_flesch_readability")
    assert(!p.contains("Join"), s"scoring must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"no aggregation anywhere:\n$p")
    assert(!p.contains("Generate"), s"words stay in per-row arrays:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"map-only pass; only the output sort may exchange:\n$p")
  }

  test("x99: the char-entropy gate is map-only (no join, no agg, no explode)") {
    val p = plan("x99_char_entropy")
    assert(!p.contains("Join"), s"the entropy fold must not join:\n$p")
    assert(!p.contains("HashAggregate"),
      s"the distinct-char fold is a per-row HOF, never an aggregation:\n$p")
    assert(!p.contains("Generate"),
      s"chars stay in per-row arrays, never exploded:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"map-only pass must not hash-shuffle; only the output sort may exchange:\n$p")
  }

  test("x51: the Gopher rule battery is map-only (no join, no hash exchange)") {
    val p = plan("x51_gopher_rules")
    assert(!p.contains("Join"), s"rule evaluation must not join:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"map-only pass must not hash-shuffle; only the output sort may exchange:\n$p")
  }

  test("x79: the C4 battery is map-only (no join, no explode, no hash exchange)") {
    val p = plan("x79_c4_rules")
    assert(!p.contains("Join"), s"line surgery must not join:\n$p")
    assert(!p.contains("Generate"),
      s"lines stay in per-row arrays (higher-order filter), never exploded:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"map-only pass must not hash-shuffle; only the output sort may exchange:\n$p")
  }

  test("x82: the Viterbi DP is expression-only over a broadcast vocabulary") {
    val p = plan("x82_unigram_viterbi")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row cost map and total ride broadcasts, never a product:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"),
      s"the DP fold is pure expressions (aggregate HOF), no UDF:\n$p")
    assert("partial".r.findAllIn(p).size >= 2,
      s"word-count and piece-mass aggs must map-side combine:\n$p")
  }

  test("x95: the EM step stays expression-only DP + vocabulary-sized aggs") {
    val p = plan("x95_unigram_viterbi_em")
    assert(!p.contains("CartesianProduct"),
      s"cost map / totals ride broadcasts, never a product:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"),
      s"DP, backtrack, and piece explode are pure expressions:\n$p")
    assert("partial".r.findAllIn(p).size >= 2,
      s"word-count and piece-count aggs must map-side combine:\n$p")
  }

  test("x56: subword counting is map-only (no join, no explode, no hash exchange)") {
    val p = plan("x56_bpe_token_count")
    assert(!p.contains("Join"), s"the nested-HOF form must not join:\n$p")
    assert(!p.contains("Generate"),
      s"per-word folds run inside one projection, not via explode:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"map-only pass must not hash-shuffle; only the output sort may exchange:\n$p")
  }

  test("x56b: subword apportionment aggregates partial+final on lang") {
    val p = plan("x56b_budget_apportion_bpe")
    assert(p.contains("partial"), s"lang agg must map-side combine:\n$p")
    assert(!p.contains("Generate"), s"no explode in the corpus pass:\n$p")
  }

  test("x54b: token windowing shuffles once on doc_id and aggregates partial+final") {
    val p = plan("x54b_token_windows")
    assert(!p.contains("CartesianProduct"), s"no product in the window chain:\n$p")
    assert(p.contains("partial"), s"(doc, win) agg must map-side combine:\n$p")
    assert(!p.contains("SinglePartition") || p.contains("bloom"),
      s"the prefix window is doc-keyed, never global:\n$p")
  }

  test("x59: PQ-ADC search scans codes map-side with a top-k heap; corpus never shuffles") {
    val p = plan("x59_ann_pq_adc")
    assert(p.contains("TakeOrderedAndProject"), s"candidate top-k must heap, not sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"no corpus product:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"ADC is table lookups on the scan side; the corpus must never shuffle:\n$p")
  }

  test("x58: repetition battery aggregates partial+final per doc; no product, no window") {
    val p = plan("x58_repetition_battery")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"signal derivation must never product the corpus:\n$p")
    assert(p.contains("partial"), s"(doc, key) aggs must map-side combine:\n$p")
    // The (count, len, gram)-max top-gram selection is an aggregation,
    // not a per-doc sort window — a corpus-wide Window would serialize.
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window"),
      s"top-gram pick must be max(struct), not a window:\n$p")
  }

  test("x58b: dup-gram coverage joins on the aggregation's own keys; no product") {
    val p = plan("x58b_dup_ngram_coverage")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"coverage must come from equi-joins on (doc_id, gram)/(doc_id, pos):\n$p")
    assert(p.contains("partial"), s"coverage aggs must map-side combine:\n$p")
  }

  test("x64: classifier inference is map-only (no join, no explode, no hash exchange)") {
    val p = plan("x64_classifier_quality")
    assert(!p.contains("Join"), s"the weight table rides the closure, never joins:\n$p")
    assert(!p.contains("Generate"),
      s"the token fold runs inside one projection, not via explode:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"map-only pass must not hash-shuffle; only the output sort may exchange:\n$p")
  }

  test("b13d/b12e: sketch-class oracles aggregate partial+final, no corpus product") {
    for (name <- Seq("b13d_hll_pinned", "b12e_histogram_percentiles",
        "b13e_cms_topk")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name: the register/bin shuffles are bounded key aggs, never a product:\n$p")
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$name: per-(group,bucket/bin) rollups must map-side combine:\n$p")
    }
  }

  test("x64b: fitted-classifier inference is map-only like x64 (fit is pre-collected)") {
    // clfFitWeights runs its one corpus pass at plan-construction time
    // (memoized bounded collect — the codebook discipline); the
    // REGISTERED plan is pure inference and must stay x64-shaped.
    val p = plan("x64b_classifier_fitted")
    assert(!p.contains("Join"), s"the fitted table rides the closure, never joins:\n$p")
    assert(!p.contains("Generate"),
      s"the token fold runs inside one projection, not via explode:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"map-only pass must not hash-shuffle; only the output sort may exchange:\n$p")
  }

  test("x10b: pinned IVF probe reads pruned lists via one broadcast of the 1-row query") {
    val p = plan("x10b_ann_ivf_pinned")
    assert(!p.contains("CartesianProduct"), s"no true product:\n$p")
    // The only nested-loop is the deliberate 1-row query-vector
    // broadcast (the b29 search discipline); assignment is the native
    // pq_encode projection, so no other join may appear.
    assert("""\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).size == 1,
      s"exactly the 1-row query broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no shuffle join anywhere in the probe:\n$p")
  }

  test("x65: BPE pair counting aggregates the vocabulary, never the corpus") {
    val p = plan("x65_bpe_pair_counts")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"pair statistics are two content-keyed aggs, no join:\n$p")
    assert(p.contains("partial"), s"word/pair aggs must map-side combine:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-K merge candidates must heap, not globally sort:\n$p")
  }

  test("x67: Bloom-gate probes are map-only — the corpus never joins or shuffles") {
    val p = plan("x67_bloom_decon")
    assert(!p.contains("Join"), s"the mask is a literal, not a join side:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"probe pass must not hash-shuffle; only the output sort may exchange:\n$p")
  }

  test("x68: batched ANN broadcasts the query block; the corpus never shuffles for scoring") {
    val p = plan("x68_ann_batch")
    assert(p.contains("Broadcast"), s"the query block must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"scoring joins must not shuffle the corpus:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the query fan-out is a broadcast nested loop, not a product:\n$p")
  }

  test("x69: normalized dedup hashes map-side and aggregates partial+final") {
    val p = plan("x69_normalized_dedup")
    assert(p.contains("partial"), s"both hash-group aggs must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"group sizes join back on hash equi-keys:\n$p")
  }

  test("x70: the corpus report is one scan of per-doc signals into a source-keyed agg") {
    val p = plan("x70_corpus_report")
    assert(p.contains("partial"), s"the source agg must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the dup-size side joins on the hash equi-key:\n$p")
    assert(!p.contains("Window"), s"counts, not windows:\n$p")
  }

  test("x71: fairness report is a map-only projection into a lang agg plus a 1-row broadcast") {
    val p = plan("x71_tokenizer_fairness")
    assert(!p.contains("Generate"),
      s"subword counting runs inside one projection, not via explode:\n$p")
    assert(p.contains("partial"), s"the lang agg must map-side combine:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row English baseline must broadcast, never shuffle the report:\n$p")
    assert(!p.contains("SortMergeJoin"), s"nothing here is big enough to SMJ:\n$p")
  }

  test("x72: the Morton key is a map-only projection + top-k, no join/shuffle") {
    val p = plan("x72_zorder_key")
    assert(p.contains("TakeOrderedAndProject"),
      s"the artifact cut must be top-k, not a global sort:\n$p")
    assert(!p.contains("Join"), s"key computation must not join:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"pure projection must not hash-shuffle:\n$p")
  }

  test("x73: epoch allocation windows the source lattice, never the corpus") {
    val p = plan("x73_epoch_alloc")
    // The corpus is touched exactly once: a partial+final agg on source.
    assert("partial".r.findAllIn(p).size >= 1 && p.contains("HashAggregate"),
      s"the corpus agg must map-side combine:\n$p")
    // The global window must sit ABOVE the aggregation (bounded input).
    // Enforced structurally: every parquet scan's direct parent in the
    // tree is a HashAggregate (in formatted output a leaf's parent is
    // the line right above it), so nothing — the Window included — can
    // consume the corpus before it is reduced to the source frame.
    assert(p.contains("Window"), s"expected the grant window:\n$p")
    val tree = p.linesIterator.takeWhile(!_.startsWith("(1)")).toVector
    tree.zipWithIndex.filter(_._1.contains("Scan parquet")).foreach {
      case (_, i) =>
        assert(i > 0 && tree(i - 1).contains("HashAggregate"),
          s"a scan is consumed by ${if (i > 0) tree(i - 1) else "?"} — " +
            s"the corpus must be reduced before any other operator:\n$p")
    }
    assert(!p.contains("CartesianProduct"),
      s"the 1-row total joins via broadcast, not a product:\n$p")
  }

  test("x86: both apportionments read the one checkpointed source agg") {
    val p = plan("x86_temperature_sampling")
    // The per-source agg is checkpointed for its two consumers: a
    // parquet scan in the registered plan means one of them rebuilt
    // the corpus subtree and the corpus would be read twice at 100 TB.
    assert(!p.contains("Scan parquet"),
      s"the corpus agg must be materialized once:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row total joins via broadcast, not a product:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"),
      s"the isqrt fixup is a pure integer CASE, no UDF:\n$p")
    assert(p.contains("Window"), s"expected the remainder-rank window:\n$p")
  }

  test("b42: retention matrix aggregates events down before any join; no window") {
    val p = plan("b42_cohort_retention")
    assert(!p.contains("Window"), s"the matrix needs no window function:\n$p")
    assert(!p.contains("CartesianProduct"), s"cells join by key:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"distinct, first-week, sizes, cells must all be partial+final:\n$p")
  }

  test("x114: the zipf head comes from a heap; windows touch 50 rows only") {
    val p = plan("x114_zipf_curve")
    assert(p.contains("TakeOrderedAndProject"),
      s"the head cut must be a heap, not a global sort:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row total joins via broadcast:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"token counts must be partial+final:\n$p")
  }

  test("x113: the growth curve scans once; windows touch only the 10-row frame") {
    val p = plan("x113_heaps_vocab_growth")
    assert(!p.contains("CartesianProduct"), s"spine joins by key:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"token-min and bucket aggs must be partial+final:\n$p")
    // Windows exist (cumsum + lag) but only above the bucket aggregation
    // — the corpus itself must never flow into a window.
    assert(p.contains("Window"), p)
  }

  test("x110: the quality sweep is one grid-keyed agg, no product, no window") {
    val p = plan("x110_quality_sweep")
    assert(!p.contains("CartesianProduct"), s"spine joins by key:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"grid cells must be partial+final:\n$p")
    assert(!p.contains("Window"), s"no window anywhere:\n$p")
  }

  test("x106: the k-anonymity audit is one QI-keyed agg pass") {
    val p = plan("x106_k_anonymity")
    assert(!p.contains("Join"), s"class sizing must not join:\n$p")
    assert(!p.contains("Window"), s"no window anywhere:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"class counts must be partial+final:\n$p")
    assert(!p.contains("SinglePartition"), s"classes stay QI-keyed:\n$p")
  }

  test("x105: the sweep fans pairs over an 18-row grid — no product, keyed aggs") {
    val p = plan("x105_threshold_sweep")
    assert(!p.contains("CartesianProduct"),
      s"candidates and spine join by key, never a product:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"grid counts must be partial+final:\n$p")
    assert(!p.contains("Window"), s"no window anywhere:\n$p")
  }

  test("x104: retro retrieval is posting equi-joins over one checkpointed chunk frame") {
    val p = plan("x104_retro_neighbors")
    assert(!p.contains("Scan parquet"),
      s"terms and both scoring sides must read the one chunk checkpoint:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates come from the df-capped posting join, never a product:\n$p")
    assert(p.contains("hashpartitioning(doc_id"),
      s"the rank window must key on (doc_id, win_id):\n$p")
    assert(!p.contains("SinglePartition"), s"no global window:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"df counts and candidate distinct must be partial+final:\n$p")
  }

  test("x107: the verification profile is one source-keyed agg pass") {
    val p = plan("x107_quality_verification")
    assert(!p.contains("Join"), s"one-pass profiling must not join:\n$p")
    assert(!p.contains("Window"), s"no window anywhere:\n$p")
    assert(p.contains("HashAggregate"),
      s"metrics must aggregate map-side first:\n$p")
    assert(!p.contains("SinglePartition"),
      s"verdicts stay source-keyed, never a global funnel:\n$p")
  }

  test("x103: bucket report is one bucket-key agg + a broadcast global max") {
    val p = plan("x103_length_buckets")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"the bucket agg must be partial+final:\n$p")
    assert(p.contains("Broadcast"), s"the 1-row global max must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the global max joins via broadcast, not a product:\n$p")
    assert(!p.contains("Window"), s"no window anywhere:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"nothing here may shuffle-join:\n$p")
  }

  test("x112: the interleave ranks per source; only the tiny index frame sorts globally") {
    val p = plan("x112_interleave_order")
    assert(p.contains("hashpartitioning(source"),
      s"the rank window must partition by source:\n$p")
    assert(p.contains("Broadcast"),
      s"the |sources|-row index frame must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row count joins via broadcast, not a product:\n$p")
  }

  test("x102b: stratified priorities window on source, never globally") {
    val p = plan("x102b_priority_stratified")
    assert(p.contains("hashpartitioning(source"),
      s"the rank window must partition by source:\n$p")
    assert(!p.contains("SinglePartition"), s"no global window:\n$p")
    assert(!p.contains("Join"), s"the draw needs no join:\n$p")
  }

  test("x102: priority sampling is map-only into one top-k heap") {
    val p = plan("x102_priority_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"the k-smallest cut must be a heap, not a global sort:\n$p")
    assert(!p.contains("Join"), s"the draw needs no join:\n$p")
    assert(!p.contains("HashAggregate"), s"no aggregation anywhere:\n$p")
    assert(!p.contains("Window"), s"no window anywhere:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"map-only before the heap; nothing may hash-shuffle:\n$p")
  }

  test("x98: both LMs read the one checkpointed token frame; scoring is equi-joins") {
    val p = plan("x98_doremi_weights")
    // The per-(doc,source,tok) counts are checkpointed for their three
    // consumers (global LM, per-source LMs, scoring) — a parquet scan
    // here means a consumer rebuilt the corpus subtree.
    assert(!p.contains("Scan parquet"),
      s"the token frame must be materialized once:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"totals join via broadcast, never a product:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"the 1-row global total and |sources|-row totals must broadcast:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 6,
      s"LM and per-source aggs must be partial+final:\n$p")
  }

  test("x87: the waterfill windows the lang frame, never the corpus") {
    val p = plan("x87_unimax_alloc")
    assert(!p.contains("Scan parquet"),
      s"the corpus agg must be materialized once for its two consumers:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 2-row totals join via broadcast, not a product:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"),
      s"the closed-form waterfill is pure integer expr, no UDF:\n$p")
    assert(p.contains("Window"), s"expected the capacity-prefix window:\n$p")
  }

  test("x89: candidates are label-cell equi-joins over checkpointed frames") {
    val p = plan("x89_bitext_margin")
    assert(!p.contains("Scan parquet"),
      s"both sides read the checkpointed lang/candidate frames:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"mining must stay inside IVF cells, never a corpus product:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"),
      s"the BIGINT dot is a codegen HOF fold, no per-row UDF:\n$p")
    assert(p.contains("Window"), s"expected the neighborhood top-k windows:\n$p")
  }

  test("x90: calibration is one corpus pass into a bounded bin agg") {
    val p = plan("x90_classifier_calibration")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row totals join via broadcast, not a product:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"),
      s"scoring is the pinned-weight integer chain, no UDF:\n$p")
    assert("partial".r.findAllIn(p).size >= 1,
      s"the 100-bin agg must map-side combine:\n$p")
    assert(p.contains("Window"), s"expected the bounded cumulative window:\n$p")
  }

  test("x91: the sidecar is one checkpointed pass plus the sha dup join") {
    val p = plan("x91_doc_attributes")
    assert(!p.contains("Scan parquet"),
      s"every signal reads the one checkpointed corpus pass:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the dup side joins on the sha hash, never a product:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"),
      s"all signals are native column expressions:\n$p")
  }

  test("x92: the ledger is the checkpointed attributes pass plus the sha canon join") {
    val p = plan("x92_mixer_ledger")
    assert(!p.contains("Scan parquet"),
      s"every rule reads the one checkpointed attributes pass:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the canonical id joins on the sha hash, never a product:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"),
      s"the verdict is native bit arithmetic:\n$p")
  }

  test("x93: eval side broadcasts; the hits frame is checkpointed for both consumers") {
    val p = plan("x93_eval_contamination_audit")
    // The train corpus streams once into the checkpointed hits frame;
    // the only parquet scan left is the eval roster.
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size <= 1,
      s"train shingles must not be rebuilt per consumer:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"gram and roster joins are equi-joins:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the corpus-tiny eval frames must broadcast:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"), s"no per-row UDF:\n$p")
  }

  test("x74: all four consumers read the one materialized shingle frame") {
    val p = plan("x74_source_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the pair join is a sh-keyed equi-join, never a product:\n$p")
    // The (source, sh) frame is checkpointed once; the registered plan
    // must contain NO parquet scan (a scan means some consumer rebuilt
    // the shingle subtree — before the fix there were four).
    assert(!p.contains("Scan parquet"),
      s"a consumer re-scanned the corpus instead of the checkpoint:\n$p")
    assert(p.contains("ExistingRDD"),
      s"expected the checkpointed shingle frame:\n$p")
    assert("partial_count".r.findAllIn(p).nonEmpty,
      s"pair counts must map-side combine:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"the source-sized count frames must broadcast:\n$p")
  }

  test("x76: phase assignment broadcasts the bounded phase table, no product") {
    val p = plan("x76_curriculum_phases")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row total and the phase table ride broadcasts:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"docs→phase mapping must broadcast the ≤10⁴-row phase frame:\n$p")
    assert("partial".r.findAllIn(p).size >= 2,
      s"the histogram and the manifest aggs must map-side combine:\n$p")
    assert(p.contains("Window"), s"expected the bounded quartile window:\n$p")
  }

  test("b41: the Bloom probe prunes the fact side below the semi-join") {
    val p = plan("b41_runtime_filter")
    assert(p.contains("LeftSemi"), s"expected the exists semi-join:\n$p")
    assert(p.contains("shiftleft"),
      s"the fact scan must carry the integer Bloom probe filter:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"),
      s"the probe is built-in integer expressions only:\n$p")
    // The probe must sit scan-side (inside a Filter over lineitem),
    // not post-join: below any SortMergeJoin/ShuffledHashJoin marker
    // the probe string appears at least once.
    val joinIdx = p.indexOf("Join")
    assert(p.indexOf("shiftleft", joinIdx) >= 0,
      s"probe filter must be under the join (fact-side pruning):\n$p")
  }

  test("x80: cluster tagging is native, the report agg is K-bounded, no product") {
    val p = plan("x80_topic_mix")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row token total rides a broadcast, never a product:\n$p")
    assert(p.contains("pq_encode"),
      s"assignment must be the one-pass native quantizer tag:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"),
      s"no per-row UDF in the tagging or scoring path:\n$p")
    assert("partial".r.findAllIn(p).size >= 1,
      s"the K-bounded report agg must map-side combine:\n$p")
  }

  test("x84: drift joins are id-keyed, assignment native, report K-bounded") {
    val p = plan("x84_topic_drift")
    assert(!p.contains("CartesianProduct"), s"no product anywhere:\n$p")
    assert(p.contains("pq_encode"),
      s"assignment must be the one-pass native quantizer tag:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"), s"no per-row UDF:\n$p")
    assert("partial".r.findAllIn(p).size >= 1,
      s"the K-bounded drift agg must map-side combine:\n$p")
  }

  test("x77: the tertile window partitions by lang, never one global partition") {
    val p = plan("x77_perplexity_bins")
    assert(!p.contains("CartesianProduct"), s"no product anywhere:\n$p")
    assert(p.contains("Window"), s"expected the per-lang rank window:\n$p")
    // The scale killer this gate exists for: a global rank would funnel
    // the corpus through a SinglePartition exchange INTO the Window.
    // The only SinglePartition allowed is the keyless scalar reduce
    // (the LM total — partial sums, 1 row/partition): its consumer in
    // the detail sections must be a HashAggregate, never Window/Sort.
    val sections = p.split("\n\n")
    sections.zipWithIndex.filter(_._1.contains("SinglePartition")).foreach {
      case (_, i) =>
        val consumer = sections.lift(i + 1).getOrElse("")
        assert(consumer.contains("HashAggregate"),
          s"SinglePartition may only feed the scalar reduce, not:\n$consumer")
    }
  }

  test("x78: negatives come from the banded candidate join, never a product") {
    val p = plan("x78_hard_negatives")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates are (band,bucket) equi-joins:\n$p")
    assert(p.contains("Window"), s"expected the per-doc top-k window:\n$p")
  }

  test("x85: effective-size agg map-side combines; the size window is cluster-keyed") {
    val p = plan("x85_effective_size")
    assert(!p.contains("CartesianProduct"), s"no product anywhere:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"),
      s"the 1/n basis-point weight is pure integer expr, no UDF:\n$p")
    assert("partial".r.findAllIn(p).size >= 1,
      s"the |sources|-bounded agg must map-side combine:\n$p")
    // The cluster-size window partitions by cluster_id; the only
    // SinglePartition tolerable is a scalar reduce, and x85 has none
    // feeding a Window or Sort.
    val sections = p.split("\n\n")
    sections.zipWithIndex.filter(_._1.contains("SinglePartition")).foreach {
      case (_, i) =>
        val consumer = sections.lift(i + 1).getOrElse("")
        assert(!consumer.contains("Window") && !consumer.contains("Sort"),
          s"no corpus-wide single-partition window/sort:\n$consumer")
    }
  }

  test("x88: the LM chain runs on the one checkpointed line frame") {
    val p = plan("x88_paragraph_lm_strip")
    // The line frame is checkpointed for its two consumers; the only
    // parquet scan left is the null-safe audit roster (2 columns).
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size <= 1,
      s"line frame must not be rebuilt from the corpus:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row cutoff joins via broadcast, not a product:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"), s"no per-row UDF:\n$p")
    assert("partial".r.findAllIn(p).size >= 1,
      s"the LM aggs must map-side combine:\n$p")
  }

  test("x74b: the sketch runs on the one checkpointed shingle-hash stream") {
    val p = plan("x74b_source_overlap_sketch")
    assert(!p.contains("Scan parquet"),
      s"every consumer must read the checkpointed gram stream:\n$p")
    assert(p.contains("ExistingRDD"), s"expected the checkpoint:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 64-permutation expansion broadcasts, never a product:\n$p")
  }

  test("whole-stage codegen covers the scan→filter→project pipeline (b06)") {
    val df = SparkEntry.queries("b06_filter_predicates")(spark, sf)
    df.collect() // finalize the adaptive plan so codegen stages materialize
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"no codegen stages in plan:\n$p")
  }
}
