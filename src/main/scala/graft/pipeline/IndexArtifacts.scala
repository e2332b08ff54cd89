package graft.pipeline

import org.apache.spark.sql.SparkSession

/** The memoized index artifacts ([[Ivf.memoModel]] tenants), exposed as
  * named build steps so the bench harness can force and TIME each build
  * as its own `idx_*` line before the query gauntlet runs.
  *
  * Why this exists (r12 judge finding): a memoized build otherwise lands
  * inside whichever consumer query happens to run first, so per-query
  * bench numbers stop being comparable across rounds the moment an
  * artifact moves between consumers — the x26/x30/x34 "spike" was
  * exactly this first-toucher attribution ambiguity. With the builds
  * timed up front, every consumer reads steady-state and its number
  * measures the query plan, nothing else. This mirrors the 100 TB
  * deployment shape: index artifacts (candidate graphs, cluster label
  * maps, centroids, codebooks, Bloom masks, classifier weights) are
  * built once per corpus snapshot by a dedicated build stage, and query
  * jobs only ever read them.
  *
  * Two artifact kinds, both forced by a plain call:
  *  - checkpointed FRAMES ([[Checkpoints.stable]] is eager): the call
  *    itself materializes the frame;
  *  - driver-side FITS (k-means model, pinned centroids, PQ codebooks,
  *    Bloom mask, classifier weights): these run at query-CONSTRUCTION
  *    time (the fit's `collect` happens inside the constructor), so
  *    invoking the registered constructor WITHOUT executing its plan
  *    pays exactly the build — through the very call path the consumer
  *    queries use, which guarantees the memo cache key matches.
  */
object IndexArtifacts {
  /** Build steps in dependency order (labels build from pairs, IVFADC
    * from the coarse pin), so each line times ONE artifact. */
  val builds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    // Checkpointed frame artifacts.
    "idx_b28_pairs" -> ((s: SparkSession, d: String) => { Curation.b28Pairs(s, d); () }),
    "idx_b28_labels" -> ((s: SparkSession, d: String) => { Curation.b28Labels(s, d); () }),
    "idx_x63_distances" -> ((s: SparkSession, d: String) => { Curation.x63Distances(s, d); () }),
    "idx_sem_labels" -> ((s: SparkSession, d: String) =>
      { Similarity.semanticLabelsAt(s, d, Similarity.SemanticDedupThreshold); () }),
    "idx_x11_postings" -> ((s: SparkSession, d: String) => { Dedup.x11PostingsIndexPath(s, d); () }),
    "idx_x11_pairs" -> ((s: SparkSession, d: String) => { Dedup.x11PairFrame(s, d); () }),
    "idx_x121_old_index" -> ((s: SparkSession, d: String) => { Curation.x121OldIndex(s, d); () }),
    "idx_x121_merged" -> ((s: SparkSession, d: String) => { Curation.x121MergedMap(s, d); () }),
    "idx_x129_old_index" -> ((s: SparkSession, d: String) => { Similarity.x129OldIndex(s, d); () }),
    "idx_x129_merged" -> ((s: SparkSession, d: String) => { Similarity.x129MergedMap(s, d); () }),
    "idx_x46b_old_ded" -> ((s: SparkSession, d: String) => { Curation.x46bOldDed(s, d); () }),
    "idx_x46b_lex_index" -> ((s: SparkSession, d: String) => { Curation.x46bLexIndex(s, d); () }),
    "idx_x46b_sem_edges" -> ((s: SparkSession, d: String) => { Curation.x46bSemEdges(s, d); () }),
    "idx_x46c_old_surv" -> ((s: SparkSession, d: String) => { Curation.x46cOldLexSurv(s, d); () }),
    "idx_x46c_postings" -> ((s: SparkSession, d: String) => { Curation.x46cPostings(s, d); () }),
    "idx_x46c_strip" -> ((s: SparkSession, d: String) => { Curation.x46cStrip(s, d); () }),
    "idx_x46c_decon" -> ((s: SparkSession, d: String) => { Curation.x46cDecon(s, d); () }),
    "idx_unigram_lm" -> ((s: SparkSession, d: String) => { TextStats.unigramLmFrame(s, d); () }),
    "idx_x133_old_lm" -> ((s: SparkSession, d: String) => { TextStats.x133OldLm(s, d); () }),
    "idx_x139_old_stats" -> ((s: SparkSession, d: String) => { Selection.x139OldStats(s, d); () }),
    "idx_bigram_lm" -> ((s: SparkSession, d: String) => { TextStats.bigramLmFrame(s, d); () }),
    // Driver-side fits, forced via their first consumer's constructor.
    "idx_kmeans_quantizer" -> ((s: SparkSession, d: String) => { Ivf.searchQuery(s, d); () }),
    "idx_coarse_pin" -> ((s: SparkSession, d: String) => { Ivf.searchPinnedIvfQuery(s, d); () }),
    "idx_ivf_partitioned" -> ((s: SparkSession, d: String) => { Ivf.partitionedIndexPath(s, d); () }),
    "idx_pq_codebooks" -> ((s: SparkSession, d: String) => { Ivf.searchPqQuery(s, d); () }),
    "idx_ivfadc_codebooks" -> ((s: SparkSession, d: String) => { Ivf.searchIvfPqQuery(s, d); () }),
    "idx_bloom_mask" -> ((s: SparkSession, d: String) => { Curation.bloomDeconQuery(s, d); () }),
    "idx_lex_postings" -> ((s: SparkSession, d: String) => { Selection.lexPostingsIndexPath(s, d); () }),
    "idx_clf_weights" -> ((s: SparkSession, d: String) => { Selection.classifierFitQuality(s, d); () }))
}
