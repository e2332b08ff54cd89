package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for LLM training-data pipelines — the steps
  * that sit between raw ingestion and training shards: relevance scoring
  * (TF-IDF), reproducible train/val/test splitting, token-budget shard
  * packing, and near-dup cluster resolution (the "keep one canonical doc
  * per duplicate cluster" step downstream of B28/x05/x09 pair finding).
  *
  * Scale design notes per operator are on the methods; everything here is
  * expression-only (no UDFs) and every query is oracle-matched in DuckDB,
  * including the iterative connected-components one (recursive CTE).
  */
object Curation {
  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  private val Knuth = HashConstants.Knuth
  private val HashPrime = HashConstants.HashPrime

  // ---------------------------------------------------------------- x13
  /** Per-document top-3 TF-IDF terms. tf and df come from ONE explode +
    * two partial-aggregated groupBys (shuffle keys (doc,tok) then tok);
    * the corpus size joins in as a broadcast 1-row count. Ranking is by
    * integer (tf DESC, tok) so row order is engine-exact; the tfidf score
    * itself is emitted as a rounded column. At 100×: both aggregations
    * are map-side combinable and the per-doc top-k is a bounded window
    * (rank ≤ 3 prunes before the final sort). */
  def tfidfTop(s: SparkSession, dir: String): DataFrame = {
    val tf = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nd = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("tok"))
    tf.join(df, "tok").crossJoin(broadcast(nd))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("tok"), col("tf"), col("df"),
        round(col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 4)
          .as("tfidf"))
      .orderBy("doc_id", "rk")
  }

  private val x13Sql =
    """WITH tf AS (SELECT doc_id, tok, count(*) AS tf
                   FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                         FROM documents)
                   GROUP BY doc_id, tok),
       df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       nd AS (SELECT count(*) AS n_docs FROM documents),
       ranked AS (SELECT t.doc_id, t.tok, t.tf, df.df,
                    row_number() OVER (PARTITION BY t.doc_id
                                       ORDER BY t.tf DESC, t.tok) AS rk
                  FROM tf t JOIN df USING (tok))
       SELECT doc_id, rk, tok, tf, df,
              round(tf * ln(CAST((SELECT n_docs FROM nd) + 1 AS DOUBLE) / (df + 1)), 4)
                AS tfidf
       FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk"""

  // ---------------------------------------------------------------- x14
  /** Reproducible train/val/test split: a Knuth-spread integer hash of
    * doc_id buckets each document into [0,100); <90 → train, <95 → val,
    * else test. Pure integer arithmetic — the same document lands in the
    * same split on any engine, any cluster size, any run (the property
    * that matters for dataset versioning). Output is the per-split
    * summary; the assignment itself is the inner projection. At 100×
    * this is a map-only projection plus one 3-group aggregation. */
  def hashSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(pmod(col("doc_id"), lit(HashPrime)) * lit(Knuth), lit(HashPrime)) % 100
    docs(s, dir)
      .select(col("doc_id"), col("n_chars"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < 90, "train").when(col("bucket") < 95, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("split")
  }

  private val x14Sql =
    s"""WITH a AS (SELECT doc_id, n_chars,
         ((doc_id % $HashPrime) * $Knuth % $HashPrime) % 100 AS bucket
         FROM documents)
       SELECT CASE WHEN bucket < 90 THEN 'train'
                   WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
              count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
              min(doc_id) AS min_id, max(doc_id) AS max_id
       FROM a GROUP BY 1 ORDER BY split"""

  // ---------------------------------------------------------------- x15
  /** Token-budget shard packing: documents are packed in doc_id order
    * into shards of ≤ `budget` whitespace tokens (a doc larger than the
    * budget gets its own shard). shard_id = floor(exclusive-prefix-sum /
    * budget) — the streaming-pack approximation every corpus sharder
    * uses; it can split a doc's shard boundary mid-budget but never
    * reorders. Output is the per-shard manifest.
    *
    * Scale note: the global ordered prefix sum exists for the oracle
    * comparison; the production form runs the identical expression
    * per-partition (sortWithinPartitions + the same window keyed by
    * partition id) so no global sort is required — shard ids then embed
    * the partition id. Documented in SCALE.md. */
  def shardPack(s: SparkSession, dir: String, budget: Int = 20000): DataFrame = {
    val nTok = size(split(col("text"), " "))
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    docs(s, dir)
      .select(col("doc_id"), nTok.as("n_tok"))
      .withColumn("shard_id",
        (coalesce(sum(col("n_tok")).over(w), lit(0L)) / budget).cast("long"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("shard_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("shard_id")
  }

  private def x15Sql(budget: Int) =
    s"""WITH t AS (SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
       c AS (SELECT doc_id, n_tok,
           CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             // $budget AS shard_id
           FROM t)
       SELECT shard_id, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
              min(doc_id) AS first_doc, max(doc_id) AS last_doc
       FROM c GROUP BY shard_id ORDER BY shard_id"""

  // ---------------------------------------------------------------- x16
  /** Near-dup cluster resolution: connected components over the B28
    * Jaccard pair graph, labelling every member with the cluster's
    * minimum doc_id (the canonical survivor). Iterative min-label
    * propagation — each round joins current labels to the edge list and
    * takes the min over self + neighbours; converges in graph-diameter
    * rounds (near-dup clusters are shallow — diameter is typically 2-4).
    *
    * Scale: each round is one shuffle join on node id + one partial-agg
    * min, both skew-free after the df cap upstream; intermediate results
    * are persisted and the loop exits when a round changes no labels
    * (count of changed rows — an aggregate, not a collect). The DuckDB
    * oracle reaches the same fixpoint with a recursive CTE (min over all
    * reachable labels), so the result is engine-exact. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(s, dir).select(col("da"), col("db"))
    // Undirected edge list, both directions.
    val edges = pairs.union(pairs.select(col("db"), col("da")))
      .toDF("src", "dst").persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node")).persist()
    var converged = false
    var rounds = 0
    val MaxRounds = 100
    while (!converged && rounds < MaxRounds) {
      val next = labels
        .join(edges, col("node") === col("src"), "left")
        .join(labels.select(col("node").as("dst2"), col("lbl").as("nbr_lbl")),
          col("dst") === col("dst2"), "left")
        .groupBy("node")
        .agg(least(min("lbl"), coalesce(min("nbr_lbl"), min("lbl"))).as("lbl"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("lbl", "old"), "node")
        .filter(col("lbl") =!= col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      rounds += 1
    }
    // Non-convergence must be loud: truncated propagation would silently
    // split one component into several clusters (and diverge from the
    // recursive-CTE oracle). MaxRounds bounds the component DIAMETER, not
    // its size — near-dup graphs are shallow, so hitting it means
    // something is structurally wrong with the input.
    if (!converged) {
      edges.unpersist(); labels.unpersist()
      throw new IllegalStateException(
        s"dedupClusters: min-label propagation did not converge in $MaxRounds rounds")
    }
    // localCheckpoint truncates lineage past the persisted loop state, so
    // edges + the final round's cache can be released here instead of
    // leaking into the shared session for the caller's lifetime.
    val finalLabels = labels.localCheckpoint(true)
    labels.unpersist()
    edges.unpersist()
    finalLabels
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy("cluster_id")))
      .orderBy("doc_id")
  }

  /** Pair generation is textually shared with b28 ([[Dedup.b28PairCtes]])
    * so the two oracles cannot drift; the recursive `reach` CTE then
    * computes min-over-all-reachable-labels — the same fixpoint the
    * Spark-side propagation loop converges to. */
  private val x16Sql =
    s"""WITH RECURSIVE ${Dedup.b28PairCtes},
       edges AS (SELECT da AS src, db AS dst FROM pairs
                 UNION ALL SELECT db, da FROM pairs),
       reach AS (SELECT DISTINCT src AS node, src AS lbl FROM edges
                 UNION
                 SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.node = e.src),
       cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node)
       SELECT doc_id, cluster_id,
              count(*) OVER (PARTITION BY cluster_id) AS cluster_size
       FROM cc ORDER BY doc_id"""

  // ----------------------------------------------------------------
  val defs: Seq[QueryDef] = Seq(
    QueryDef("x13_tfidf_top", tfidfTop, Some(x13Sql)),
    QueryDef("x14_hash_split", hashSplit, Some(x14Sql)),
    QueryDef("x15_shard_pack", (s, d) => shardPack(s, d), Some(x15Sql(20000))),
    QueryDef("x16_dedup_clusters", dedupClusters, Some(x16Sql)))
}
