package graft.pipeline

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** IVF (inverted-file) approximate nearest neighbour index: a k-means
  * coarse quantizer partitions the corpus into `nlist` lists; a query
  * probes only the `nprobe` lists whose centroids are nearest, reading
  * ~nprobe/nlist of the data instead of all of it.
  *
  * Scale design:
  *  - the index BUILD is one ML fit (sampled at very large corpus sizes)
  *    plus one transform that tags every vector with its list id — at rest
  *    the corpus is then written partitioned by `list_id` (SCALE.md), so a
  *    probe is a partition-pruned scan;
  *  - the centroid table is `nlist × dim` floats — an index structure that
  *    lives on the driver / in a broadcast, exactly like parquet footer
  *    metadata;
  *  - the probe-side search reuses the exact cosine top-k kernel
  *    ([[Similarity.cosine]]) over the pruned candidate set.
  *
  * Deterministic given the fixed seed, but k-means assignments are not
  * portable to other engines → registered as a rows-only query.
  */
object Ivf {
  val DefaultNlist = 8
  val Seed = 42L
  /** Upper bound on vectors fed to the k-means fit. A coarse quantizer
    * needs only a representative sample — centroids from 100k vectors are
    * statistically indistinguishable from centroids over the full corpus,
    * while a full-corpus fit at 100 TB would iterate the entire dataset
    * maxIter times. */
  val FitSampleCap = 100000L

  /** Corpus row counts memoized by the CANONICALIZED optimized plan —
    * exact plan equality, not a 32-bit semanticHash whose collision would
    * silently hand a different corpus's count to the sampling decision
    * (a 10⁹ count applied to a 10⁵ corpus fits KMeans on ~0 vectors).
    * The sampling decision in [[build]] needs |corpus| on EVERY execution
    * (bench best-of-N, verify, repeated probes) but the underlying
    * snapshot dirs are immutable — the same assumption Spark's own file-
    * index caching makes; a rewritten path needs a new session (or plan).
    * Bounded: cleared wholesale past 64 distinct corpora, a size no real
    * session reaches. When the catalog/CBO already carries a rowCount
    * statistic the answer is free — no job at all. */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def corpusSize(df: DataFrame): Long = {
    val plan = df.queryExecution.optimizedPlan
    plan.stats.rowCount match {
      case Some(rc) => rc.toLong
      case None =>
        if (countCache.size > 64) countCache.clear()
        countCache.computeIfAbsent(plan.canonicalized.toString,
          _ => java.lang.Long.valueOf(df.count())).longValue()
    }
  }

  /** Fit the coarse quantizer (on a bounded sample of the corpus) and tag
    * every vector with its list id. */
  def build(embeddings: DataFrame, nlist: Int = DefaultNlist): (KMeansModel, DataFrame) = {
    val vecs = embeddings.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    // The (memoized) count decides whether sampling is needed; the
    // fraction is padded 10% so the Bernoulli sample almost surely clears
    // the cap's intent, and the fit input stays index-sized regardless of
    // corpus size.
    val n = corpusSize(embeddings)
    val fitInput =
      if (n <= FitSampleCap) vecs
      else vecs.sample(withReplacement = false,
        math.min(1.0, 1.1 * FitSampleCap.toDouble / n), Seed)
    val model = new KMeans().setK(nlist).setSeed(Seed).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("list_id").fit(fitInput)
    (model, model.transform(vecs).drop("features"))
  }

  /** Nearest `nprobe` list ids for a query vector (driver-side centroid
    * scan — the centroid table IS the index). */
  def probeLists(model: KMeansModel, query: Array[Double], nprobe: Int): Seq[Int] =
    model.clusterCenters.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var j = 0
      val arr = c.toArray
      while (j < arr.length) { val t = arr(j) - query(j); d += t * t; j += 1 }
      (d, i)
    }.sortBy(_._1).take(nprobe).map(_._2).toSeq

  /** End-to-end IVF top-k cosine search for the vec_id=0 query vector. */
  def searchQuery(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s) // vec_dot/vec_norm2 for cosine
    val emb = Tables.t(s, dir, "embeddings")
    val (model, indexed) = build(emb)
    val queryVec = indexed.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val lists = probeLists(model, queryVec, nprobe = 2)
    val q = indexed.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    indexed.filter(col("vec_id") =!= 0 && col("list_id").isin(lists: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("list_id"),
        round(Similarity.cosine(col("embedding"), col("q_emb")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x10_ann_ivf_kmeans", searchQuery, None))
}
