package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (SURVEY.md §2B B29 + ANN
  * extensions; technique grounding: top-k similarity, EDBT'20/ICDE'21 —
  * PAPERS.md).
  *
  * Scale design:
  *  - the query vector is a one-row DataFrame broadcast to every executor —
  *    never collected into driver-side literals, never shuffled;
  *  - brute-force top-k is a narrow map (zip_with/aggregate fold, all
  *    codegen-friendly built-ins) + TakeOrderedAndProject, so each
  *    partition returns only k rows;
  *  - the IVF-style variant prunes the scan to the query's coarse partition
  *    (here the precomputed `label` column; at 100 TB a k-means assignment
  *    materialized at ingest and used as a partition key, turning top-k
  *    into a partition-pruned scan of ~1/nlist of the data);
  *  - the LSH variant buckets vectors by deterministic sign-projections so
  *    candidate generation is an equi-join on bucket id.
  */
object Similarity {
  private def dbl(c: Column): Column = c.cast("double")

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => dbl(x) * dbl(y)), lit(0.0), (acc, v) => acc + v)

  private def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + dbl(x) * dbl(x))

  /** Cosine similarity between two array<float> columns (exact, double
    * accumulation in array order — reproducible across engines). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  // ---------------------------------------------------------------- B29
  /** Brute-force cosine top-k of all vectors vs the vec_id=0 query row. */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosine(col("embedding"), col("q_emb")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  private val b29Sql =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       z AS (SELECT vec_id, unnest(embedding) AS x, unnest((SELECT qe FROM q)) AS y
             FROM embeddings WHERE vec_id <> 0),
       s AS (SELECT vec_id,
               sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
               sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
               sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
             FROM z GROUP BY vec_id)
       SELECT vec_id, round(dot / (sqrt(na) * sqrt(nq)), 4) AS cosine
       FROM s ORDER BY cosine DESC, vec_id LIMIT 10"""

  // ---------------------------------------------------------------- IVF
  /** IVF-style ANN: restrict the scan to the query vector's coarse
    * partition (`label`), then exact cosine top-k inside it. */
  def annIvfTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), col("label").as("q_label"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(q), col("label") === col("q_label"))
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(5)
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  private val b29bSql =
    """WITH q AS (SELECT embedding AS qe, label AS ql FROM embeddings WHERE vec_id = 0),
       z AS (SELECT vec_id, label, unnest(embedding) AS x, unnest((SELECT qe FROM q)) AS y
             FROM embeddings WHERE vec_id <> 0 AND label = (SELECT ql FROM q)),
       s AS (SELECT vec_id, label,
               sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
               sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
               sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
             FROM z GROUP BY vec_id, label)
       SELECT vec_id, label, round(dot / (sqrt(na) * sqrt(nq)), 4) AS cosine
       FROM s ORDER BY cosine DESC, vec_id LIMIT 5"""

  // ---------------------------------------------------------------- LSH
  /** Number of sign-projection bits in the LSH bucket id. */
  val LshBits = 8

  /** Deterministic random-hyperplane LSH bucket id: bit i is the sign of
    * the dot product with a pseudo-random ±1 hyperplane derived from
    * xxhash64(i, dim-index). Equal buckets ⇒ likely-high cosine. */
  def lshBucket(emb: Column): Column = {
    // hyperplane(i)[j] = +1 if xxhash64(i*10007 + j) even else -1
    val projections = (0 until LshBits).map { i =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, j) => when(pmod(xxhash64(lit(i) * lit(10007) + j), lit(2)) === 0, dbl(x))
            .otherwise(-dbl(x))),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    projections.reduce(_ + _)
  }

  /** LSH-bucketed candidate search: same-bucket vectors, exact cosine
    * verify. Output is deterministic but hash-seeded → rows-only check. */
  def annLshQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(s, dir, "embeddings").withColumn("bucket", lshBucket(col("embedding")))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(q), col("bucket") === col("q_bucket"))
      .select(col("vec_id"), col("bucket"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** Exact all-pairs cosine above a threshold for a sampled slice —
    * embedding near-dup detection (the embedding analogue of B28). At
    * corpus scale the pair generation runs behind the LSH buckets above
    * instead of the sampled self-join. */
  def embeddingNearDups(s: SparkSession, dir: String, mod: Int = 7, threshold: Double = 0.2): DataFrame = {
    // Norms are per-vector, so compute them ONCE before the pairwise join:
    // each pair then costs a single dot-product fold instead of three.
    val e = Tables.t(s, dir, "embeddings").filter(col("vec_id") % mod === 0)
      .select(col("vec_id"), col("embedding"), sqrt(norm2(col("embedding"))).as("norm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        round(dot(col("a.embedding"), col("b.embedding")) /
          (col("a.norm") * col("b.norm")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("va", "vb")
  }

  private def x09(s: SparkSession, dir: String): DataFrame =
    embeddingNearDups(s, dir)

  private val x09Sql =
    """WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 = 0),
       z AS (SELECT a.vec_id AS va, b.vec_id AS vb,
               unnest(a.embedding) AS x, unnest(b.embedding) AS y
             FROM sub a JOIN sub b ON a.vec_id < b.vec_id),
       s AS (SELECT va, vb,
               sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
               sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
               sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
             FROM z GROUP BY va, vb)
       SELECT va, vb, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cosine
       FROM s WHERE round(dot / (sqrt(na) * sqrt(nb)), 4) >= 0.2
       ORDER BY va, vb"""

  // ----------------------------------------------------------------
  val defs: Seq[QueryDef] = Seq(
    QueryDef("b29_cosine_topk", cosineTopK, Some(b29Sql)),
    QueryDef("b29b_ann_ivf", annIvfTopK, Some(b29bSql)),
    QueryDef("x07_ann_lsh", annLshQuery, None),
    QueryDef("x09_embedding_neardup", x09, Some(x09Sql)))
}
