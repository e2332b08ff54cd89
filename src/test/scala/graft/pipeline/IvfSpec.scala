package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** IVF index semantics: full coverage of the corpus by lists, pruned
  * probes, and recall of the brute-force top-1 with enough probes. */
class IvfSpec extends SparkSpec {

  test("every vector lands in exactly one of nlist lists") {
    val (_, indexed) = Ivf.build(Tables.t(spark, sf, "embeddings"))
    assert(indexed.count() == 500)
    val lists = indexed.select("list_id").distinct().collect().map(_.getInt(0)).toSet
    assert(lists.size <= Ivf.DefaultNlist && lists.nonEmpty)
  }

  test("search result is deterministic across runs") {
    val a = Ivf.searchQuery(spark, sf).collect().toSeq
    val b = Ivf.searchQuery(spark, sf).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("with nprobe = nlist the IVF top-1 equals brute-force top-1") {
    val emb = Tables.t(spark, sf, "embeddings")
    val (model, indexed) = Ivf.build(emb)
    val brute = Similarity.cosineTopK(spark, sf).collect().head.getLong(0)
    // probe everything: candidate set == full corpus, so exact recall
    val all = (0 until Ivf.DefaultNlist)
    val q = indexed.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val ivfTop = indexed.filter(col("vec_id") =!= 0 && col("list_id").isin(all: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(Similarity.cosine(col("embedding"), col("q_emb")), 4).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(1)
      .collect().head.getLong(0)
    assert(ivfTop == brute)
  }
}
