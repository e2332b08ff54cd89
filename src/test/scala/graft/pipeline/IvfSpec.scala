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

  test("x52: int8 quantized top-10 recalls the exact top-10 within tolerance") {
    val exact = Similarity.cosineTopK(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sq8 = Similarity.annSq8TopK(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(sq8.length == 10)
    // Recall@10: int8 at 64 dims loses ~1e-3 of cosine — the exact and
    // quantized top-10 SETS must agree on this corpus (rank swaps between
    // near-tied neighbors are the expected, acceptable degradation).
    val hits = sq8.count { case (id, _) => exact.contains(id) }
    assert(hits == 10, s"recall@10 was $hits/10: ${sq8.toSeq} vs $exact")
    // Quantization error bound: |cos8 - cos| small for every shared id.
    sq8.filter { case (id, _) => exact.contains(id) }.foreach { case (id, c8) =>
      assert(math.abs(c8 - exact(id)) <= 0.005, s"vec $id: $c8 vs ${exact(id)}")
    }
  }

  test("x52b: IVF+SQ8 composed top-5 matches the exact-in-list top-5") {
    val exact = Similarity.annIvfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val sq8 = Similarity.annIvfSq8TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(sq8.length == 5)
    // Same list restriction, so quantization is the ONLY difference:
    // the id sets must agree and cosines within the int8 error band.
    assert(sq8.map(_._1).toSet == exact.keySet,
      s"${sq8.toSeq} vs $exact")
    sq8.foreach { case (id, c8) =>
      assert(math.abs(c8 - exact(id)) <= 0.005, s"vec $id: $c8 vs ${exact(id)}")
    }
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
