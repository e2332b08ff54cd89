package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Semantics of the curation operators on controlled inputs (the DuckDB
  * hash-compare covers the registered query shapes). */
class CurationSpec extends SparkSpec {

  test("hash split is deterministic, disjoint, and roughly 90/5/5") {
    val a = Curation.hashSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Curation.hashSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "split must be run-deterministic")
    val total = a.values.sum
    assert(total == Tables.t(spark, sf, "documents").count())
    assert(a("train").toDouble / total > 0.8, s"train fraction collapsed: $a")
    assert(a.getOrElse("val", 0L) + a.getOrElse("test", 0L) > 0, s"no holdout: $a")
  }

  test("shard packing respects the token budget up to one document overhang") {
    val budget = 500
    val shards = Curation.shardPack(spark, sf, budget).collect()
    assert(shards.length > 1, "sf0.001 corpus should span multiple 500-token shards")
    val maxDocTok = Tables.t(spark, sf, "documents")
      .select(max(size(split(col("text"), " ")))).head().getInt(0)
    shards.foreach { r =>
      val tokens = r.getLong(2)
      assert(tokens <= budget + maxDocTok,
        s"shard ${r.getLong(0)} holds $tokens tokens (budget $budget + max doc $maxDocTok)")
    }
    // Shards partition the corpus in doc_id order: first/last ranges nest.
    val ordered = shards.sortBy(_.getLong(0))
    ordered.sliding(2).foreach {
      case Array(x, y) => assert(x.getLong(4) < y.getLong(3), "shard ranges must not overlap")
      case _ =>
    }
  }

  test("dedup clusters are transitive (A~B, B~C, A!~C still one cluster)") {
    import spark.implicits._
    // 29 divides every doc_id so the % 29 slice keeps all docs. A chain:
    // doc 29 ~ doc 58 (shares u1..u4), doc 58 ~ doc 87 (shares v1..v4),
    // 29 and 87 share nothing. doc 116 is unrelated.
    val corpus = Seq(
      (29L, "u1 u2 u3 u4 a b"),
      (58L, "u1 u2 u3 u4 v1 v2 v3 v4"),
      (87L, "v1 v2 v3 v4 c d"),
      (116L, "w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("cc").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(29L, 58L, 87L), s"only paired docs belong to clusters: $out")
    assert(out.values.toSet == Set(29L), s"chain must collapse to one cluster rooted at 29: $out")
  }

  test("decontamination flags only train docs sharing shingles with the eval slice") {
    import spark.implicits._
    // 97 divides 97 and 194: those are the "eval" docs. Train doc 1 copies
    // eval text (contaminated); train doc 2 is clean.
    val corpus = Seq(
      (97L, "the quick brown fox jumps high"),
      (194L, "completely different eval material here"),
      (1L, "prefix words then the quick brown fox jumps high suffix"),
      (2L, "nothing in common with held out data at all")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("decon").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.decontamination(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(1L) && out(1L) >= 4, s"copied shingles must flag doc 1: $out")
    assert(!out.contains(2L), s"clean doc must not be flagged: $out")
    assert(!out.contains(97L) && !out.contains(194L), "eval docs are not scanned")
  }

  test("repetition ratio separates boilerplate from varied text") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "each word here appears exactly once today")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("rep").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.repetitionRatio(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) > 0.5, s"pure repetition must score high: $out")
    assert(out(2L) == 0.0, s"all-distinct shingles must score zero: $out")
  }

  test("tfidf ranks a document's most frequent distinctive term first") {
    val top = Curation.tfidfTop(spark, sf)
      .filter(col("rk") === 1).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      assert(r.getLong(3) >= 1, "rank-1 term must have tf >= 1")
    }
    // rank-1 row per doc is unique
    val perDoc = top.groupBy(_.getLong(0)).map(_._2.length)
    assert(perDoc.forall(_ == 1))
  }
}
