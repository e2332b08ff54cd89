package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The at-rest index lifecycle: export each frame artifact, read it
  * back, and prove consumers produce bit-identical results from the
  * table as from the in-JVM memoized frame. */
class IndexExportSpec extends SparkSpec {

  test("export → manifest → read-back → consume equals the memoized path") {
    val out = java.nio.file.Files.createTempDirectory("idxexp").toString
    val counts = IndexExport.write(spark, sf, out)
    assert(counts.keySet ==
      Set("b28_pairs", "b28_labels", "x11_pairs", "sem_labels", "image_phash",
        "audio_fp", "x121_old_index", "x129_old_index", "x133_old_lm",
        "x139_old_stats", "bloom_mask", "x46c_postings", "x46c_strip_df",
        "x46c_strip_out", "x46c_decon_lex"))
    // Manifest counts are the parquet truth.
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/manifest.json"))
    counts.foreach { case (name, n) =>
      assert(IndexExport.read(spark, out, name).count() == n, s"$name count")
      assert(manifest.contains(s""""$name": $n"""), s"$name in manifest")
    }
    assert(counts("image_phash") ==
      graft.Tables.t(spark, sf, "documents").count(),
      "one phash row per document")
    assert(counts("audio_fp") ==
      graft.Tables.t(spark, sf, "documents").count(),
      "one audio fingerprint row per document")
    // Read-back frames equal the memoized artifacts row for row.
    Seq("b28_pairs", "b28_labels", "x11_pairs", "sem_labels",
        "x121_old_index", "x129_old_index", "x133_old_lm",
        "bloom_mask", "x46c_postings", "x46c_strip_df", "x46c_strip_out",
        "x46c_decon_lex").foreach { name =>
      val live = IndexExport.artifacts(spark, sf)(name)
      val cols = live.columns.map(col)
      val back = IndexExport.read(spark, out, name)
      assert(back.orderBy(cols: _*).collect().toSeq ==
        live.orderBy(cols: _*).collect().toSeq, s"$name round-trip")
    }
    // A consumer fed the EXPORTED table equals the registered query fed
    // the memoized frame: x16's clusters from the at-rest label map.
    val fromExport = Curation.dedupClustersFromLabels(
      IndexExport.read(spark, out, "b28_labels")).collect().toSeq
    val registered = graft.SparkEntry.queries("x16_dedup_clusters")(spark, sf)
      .collect().toSeq
    assert(fromExport == registered, "x16 from the exported index")
    // And the image dedup pairs from the at-rest phash table.
    val pairsFromExport = Multimodal.hashBandPairs(
      IndexExport.read(spark, out, "image_phash")).collect().toSeq
    val pairsRegistered = graft.SparkEntry
      .queries("x115_image_phash_dedup")(spark, sf).collect().toSeq
    assert(pairsFromExport == pairsRegistered, "x115 from the exported index")
    // The audio dedup pairs from the at-rest fingerprint table (the
    // r13 gap: audio had no at-rest handoff path).
    val audioFromExport = Multimodal.hashBandPairs(
      IndexExport.read(spark, out, "audio_fp")).collect().toSeq
    val audioRegistered = graft.SparkEntry
      .queries("x116_audio_fingerprint_dedup")(spark, sf).collect().toSeq
    assert(audioFromExport == audioRegistered, "x116 from the exported index")
    // The Bloom probe fed the EXPORTED mask equals the registered x67
    // (the 10th frame's consumer path — r14 ask #6).
    val maskBack = Curation.bloomMaskFromFrame(
      IndexExport.read(spark, out, "bloom_mask"))
    val probeFromExport = Curation.bloomDeconWithMask(
      graft.Tables.t(spark, sf, "documents").filter(col("doc_id") % 97 =!= 0),
      maskBack).collect().toSeq
    val probeRegistered = graft.SparkEntry
      .queries("x67_bloom_decon")(spark, sf).collect().toSeq
    assert(probeFromExport == probeRegistered, "x67 from the exported mask")
  }

  test("incremental cluster merges read the old index from parquet, not the memo (cross-job handoff)") {
    // The x121/x129 registered queries read their standing index via
    // the in-JVM memo; production reads it from the snapshot store.
    // Prove the parquet round-trip feeds the merge identically — the
    // cross-JOB version of the incremental ≡ full guarantee.
    val out = java.nio.file.Files.createTempDirectory("idxjob").toString
    val standing = Set("x121_old_index", "x129_old_index", "x133_old_lm")
    IndexExport.artifacts(spark, sf)
      .filter { case (name, _) => standing(name) }
      .foreach { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$out/$name.parquet") }
    val d = graft.Tables.t(spark, sf, "documents").filter(col("doc_id") % 7 === 0)
    val lexFromParquet = Curation.incrementalClustersFromIndex(
      d.filter(pmod(col("doc_id"), lit(14)) === 7),
      d.filter(pmod(col("doc_id"), lit(14)) === 0),
      IndexExport.read(spark, out, "x121_old_index"), 0.8).collect().toSeq
    val lexRegistered = graft.SparkEntry
      .queries("x121_incremental_clusters")(spark, sf).collect().toSeq
    assert(lexFromParquet == lexRegistered, "x121 merge from the at-rest index")
    val e = graft.Tables.t(spark, sf, "embeddings").select("vec_id", "embedding")
    val semFromParquet = Similarity.incrementalSemanticClustersFromIndex(
      e.filter(col("vec_id") % 2 === 1),
      e.filter(col("vec_id") % 2 === 0),
      IndexExport.read(spark, out, "x129_old_index"),
      Similarity.SemanticDedupThreshold).collect().toSeq
    val semRegistered = graft.SparkEntry
      .queries("x129_incremental_semantic_clusters")(spark, sf).collect().toSeq
    assert(semFromParquet == semRegistered, "x129 merge from the at-rest index")
    val lmFromParquet = TextStats.incrementalUnigramLm(
      graft.Tables.t(spark, sf, "documents").filter(col("doc_id") % 2 === 1),
      IndexExport.read(spark, out, "x133_old_lm"))
      .orderBy("tok").collect().toSeq
    val lmRegistered = graft.SparkEntry
      .queries("x133_incremental_unigram_lm")(spark, sf).collect().toSeq
    assert(lmFromParquet == lmRegistered, "x133 merge from the at-rest LM table")
  }
}
