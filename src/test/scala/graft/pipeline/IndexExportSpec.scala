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
      Set("b28_pairs", "b28_labels", "x11_pairs", "sem_labels", "image_phash"))
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
    // Read-back frames equal the memoized artifacts row for row.
    Seq("b28_pairs", "b28_labels", "x11_pairs", "sem_labels").foreach { name =>
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
  }
}
