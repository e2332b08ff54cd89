package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CompactionSpec extends SparkSpec {

  test("compaction merges small files to the target count, content-identical") {
    val dir = Files.createTempDirectory("compact").resolve("t").toString
    val li = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    li.repartition(64).write.parquet(dir)
    val before = li.collect().map(_.toString).sorted.toSeq

    val bytes = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")).map(_.length).sum
    // A target of ~1/4 the data → 4 files (65 -> 4-file band with the
    // ceil; assert the band, not the exact count).
    val stats = Compaction.compact(spark, dir, math.max(1L, bytes / 4))
    assert(stats.filesBefore == 64, s"expected 64 small files, got $stats")
    assert(stats.filesAfter <= 5 && stats.filesAfter >= 4,
      s"expected ~4 compacted files, got $stats")

    val after = spark.read.parquet(dir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .collect().map(_.toString).sorted.toSeq
    assert(after == before, "compaction must preserve every row")
    // The swap must leave no staging/backup residue.
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.endsWith(".compacting")), parent.mkString(","))
    assert(!parent.exists(_.endsWith(".pre-compaction")), parent.mkString(","))
  }

  test("compaction is a no-op when files already meet the target") {
    val dir = Files.createTempDirectory("compact2").resolve("t").toString
    Tables.t(spark, sf, "region").coalesce(1).write.parquet(dir)
    val mtime = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified).max
    val stats = Compaction.compact(spark, dir, 128L << 20)
    assert(stats.filesBefore == stats.filesAfter)
    val mtime2 = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified).max
    assert(mtime == mtime2, "a no-op must not rewrite anything")
  }
}
