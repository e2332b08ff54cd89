package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The storage core under every r16 maintenance stream: atomic pointer
  * swaps, the batch-id replay ledger, multi-table commit atomicity, and
  * version pruning. The stream specs prove the end-to-end semantics;
  * this spec pins the primitive's own contract. */
class VersionedTableSpec extends SparkSpec {

  private def tmp() = java.nio.file.Files.createTempDirectory("vt").toString

  test("seed -> commit advances versions; lastBatchId tracks the ledger") {
    import spark.implicits._
    val dir = tmp()
    assert(VersionedTable.current(dir).isEmpty && VersionedTable.lastBatchId(dir) == -1L)
    VersionedTable.seed(dir, Seq("t" -> Seq((1L, "a")).toDF("k", "v")))
    assert(VersionedTable.current(dir).contains(("v0", -1L)))
    assert(!VersionedTable.alreadyMerged(dir, 0L))
    VersionedTable.commit(dir, 0L, Seq("t" -> Seq((2L, "b")).toDF("k", "v")))
    assert(VersionedTable.current(dir).contains(("v1", 0L)))
    assert(VersionedTable.alreadyMerged(dir, 0L) && !VersionedTable.alreadyMerged(dir, 1L))
    assert(VersionedTable.read(spark, dir, "t").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("multi-table commits are atomic: both tables come from one version") {
    import spark.implicits._
    val dir = tmp()
    VersionedTable.seed(dir, Seq(
      "a" -> Seq(1L).toDF("x"), "b" -> Seq(10L).toDF("y")))
    VersionedTable.commit(dir, 0L, Seq(
      "a" -> Seq(2L).toDF("x"), "b" -> Seq(20L).toDF("y")))
    assert(VersionedTable.read(spark, dir, "a").head().getLong(0) == 2L)
    assert(VersionedTable.read(spark, dir, "b").head().getLong(0) == 20L)
    // A torn NEXT version (one table written, no pointer swap) leaves
    // BOTH reads on the committed version - no mixed state is readable.
    Seq(3L).toDF("x").write.parquet(s"$dir/v2/a")
    assert(VersionedTable.read(spark, dir, "a").head().getLong(0) == 2L)
    assert(VersionedTable.read(spark, dir, "b").head().getLong(0) == 20L)
  }

  test("replay ledger keys on (stream identity, batchId): same id skips, new id resets") {
    import spark.implicits._
    val dir = tmp()
    VersionedTable.seed(dir, Seq("t" -> Seq(0L).toDF("x")))
    VersionedTable.commit(dir, 1L, Seq("t" -> Seq(1L).toDF("x")), "streamA")
    // Same identity: the monotonic-id replay skip holds.
    assert(VersionedTable.alreadyMerged(dir, 0L, "streamA") &&
      VersionedTable.alreadyMerged(dir, 1L, "streamA") &&
      !VersionedTable.alreadyMerged(dir, 2L, "streamA"))
    // Different identity (fresh checkpoint, ids restart at 0): the
    // ledger RESETS — batch 0 of the new stream is NOT "already merged"
    // (the r16 ADVICE silent-drop case), and the commit re-keys the
    // ledger to the adopter.
    assert(!VersionedTable.alreadyMerged(dir, 0L, "streamB"),
      "a new stream's batches must merge, not vanish under the old high-water mark")
    VersionedTable.commit(dir, 0L, Seq("t" -> Seq(2L).toDF("x")), "streamB")
    assert(VersionedTable.alreadyMerged(dir, 0L, "streamB") &&
      !VersionedTable.alreadyMerged(dir, 1L, "streamB"))
    assert(VersionedTable.currentEntry(dir).exists(_._3 == "streamB"))
    // Empty identity on either side degrades to the legacy bare-id rule.
    assert(VersionedTable.alreadyMerged(dir, 0L) &&
      !VersionedTable.alreadyMerged(dir, 1L))
    // Colon would corrupt the pointer format: rejected loudly.
    intercept[IllegalArgumentException](
      VersionedTable.commit(dir, 2L, Seq("t" -> Seq(3L).toDF("x")), "a:b"))
  }

  test("per-identity ledger: a rolled-back old stream skips its own replays (r17 ADVICE)") {
    import spark.implicits._
    val dir = tmp()
    VersionedTable.seed(dir, Seq("t" -> Seq(0L).toDF("x")))
    // Stream A merges batches 0 and 1, then stream B takes over.
    VersionedTable.commit(dir, 0L, Seq("t" -> Seq(1L).toDF("x")), "streamA")
    VersionedTable.commit(dir, 1L, Seq("t" -> Seq(2L).toDF("x")), "streamA")
    VersionedTable.commit(dir, 0L, Seq("t" -> Seq(3L).toDF("x")), "streamB")
    // The r17 scenario: stream A restarts from its still-valid
    // checkpoint (orchestrator rollback) and replays its batches. With
    // only the LATEST identity retained, the A->B mismatch used to
    // reset the ledger and batches 0/1 RE-MERGED — double-counting the
    // standing statistics. The per-identity map keeps A's high-water
    // mark alive across B's commits:
    assert(VersionedTable.alreadyMerged(dir, 0L, "streamA") &&
      VersionedTable.alreadyMerged(dir, 1L, "streamA"),
      "an identity that ever committed must skip its own replayed batches")
    assert(!VersionedTable.alreadyMerged(dir, 2L, "streamA"),
      "genuinely new batches of a returning identity must still merge")
    assert(VersionedTable.alreadyMerged(dir, 0L, "streamB") &&
      !VersionedTable.alreadyMerged(dir, 1L, "streamB"))
    // A never-seen identity begins its own ledger (merges from scratch).
    assert(!VersionedTable.alreadyMerged(dir, 0L, "streamC"))
    // Interleaved ownership keeps every mark: A commits again, B's and
    // A's marks both advance independently.
    VersionedTable.commit(dir, 2L, Seq("t" -> Seq(4L).toDF("x")), "streamA")
    assert(VersionedTable.ledger(dir) == Map("streamA" -> 2L, "streamB" -> 0L))
    assert(VersionedTable.alreadyMerged(dir, 0L, "streamB"),
      "another identity's commit must not erase an existing mark")
  }

  test("pre-map pointers degrade to a one-entry ledger seeded from the owner") {
    import spark.implicits._
    val dir = tmp()
    VersionedTable.seed(dir, Seq("t" -> Seq(0L).toDF("x")))
    // Simulate an artifact last written by the r17 (single-identity)
    // format: rewrite the pointer to a bare first line.
    val p = java.nio.file.Paths.get(dir, "_CURRENT")
    val firstLine = java.nio.file.Files.readString(p).linesIterator.next()
    java.nio.file.Files.writeString(p, firstLine.split(":", 3).take(2).mkString(":") + ":oldStream")
    assert(VersionedTable.ledger(dir) == Map("oldStream" -> -1L))
    assert(VersionedTable.alreadyMerged(dir, -1L, "oldStream") &&
      !VersionedTable.alreadyMerged(dir, 0L, "oldStream"),
      "the owning identity's replay skip must survive the format upgrade")
  }

  test("scheme-qualified dirs fail fast: the pointer is driver-local java.nio") {
    import spark.implicits._
    // r16 ADVICE: an hdfs:// or s3a:// dir would silently split the
    // artifact (parquet remote, pointer on a bogus driver-local path,
    // reads forever 'unseeded'). The contract is local-only until the
    // pointer rides the Hadoop FS API.
    intercept[IllegalArgumentException](
      VersionedTable.current("hdfs://nn:8020/idx"))
    intercept[IllegalArgumentException](
      VersionedTable.seed("s3a://bucket/idx", Seq("t" -> Seq(1L).toDF("x"))))
    intercept[IllegalArgumentException](
      VersionedTable.read(spark, "file:///tmp/idx", "t"))
  }

  test("pruning keeps the live and previous versions only") {
    import spark.implicits._
    val dir = tmp()
    VersionedTable.seed(dir, Seq("t" -> Seq(0L).toDF("x")))
    (0L to 3L).foreach(i =>
      VersionedTable.commit(dir, i, Seq("t" -> Seq(i + 1).toDF("x"))))
    val versions = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString)
          .filter(_.matches("v\\d+")).toSet
      } finally l.close()
    }
    assert(versions == Set("v3", "v4"),
      s"only the live and previous versions survive pruning: $versions")
    assert(VersionedTable.read(spark, dir, "t").head().getLong(0) == 4L)
  }

  test("unseeded reads fail loudly, not with a phantom empty table") {
    val dir = tmp()
    val e = intercept[RuntimeException](VersionedTable.read(spark, dir, "t"))
    assert(e.getMessage.contains("unseeded"))
  }
}
