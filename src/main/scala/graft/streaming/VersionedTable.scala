package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic, replay-safe standing-table storage for the maintenance
  * streams (LM counts, BM25 stats): a pointer file names the live
  * version, updates write a COMPLETE new version directory and then
  * swap the pointer with one atomic rename.
  *
  * Why (r15 ADVICE, both findings on StreamingJobs.scala):
  *  - the old read→merge→overwrite rewrote the standing parquet in
  *    place from an executor-memory localCheckpoint, so a crash
  *    mid-overwrite destroyed the artifact (old files already deleted,
  *    checkpoint blocks gone with the app). Here the old version is
  *    never touched while the new one is written; a crash at ANY point
  *    leaves `_CURRENT` naming a complete, consistent version.
  *  - at-least-once replays double-counted into the standing statistics
  *    (the foreachBatch batchId was received and ignored). The pointer
  *    records the last merged batch id; micro-batch ids are monotonic
  *    per checkpoint, so `batchId <= lastBatchId` IS the replay ledger
  *    and a re-delivered batch is skipped, making the merge
  *    exactly-once in effect.
  *
  * Layout: `dir/v<k>/<table>/` (one parquet dir per named table — the
  * BM25 artifact keeps its (n_docs, sumdl) scalars as their OWN 1-row
  * table instead of denormalized columns, so a zero-vocab wave can
  * never reset them), pointer `dir/_CURRENT` = "v<k>:<lastBatchId>".
  * A version is multi-table precisely so vocab + scalars commit in ONE
  * atomic swap.
  *
  * The pointer swap is `Files.move(..., ATOMIC_MOVE)` — atomic on the
  * local/POSIX filesystems this runs on and on HDFS-style rename
  * semantics; on an eventually-consistent object store a deployment
  * would back this with a transactional table format instead (the same
  * caveat every rename-based committer carries). The previous version
  * is kept (readers mid-scan keep their file handles); versions older
  * than that are pruned best-effort AFTER the swap, where a crash can
  * only leave unreferenced garbage, never a broken pointer. */
object VersionedTable {
  private val Pointer = "_CURRENT"

  private def ptrPath(dir: String) = java.nio.file.Paths.get(dir, Pointer)

  /** (live version name, last merged batch id), None when unseeded. */
  def current(dir: String): Option[(String, Long)] = {
    val p = ptrPath(dir)
    if (!java.nio.file.Files.exists(p)) None
    else {
      val Array(v, b) = java.nio.file.Files.readString(p).trim.split(":", 2)
      Some((v, b.toLong))
    }
  }

  /** Last merged micro-batch id; -1 covers both "only seeded" (the seed
    * commits as -1) and the convention that real batch ids start at 0. */
  def lastBatchId(dir: String): Long = current(dir).map(_._2).getOrElse(-1L)

  /** True iff `batchId` was already merged — the replay-skip rule.
    * Sound because foreachBatch delivers micro-batches in id order. */
  def alreadyMerged(dir: String, batchId: Long): Boolean =
    batchId <= lastBatchId(dir)

  /** Read one named table of the live version. */
  def read(s: SparkSession, dir: String, table: String = "t"): DataFrame = {
    val (v, _) = current(dir).getOrElse(
      sys.error(s"VersionedTable at $dir is unseeded (no $Pointer)"))
    s.read.parquet(s"$dir/$v/$table")
  }

  /** Write a complete new version holding `tables`, then atomically
    * advance the pointer to (new version, batchId). Versions older than
    * the immediately-previous one are pruned after the swap. */
  def commit(dir: String, batchId: Long, tables: Seq[(String, DataFrame)]): Unit = {
    val prev = current(dir)
    val k = prev.map(_._1.drop(1).toLong + 1).getOrElse(0L)
    val v = s"v$k"
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$v/$name")
    }
    val tmp = java.nio.file.Paths.get(dir, s"$Pointer.tmp")
    java.nio.file.Files.writeString(tmp, s"$v:$batchId")
    java.nio.file.Files.move(tmp, ptrPath(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // Best-effort prune of versions older than the previous one.
    prune(dir, keep = Set(v) ++ prev.map(_._1))
  }

  /** Seed a fresh artifact (batch id -1: every real batch merges). */
  def seed(dir: String, tables: Seq[(String, DataFrame)]): Unit =
    commit(dir, -1L, tables)

  private def prune(dir: String, keep: Set[String]): Unit =
    try {
      val d = java.nio.file.Paths.get(dir)
      val versions = java.nio.file.Files.list(d)
      val doomed =
        try {
          import scala.jdk.CollectionConverters._
          versions.iterator().asScala
            .filter(p => p.getFileName.toString.matches("v\\d+") &&
              !keep(p.getFileName.toString))
            .toList
        } finally versions.close()
      doomed.foreach { p =>
        val walk = java.nio.file.Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toList.reverse
            .foreach(f => java.nio.file.Files.deleteIfExists(f))
        } finally walk.close()
      }
    } catch { case _: java.io.IOException => () } // garbage, not corruption
}
