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
  *    records (last merged batch id, owning stream identity); within one
  *    stream identity micro-batch ids are monotonic, so `batchId <=
  *    lastBatchId` is the replay ledger and a re-delivered batch is
  *    skipped, making the merge exactly-once in effect. A DIFFERENT
  *    stream identity (fresh/reset checkpoint — batch ids restart at 0)
  *    resets the ledger instead of silently dropping the new stream's
  *    data until its counter passes the old high-water mark (r16
  *    ADVICE, medium; Delta's txnAppId + txnVersion pattern).
  *
  * Layout: `dir/v<k>/<table>/` (one parquet dir per named table — the
  * BM25 artifact keeps its (n_docs, sumdl) scalars as their OWN 1-row
  * table instead of denormalized columns, so a zero-vocab wave can
  * never reset them), pointer `dir/_CURRENT` =
  * "v<k>:<lastBatchId>[:<streamId>]".
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

  /** The pointer path is driver-local java.nio; table data goes through
    * Spark's Hadoop FS. On a remote scheme (hdfs://, s3a://, ...) the two
    * would silently split the artifact across filesystems — the pointer
    * written to a bogus driver-local path while parquet lands remotely,
    * and `current` reading "unseeded" forever (r16 ADVICE). Fail fast
    * instead: this implementation is local-filesystem only; a cluster
    * deployment backs the pointer with the Hadoop FileSystem API (rename
    * is atomic on HDFS) or a transactional table format. */
  private def requireLocal(dir: String): Unit =
    require(!dir.matches("^[a-zA-Z][a-zA-Z0-9+.-]*://.*"),
      s"VersionedTable is local-filesystem only (pointer I/O is java.nio " +
        s"on the driver); got a scheme-qualified dir: $dir — use a local " +
        s"path, or back the pointer with Hadoop FileSystem rename for HDFS")

  private def ptrPath(dir: String) = {
    requireLocal(dir)
    java.nio.file.Paths.get(dir, Pointer)
  }

  /** (live version name, last merged batch id), None when unseeded. */
  def current(dir: String): Option[(String, Long)] =
    currentEntry(dir).map { case (v, b, _) => (v, b) }

  /** (live version, last merged batch id, owning stream identity) — the
    * stream identity is "" for artifacts last written by a pre-identity
    * commit or by a caller that did not declare one. */
  def currentEntry(dir: String): Option[(String, Long, String)] = {
    val p = ptrPath(dir)
    if (!java.nio.file.Files.exists(p)) None
    else java.nio.file.Files.readString(p).trim.split(":", 3) match {
      case Array(v, b) => Some((v, b.toLong, ""))
      case Array(v, b, sid) => Some((v, b.toLong, sid))
    }
  }

  /** Last merged micro-batch id; -1 covers both "only seeded" (the seed
    * commits as -1) and the convention that real batch ids start at 0. */
  def lastBatchId(dir: String): Long = current(dir).map(_._2).getOrElse(-1L)

  /** True iff `batchId` was already merged — the replay-skip rule, keyed
    * on (stream identity, batchId) like Delta's txnAppId + txnVersion
    * (r16 ADVICE, medium). Micro-batch ids are monotonic only PER
    * CHECKPOINT, so a bare id comparison across a checkpoint reset
    * silently drops genuinely new data until the fresh counter passes
    * the old high-water mark. With identities:
    *  - same identity (a restart of the same checkpoint): id-order
    *    replay skip, exactly-once as before;
    *  - DIFFERENT identity (fresh/reset checkpoint): the ledger resets —
    *    every batch the new stream delivers merges as new data, with a
    *    loud warning, and the commit adopts the new identity. The
    *    operator contract this implies (Delta's): a new checkpoint must
    *    not re-deliver already-merged source data, or it double-counts.
    *    No silent drop in either direction.
    *  - an EMPTY identity on either side degrades to the legacy bare-id
    *    rule (direct library calls, pre-identity artifacts). */
  def alreadyMerged(dir: String, batchId: Long, streamId: String = ""): Boolean =
    currentEntry(dir) match {
      case None => false
      case Some((_, b, sid)) =>
        if (sid.nonEmpty && streamId.nonEmpty && sid != streamId) {
          System.err.println(s"[versioned-table] $dir: stream identity " +
            s"changed ($sid -> $streamId) — replay ledger RESET; every batch " +
            s"of the new stream merges as new data. Ensure the new checkpoint " +
            s"does not re-deliver already-merged source data.")
          false
        } else batchId <= b
    }

  /** Read one named table of the live version. */
  def read(s: SparkSession, dir: String, table: String = "t"): DataFrame = {
    val (v, _) = current(dir).getOrElse(
      sys.error(s"VersionedTable at $dir is unseeded (no $Pointer)"))
    s.read.parquet(s"$dir/$v/$table")
  }

  /** Write a complete new version holding `tables`, then atomically
    * advance the pointer to (new version, batchId, streamId). Versions
    * older than the immediately-previous one are pruned after the swap.
    * `streamId` must be colon-free (the pointer is colon-delimited). */
  def commit(dir: String, batchId: Long, tables: Seq[(String, DataFrame)],
      streamId: String = ""): Unit = {
    require(!streamId.contains(":"),
      s"streamId must be colon-free (pointer delimiter): $streamId")
    val prev = current(dir)
    val k = prev.map(_._1.drop(1).toLong + 1).getOrElse(0L)
    val v = s"v$k"
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$v/$name")
    }
    val tmp = java.nio.file.Paths.get(dir, s"$Pointer.tmp")
    val sidSuffix = if (streamId.isEmpty) "" else s":$streamId"
    java.nio.file.Files.writeString(tmp, s"$v:$batchId$sidSuffix")
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
