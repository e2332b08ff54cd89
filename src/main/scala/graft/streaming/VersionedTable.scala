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
  *    hwm(identity)` is the replay ledger and a re-delivered batch is
  *    skipped, making the merge exactly-once in effect. The pointer
  *    keeps a high-water mark PER identity (r17 ADVICE, medium;
  *    Delta's txnAppId → txnVersion map): an old stream restarted from
  *    its still-valid checkpoint after another identity committed
  *    (orchestrator rollback, two streams on one artifact) skips its
  *    own replayed batches instead of re-merging them, and a
  *    NEVER-SEEN identity (fresh/reset checkpoint — batch ids restart
  *    at 0) begins its own ledger entry instead of silently dropping
  *    data until its counter passes another stream's high-water mark
  *    (r16 ADVICE, medium).
  *
  * Layout: `dir/v<k>/<table>/` (one parquet dir per named table — the
  * BM25 artifact keeps its (n_docs, sumdl) scalars as their OWN 1-row
  * table instead of denormalized columns, so a zero-vocab wave can
  * never reset them), pointer `dir/_CURRENT` =
  * "v<k>:<lastBatchId>[:<streamId>]" followed by one
  * `ledger:<sid>:<hwm>` line per identity that ever committed.
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
    * commit or by a caller that did not declare one. Reads the
    * pointer's FIRST line; per-identity high-water marks ride the
    * following `ledger:` lines ([[ledger]]). */
  def currentEntry(dir: String): Option[(String, Long, String)] = {
    val p = ptrPath(dir)
    if (!java.nio.file.Files.exists(p)) None
    else java.nio.file.Files.readString(p).linesIterator.next().trim
      .split(":", 3) match {
        case Array(v, b) => Some((v, b.toLong, ""))
        case Array(v, b, sid) => Some((v, b.toLong, sid))
      }
  }

  /** Per-stream-identity high-water marks (sid → last merged batch id)
    * — Delta's txnAppId→txnVersion map, kept INSIDE the atomic pointer
    * (lines 2..n, `ledger:<sid>:<hwm>`), so it can never drift from
    * the version it describes. Why a MAP and not just the latest
    * identity (r17 ADVICE, medium): with only the latest retained, an
    * OLD stream restarted from its still-valid checkpoint after
    * another identity had committed (orchestrator rollback; two
    * streams accidentally pointed at one artifact) saw an identity
    * mismatch, reset the ledger, and RE-MERGED its replayed batches —
    * double-counting the standing statistics. With the map, each
    * identity keeps its own high-water mark for the artifact's life:
    * replays of ANY identity that ever committed are skipped.
    * Pre-map pointers (single line) degrade to a one-entry map seeded
    * from the owning identity. */
  def ledger(dir: String): Map[String, Long] = {
    val p = ptrPath(dir)
    if (!java.nio.file.Files.exists(p)) Map.empty
    else {
      val lines = java.nio.file.Files.readString(p).linesIterator.toList
      val fromLines = lines.drop(1).iterator.map(_.trim).filter(_.nonEmpty)
        .map(_.split(":", 3))
        .collect { case Array("ledger", sid, hwm) => sid -> hwm.toLong }
        .toMap
      // Seed with the first line's owning identity so artifacts written
      // before the map existed keep their replay skip.
      currentEntry(dir) match {
        case Some((_, b, sid)) if sid.nonEmpty && !fromLines.contains(sid) =>
          fromLines + (sid -> b)
        case _ => fromLines
      }
    }
  }

  /** Last merged micro-batch id; -1 covers both "only seeded" (the seed
    * commits as -1) and the convention that real batch ids start at 0. */
  def lastBatchId(dir: String): Long = current(dir).map(_._2).getOrElse(-1L)

  /** True iff `batchId` was already merged — the replay-skip rule, keyed
    * on (stream identity, batchId) like Delta's txnAppId + txnVersion
    * (r16 ADVICE, medium; r17 ADVICE hardened to a per-identity MAP).
    * Micro-batch ids are monotonic only PER
    * CHECKPOINT, so a bare id comparison across a checkpoint reset
    * silently drops genuinely new data until the fresh counter passes
    * the old high-water mark. With the [[ledger]] map:
    *  - an identity that EVER committed (the current one OR an earlier
    *    one restarted after a rollback / a second stream pointed at the
    *    artifact): id-order replay skip against ITS OWN high-water
    *    mark — replays never double-merge, new batches always admit;
    *  - a NEVER-SEEN identity (fresh/reset checkpoint): begins its own
    *    ledger entry — every batch it delivers merges as new data,
    *    with a loud warning on the first encounter. The operator
    *    contract this implies (Delta's): a new checkpoint must not
    *    re-deliver already-merged source data, or it double-counts.
    *    No silent drop in either direction.
    *  - an EMPTY identity on either side degrades to the legacy bare-id
    *    rule (direct library calls, pre-identity artifacts). */
  def alreadyMerged(dir: String, batchId: Long, streamId: String = ""): Boolean =
    currentEntry(dir) match {
      case None => false
      case Some((_, b, sid)) =>
        if (sid.isEmpty || streamId.isEmpty) batchId <= b
        else ledger(dir).get(streamId) match {
          case Some(hwm) => batchId <= hwm
          case None =>
            System.err.println(s"[versioned-table] $dir: new stream identity " +
              s"$streamId (owner $sid) — it begins its OWN replay ledger; " +
              s"every batch it delivers merges as new data. Ensure the new " +
              s"checkpoint does not re-deliver already-merged source data.")
            false
        }
    }

  /** Read one named table of the live version. */
  def read(s: SparkSession, dir: String, table: String = "t"): DataFrame = {
    val (v, _) = current(dir).getOrElse(
      sys.error(s"VersionedTable at $dir is unseeded (no $Pointer)"))
    s.read.parquet(s"$dir/$v/$table")
  }

  /** Write a complete new version holding `tables`, then atomically
    * advance the pointer to (new version, batchId, streamId) PLUS the
    * updated per-identity ledger map (line 1 + `ledger:` lines, one
    * file, one atomic move — the map can never drift from the version).
    * Versions
    * older than the immediately-previous one are pruned after the swap.
    * `streamId` must be colon- and newline-free (the pointer is
    * colon-delimited, one entry per line). */
  def commit(dir: String, batchId: Long, tables: Seq[(String, DataFrame)],
      streamId: String = ""): Unit = {
    require(!streamId.contains(":") && !streamId.exists(c => c == '\n' || c == '\r'),
      s"streamId must be colon- and newline-free (pointer delimiters): $streamId")
    val prev = current(dir)
    val prevLedger = ledger(dir)
    val k = prev.map(_._1.drop(1).toLong + 1).getOrElse(0L)
    val v = s"v$k"
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$v/$name")
    }
    val newLedger =
      if (streamId.isEmpty) prevLedger
      else prevLedger + (streamId ->
        math.max(batchId, prevLedger.getOrElse(streamId, -1L)))
    val tmp = java.nio.file.Paths.get(dir, s"$Pointer.tmp")
    val sidSuffix = if (streamId.isEmpty) "" else s":$streamId"
    val ledgerLines = newLedger.toSeq.sorted
      .map { case (sid, hwm) => s"\nledger:$sid:$hwm" }.mkString
    java.nio.file.Files.writeString(tmp, s"$v:$batchId$sidSuffix$ledgerLines")
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
