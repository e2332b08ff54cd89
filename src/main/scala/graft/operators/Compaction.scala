package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the at-rest maintenance job every streaming
  * or fine-grained-ingest table eventually needs: micro-batch sinks and
  * over-parallel writers leave thousands of KB-sized files, and at
  * 100 TB the scan cost becomes driver-side file listing + per-file
  * open overhead instead of IO (a million 100 KB files costs more to
  * PLAN than to read). Compaction rewrites a directory into
  * ~target-sized files in one shuffle.
  *
  * The swap is the staging discipline Sinks.saveMultiRow documents: the
  * rewrite lands in `<path>.compacting`, the old directory moves to
  * `<path>.pre-compaction`, the new one renames in, and the backup is
  * deleted last. Each HDFS rename is atomic but the SEQUENCE is not;
  * the crash states, exhaustively: (a) before the first rename — the
  * original is untouched, a stale `.compacting` may remain (swept on
  * the next run); (b) BETWEEN the renames — `<path>` is absent, the
  * original data is intact in `.pre-compaction` and the rewrite in
  * `.compacting` (the next run self-heals by restoring the backup —
  * the original, the strictly safer copy — before proceeding); (c)
  * after the second rename — the new data is live, a stale
  * `.pre-compaction` remains (swept on the next run). No crash state
  * bricks future compactions or loses data. Readers holding the old
  * file list mid-swap fail and retry, the standard non-transactional-
  * table trade (table formats with snapshot isolation solve this with
  * metadata commits; this utility serves plain parquet directories).
  *
  * Round-robin repartition deliberately: compaction serves UNSORTED
  * ingest output. Data with a cultivated order (z-ordered or bucketed
  * layouts) should be rewritten through [[ZOrder.zorderWrite]] /
  * [[Bucketing.writeBucketed]] instead — a plain compact would destroy
  * the clustering the layout paid for. */
object Compaction {

  /** before/after file counts and bytes, for the operator's audit log. */
  final case class Stats(filesBefore: Int, filesAfter: Int, bytes: Long,
      targetBytes: Long)

  /** Rewrite the parquet directory at `path` into ceil(bytes/target)
    * files. Returns the audit stats; no-op (no rewrite at all) when the
    * directory already has that many files or fewer. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): Stats = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new Path(path + ".compacting")
    val backup = new Path(path + ".pre-compaction")
    // Self-heal crash state (b): a prior run died mid-swap — restore
    // the original (the strictly safer copy; the rewrite is re-derived
    // below anyway).
    if (!fs.exists(p) && fs.exists(backup))
      require(fs.rename(backup, p), s"could not restore $backup to $p")
    def dataFiles() = fs.listStatus(p)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val before = dataFiles()
    val bytes = before.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (before.length <= n)
      return Stats(before.length, before.length, bytes, targetBytes)
    // Sweep BOTH possible leftovers of a crashed prior run: a stale
    // backup would otherwise make the rename below fail forever (posix
    // rename-onto-existing returns false) or nest data (HDFS
    // dst-is-directory semantics). Reaching this line means `path`
    // exists, so a stale backup is a superseded copy, safe to drop.
    fs.delete(staging, true)
    fs.delete(backup, true)
    spark.read.parquet(path).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    require(fs.rename(p, backup), s"could not move $p aside")
    require(fs.rename(staging, p), s"could not move compacted data into $p")
    fs.delete(backup, true)
    Stats(before.length, dataFiles().length, bytes, targetBytes)
  }
}
