package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Lineage-truncation strategy for the composed pipelines.
  *
  * The multi-consumer frames in curate/curateV2 and every round of
  * [[Curation.propagateMinLabels]] need an EAGER materialization that
  * also truncates lineage (persist alone keeps the full plan tree, which
  * doubles per propagation round and blows up plan compilation — the
  * measured reason the loop checkpoints at all). Two strategies satisfy
  * that contract with different fault-tolerance:
  *
  *  - `local` (default): `localCheckpoint(eager = true)` — blocks live
  *    on executor local storage. Fastest (no distributed-FS write), the
  *    right choice on local[n] and in tests, but an executor loss
  *    DESTROYS blocks and, lineage having been truncated, the job dies
  *    instead of recomputing.
  *  - `reliable`: `checkpoint(eager = true)` to the session's Spark
  *    checkpoint directory — on a real cluster an HDFS/object-store
  *    path. Survives executor churn: lost partitions reload from the
  *    checkpoint files. The write costs one round-trip through the
  *    reliable store per checkpoint; at 100 TB that is the price of a
  *    restartable multi-hour job, and it is paid on the CHECKPOINTED
  *    frames only (post-gate, post-dedup — orders of magnitude smaller
  *    than the input corpus).
  *
  * Mode is read per call from the session conf, so one session can run
  * tests in `local` and flip to `reliable` for a production submit with
  * `--conf spark.graft.checkpoint.mode=reliable` plus either
  * `spark.graft.checkpoint.dir` or an sc.setCheckpointDir call; no
  * operator signature changes. SCALE.md "Fault tolerance of the composed
  * pipelines" carries the operational guidance.
  */
object Checkpoints {
  val ModeKey = "spark.graft.checkpoint.mode"
  val DirKey = "spark.graft.checkpoint.dir"

  // The DirKey value last applied via setCheckpointDir. Needed because
  // sc.getCheckpointDir returns the resolved URI with an appended UUID
  // subdirectory, so it can never be string-compared against DirKey to
  // detect a reconfiguration (e.g. a new bucket after a namespace move)
  // — without this, a changed DirKey would be silently ignored and
  // checkpoints would keep landing in the old location.
  @volatile private var appliedDir: Option[String] = None

  /** Eagerly materialize `df` with truncated lineage, by the session's
    * configured strategy.
    *
    * Reliable-mode file lifecycle: Spark deletes a reliable checkpoint's
    * files only when `spark.cleaner.referenceTracking.cleanCheckpoints`
    * is true (a STATIC conf — set it at SparkContext creation) AND the
    * RDD is garbage-collected; otherwise files persist after the job, by
    * design (that persistence is the recovery story). A long-lived
    * cluster deployment must either enable that cleaner flag or
    * lifecycle the checkpoint directory (bucket TTL / scheduled sweep) —
    * one rdd-* subdirectory accrues per checkpointed frame per run.
    * SCALE.md "Fault tolerance of the composed pipelines" carries this. */
  /** [[stable]] + PINNED statistics — for checkpoints that ITERATE (the
    * min-label propagation rounds): the checkpoint's stats rewrite
    * inherits the size-only join estimator's multiplied sizeInBytes, so
    * a loop that joins its own previous checkpoint twice per round
    * doubles the stat's DIGIT COUNT every round — the sf1 probe caught
    * the driver spending minutes in BigInteger.multiply inside
    * planning by round ~20. Pinning each round's frame to
    * defaultSizeInBytes keeps every rewrite small-digit and leaves
    * broadcast decisions as they were (the inflated stats already
    * precluded auto-broadcast of these frames). See
    * [[org.apache.spark.sql.execution.GraftCheckpointStats]]. */
  def stablePinned(df: DataFrame): DataFrame =
    org.apache.spark.sql.execution.GraftCheckpointStats.pinDefault(stable(df))

  def stable(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.get(ModeKey, "local") match {
      case "local" => df.localCheckpoint(eager = true)
      case "reliable" =>
        val sc = s.sparkContext
        val want = s.conf.getOption(DirKey)
        want match {
          // Apply DirKey when (a) the context has NO dir — covers first
          // use AND a context restart with the same conf (appliedDir is
          // JVM-global, the dir is per-context, so the tracker alone
          // would wrongly skip the re-apply) — or (b) DirKey changed
          // from what WE last applied (reconfiguration). A dir set
          // manually via sc.setCheckpointDir that this object never
          // applied always wins over a present DirKey, matching the
          // error message's "or call setCheckpointDir first" contract.
          case Some(d) if sc.getCheckpointDir.isEmpty ||
              (appliedDir.isDefined && !appliedDir.contains(d)) =>
            sc.setCheckpointDir(d); appliedDir = Some(d)
          case None if sc.getCheckpointDir.isEmpty =>
            throw new IllegalArgumentException(
              s"$ModeKey=reliable needs a checkpoint directory: set $DirKey " +
                "or call sparkContext.setCheckpointDir first")
          case _ => // DirKey unchanged, or a manually-set sc dir in charge
        }
        df.checkpoint(eager = true)
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be 'local' or 'reliable', got '$other'")
    }
  }
}
