package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{DataFrame, Dataset}

/** Pin bounded statistics on a checkpointed frame.
  *
  * Why this exists (found by the sf1 scaling probe, round 15):
  * `Dataset.localCheckpoint`/`checkpoint` re-root the frame on a
  * [[LogicalRDD]] whose statistics are REWRITTEN from the pre-checkpoint
  * plan (`LogicalRDD.rewriteStatsAndConstraints`), and the size-only
  * estimator (`SizeInBytesOnlyStatsPlanVisitor.visitJoin`) MULTIPLIES
  * child sizes for inner joins. An iterated checkpoint — graft's
  * min-label propagation loop, which joins the previous round's
  * checkpointed labels twice per round — therefore carries sizeInBytes
  * whose DIGIT COUNT doubles every round: by round ~20 the driver sits
  * in BigInteger.multiply (Karatsuba/Toom-Cook) for minutes computing
  * statistics nobody can use. The fix is to pin each round's
  * materialized frame to the session's `defaultSizeInBytes` (the
  * "unknown leaf" convention, Long.MaxValue by default): every round's
  * rewrite then multiplies small-digit numbers, and downstream broadcast
  * decisions are unchanged — the inflated stats already precluded
  * auto-broadcast, and the library broadcasts its small sides
  * explicitly.
  *
  * Lives in Spark's package to reach `Dataset.ofRows` and the
  * [[LogicalRDD]] second parameter list — public Apache Spark source,
  * pinned to the 4.1.x layout the build ships.
  */
object GraftCheckpointStats {
  /** `df` unchanged unless its analyzed plan is a [[LogicalRDD]] (the
    * checkpoint shape) — then the same RDD re-wrapped with pinned
    * statistics. */
  def pinDefault(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val c = df.asInstanceOf[DataFrame]
    c.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val size = BigInt(c.sparkSession.sessionState.conf.defaultSizeInBytes)
        Dataset.ofRows(c.sparkSession,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            c.sparkSession, Some(Statistics(sizeInBytes = size)), None))
      case _ => df
    }
  }

  /** The sizeInBytes the analyzed plan currently reports — test hook so
    * a spec can pin that iterated checkpoints stay bounded. */
  def statsSizeOf(df: org.apache.spark.sql.DataFrame): BigInt =
    df.asInstanceOf[DataFrame].queryExecution.optimizedPlan.stats.sizeInBytes
}
