package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Checkpoint recovery: a watermarked aggregation stopped mid-stream and
  * restarted from its checkpoint must neither lose nor double-count data
  * — the exactly-once contract the 100 TB streaming story depends on. */
class RecoverySpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long, v: Double) =
    Ev(id, Timestamp.valueOf(t), user, "click", v, "{}")

  test("windowed agg restarts from checkpoint without loss or double-count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val input = MemoryStream[Ev]

    def start() = StreamingJobs.tumbling(input.toDF())
      .writeStream.outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .format("memory").queryName("recovery_out").start()

    val q1 = start()
    input.addData(Seq(
      ev(1, "2024-01-01 00:05:00", 1, 1.0),
      ev(2, "2024-01-01 00:15:00", 1, 2.0)))
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint; feed the second half
    val q2 = start()
    input.addData(Seq(
      ev(3, "2024-01-01 00:25:00", 2, 4.0),
      ev(4, "2024-01-01 01:05:00", 2, 8.0)))
    q2.processAllAvailable()
    val rows = spark.table("recovery_out")
      .orderBy("hr", "event_type")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSeq
    q2.stop()

    assert(rows == Seq(
      ("2024-01-01 00:00:00", 3L, 7.0),   // events 1+2 (pre-restart) + 3
      ("2024-01-01 01:00:00", 1L, 8.0)),  // event 4 only
      s"state must survive the restart exactly once, got $rows")
  }
}
