package graft.pipeline

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode/feature-extraction as
  * per-partition batch transforms.
  *
  * The container has no media codecs, so [[decodeStub]] is a clearly-marked
  * deterministic fake — but everything Spark-side is real and tested: the
  * schema contract, the `mapPartitions` batching (one decoder instance per
  * partition, streamed row iterator, no per-row setup cost), and the
  * repartitioning knob that bounds how many payload bytes sit in one task
  * at 100 TB (payload-heavy tables want `maxPartitionBytes` tuned down and
  * pruned early via metadata-only predicates before any decode runs).
  */
object Multimodal {

  /** Schema contract for a multimodal table: opaque payload + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true)))

  /** Feature row produced by the decode/extract stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feat_mean", DoubleType, nullable = false),
    StructField("frame_count", IntegerType, nullable = false)))

  /** STUB decoder: a real deployment would decode the payload with an
    * image/audio codec here (the batch shape — one instance per partition,
    * iterator-in/iterator-out — is exactly what a JNI codec needs). The
    * fake derives deterministic pseudo-features from the raw bytes so the
    * plumbing is testable end-to-end without codecs. */
  private[pipeline] def decodeStub(payload: Array[Byte]): (Long, Double, Int) = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum = checksum * 31 + (payload(i) & 0xff); i += 1 }
    val mean = if (payload.isEmpty) 0.0 else {
      var s = 0L; payload.foreach(b => s += (b & 0xff)); s.toDouble / payload.length
    }
    (checksum, mean, payload.length / 64 + 1)
  }

  /** Decode + feature-extract over a multimodal table: per-partition batch
    * transform (mapPartitions), the last-resort tier of the operator
    * decision table — justified here because codec calls are imperative. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      // one decoder instance per partition would be initialized here
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val (checksum, mean, frames) = decodeStub(payload)
        Row(id, payload.length, checksum, mean, frames)
      }
    }(enc)
  }

  /** Resized-media row produced by [[resize]]. */
  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta_width", IntegerType, nullable = false),
    StructField("meta_height", IntegerType, nullable = false)))

  /** STUB resize: a real deployment decodes, scales, and re-encodes here.
    * The fake deterministically truncates the payload proportionally to
    * the target area so output sizes are testable; the Spark-side shape —
    * per-partition batch transform, metadata recomputed alongside the
    * payload — is the real contract. */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(resizedSchema)
    media.select("media_id", "payload", "meta_width", "meta_height").mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        // meta_width/meta_height are nullable in mediaSchema — getInt on
        // null throws; treat missing dimensions as 1x1 (no shrink basis)
        val w0 = if (r.isNullAt(2)) 1 else r.getInt(2)
        val h0 = if (r.isNullAt(3)) 1 else r.getInt(3)
        val srcArea = math.max(1, w0 * h0)
        val frac = math.min(1.0, (width * height).toDouble / srcArea)
        val resized = payload.take(math.max(1, (payload.length * frac).toInt))
        Row(r.getLong(0), resized, width, height)
      }
    }(enc)
  }

  /** Frame-sampled row produced by [[frameSample]]. */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_payload", BinaryType, nullable = false)))

  /** STUB frame sampling: one output row per sampled "frame" (every
    * `stride`-th 64-byte chunk of the payload standing in for decoded
    * video frames). The flatMap shape — one input row fanning out to N
    * frame rows inside a partition iterator — is exactly how a real
    * demuxer integrates; downstream operators (dedup, embedding, filter)
    * consume frames as ordinary rows. */
  def frameSample(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive (1 keeps every frame), got $stride")
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        payload.grouped(64).zipWithIndex
          .filter { case (_, i) => i % stride == 0 }
          .map { case (chunk, i) => Row(r.getLong(0), i, chunk) }
      }
    }(enc)
  }

  /** Build a multimodal table from `documents` (text bytes standing in for
    * media payloads — the container ships no codecs or media fixtures). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("text/fake").as("media_type"),
      (col("n_chars") % 64).cast("int").as("meta_width"),
      (col("n_chars") % 48).cast("int").as("meta_height"))

  // ----------------------------------------------------------------
  val defs: Seq[QueryDef] = Seq(
    QueryDef("x08_multimodal_meta", TextStats.multimodalMeta,
      Some(TextStats.x08OracleSql)))
}
