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
