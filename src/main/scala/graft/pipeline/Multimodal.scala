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
  * The container has no EXTERNAL media codecs, so [[decodeStub]] is a
  * clearly-marked deterministic fake for the generic tier — but the image
  * and audio paths are REAL: [[decodeImages]]/x08b round-trips PNG
  * through the JDK's own `javax.imageio` and [[decodeAudios]]/x08c
  * round-trips WAV through `javax.sound.sampled` (encode executor-side
  * from document-derived data, decode back, cross-check against stored
  * metadata). Everything
  * Spark-side is real and tested either way: the
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

  // ---------------------------------------------------------------- x08b
  /** REAL image decode via JDK ImageIO (round-8 ask #6): the container
    * ships no external codecs, but `javax.imageio` reads PNG from bytes
    * with zero new dependencies — so the decode tier of the multimodal
    * plumbing can be exercised for real, not stubbed. PNG is lossless,
    * so a decoded pixel equals the written pixel and every derived
    * feature below is deterministic cross-platform. */

  /** Encode a small grayscale PNG (w×h, pixels cycled from `seed`) —
    * the planted-fixture generator, run EXECUTOR-side inside the same
    * mapPartitions batch shape a real encoder would use. */
  private[pipeline] def pngFixture(w: Int, h: Int, seed: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val b = if (seed.isEmpty) 0 else seed(i % seed.length) & 0xff
        img.setRGB(x, y, (b << 16) | (b << 8) | b)
        i += 1; x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode an image payload with ImageIO: (width, height, mean pixel
    * intensity = unweighted RGB mean — exact on any input, equal to the
    * gray level on grayscale images; NOT Rec.601 luma, whose float
    * weights would make the planted-fixture compares approximate). None
    * for unreadable/empty payloads — a corrupt file in a 100 TB crawl
    * must score as undecodable, never kill the task. */
  private[pipeline] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] =
    if (payload == null || payload.isEmpty) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((img.getWidth, img.getHeight,
          sum.toDouble / (3L * img.getWidth * img.getHeight)))
      }
    } catch { case _: Exception => None }

  /** A media table with REAL PNG payloads derived deterministically from
    * `documents` (dimensions from n_chars, pixels from the text bytes) —
    * the encode half of the round trip, per-partition batched. */
  def imagesFromDocuments(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    docs.select(col("doc_id"), col("text"), col("n_chars").cast("int"))
      .mapPartitions { rows =>
        rows.map { r =>
          val n = if (r.isNullAt(2)) 0 else r.getInt(2)
          val w = n % 16 + 1
          val h = n % 12 + 1
          val seed =
            if (r.isNullAt(1)) Array.empty[Byte]
            else r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          Row(r.getLong(0), pngFixture(w, h, seed), "image/png",
            w: java.lang.Integer, h: java.lang.Integer)
        }
      }(enc)
  }

  /** Decoded-image feature row: real width/height/mean intensity plus
    * the meta-consistency verdict (decoded dims == stored metadata). */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("decoded", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("meta_match", IntegerType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false)))

  /** Real decode tier over a media table: one ImageIO reader per task,
    * iterator-in/iterator-out, undecodable rows scored not dropped. */
  def decodeImages(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "payload", "meta_width", "meta_height")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val mw = if (r.isNullAt(2)) -1 else r.getInt(2)
          val mh = if (r.isNullAt(3)) -1 else r.getInt(3)
          decodeImage(payload) match {
            case Some((w, h, mean)) =>
              Row(r.getLong(0), payload.length, 1, w, h,
                if (w == mw && h == mh) 1 else 0,
                math.rint(mean * 10000) / 10000)
            case None =>
              Row(r.getLong(0), payload.length, 0, 0, 0, 0, 0.0)
          }
        }
      }(enc)
  }

  /** Registered x08b: PNG-encode the documents table, decode it back
    * with ImageIO, emit per-image features + the metadata cross-check.
    * Rows-only (DuckDB cannot decode PNG) — MultimodalSpec pins exact
    * fixture values and the spec/meta consistency instead. */
  def imageDecodeQuery(s: SparkSession, dir: String): DataFrame =
    decodeImages(imagesFromDocuments(graft.Tables.t(s, dir, "documents")))
      .orderBy("media_id")

  // ---------------------------------------------------------------- x08c
  /** REAL audio decode via the JDK's own WAV codec (`javax.sound.sampled`
    * — pure Java, headless-safe, zero new dependencies): the audio
    * counterpart of x08b. Fixtures are integer-deterministic square
    * waves (no floating-point in generation), so every decoded feature —
    * frame count, format fields, RMS — is exact and reproducible. */

  /** Encode a mono 16-bit PCM WAV: a square wave of `period` frames
    * (amp, then −amp, alternating each half period). Executor-side, same
    * batch shape as [[pngFixture]]. */
  private[pipeline] def wavFixture(nFrames: Int, period: Int,
      sampleRate: Int = 8000, amp: Short = 8192): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v: Int = if ((i / math.max(1, period / 2)) % 2 == 0) amp else -amp
      pcm(2 * i) = (v & 0xff).toByte // little-endian s16
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload: (sampleRate, channels, frames, meanSquare) —
    * meanSquare is the exact integer mean of squared s16 samples (RMS² —
    * kept integral so the feature is bit-reproducible; callers can sqrt).
    * None for unreadable payloads, same contract as [[decodeImage]]. */
  private[pipeline] def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Long, Long)] =
    if (payload == null || payload.isEmpty) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        val data = ais.readAllBytes()
        val frameSz = f.getFrameSize
        val frames = if (frameSz > 0) data.length.toLong / frameSz else 0L
        // Mean square over s16 samples (16-bit PCM only — the fixture
        // format; other encodings report 0 rather than guessing).
        var sumSq = 0L
        var n = 0L
        if (f.getSampleSizeInBits == 16 && !f.isBigEndian) {
          var i = 0
          while (i + 1 < data.length) {
            val s = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort
            sumSq += s.toLong * s; n += 1; i += 2
          }
        }
        Some((f.getSampleRate.toInt, f.getChannels, frames,
          if (n == 0) 0L else sumSq / n))
      } finally ais.close()
    } catch { case _: Exception => None }

  /** A media table with REAL WAV payloads derived deterministically from
    * `documents` (duration and period from n_chars/doc_id). */
  def audioFromDocuments(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    docs.select(col("doc_id"), col("n_chars").cast("int"))
      .mapPartitions { rows =>
        rows.map { r =>
          val n = if (r.isNullAt(1)) 0 else r.getInt(1)
          val nFrames = 800 + n % 800
          val period = 16 + (r.getLong(0) % 48).toInt
          // meta_width carries frames/100, meta_height the period — the
          // audio analogue of the image dims cross-check.
          Row(r.getLong(0), wavFixture(nFrames, period), "audio/wav",
            (nFrames / 100): java.lang.Integer, period: java.lang.Integer)
        }
      }(enc)
  }

  /** Decoded-audio feature row (meta_match = decoded frame count
    * agrees with the stored frames/100 metadata — the audio analogue of
    * x08b's dimension cross-check; the period is not recoverable from
    * decode features, so only the frame field participates). */
  val decodedAudioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("decoded", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("meta_match", IntegerType, nullable = false),
    StructField("mean_square", LongType, nullable = false)))

  /** Real audio decode tier: one WAV parser per task, undecodable rows
    * scored not dropped — mirrors [[decodeImages]]. */
  def decodeAudios(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedAudioSchema)
    media.select("media_id", "payload", "meta_width").mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val metaFrames100 = if (r.isNullAt(2)) -1 else r.getInt(2)
        decodeAudio(payload) match {
          case Some((rate, ch, frames, meanSq)) =>
            Row(r.getLong(0), payload.length, 1, rate, ch, frames,
              if ((frames / 100).toInt == metaFrames100) 1 else 0, meanSq)
          case None => Row(r.getLong(0), payload.length, 0, 0, 0, 0L, 0, 0L)
        }
      }
    }(enc)
  }

  /** Registered x08c: WAV-encode the documents table, decode it back
    * through javax.sound.sampled, emit per-clip features. Rows-only
    * (DuckDB cannot parse WAV); PipelineSpec pins exact fixture values
    * and full-corpus decode + determinism. */
  def audioDecodeQuery(s: SparkSession, dir: String): DataFrame =
    decodeAudios(audioFromDocuments(graft.Tables.t(s, dir, "documents")))
      .orderBy("media_id")

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
      Some(TextStats.x08OracleSql)),
    QueryDef("x08b_image_decode", imageDecodeQuery, None),
    QueryDef("x08c_audio_decode", audioDecodeQuery, None))
}
