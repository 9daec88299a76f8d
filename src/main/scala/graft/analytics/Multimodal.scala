package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs as a
  * *batched per-partition* pass (`Dataset.mapPartitions`) so a real decoder
  * (libjpeg, ffmpeg, …) would amortize its init cost per partition, not per
  * row — the Scala analog of arrow-batched `mapInPandas`.
  *
  * The decode step itself is a STUB: this container has no image/audio
  * libraries, so [[FakeDecoder]] derives deterministic pseudo-features from
  * the bytes. The Spark-side plumbing — binary schema, typed Encoders,
  * partition-batched UDF shape, feature struct schema — is real and tested,
  * and is exactly what a production decoder would slot into.
  *
  * 100 TB notes: media bytes dominate row size, so the pipeline (a) never
  * shuffles the binary column — features are extracted in place and the
  * payload dropped before any wide op; (b) relies on parquet column pruning
  * so metadata-only queries never read the blob pages — MEASURED, not
  * assumed: MultimodalPruningSpec shows the pruned ReadSchema plus footer
  * chunk accounting (metadata scans touch ~4% of the table's data bytes on
  * the test corpus; the fraction shrinks as payloads grow).
  */
object Multimodal {

  /** A media row: opaque payload + minimal typed metadata. */
  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                                 first_byte: Int, checksum: Long)

  /** The ONE additive mod-2^31 checksum every stub feature derives from —
    * the oracle reproduces this exact fold, so all call sites must share
    * this definition. */
  private def checksum(bytes: Array[Byte], from: Int, until: Int): Long = {
    var sum = 0L
    var i = from
    while (i < until) { sum = (sum + (bytes(i) & 0xff)) % 2147483647L; i += 1 }
    sum
  }

  /** STUB decoder — deterministic pseudo-decode in place of the real
    * image/audio library (`???` boundary): byte length, first byte, and a
    * mod-2^31 additive checksum stand in for width/height/fft features. */
  object FakeDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val bytes = row.media
      MediaFeatures(row.doc_id, row.format, bytes.length.toLong,
        if (bytes.nonEmpty) bytes(0) & 0xff else -1, checksum(bytes, 0, bytes.length))
    }
  }

  /** Adapt the `documents` table into a media table: the UTF-8 bytes of
    * `text` play the media payload; `source` plays the container format.
    * Restricted to non-empty ASCII payloads so the byte-level features the
    * stub decoder computes are reproducible from the characters by the SQL
    * oracle (multi-byte UTF-8 would diverge bytes from codepoints — a
    * harness constraint, not an engine one: the decoder itself is
    * byte-faithful for any payload). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) > 0 && col("text").rlike("^[\\x20-\\x7e]*$"))
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        col("source").as("format"))

  /** The batched decode pass: binary in, feature struct out, one decoder
    * instantiation per partition. */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real pipeline: init decoder here, once per partition
      rows.map(FakeDecoder.decode)
    }
  }

  /** End-to-end: documents → media binary → decoded features. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    extractFeatures(asMediaTable(graft.Tables(spark, dir).documents)).toDF()
  }

  /** Features of a resized payload (stub-resample → re-extract). */
  final case class ResizedFeatures(doc_id: Long, n_bytes_in: Long,
                                   n_bytes_out: Long, checksum_out: Long)

  /** The resize dataflow: binary in → [[resizeStub]] (deterministic
    * decimation standing in for a real resampler) → features of the
    * RESIZED payload, batched per partition like every media pass. The
    * payload is never shuffled: resize and re-extract happen in one narrow
    * stage and only the small feature row survives. */
  def resizeFeatures(media: DataFrame, factor: Int = 4)
                    (implicit spark: SparkSession): Dataset[ResizedFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real pipeline: init the resample kernel once per partition here
      rows.map { r =>
        val out = resizeStub(r.media, factor)
        ResizedFeatures(r.doc_id, r.media.length.toLong, out.length.toLong,
          checksum(out, 0, out.length))
      }
    }
  }

  /** End-to-end: documents → media binary → resized-payload features. */
  def resizedFeatures(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    resizeFeatures(asMediaTable(graft.Tables(spark, dir).documents)).toDF()
  }

  /** One sampled frame's features. */
  final case class FrameFeature(doc_id: Long, frame_idx: Long, frame_checksum: Long)

  /** STUB resize: deterministic byte decimation (every `factor`-th byte) in
    * place of a real image resampler — the Spark-side contract (binary in,
    * smaller binary out, applied per partition) is what a real kernel
    * would slot into. */
  def resizeStub(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** STUB frame sampling: treat the payload as fixed-size frames
    * (`frameSize` bytes), emit every `stride`-th frame's checksum — the
    * video-frame-sampling dataflow shape (one row in, N feature rows out,
    * batched per partition) with a deterministic fake in place of a real
    * demuxer. */
  def sampleFrames(media: DataFrame, frameSize: Int = 64, stride: Int = 2)
                  (implicit spark: SparkSession): Dataset[FrameFeature] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real pipeline: init the demuxer/decoder once per partition here
      rows.flatMap { row =>
        val bytes = row.media
        val nFrames = (bytes.length + frameSize - 1) / frameSize
        (0 until nFrames).iterator.filter(_ % stride == 0).map { k =>
          FrameFeature(row.doc_id, k.toLong,
            checksum(bytes, k * frameSize, math.min((k + 1) * frameSize, bytes.length)))
        }
      }
    }
  }

  /** End-to-end: documents → media binary → sampled frame features. */
  def frameFeatures(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    sampleFrames(asMediaTable(graft.Tables(spark, dir).documents)).toDF()
  }

  // ---- REAL decoders ([[MediaCodecs]]) ----------------------------------
  //
  // The queries below run genuine container parsing: each doc_id is mapped
  // by a closed-form formula to raster/PCM content, ENCODED into real
  // BMP / PPM / WAV bytes, then DECODED back by the byte-level parsers in
  // [[MediaCodecs]]. The oracle recomputes the expected dimensions,
  // duration, and a position-weighted pixel/sample digest from the same
  // closed form — so any decoder bug in BGR order, bottom-up rows, row
  // padding, chunk walking, or sign extension breaks the digest. The
  // synthesis happens inside mapPartitions: media bytes never leave the
  // partition; only feature rows survive (the 100 TB contract).

  /** Deterministic raster for doc_id: w=4+id%13, h=3+id%7, and the
    * row-major RGB byte at index i is (id·31 + y·7 + x·3 + c·11) mod 256 —
    * chosen to be reproducible in plain SQL by the oracle. */
  def synthImage(docId: Long): MediaCodecs.ImageRgb = {
    val w = (4 + docId % 13).toInt
    val h = (3 + docId % 7).toInt
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) {
      val y = i / (w * 3); val x = (i % (w * 3)) / 3; val c = i % 3
      px(i) = ((docId * 31 + y * 7 + x * 3 + c * 11) % 256).toByte
      i += 1
    }
    MediaCodecs.ImageRgb(w, h, px)
  }

  /** Deterministic PCM clip for doc_id: 8 kHz, 1+id%2 channels, 50+id%97
    * frames, 16-bit sample i = ((id·131 + i·17) mod 65536) − 32768. */
  def synthWav(docId: Long): MediaCodecs.WavPcm = {
    val ch = (1 + docId % 2).toInt
    val nf = (50 + docId % 97).toInt
    val samples = new Array[Int](nf * ch)
    var i = 0
    while (i < samples.length) {
      samples(i) = ((docId * 131 + i * 17) % 65536).toInt - 32768
      i += 1
    }
    MediaCodecs.WavPcm(8000, ch, 16, samples)
  }

  final case class ImageFeat(doc_id: Long, format: String, width: Long,
                             height: Long, pixel_digest: Long)
  final case class ResizeFeat(doc_id: Long, width_in: Long, height_in: Long,
                              width_out: Long, height_out: Long,
                              pixel_digest: Long)
  final case class WavFeat(doc_id: Long, sample_rate: Long, channels: Long,
                           n_frames: Long, duration_us: Long,
                           sample_digest: Long)

  /** Real image decode: even ids travel as BMP, odd as PPM; the decoder
    * dispatches on magic bytes and reports the container it detected. */
  def decodeImageFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables(spark, dir).documents.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val raster = synthImage(id)
          val container =
            if (id % 2 == 0) MediaCodecs.encodeBmp(raster)
            else MediaCodecs.encodePpm(raster)
          val img = MediaCodecs.decodeImage(container) // REAL byte-level parse
          ImageFeat(id, MediaCodecs.imageFormat(container),
            img.width.toLong, img.height.toLong, MediaCodecs.pixelDigest(img))
        }
      }.toDF().orderBy("doc_id")
  }

  /** Real decode → nearest-neighbor halve → RE-ENCODE → re-decode: the
    * digest is taken after a second full codec round trip, so encode and
    * decode must both be byte-faithful for the oracle to match. */
  def resizeImageFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables(spark, dir).documents.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val raster = synthImage(id)
          val container =
            if (id % 2 == 0) MediaCodecs.encodeBmp(raster)
            else MediaCodecs.encodePpm(raster)
          val img = MediaCodecs.decodeImage(container)
          val ow = (img.width + 1) / 2; val oh = (img.height + 1) / 2
          val small = MediaCodecs.resizeNearest(img, ow, oh)
          // second round trip through the OTHER container than the input
          val re =
            if (id % 2 == 0) MediaCodecs.decodePpm(MediaCodecs.encodePpm(small))
            else MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(small))
          ResizeFeat(id, img.width.toLong, img.height.toLong,
            re.width.toLong, re.height.toLong, MediaCodecs.pixelDigest(re))
        }
      }.toDF().orderBy("doc_id")
  }

  /** Real WAV PCM decode: RIFF chunk walk, fmt parse, 16-bit LE sign
    * extension; duration derived from frames/rate like a real probe. */
  def decodeWavFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables(spark, dir).documents.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val clip = synthWav(id)
          val wav = MediaCodecs.decodeWav(MediaCodecs.encodeWav(clip))
          WavFeat(id, wav.sampleRate.toLong, wav.channels.toLong,
            wav.nFrames.toLong, wav.durationMicros, MediaCodecs.sampleDigest(wav))
        }
      }.toDF().orderBy("doc_id")
  }
}
