package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.10 north star).
  *
  * Media (image/audio/video) rides through the engine as opaque
  * `binary` columns with typed metadata — exactly how the reference
  * treats every value as an opaque JSON blob (RestoreProcessor.php:80),
  * lifted to bytes. The plumbing — schema, batched per-partition
  * processing shape, partition sizing (media rows are MBs, so
  * rows-per-partition must be bounded by bytes, not row count),
  * deterministic testability — is real, and so is the decode for
  * images (javax.imageio) and PCM audio (javax.sound), both pure JDK.
  * Undecodable payloads fall back to a deterministic hash ladder
  * instead of failing the task. Video: container metadata is real
  * ([[Mp4]]), MJPEG frame decode is real via the pure-JDK default of
  * the [[VideoFrameDecoder]] seam, and inter-frame codecs (H.264,
  * HEVC) take the ladder until an external-codec plugin is passed in.
  */
object Media {

  final case class MediaRow(media_id: Long, kind: String,
                            bytes: Array[Byte], width: Int, height: Int)

  final case class MediaFeatures(media_id: Long, kind: String,
                                 n_bytes: Long, digest: Long,
                                 features: Array[Float])

  /** Deterministic media corpus derived from `documents` (the brief's
    * rule: derive from provided tables, don't invent data): text bytes
    * stand in for an encoded payload; width/height from stable hashes. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      (pmod(xxhash64(col("text")), lit(640)) + 32).cast("int").as("width"),
      (pmod(xxhash64(col("text"), lit(1)), lit(480)) + 32).cast("int").as("height")
    ).as[MediaRow]
  }

  /** Feature extraction over batched partitions. The decode call is the
    * stub seam; everything around it — mapPartitions with bounded
    * batches (the Scala analog of mapInPandas' Arrow batch shape),
    * typed Encoders, per-partition amortized "codec init" — is the real
    * production plumbing.
    */
  def extractFeatures(media: Dataset[MediaRow],
                      batchSize: Int = 64,
                      frameDecoder: VideoFrameDecoder = MjpegFrameDecoder)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "codec" initialization happens once, here —
      // a real implementation would open the native decoder. The
      // frameDecoder parameter is the external-codec plug point:
      // passing e.g. an H.264 decoder built on a native library
      // upgrades video frame features cluster-wide with no other
      // code change (the VideoFrameDecoder trait is Serializable so
      // the plug ships in the task closure).
      val codec = new MediaCodec(frameDecoder)
      it.grouped(batchSize).flatMap { batch =>
        // batch-shaped call, like an Arrow record batch
        codec.decodeBatch(batch)
      }
    }
  }

  /** Repartition media by PAYLOAD BYTES, not row count — media rows are
    * KBs-to-MBs, so a row-count split makes partitions that differ by
    * orders of magnitude in memory. Sizing prefers the plan's
    * statistics (for a file scan, file sizes from the already-listed
    * footer metadata — free) — but ONLY for scan-shaped plans: without
    * CBO the estimate passes through Filter nodes un-reduced, so a
    * selective filter ("videos only", "over 1 MB") would size the
    * partition count from the UNFILTERED corpus — thousands of
    * near-empty partitions whose scheduling overhead dwarfs the work.
    * Filtered frames (column Filter AND typed-lambda TypedFilter —
    * both shapes pass the estimate through) pay one exact
    * `sum(length(bytes))` pass over the survivors instead. That read
    * scales with what SURVIVES: cheap exactly when the filter is
    * selective (the case that needs the correction most); for a
    * near-pass-through filter it approaches one full read of the
    * payload column, the price of an exact answer — a caller who
    * knows the filter keeps ~everything should repartition BEFORE
    * filtering and ride the free estimate. Frames where the
    * optimizer has no estimate at all (the default sentinel) use the
    * same exact path. The target mirrors
    * `spark.sql.files.maxPartitionBytes`'s 128 MB default. */
  def repartitionByBytes(media: Dataset[MediaRow],
                         targetBytes: Long = 128L << 20): Dataset[MediaRow] = {
    val plan = media.queryExecution.optimizedPlan
    val filtered = plan.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
      case t: org.apache.spark.sql.catalyst.plans.logical.TypedFilter => t
    }.isDefined
    val statBytes = plan.stats.sizeInBytes
    val total: Double =
      if (!filtered && statBytes < BigInt(Long.MaxValue) / 4)
        statBytes.toDouble
      else Option(media.agg(sum(length(col("bytes"))))
        .head.getAs[java.lang.Long](0)).map(_.toDouble).getOrElse(0.0)
    val parts = math.max(1, math.ceil(total / targetBytes).toInt)
    media.repartition(parts)
  }

  /** Resize to fit a bounding box, preserving aspect ratio. The
    * metadata arithmetic (the part an engine owns) is real; the pixel
    * re-encode is the same stub seam as [[MediaCodec]] — bytes pass
    * through unchanged here, a real impl would transcode. */
  def resizeToFit(media: Dataset[MediaRow],
                  maxW: Int, maxH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    // one shot: chained withColumn would re-evaluate the scale
    // expression against the already-updated width
    media.toDF()
      .withColumn("scale", least(lit(1.0),
        least(lit(maxW) / col("width"), lit(maxH) / col("height"))))
      .withColumn("width", greatest(floor(col("width") * col("scale")),
        lit(1)).cast("int"))
      .withColumn("height", greatest(floor(col("height") * col("scale")),
        lit(1)).cast("int"))
      .drop("scale")
      .as[MediaRow]
  }

  /** Deterministic frame sampling for "video": one row per sampled
    * frame index, stride derived from the payload size — the explode
    * shape of real frame extraction. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int = 16): DataFrame =
    media.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L),
          greatest((length(col("bytes")) / everyN).cast("bigint") - 1, lit(0L))))
          .as("frame_idx"))
      .withColumn("frame_digest",
        xxhash64(col("media_id"), col("frame_idx")))
}

/** One decoded video frame's summary features. */
final case class VideoFrame(frameIdx: Int, width: Int, height: Int,
                            meanLuma: Float)

/** The video frame-decode seam. The engine owns everything up to the
  * compressed sample — container parsing (Mp4), sample offsets/sizes,
  * the mapPartitions batch shape — and delegates sample-to-pixels to
  * an implementation of this trait. [[MjpegFrameDecoder]] is the
  * pure-JDK default (MJPEG samples ARE JPEG images); a deployment
  * with an external codec library on the classpath (jcodec, ffmpeg
  * bindings) plugs H.264/HEVC in by passing its own instance to
  * [[MediaCodec]] — the seam is a constructor argument, not a global.
  * Returning None means "codec not handled here": the caller keeps
  * its container metadata and the hash ladder covers frame features,
  * so a dirty or exotic corpus degrades, never fails. */
trait VideoFrameDecoder extends Serializable {
  def name: String
  /** Up to `maxFrames` decoded frames, or None if the payload's codec
    * is not handled by this decoder. `video` is the container's
    * already-parsed sample table (one Mp4.parseAll per row — the
    * caller must not force a second walk of the same moov/trak/stbl);
    * a plugin that runs its own demuxer may ignore it and read
    * `bytes` directly. */
  def decode(bytes: Array[Byte], video: Option[Mp4.SampleTable],
             maxFrames: Int): Option[Vector[VideoFrame]]
}

/** Real MJPEG frame decode, pure JDK: each sample of a Motion-JPEG
  * track ('jpeg'/'mjpa' fourcc — every frame independently coded) is a
  * complete JPEG image, so the Mp4 sample table + ImageIO decode the
  * actual pixels with no external codec. Inter-frame codecs (avc1,
  * hvc1, vp09, av01) return None — that is the external-codec seam. */
object MjpegFrameDecoder extends VideoFrameDecoder {
  private val JpegCodecs = Set("jpeg", "mjpa", "AVDJ", "avdj")

  override def name: String = "mjpeg-jdk"

  override def decode(bytes: Array[Byte], video: Option[Mp4.SampleTable],
                      maxFrames: Int): Option[Vector[VideoFrame]] =
    video
      .filter(t => JpegCodecs.contains(t.codec))
      .map { t =>
        val n = math.min(maxFrames, t.offsets.length)
        (0 until n).flatMap { i =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes,
                t.offsets(i).toInt, t.sizes(i).toInt))
            if (img == null) None
            else {
              var lum = 0.0
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  lum += (((rgb >> 16) & 0xFF) * 299 +
                    ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000.0
                  x += 1
                }
                y += 1
              }
              Some(VideoFrame(i, img.getWidth, img.getHeight,
                (lum / (img.getWidth.toDouble * img.getHeight)).toFloat))
            }
          } catch { // a corrupt frame drops; its neighbors still decode
            case scala.util.control.NonFatal(_) => None
          }
        }.toVector
      }
      .filter(_.nonEmpty)
}

/** The codec. Image and WAV-audio decode are REAL and pure-JDK —
  * `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF readers ship with the
  * JDK) and `javax.sound.sampled.AudioSystem` (WAV/AIFF PCM) — no
  * external libraries, headless-safe. A payload the JDK reader cannot
  * parse (corrupt bytes, or a format needing a native codec) falls
  * back to the deterministic hash ladder instead of failing the task —
  * the production posture for dirty media corpora, and what keeps
  * `q_media_features` deterministic on the synthetic corpus (whose
  * "image" bytes are text, hence all-fallback). Video: container
  * metadata via [[Mp4]], frame decode via the [[VideoFrameDecoder]]
  * seam (MJPEG real by default; inter-frame codecs need an external
  * plugin and fall back to the ladder's frame features). */
final class MediaCodec(frameDecoder: VideoFrameDecoder = MjpegFrameDecoder)
    extends Serializable {

  import Media._

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def digestOf(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = mix(h ^ bytes(i)); i += 1 }
    h
  }

  /** Fallback features: deterministic hash ladder over the digest. */
  private def fallback(m: MediaRow, h: Long): MediaFeatures = {
    val feats = new Array[Float](16)
    var j = 0
    var z = h
    while (j < 16) {
      z = mix(z)
      feats(j) = (z >>> 40).toFloat / (1 << 24).toFloat - 0.5f
      j += 1
    }
    MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, h, feats)
  }

  /** Real image decode: dimensions, per-channel means, 8-bin luminance
    * histogram, aspect — 16 floats. None if no JDK reader claims the
    * bytes. */
  private def decodeImage(m: MediaRow, h: Long): Option[MediaFeatures] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.bytes))
      if (img == null) None
      else {
        val (w, ht) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0.0, 0.0, 0.0)
        val hist = new Array[Long](8)
        var y = 0
        while (y < ht) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            sr += r; sg += g; sb += b
            hist(((r * 299 + g * 587 + b * 114) / 1000) >> 5) += 1L
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * ht
        val feats = new Array[Float](16)
        feats(0) = w.toFloat; feats(1) = ht.toFloat
        feats(2) = (sr / n).toFloat; feats(3) = (sg / n).toFloat
        feats(4) = (sb / n).toFloat
        var k = 0
        while (k < 8) { feats(5 + k) = (hist(k) / n).toFloat; k += 1 }
        feats(13) = (w.toDouble / ht).toFloat
        Some(MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, h, feats))
      }
    } catch {
      // ImageIO plugins throw unchecked exceptions (CMMException,
      // IllegalArgumentException, ...) on truncated/malformed bytes;
      // any decode failure must route to the fallback ladder, never
      // fail the task.
      case scala.util.control.NonFatal(_) => None
    }

  /** Real PCM-audio decode (WAV/AIFF): sample rate, channels, frame
    * count, duration, RMS + peak of the first channel — 16 floats. */
  private def decodeAudio(m: MediaRow, h: Long): Option[MediaFeatures] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val bytesPerFrame = math.max(1, fmt.getFrameSize)
        val buf = in.readAllBytes()
        // first channel, 16-bit little-endian PCM (the common WAV case)
        var rms = 0.0
        var peak = 0.0
        var count = 0
        if (fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian) {
          var i = 0
          while (i + 1 < buf.length) {
            val s = ((buf(i + 1) << 8) | (buf(i) & 0xFF)).toDouble / 32768.0
            rms += s * s
            peak = math.max(peak, math.abs(s))
            count += 1
            i += bytesPerFrame
          }
        }
        val feats = new Array[Float](16)
        feats(0) = fmt.getSampleRate
        feats(1) = fmt.getChannels.toFloat
        feats(2) = frames.toFloat
        feats(3) = if (fmt.getFrameRate > 0) frames / fmt.getFrameRate else 0f
        feats(4) = if (count > 0) math.sqrt(rms / count).toFloat else 0f
        feats(5) = peak.toFloat
        feats(6) = fmt.getSampleSizeInBits.toFloat
        Some(MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, h, feats))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Video CONTAINER metadata (ISO-BMFF boxes via [[Mp4]]): duration,
    * dimensions, track layout — the fields a pipeline filters on — are
    * real for real MP4/MOV files. Frame features (slots 7-11) come
    * from the [[VideoFrameDecoder]] seam when the codec is handled
    * (MJPEG by default — real pixels, no external library) and stay
    * zero otherwise; payloads that are not valid containers (including
    * the synthetic text-bytes corpus) still fall back to the ladder. */
  private def decodeVideo(m: MediaRow, h: Long): Option[MediaFeatures] = {
    // ONE box-tree walk per row: metadata and the frame-decoder's
    // sample table come from the same Mp4.parseAll
    val parsed = Mp4.parseAll(m.bytes)
    parsed.meta.map { meta =>
      val feats = new Array[Float](16)
      feats(0) = meta.width.toFloat
      feats(1) = meta.height.toFloat
      feats(2) = meta.durationSec.toFloat
      feats(3) = meta.nTracks.toFloat
      feats(4) = meta.nVideo.toFloat
      feats(5) = meta.nAudio.toFloat
      feats(6) = meta.timescale.toFloat
      frameDecoder.decode(m.bytes, parsed.video, maxFrames = 8)
        .foreach { frames =>
          feats(7) = frames.size.toFloat
          feats(8) = frames.head.meanLuma
          feats(9) = frames.map(_.meanLuma).sum / frames.size
          feats(10) = frames.head.width.toFloat
          feats(11) = frames.head.height.toFloat
        }
      MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, h, feats)
    }
  }

  private def decodeOne(m: MediaRow): MediaFeatures = {
    val h = digestOf(m.bytes)
    m.kind match {
      case "image" => decodeImage(m, h).getOrElse(fallback(m, h))
      case "audio" => decodeAudio(m, h).getOrElse(fallback(m, h))
      case "video" => decodeVideo(m, h).getOrElse(fallback(m, h))
      case _ => fallback(m, h)
    }
  }

  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map(decodeOne)
}
