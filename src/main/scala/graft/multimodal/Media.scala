package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.10 north star).
  *
  * Media (image/audio/video) rides through the engine as opaque
  * `binary` columns with typed metadata — exactly how the reference
  * treats every value as an opaque JSON blob (RestoreProcessor.php:80),
  * lifted to bytes. What must be REAL at 100 TB is the plumbing: the
  * schema, the batched per-partition processing shape, partition sizing
  * (media rows are MBs, so rows-per-partition must be bounded by bytes,
  * not row count), and deterministic testability. The codec itself is
  * a stub: this container has no image/audio libraries, so
  * [[MediaCodec.decodeStub]] derives features from the bytes with a
  * deterministic hash ladder and is clearly marked as the seam where a
  * real decoder (JNI/library call) plugs in.
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
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "codec" initialization happens once, here —
      // a real implementation would open the native decoder.
      val codec = new MediaCodec
      it.grouped(batchSize).flatMap { batch =>
        // batch-shaped call, like an Arrow record batch
        codec.decodeBatch(batch)
      }
    }
  }

  /** Repartition media by PAYLOAD BYTES, not row count — media rows are
    * KBs-to-MBs, so a row-count split makes partitions that differ by
    * orders of magnitude in memory. One cheap metadata aggregate sizes
    * the shuffle; the target mirrors
    * `spark.sql.files.maxPartitionBytes`'s 128 MB default. */
  def repartitionByBytes(media: Dataset[MediaRow],
                         targetBytes: Long = 128L << 20): Dataset[MediaRow] = {
    val total = media.agg(sum(length(col("bytes"))))
      .head.getAs[java.lang.Long](0)
    val parts = math.max(1,
      math.ceil(Option(total).map(_.toDouble).getOrElse(0.0) /
        targetBytes).toInt)
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

/** The stub codec: the decode is a deterministic fake (hash ladder over
  * the bytes). REPLACE the body of `decodeOne` with a real library call
  * (e.g. javax.imageio / ffmpeg JNI) in an environment that has one —
  * the signature and batch shape are the contract. */
final class MediaCodec extends Serializable {

  import Media._

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def decodeOne(m: MediaRow): MediaFeatures = {
    // --- STUB: deterministic fake decode ---------------------------
    // real impl: decode m.bytes (image/audio/video), then embed.
    var h = 0L
    var i = 0
    while (i < m.bytes.length) { h = mix(h ^ m.bytes(i)); i += 1 }
    val feats = new Array[Float](16)
    var j = 0
    var z = h
    while (j < 16) {
      z = mix(z)
      feats(j) = (z >>> 40).toFloat / (1 << 24).toFloat - 0.5f
      j += 1
    }
    MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, h, feats)
    // ---------------------------------------------------------------
  }

  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map(decodeOne)
}
