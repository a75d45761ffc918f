package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._

/** The multimodal plumbing contract: schema, batch shape, determinism —
  * plus the REAL pure-JDK decode paths (ImageIO for images,
  * javax.sound for WAV audio; video remains the documented stub). The
  * synthetic corpus carries text bytes, so corpus-level laws exercise
  * the fallback ladder; the decode tests below feed genuine PNG/WAV
  * payloads generated in-memory. */
class MultimodalSpec extends SparkSuite {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val media = Media.mediaFromDocuments(docs)

  test("media corpus has the binary-plus-metadata schema") {
    val sch = media.schema
    assert(sch("bytes").dataType.typeName == "binary")
    assert(sch("kind").dataType.typeName == "string")
    assert(media.count() == docs.count())
    val kinds = media.select("kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and total") {
    val f1 = Media.extractFeatures(media).collect()
    val f2 = Media.extractFeatures(media, batchSize = 7).collect()
    assert(f1.length == docs.count())
    // batch size must not change results (pure per-row decode)
    val m1 = f1.map(f => f.media_id -> (f.digest, f.features.toSeq)).toMap
    val m2 = f2.map(f => f.media_id -> (f.digest, f.features.toSeq)).toMap
    assert(m1 == m2)
    assert(f1.forall(_.features.length == 16))
    assert(f1.forall(_.n_bytes > 0))
  }

  test("feature extraction distributes (no driver-side collect)") {
    // runs over a repartitioned dataset; row counts must be preserved
    // across an arbitrary partitioning
    val repart = media.repartition(13)
    assert(Media.extractFeatures(repart).count() == media.count())
  }

  test("byte-bounded repartitioning sizes partitions by payload") {
    // ~100 docs x ~1KB payloads; a 4KB target must yield many
    // partitions, a huge target exactly one
    val small = Media.repartitionByBytes(media, targetBytes = 4096)
    val one = Media.repartitionByBytes(media, targetBytes = Long.MaxValue >> 8)
    val totalBytes = media.toDF().agg(sum(length(col("bytes"))))
      .head.getLong(0)
    val expected = math.ceil(totalBytes / 4096.0).toInt
    assert(small.rdd.getNumPartitions == expected)
    assert(one.rdd.getNumPartitions == 1)
    assert(small.count() == media.count())
  }

  test("resize preserves aspect ratio within the bounding box") {
    val resized = Media.resizeToFit(media, 64, 64).collect()
    val orig = media.collect().map(m => m.media_id -> m).toMap
    resized.foreach { r =>
      assert(r.width <= 64 && r.height <= 64 && r.width >= 1 && r.height >= 1)
      val o = orig(r.media_id)
      if (o.width > 64 || o.height > 64) {
        // the larger relative dimension must hit (close to) the box
        val sW = r.width.toDouble / o.width
        val sH = r.height.toDouble / o.height
        assert(math.abs(sW - sH) < 0.05,
          s"aspect drift for ${r.media_id}: $sW vs $sH")
      } else assert(r.width == o.width && r.height == o.height)
    }
  }

  test("frame sampling explodes only videos, deterministically") {
    val frames = Media.sampleFrames(media)
    val vids = media.filter(col("kind") === "video")
    assert(frames.select("media_id").distinct().count() == vids.count())
    // frame digest is a pure function of (media_id, frame_idx)
    val a = frames.orderBy("media_id", "frame_idx").collect()
    val b = Media.sampleFrames(media).orderBy("media_id", "frame_idx").collect()
    assert(a.sameElements(b))
  }

  // ---- real decode paths (pure JDK, in-memory payloads) --------------

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("image decode is real: PNG dimensions and channel means") {
    val sp = spark; import sp.implicits._
    // a solid orange 12x8 PNG: decoded dims and means must be exact
    val bytes = pngBytes(12, 8, 0xFF8020)
    val rows = Seq(Media.MediaRow(1L, "image", bytes, 0, 0)).toDS()
    val f = Media.extractFeatures(rows).collect().head
    assert(f.features(0) == 12.0f && f.features(1) == 8.0f)
    assert(f.features(2) == 255.0f) // mean R
    assert(f.features(3) == 128.0f) // mean G
    assert(f.features(4) == 32.0f)  // mean B
    // one luminance bin holds every pixel
    assert((5 until 13).map(f.features(_)).count(_ == 1.0f) == 1)
  }

  test("audio decode is real: WAV rate, frames, RMS of a known signal") {
    val sp = spark; import sp.implicits._
    // a constant full-scale-half signal: RMS == 0.5, peak == 0.5
    val samples = Array.fill[Short](8000)((16384).toShort)
    val pcm = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(pcm.putShort)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), fmt, samples.length)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val rows = Seq(Media.MediaRow(2L, "audio", out.toByteArray, 0, 0)).toDS()
    val f = Media.extractFeatures(rows).collect().head
    assert(f.features(0) == 8000f)          // sample rate
    assert(f.features(1) == 1f)             // channels
    assert(f.features(2) == 8000f)          // frames
    assert(math.abs(f.features(4) - 0.5f) < 1e-3) // RMS
    assert(math.abs(f.features(5) - 0.5f) < 1e-3) // peak
  }

  test("undecodable payloads fall back to the deterministic ladder") {
    val sp = spark; import sp.implicits._
    val junk = "definitely not a png".getBytes("UTF-8")
    val rows = Seq(Media.MediaRow(3L, "image", junk, 0, 0)).toDS()
    val f1 = Media.extractFeatures(rows).collect().head
    val f2 = Media.extractFeatures(rows).collect().head
    assert(f1.features.toSeq == f2.features.toSeq) // deterministic
    assert(f1.features.length == 16)
    assert(f1.digest == f2.digest)
  }
}
