package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._

/** The multimodal plumbing contract: schema, batch shape, determinism.
  * (Decode itself is a documented stub — no media libs in this
  * environment — so the laws are about the pipeline, not pixels.) */
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
}
