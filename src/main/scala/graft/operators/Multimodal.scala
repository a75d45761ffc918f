package graft.operators

import graft.{GraftQuery, Tables}
import graft.multimodal.Media
import org.apache.spark.sql.functions._

/** Driver-visible queries over the multimodal plumbing
  * (graft.multimodal.Media — SURVEY.md §2.10 north star). The media
  * corpus derives deterministically from `documents` (text bytes stand
  * in for an encoded payload), so the byte-accounting half is
  * DuckDB-checkable; the stub-decode half (hash-ladder features) is
  * deterministic but engine-specific, so that query is oracle-exempt
  * (driver rows-only check) and law-tested in MediaSpec.
  */
object Multimodal {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_media_meta",
      "Multimodal metadata pass: documents → typed media rows (kind by " +
        "id, payload bytes), per-'video' frame-sample cardinality via " +
        "the explode-shaped sampleFrames, left-joined back so every " +
        "media row reports its frame count. The byte/kind/frame " +
        "arithmetic is engine-owned and exactly oracle-checkable; " +
        "payload decode stays behind the stub seam.",
      (s, d) => {
        val media = Media.mediaFromDocuments(Tables.documents(s, d)).toDF()
        val frames = Media.sampleFrames(
          Media.mediaFromDocuments(Tables.documents(s, d)))
          .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
        media.join(frames, Seq("media_id"), "left")
          .select(col("media_id"), col("kind"),
            length(col("bytes")).cast("bigint").as("n_bytes"),
            coalesce(col("n_frames"), lit(0L)).as("n_frames"))
          .orderBy("media_id")
      },
      Some("SELECT doc_id AS media_id, " +
        "['image','audio','video'][(doc_id % 3) + 1] AS kind, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "CASE WHEN (doc_id % 3) + 1 = 3 THEN " +
        "greatest(CAST(floor(octet_length(encode(text)) / 16) AS BIGINT) " +
        "- 1, 0) + 1 ELSE 0 END AS n_frames " +
        "FROM documents ORDER BY media_id")),

    GraftQuery(
      "q_media_features",
      "Batched per-partition media decode: byte-bounded repartition, " +
        "then mapPartitions with per-partition codec init and " +
        "batch-shaped calls (the Arrow-batch analog) through the " +
        "deterministic stub codec. Oracle-exempt (the stub's hash " +
        "ladder is engine-specific); MediaSpec pins determinism and " +
        "batch-shape invariance.",
      (s, d) => {
        val media = Media.repartitionByBytes(
          Media.mediaFromDocuments(Tables.documents(s, d)))
        Media.extractFeatures(media).toDF()
          .select(col("media_id"), col("kind"), col("n_bytes"),
            col("digest"),
            round(element_at(col("features"), 1).cast("double"), 6)
              .as("f0"))
          .orderBy("media_id")
      },
      None)
  )
}
