package graft.streaming

import graft.functions.ShingleHashes
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twins of the corpus-hygiene batch operators
  * (operators.Dedup `q_decontaminate` / `q_span_dup`) — the ingest-time
  * shape of an LLM data pipeline: documents arrive continuously and
  * contamination / cross-document span duplication is flagged as they
  * land, instead of by a retrospective batch sweep. The batch operators
  * remain the bulk path; these close the batch↔streaming symmetry the
  * events family already has (EventStreams), and StreamingSpec pins
  * stream == batch on the planted near-dup corpus.
  */
object CorpusStreams {

  final case class Doc(doc_id: Long, text: String)

  /** A flagged duplicated span: document `doc_id` contains span hash
    * `h`, and `h` occurs in at least one other document seen so far. */
  final case class SpanHit(doc_id: Long, h: Long)

  final case class SpanState(firstDoc: Long, n: Long)

  /** Tokenize exactly like the batch operators' `split(col, " ")`:
    * Spark's split is Java regex split with limit -1 (trailing empty
    * strings kept). */
  private def toks(text: String): Array[String] = text.split(" ", -1)

  /** Distinct 3-token grams of `text`, as strings — the batch
    * q_decontaminate gram definition (size >= 3 or none), first-seen
    * order. */
  private[streaming] def grams3(text: String): Seq[String] = {
    val t = toks(text)
    if (t.length < 3) Seq.empty
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i <= t.length - 3) {
        seen.add(t(i) + " " + t(i + 1) + " " + t(i + 2))
        i += 1
      }
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq
    }
  }

  /** Streaming decontamination: each arriving training document is
    * checked against a FIXED eval set (a benchmark suite), emitting
    * (train_id, eval_id, n_shared) for every eval doc sharing at least
    * `minShared` distinct 3-grams — the same contamination signal as
    * the batch q_decontaminate, row for row.
    *
    * Scale shape is the batch operator's, transplanted: the eval side
    * is fixed-size while the train stream is unbounded, so the eval
    * gram index is built ONCE on the driver and broadcast; each train
    * doc is then scored in a pure per-row flatMap — NO state store, NO
    * shuffle, NO watermark, and Append mode works because a document's
    * verdict depends only on itself and the static eval set. A 100
    * TB/day firehose passes through map-only. */
  def decontaminateStream(train: Dataset[Doc], evalDocs: DataFrame,
                          minShared: Int = 3): DataFrame = {
    val sp = train.sparkSession
    import sp.implicits._
    // eval gram -> eval doc ids; driver-sized by the fixed-benchmark
    // argument (the batch operator broadcasts the same exploded frame)
    val evalIndex: Map[String, Array[Long]] =
      evalDocs.select("doc_id", "text").as[Doc].collect()
        .flatMap(d => grams3(d.text).map(_ -> d.doc_id))
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
    val bc = sp.sparkContext.broadcast(evalIndex)
    train.flatMap { d =>
      val idx = bc.value
      val counts = collection.mutable.Map.empty[Long, Long]
      grams3(d.text).foreach { g =>
        idx.getOrElse(g, Array.emptyLongArray).foreach { ev =>
          counts(ev) = counts.getOrElse(ev, 0L) + 1L
        }
      }
      counts.iterator
        .filter { case (_, n) => n >= minShared }
        .map { case (ev, n) => (d.doc_id, ev, n) }
    }.toDF("train_id", "eval_id", "n_shared")
  }

  /** A doc's packing verdict — the streaming twin of q_seq_pack's
    * output row. */
  final case class PackedDoc(doc_id: Long, shard: Long, n_tokens: Long,
                             bin: Long, bin_offset: Long)

  /** Streaming concat-and-chunk sequence packing: docs land in `nsh`
    * independent pack streams (doc_id mod nsh), each stream carries
    * one Long of state — its cumulative token count — and every
    * arriving doc is placed at the current offset (bin = cum DIV b,
    * offset = cum mod b), exactly the batch q_seq_pack arithmetic.
    * Parallelism is |streams|, state is 8 bytes per stream, and the
    * stream == batch equality holds when docs arrive doc_id-ascending
    * per stream (an append-ordered ingest; within one micro-batch any
    * order works — the group sorts its batch slice). */
  def seqPackStream(docs: Dataset[Doc], nsh: Int = 32,
                    b: Long = 512): Dataset[PackedDoc] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs
      .map(d => (d.doc_id, d.doc_id % nsh, toks(d.text).length.toLong))
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[(Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).map { case (id, sh, n) =>
            val r = PackedDoc(id, sh, n, cum / b, cum % b)
            cum += n
            r
          }
          state.update(cum)
          out.iterator
      }
  }

  /** A doc's online dedup verdict — the streaming twin of
    * q_dedup_keep's output row. */
  final case class KeepVerdict(doc_id: Long, fingerprint: String,
                               keep: Boolean)

  /** Streaming exact dedup: every arriving document gets an immediate
    * keep/drop verdict against all text seen so far — the ingest-time
    * face of the batch q_dedup_keep. Fingerprint is bit-identical to
    * the batch operator's md5(lower(text)) (same UTF8String lowercase,
    * same lowercase hex), so batch and stream agree on what "the same
    * document" means.
    *
    * State is 8 bytes (the kept doc_id) per distinct fingerprint,
    * sharded by the state-store shuffle on the 32-char key. Online
    * semantics keep the FIRST arrival; the batch operator keeps the
    * min doc_id — the two coincide whenever ingest is append-ordered
    * (doc_id-ascending across micro-batches; within one micro-batch
    * any order works, the group sorts its batch slice — the
    * seqPackStream rule), which StreamingSpec pins with duplicates
    * straddling a batch boundary. Verdicts are emitted once and never
    * revised — online dedup's contract — unlike spanDupStream's
    * retroactive first-holder flag. Long-running production ingest:
    * RocksDB state store + TTL horizon, batch op as the
    * retrospective sweep. */
  def dedupKeepStream(docs: Dataset[Doc]): Dataset[KeepVerdict] = {
    val sp = docs.sparkSession
    import sp.implicits._
    def fp(text: String): String = {
      val lowered = org.apache.spark.unsafe.types.UTF8String
        .fromString(text).toLowerCase.getBytes
      // commons-codec md5Hex — the exact call inside Spark's Md5
      // expression, so the hex matches the batch column byte for byte
      org.apache.commons.codec.digest.DigestUtils.md5Hex(lowered)
    }
    docs
      .map(d => (d.doc_id, fp(d.text)))
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, KeepVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fingerprint: String, rows: Iterator[(Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          var kept = state.getOption
          val out = rows.toSeq.sortBy(_._1).map { case (id, _) =>
            val keep = kept.isEmpty
            if (keep) kept = Some(id)
            KeepVerdict(id, fingerprint, keep)
          }
          kept.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming cross-document span duplication: every arriving
    * document's distinct `width`-token span hashes (bit-identical to
    * the batch q_span_dup's shingle_hashes) are checked against all
    * spans seen so far; a (doc_id, h) hit is emitted exactly once for
    * every document whose span turns out to be shared — including,
    * retroactively, the FIRST holder when the second arrives, so the
    * accumulated hit set equals the batch operator's flagged
    * (doc, span) pairs over the same corpus regardless of arrival
    * order.
    *
    * State is keyed by span hash — 8-byte key, (firstDoc, count)
    * value — sharded across executors by the state-store shuffle.
    * Unbounded corpus means state ~ distinct spans: for a long-running
    * production ingest that is RocksDB-state-store territory with a
    * TTL matched to the dedup horizon; the batch operator remains the
    * retrospective full-corpus path. */
  def spanDupStream(docs: Dataset[Doc], width: Int = 8): Dataset[SpanHit] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs
      .flatMap(d => ShingleHashes.of(toks(d.text), width)
        .map(h => (h, d.doc_id)))
      .groupByKey(_._1)
      .flatMapGroupsWithState[SpanState, SpanHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (h: Long, rows: Iterator[(Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[SpanState]) =>
          val out = Seq.newBuilder[SpanHit]
          var st = state.getOption
          rows.foreach { case (_, doc) =>
            st match {
              case None =>
                st = Some(SpanState(doc, 1))
              case Some(s) if s.n == 1 =>
                // the span just became duplicated: flag the stored
                // first holder retroactively plus the new one
                out += SpanHit(s.firstDoc, h)
                out += SpanHit(doc, h)
                st = Some(s.copy(n = 2))
              case Some(s) =>
                out += SpanHit(doc, h)
                st = Some(s.copy(n = s.n + 1))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }
}
