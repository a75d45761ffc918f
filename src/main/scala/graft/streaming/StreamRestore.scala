package graft.streaming

import graft.pipeline.Restore
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous restore — the reference's one-shot `do_restore`
  * (RestoreProcessor.php:56-68) lifted to Structured Streaming: a
  * stream of backup edges (path, key, value_json) drains into the KV
  * sink micro-batch by micro-batch through `foreachBatch`, reusing the
  * EXACT batch restore path (graft.pipeline.Restore — foreachPartition
  * + per-path adaptive batching), so batch and streaming restore cannot
  * drift semantically.
  *
  * Delivery contract: checkpointed offsets give at-least-once batch
  * replay (a crash between sink writes and the checkpoint commit
  * re-runs the micro-batch); [[Restore.KVSink.update]] is idempotent by
  * contract, so replayed writes converge — at-least-once delivery of
  * idempotent PATCHes is the same effectively-exactly-once argument the
  * reference's retry loop relies on (RestoreProcessor.php:82-94).
  */
object StreamRestore {

  /** Start draining a streaming edge frame into `sink`.
    *
    * @param trigger AvailableNow by default: process the full backlog
    *        then stop (the streaming form of a one-shot restore);
    *        pass a ProcessingTime trigger for a live tail.
    */
  def continuousRestore(edges: DataFrame, sink: Restore.KVSink,
                        checkpoint: String,
                        trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        Restore.restore(batch.toDF(), sink)
      }
      .trigger(trigger)
      .start()
}
