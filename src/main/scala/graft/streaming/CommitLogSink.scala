package graft.streaming

import graft.sources.CommitLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Generic exactly-once streaming sink into a commit-log table — the
  * write-side complement of `readStream.format("graft_commitlog")`:
  * any micro-batch frame lands as one (run_id, batch_id) partition
  * made visible by one atomic marker, so a downstream
  * [[CommitLog.readCommitted]] / DSv2 / streaming reader never sees a
  * torn batch, and a foreachBatch retry (at-least-once delivery)
  * converges — the dynamic overwrite replaces the partition's own
  * files and the existing marker makes the re-commit a no-op. The
  * routing-specific sinks ([[EventStreams.validateAndRouteCommitted]],
  * [[DedupIngest]], [[EmbedIngest]]) compose validation/dedup in
  * front of the same discipline; this is the bare pipe for frames
  * that are already shaped.
  *
  * `statsCols` records marker min/max per batch — the dial that buys
  * batch-directory pruning for every future range read; a streaming
  * sink is exactly where those markers are cheapest (the batch is
  * already in memory).
  *
  * run_id derives from the checkpoint path (sanitized tail + two
  * 32-bit hashes, the [[EmbedIngest]] convention): restarts of the
  * SAME pipeline keep appending to their run with Spark's replayed
  * epoch ids, while two pipelines with lookalike checkpoint tails
  * cannot collide into one run's id space. */
object CommitLogSink {

  def start(stream: DataFrame, table: String, checkpoint: String,
      statsCols: Seq[String] = Seq.empty,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val runId = EmbedIngest.runIdOf(checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // an empty micro-batch (routine when an upstream filter drops
        // a whole epoch) must commit NOTHING: the dynamic-overwrite
        // parquet write of an empty frame creates no partition
        // directory, so a marker would dangle and break every future
        // read of the table. Skipping both keeps replay exactly-once —
        // an empty epoch delivered nothing to re-deliver.
        if (!batch.isEmpty) {
          if (statsCols.isEmpty)
            CommitLog.writeBatch(batch, table, runId, batchId)
          else
            CommitLog.writeBatchWithStats(batch, table, runId, batchId, statsCols)
        }
      }
      .start()
  }
}
