package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, Dataset}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.SnapshotStore

/** Streaming CDC into the versioned snapshot store: each micro-batch of
  * change rows (op = upsert | delete, keyed) becomes ONE store commit
  * via [[SnapshotStore.commitIfNew]], with the batch's epoch id as the
  * commit's transaction metadata — checkpoint-recovery replays of an
  * already-committed batch are detected in the manifest log and no-op,
  * so the store content is exactly-once no matter how the stream dies
  * and restarts (the Delta `txnVersion` idempotent-foreachBatch
  * pattern).
  *
  * Each micro-batch still pays only its touched buckets (the store's
  * COW contract); the version history doubles as an audit trail of the
  * stream: one version per applied batch, time-travelable like any
  * batch commit.
  */
object StreamingSnapshot {

  def changeSink(storeDir: String, keyCol: String, changes: DataFrame,
                 checkpoint: Option[String] = None): StreamingQuery = {
    val writer = changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // an empty micro-batch (restart handshakes, idle triggers) must
        // not mint an empty store version — the version trail is the
        // audit of APPLIED change batches
        if (!batch.isEmpty)
          SnapshotStore.commitIfNew(batch.sparkSession, storeDir, batch.toDF(),
            keyCol, s"stream-$batchId")
        ()
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }
}
