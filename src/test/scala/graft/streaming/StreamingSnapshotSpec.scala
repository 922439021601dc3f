package graft.streaming

import graft.SparkSpec
import graft.sources.{Scratch, SnapshotStore}
import org.apache.spark.sql.functions._

/** Streaming CDC commits into the versioned snapshot store: each
  * micro-batch is one manifest commit carrying its epoch id as txn
  * metadata; the final content equals applying the same changes in one
  * batch commit, version history records the batch sequence, and a
  * REPLAYED batch (checkpoint recovery) is a manifest-level no-op —
  * content and version count both unchanged.
  */
class StreamingSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def baseRows = (0L until 64L).map(k => (k, s"t${k % 4}", k.toDouble))

  private def freshStore(): String = {
    val dir = Scratch.tempDir("graft_snapstream_")
    SnapshotStore.create(spark, dir,
      baseRows.toDF("event_id", "event_type", "value"), "event_id")
    dir
  }

  private def content(dir: String, v: Int): Map[Long, Double] =
    SnapshotStore.readAt(spark, dir, v)
      .select(col("event_id"), col("value")).as[(Long, Double)]
      .collect().toMap

  private def changeRows(ids: Seq[Long], op: String, bump: Double) =
    ids.map(k => (k, s"t${k % 4}", k.toDouble + bump, op))

  test("streamed change batches ≡ the same changes applied in batch commits; replay no-ops") {
    val dir = freshStore()
    val tmp = java.nio.file.Files.createTempDirectory("snapstream-in").toString
    val b1 = changeRows(Seq(0L, 8L), "upsert", 100.0) ++ changeRows(Seq(5L), "delete", 0.0)
    val b2 = changeRows(Seq(1L, 9L), "upsert", 200.0)
    // ONE part file per intended micro-batch: the file source is free to
    // split a multi-file drop across listing passes (observed under
    // load), and a split batch correctly mints its own version — the
    // per-batch version assertion below is only meaningful when the
    // batch boundary is pinned to the file boundary
    b1.toDF("event_id", "event_type", "value", "op")
      .coalesce(1).write.parquet(s"$tmp/in")

    val incoming = spark.readStream
      .schema(b1.toDF("event_id", "event_type", "value", "op").schema)
      .parquet(s"$tmp/in")
    val q = StreamingSnapshot.changeSink(dir, "event_id", incoming)
    try {
      q.processAllAvailable()
      b2.toDF("event_id", "event_type", "value", "op")
        .coalesce(1).write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
    } finally q.stop()

    val latest = SnapshotStore.latestVersion(spark, dir)
    assert(latest === 2, "one store version per applied micro-batch")
    // batch-commit twin over a second store
    val twin = freshStore()
    SnapshotStore.commit(spark, twin,
      b1.toDF("event_id", "event_type", "value", "op"), "event_id", 0)
    SnapshotStore.commit(spark, twin,
      b2.toDF("event_id", "event_type", "value", "op"), "event_id", 1)
    assert(content(dir, latest) === content(twin, 2))
    // the txn trail records the stream's epochs
    assert(SnapshotStore.committedTxn(spark, dir, 1).exists(_.startsWith("stream-")))
    assert(SnapshotStore.committedTxn(spark, dir, 2).exists(_.startsWith("stream-")))

    // checkpoint-recovery replay: re-deliver an already-committed batch
    val replayTxn = SnapshotStore.committedTxn(spark, dir, 2).get
    val before = content(dir, latest)
    val v = SnapshotStore.commitIfNew(spark, dir,
      b2.toDF("event_id", "event_type", "value", "op"), "event_id", replayTxn)
    assert(v === latest, "replayed txn must not mint a new version")
    assert(SnapshotStore.latestVersion(spark, dir) === latest)
    assert(content(dir, latest) === before)
  }

  test("batch-commit API without txn metadata reports none") {
    val dir = freshStore()
    SnapshotStore.commit(spark, dir,
      changeRows(Seq(0L), "upsert", 1.0).toDF("event_id", "event_type", "value", "op"),
      "event_id", 0)
    assert(SnapshotStore.committedTxn(spark, dir, 1).isEmpty)
    assert(SnapshotStore.committedTxn(spark, dir, 0).isEmpty)
  }
}
