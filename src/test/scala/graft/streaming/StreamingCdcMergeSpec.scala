package graft.streaming

import graft.SparkSpec
import graft.sources.{CdcMerge, TimePartitionedStore}
import org.apache.spark.sql.functions._

/** STREAMING CDC merge — the composition a continuously-fed lake
  * actually runs: change batches arrive as a stream and each
  * micro-batch is applied through `foreachBatch(CdcMerge.mergeChanges)`
  * (the streaming MERGE INTO pattern of the table formats). The final
  * store must equal applying the SAME changes as one batch merge —
  * micro-batch boundaries must not be observable in the result (the
  * per-batch merge is keyed last-writer-wins and batches partition the
  * key set here, so order across batches cannot matter).
  */
class StreamingCdcMergeSpec extends SparkSpec {

  private def freshLayout(): String = {
    val src = TimePartitionedStore.ensureDatedLayout(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft_scdc_").toString
    spark.read.parquet(src).write.mode("overwrite")
      .partitionBy("event_date").parquet(out)
    out
  }

  test("foreachBatch merge over streamed changes == one batch merge") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_scdc_in_").toString
    val streamStore = freshLayout()
    val batchStore = freshLayout()

    // deterministic change set over a 3-day window: upserts and deletes
    val windowed = spark.read.parquet(streamStore)
      .filter(col("event_date") >= lit("2024-01-08") &&
              col("event_date") <= lit("2024-01-10"))
    val changes = windowed.filter(col("event_id") % 7 === 0)
      .withColumn("value", col("value") + 500.0)
      .withColumn("op", lit("upsert"))
      .unionByName(windowed.filter(col("event_id") % 11 === 0)
        .withColumn("op", lit("delete")))
      .select("op", "event_id", "ts", "user_id", "event_type", "value", "props")
      .localCheckpoint(true)
    assert(changes.count() > 10)

    // two file-arrivals split the change set -> at least two micro-batches
    changes.filter(col("event_id") % 2 === 0).write.parquet(s"$tmp/in")
    val incoming = spark.readStream.schema(changes.schema).parquet(s"$tmp/in")
    val q = incoming.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          CdcMerge.mergeChanges(spark, streamStore, batch.localCheckpoint(true))
          ()
        }
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      q.processAllAvailable()
      changes.filter(col("event_id") % 2 =!= 0)
        .write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
    } finally q.stop()

    CdcMerge.mergeChanges(spark, batchStore, changes)
    val streamed = spark.read.parquet(streamStore)
    val batched = spark.read.parquet(batchStore)
    assert(streamed.count() === batched.count())
    assert(streamed.exceptAll(batched).isEmpty &&
      batched.exceptAll(streamed).isEmpty)
    // and the merge genuinely changed the store
    val untouched = freshLayout()
    assert(spark.read.parquet(untouched).count() !== streamed.count())
  }
}
