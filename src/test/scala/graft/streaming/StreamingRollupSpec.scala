package graft.streaming

import graft.SparkSpec
import graft.sources.TimePartitionedStore
import org.apache.spark.sql.functions._

/** STREAMING incremental rollup maintenance: events arrive as a stream
  * and every micro-batch appends its per-(day, type) partial aggregates
  * — no read-modify-write, pure file appends. Because the partials are
  * algebraic (SUM/COUNT), the merge-on-read totals must equal a direct
  * aggregation of all the events, with micro-batch boundaries
  * unobservable — the streaming half of the source_rollup_incremental
  * row's maintenance story.
  */
class StreamingRollupSpec extends SparkSpec {

  test("per-micro-batch partial appends merge to the direct aggregation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sroll_").toString
    val rollup = java.nio.file.Files.createTempDirectory("graft_sroll_out_").toString
    val events = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "event_type", "value")
      .localCheckpoint(true)

    // two file-arrivals split the stream → at least two micro-batches
    events.filter(col("event_id") % 2 === 0).write.parquet(s"$tmp/in")
    val incoming = spark.readStream.schema(events.schema).parquet(s"$tmp/in")
    val q = incoming.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          TimePartitionedStore.appendRollupPartials(rollup,
            batch.localCheckpoint(true))
          ()
        }
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      q.processAllAvailable()
      events.filter(col("event_id") % 2 =!= 0)
        .write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
    } finally q.stop()

    // at least two partial row-sets were appended for some (day, type)
    val partials = spark.read.parquet(rollup)
    val maxPartials = partials.groupBy("event_date", "event_type")
      .count().agg(max("count")).collect()(0).getLong(0)
    assert(maxPartials >= 2, "stream produced only one partial per group")

    val merged = TimePartitionedStore.totalsOf(spark, rollup)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val direct = events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("bigint"))
          .as("value_cents"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged === direct)
  }
}
