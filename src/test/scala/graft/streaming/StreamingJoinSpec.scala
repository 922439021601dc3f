package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stream-stream attribution join ≡ the same join run in batch on the
  * same events, and the state the join keeps is watermark-bounded (the
  * progress metrics report a stateful join operator).
  */
class StreamingJoinSpec extends SparkSpec {

  test("stream-stream view→purchase join matches the batch join") {
    val events = graft.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("stream-join").toString
    events.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$tmp/in")

    val joined = StreamingJoin.viewPurchaseAttribution(stream, stream)
    val q = joined.writeStream.format("memory")
      .queryName("vp_pairs").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("vp_pairs")
      .select("view_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val v = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val batch = v.join(p,
        col("user_id") === col("pu") &&
          col("view_ts") <= col("purchase_ts") &&
          col("view_ts") >= col("purchase_ts") - expr("INTERVAL 3600 SECONDS"))
      .select("view_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(batch.nonEmpty)
    assert(streamed === batch)
    // the join must run as a stateful streaming symmetric hash join
    assert(q.lastProgress.stateOperators.nonEmpty)
  }
}
