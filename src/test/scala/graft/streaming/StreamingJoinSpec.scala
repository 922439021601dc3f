package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stream-stream attribution join ≡ the same join run in batch on the
  * same events, and the state the join keeps is watermark-bounded (the
  * progress metrics report a stateful join operator).
  */
class StreamingJoinSpec extends SparkSpec {

  test("stream-stream view→purchase join matches the batch join") {
    // instant-typed ts on both batch and stream sides (round-8+ driver
    // files load as TIMESTAMP_NTZ, which watermarks reject and
    // getTimestamp can't read)
    val events = graft.Tables.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
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

  test("left-outer stream-stream join: misses emit on watermark, parity with batch left-anti") {
    // instant-typed ts on both batch and stream sides (round-8+ driver
    // files load as TIMESTAMP_NTZ, which watermarks reject and
    // getTimestamp can't read)
    val events = graft.Tables.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("user_id", "event_id", "event_type", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("stream-join-outer").toString
    events.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$tmp/in")

    val joined = StreamingJoin.viewPurchaseAttributionOuter(stream, stream)
    val q = joined.writeStream.format("memory")
      .queryName("vp_outer").outputMode("append").start()
    try {
      q.processAllAvailable()
      // outer rows emit from no-data microbatches after the watermark
      // advances — poll until the null-purchase count stabilizes
      def nulls() = spark.table("vp_outer").filter(col("purchase_id").isNull).count()
      var prev = -1L
      var tries = 0
      while (nulls() != prev && tries < 30) {
        prev = nulls(); tries += 1; Thread.sleep(500); q.processAllAvailable()
      }
    } finally q.stop()

    val out = spark.table("vp_outer").collect()
    val matched = out.filter(!_.isNullAt(2)).map(r => (r.getLong(1), r.getLong(2))).toSet
    val missed = out.filter(_.isNullAt(2)).map(_.getLong(1)).toSet

    val v = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val joinCond = col("user_id") === col("pu") &&
      col("view_ts") <= col("purchase_ts") &&
      col("view_ts") >= col("purchase_ts") - expr("INTERVAL 3600 SECONDS")
    val batchInner = v.join(p, joinCond)
      .select("view_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // never-matched views per batch semantics (left-anti on the same cond)
    val batchAnti = v.join(p, joinCond, "left_anti")
      .select("view_id", "view_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toMap

    // matched side: exact parity with the batch inner join
    assert(matched === batchInner)
    // every emitted miss is a true batch-semantics miss (no false outers)
    assert(missed.subsetOf(batchAnti.keySet))
    assert(missed.nonEmpty)
    // completeness up to the final watermark: a miss whose whole match
    // window closed well before the watermark (maxTs − delay) MUST have
    // been evicted+emitted; 3×delay slack keeps the bound safely clear
    // of microbatch boundary effects
    val maxTs = events.agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime
    val safeCutoff = maxTs - (3600L + 3 * 600L) * 1000L
    val mustEmit = batchAnti.collect {
      case (id, ts) if ts.getTime < safeCutoff => id
    }.toSet
    assert(mustEmit.subsetOf(missed),
      s"${(mustEmit -- missed).size} closed-window misses were never emitted")
  }
}
