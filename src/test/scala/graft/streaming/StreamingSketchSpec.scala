package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming sketch maintenance ≡ batch: the daily HLL table built by a
  * stateful streaming aggregation across TWO micro-batch arrivals (each
  * (type, day) group split across both, forcing a state merge) must
  * produce exactly the batch pass's estimates.
  */
class StreamingSketchSpec extends SparkSpec {

  test("streamed daily HLL sketches match the batch pass across micro-batches") {
    val tmp = java.nio.file.Files.createTempDirectory("stream-sketch").toString
    val e = graft.Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type"), col("user_id"))
    // chunk 1 now; chunk 2 lands mid-stream — every (type, day) group
    // spans both chunks, so batch 2 must MERGE into existing state
    e.filter(col("user_id") % 2 === 0).write.parquet(s"$tmp/in")

    val incoming = spark.readStream.schema(e.schema).parquet(s"$tmp/in")
    val q = StreamingSketch.dailyEstimates(incoming)
      .writeStream.format("memory").queryName("daily_sk")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      e.filter(col("user_id") % 2 =!= 0)
        .write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
      // the sketch table lives in the agg state store
      assert(q.lastProgress.stateOperators.nonEmpty)
    } finally q.stop()

    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    val streamed = keyed(spark.table("daily_sk").collect())
    val batch = keyed(StreamingSketch.dailyEstimates(e).collect())
    assert(batch.size > 20, s"expected many (type, day) groups, got ${batch.size}")
    assert(streamed === batch)
  }
}
