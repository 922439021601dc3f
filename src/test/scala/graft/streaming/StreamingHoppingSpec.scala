package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Batch/stream parity for the hopping-window rollup: the streamed
  * append-mode windows over the real events corpus must equal
  * `Relational.qEventsHopping` row for row once the watermark has
  * passed every real window (a far-future sentinel closes them). Also
  * pins the append-mode discipline: nothing emits while windows are
  * still open.
  */
case class HopEvent(event_time: Timestamp, event_type: String, value: Double)

class StreamingHoppingSpec extends SparkSpec {

  test("streamed hopping windows ≡ batch qEventsHopping on the events corpus") {
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext

    val rows = graft.Tables.events(spark, sfDir)
      .selectExpr("cast(ts as timestamp) AS event_time", "event_type", "value")
      .as[HopEvent].collect().toSeq
    assert(rows.nonEmpty)
    val maxTs = rows.map(_.event_time.getTime).max

    val input = MemoryStream[HopEvent]
    val counts = StreamingDedup.hoppingCounts(input.toDF(), "event_time",
      windowLen = "1 hour", slide = "30 minutes", watermark = "0 seconds")
    val q = counts.writeStream.format("memory").queryName("hop")
      .outputMode("append").start()
    try {
      // two arrivals: the batch boundary must not show in the result
      val (first, second) = rows.splitAt(rows.size / 2)
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      val openCount = spark.table("hop").count()
      // the sentinel pushes the watermark past every real window's end
      // (last real window ends <= maxTs + 1h < maxTs + 2h)
      input.addData(HopEvent(new Timestamp(maxTs + 7200000L), "__sentinel", 0.0))
      q.processAllAvailable()
      input.addData(HopEvent(new Timestamp(maxTs + 7200000L), "__sentinel2", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("hop")
        .filter(!col("event_type").startsWith("__sentinel"))
        .select("window_start_us", "event_type", "n_events", "value_micros")
        .as[(Long, String, Long, Long)].collect().toSet
      val batch = graft.operators.Relational.qEventsHopping(spark, sfDir)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(streamed.size > openCount,
        "sentinel flushed nothing — parity would be vacuous")
      assert(streamed === batch,
        s"stream-only: ${streamed -- batch take 3}; batch-only: ${batch -- streamed take 3}")
    } finally q.stop()
  }
}
