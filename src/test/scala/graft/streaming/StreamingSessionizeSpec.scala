package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming sessionization ≡ batch sessionization for closed sessions:
  * same session numbering, counts, and bounds as
  * `Relational.sessionize` once the watermark closes a session.
  */
class StreamingSessionizeSpec extends SparkSpec {
  import StreamingSessionize._

  private def t(s: String) = Timestamp.valueOf(s)

  test("closed sessions match the batch sessionizer; open sessions withheld") {
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext

    // two users, three sessions each: gaps of 40min split, 10min joins
    val originals = Seq(
      Ev(1L, t("2024-01-01 08:00:00"), 1L),
      Ev(1L, t("2024-01-01 08:10:00"), 2L),
      Ev(1L, t("2024-01-01 09:00:00"), 3L), // 50min gap → session 2
      Ev(1L, t("2024-01-01 09:20:00"), 4L),
      Ev(1L, t("2024-01-01 11:00:00"), 5L), // session 3
      Ev(2L, t("2024-01-01 08:05:00"), 6L),
      Ev(2L, t("2024-01-01 08:40:00"), 7L), // 35min gap → session 2
      Ev(2L, t("2024-01-01 08:41:00"), 8L),
      Ev(2L, t("2024-01-01 10:30:00"), 9L)) // session 3
    // sentinels push the watermark far past every original session + gap;
    // their own sessions stay open and must NOT be emitted
    val sentinels = Seq(
      Ev(1L, t("2024-01-01 15:00:00"), 100L),
      Ev(2L, t("2024-01-01 15:00:00"), 101L))

    val input = MemoryStream[Ev]
    val q = StreamingSessionize.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // batch split along EVENT TIME (watermarkDelay=0 ⇒ a batch
      // boundary declares everything before its max ts final)
      val (early, late) = originals.partition(_.ts.getTime <= t("2024-01-01 09:00:00").getTime)
      input.addData(early)
      q.processAllAvailable()
      input.addData(late)
      q.processAllAvailable()
      input.addData(sentinels)
      q.processAllAvailable() // no-data batches fire the gap timeouts
    } finally q.stop()

    val streamed = spark.table("sessions")
      .as[Session].collect()
      .map(se => (se.user_id, se.session_id, se.n_events, se.session_start, se.session_end))
      .toSet
    val batch = graft.operators.Relational.sessionize(
        originals.toDF("user_id", "ts", "event_id"))
      .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSet
    assert(batch.size === 6, s"fixture should make 6 sessions, got $batch")
    assert(streamed === batch,
      s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
  }

  test("exact-microsecond gap convention matches batch (boundary events)") {
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // exact-µs convention (the sf1 drill retired second-truncation,
    // which fused sessions at fractional-second boundaries): a gap of
    // 1799.9s stays in-session; 1800.000001s opens a new one
    val originals = Seq(
      Ev(9L, Timestamp.valueOf("2024-01-01 08:00:00.500"), 1L),
      Ev(9L, Timestamp.valueOf("2024-01-01 08:30:00.400"), 2L), // 1799.9s → same
      Ev(9L, Timestamp.valueOf("2024-01-01 09:00:00.400001"), 3L)) // 1800.000001s → new
    val sentinels = Seq(Ev(9L, t("2024-01-01 13:00:00"), 100L))
    val input = MemoryStream[Ev]
    val q = StreamingSessionize.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_edge")
      .outputMode("append").start()
    try {
      input.addData(originals)
      q.processAllAvailable()
      input.addData(sentinels)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sessions_edge").as[Session].collect()
      .map(se => (se.user_id, se.session_id, se.n_events, se.session_start, se.session_end))
      .toSet
    val batch = graft.operators.Relational.sessionize(
        originals.toDF("user_id", "ts", "event_id"))
      .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSet
    assert(batch.map(_._2) === Set(1L, 2L))
    assert(streamed === batch)
  }
}
