package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Checkpoint-RESTART parity: a stateful streaming query (the
  * flatMapGroupsWithState sessionizer) stopped mid-stream and restarted
  * from its checkpoint must produce EXACTLY the batch result — state
  * (open sessions + per-user counters) restored, closed sessions
  * emitted once across both runs, sessions spanning the restart
  * boundary assembled correctly. The sink is the fault-tolerant file
  * sink (its commit log is what makes restart exactly-once in
  * production); the source is the replayable file source. This is the
  * recovery path a 100 TB deployment exercises on every executor loss
  * or planned redeploy.
  */
class StreamingRestartSpec extends SparkSpec {
  import StreamingSessionize._

  private def t(s: String) = Timestamp.valueOf(s)

  test("sessionizer restarted from checkpoint equals batch; no dup or lost sessions") {
    implicit val s = spark
    import s.implicits._

    val originals = Seq(
      Ev(1L, t("2024-01-01 08:00:00"), 1L),
      Ev(1L, t("2024-01-01 08:10:00"), 2L),
      Ev(1L, t("2024-01-01 09:00:00"), 3L), // 50min gap -> session 2
      Ev(1L, t("2024-01-01 09:20:00"), 4L),
      Ev(1L, t("2024-01-01 11:00:00"), 5L), // session 3
      Ev(2L, t("2024-01-01 08:05:00"), 6L),
      Ev(2L, t("2024-01-01 08:40:00"), 7L), // 35min gap -> session 2
      Ev(2L, t("2024-01-01 08:41:00"), 8L),
      Ev(2L, t("2024-01-01 10:30:00"), 9L)) // session 3
    // sentinels close every real session; their own stay open/unemitted
    val sentinels = Seq(
      Ev(1L, t("2024-01-01 15:00:00"), 100L),
      Ev(2L, t("2024-01-01 15:00:00"), 101L))

    val root = java.nio.file.Files.createTempDirectory("sess-restart").toString
    val (in, out, ck) = (s"$root/in", s"$root/out", s"$root/ck")

    // split along EVENT TIME (the checkpointed watermark lands at
    // 09:00, so run-2 events must sit at or past it — late rows behind
    // a restored watermark are dropped, exactly as in a live restart).
    // User 1 session 2 SPANS the restart: event 3 (09:00) arrives in
    // run 1, event 4 (09:20) in run 2 — only restored state can
    // assemble it.
    val (run1, run2) = originals.partition(_.ts.getTime <= t("2024-01-01 09:00:00").getTime)
    run1.toDS().write.parquet(in)

    def startQuery() = {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
        .parquet(in).as[Ev]
      StreamingSessionize.sessionize(stream)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").start()
    }

    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val afterRun1 = spark.read.parquet(out).count()

    (run2 ++ sentinels).toDS().write.mode("append").parquet(in)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.read.parquet(out).as[Session].collect()
      .map(se => (se.user_id, se.session_id, se.n_events, se.session_start, se.session_end))
    val batch = graft.operators.Relational.sessionize(
        originals.toDF("user_id", "ts", "event_id"))
      .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSet
    assert(batch.size === 6)
    assert(streamed.length === streamed.toSet.size, "a session was emitted twice across the restart")
    assert(streamed.toSet === batch,
      s"stream-only: ${streamed.toSet -- batch}; batch-only: ${batch -- streamed.toSet}")
    assert(afterRun1 < 6, "restart must have real work left (fixture broke)")
    // the spanning session (user 1, session 2: events 3+4) is present
    // with BOTH its events — provable only if run 2 restored the state
    // run 1 checkpointed
    assert(streamed.toSet.exists(r => r._1 == 1L && r._3 == 2L &&
      r._4 == t("2024-01-01 09:00:00") && r._5 == t("2024-01-01 09:20:00")))
  }

  test("millis-era checkpoint state fails LOUDLY, never as corrupted sessions") {
    // A genuine pre-change checkpoint binary can't be synthesized from
    // current code, so the guard is pinned at the state-tuple level —
    // the exact values a restored pre-micros checkpoint would hand the
    // handler. 2024-01-01 in MILLIS (what old state holds) must throw;
    // the same instant in MICROS must pass; the closed-session counter
    // residual (n == 0) must stay exempt or every long-idle user would
    // poison a legitimate restart.
    val millis2024 = 1704067200000L
    val micros2024 = millis2024 * 1000L
    val ex = intercept[IllegalStateException] {
      StreamingSessionize.guardStateEpoch(7L, (3L, millis2024, millis2024, 2L))
    }
    assert(ex.getMessage.contains("predates the"))
    assert(ex.getMessage.contains("user 7"))
    StreamingSessionize.guardStateEpoch(7L, (3L, micros2024, micros2024, 2L))
    StreamingSessionize.guardStateEpoch(7L, (4L, 0L, 0L, 0L))
    // boundary: the floor itself is micros-era (1973), one below is not
    StreamingSessionize.guardStateEpoch(7L, (1L, StreamingSessionize.MinEpochMicros, StreamingSessionize.MinEpochMicros, 1L))
    intercept[IllegalStateException] {
      StreamingSessionize.guardStateEpoch(7L, (1L, StreamingSessionize.MinEpochMicros - 1, StreamingSessionize.MinEpochMicros, 1L))
    }
  }
}
