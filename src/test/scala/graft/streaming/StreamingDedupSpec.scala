package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.RecordState

/** Streaming dedup specs: watermark dedup and the flatMapGroupsWithState
  * state lattice, driven synchronously with MemoryStream (SURVEY §7 M4).
  */
class StreamingDedupSpec extends SparkSpec {
  import StreamingDedup._

  private def t(s: String) = Timestamp.valueOf(s)

  test("auditStream: first attempt per key SUCCESS, later DUPLICATE, across batches") {
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[Attempt]
    val q = auditStream(input.toDS(), ttlMillis = 0)
      .writeStream.format("memory").queryName("audit").outputMode("append").start()
    try {
      input.addData(
        Attempt("k1", t("2024-01-01 00:00:00"), "u1"),
        Attempt("k2", t("2024-01-01 00:00:00"), "u2"),
        Attempt("k2", t("2024-01-01 00:00:01"), "u3"))
      q.processAllAvailable()
      input.addData(Attempt("k1", t("2024-01-01 00:01:00"), "u4")) // later batch dup
      q.processAllAvailable()
      val got = spark.table("audit").as[Audited].collect()
        .map(a => a.record_uuid -> a.state).toMap
      assert(got("u1") === RecordState.Success)
      assert(got("u2") === RecordState.Success)
      assert(got("u3") === RecordState.Duplicate)
      assert(got("u4") === RecordState.Duplicate) // state persisted across batches
    } finally q.stop()
  }

  test("auditStream: within-batch ordering is (event_time, record_uuid)") {
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[Attempt]
    val q = auditStream(input.toDS(), ttlMillis = 0)
      .writeStream.format("memory").queryName("audit2").outputMode("append").start()
    try {
      // arrival order deliberately reversed; time order must win
      input.addData(
        Attempt("k", t("2024-01-01 00:00:05"), "late"),
        Attempt("k", t("2024-01-01 00:00:01"), "early"))
      q.processAllAvailable()
      val got = spark.table("audit2").as[Audited].collect()
        .map(a => a.record_uuid -> a.state).toMap
      assert(got("early") === RecordState.Success)
      assert(got("late") === RecordState.Duplicate)
    } finally q.stop()
  }

  test("auditStream TTL: SUCCESS → (event-time expiry) → SUCCESS for the same key") {
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[Attempt]
    // 1-minute write-relative TTL, driven purely by the watermark clock
    val q = auditStream(input.toDS(), ttlMillis = 60_000)
      .writeStream.format("memory").queryName("ttl").outputMode("append").start()
    try {
      input.addData(Attempt("k1", t("2024-01-01 00:00:00"), "u1"))
      q.processAllAvailable() // u1 SUCCESS; k1 expires at 00:01:00 event time
      input.addData(Attempt("k1", t("2024-01-01 00:00:30"), "u2"))
      q.processAllAvailable() // still alive (watermark 00:00:00) → DUPLICATE
      // unrelated keys push the watermark past k1's expiry: the first
      // batch advances the watermark to 00:02:00, the second runs with it
      // and fires k1's timeout (state.remove)
      input.addData(Attempt("w1", t("2024-01-01 00:02:00"), "w1"))
      q.processAllAvailable()
      input.addData(Attempt("w2", t("2024-01-01 00:02:10"), "w2"))
      q.processAllAvailable()
      input.addData(Attempt("w3", t("2024-01-01 00:02:20"), "w3"))
      q.processAllAvailable()
      // k1 is claimable again: a fresh attempt wins
      input.addData(Attempt("k1", t("2024-01-01 00:02:30"), "u3"))
      q.processAllAvailable()
      val got = spark.table("ttl").as[Audited].collect()
        .map(a => a.record_uuid -> a.state).toMap
      assert(got("u1") === RecordState.Success)
      assert(got("u2") === RecordState.Duplicate) // within TTL: suppressed
      assert(got("u3") === RecordState.Success)   // after expiry: re-claimed
    } finally q.stop()
  }

  test("auditStream TTL: key re-claimed within TTL stays DUPLICATE (no premature expiry)") {
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[Attempt]
    val q = auditStream(input.toDS(), ttlMillis = 600_000) // 10 min
      .writeStream.format("memory").queryName("ttl2").outputMode("append").start()
    try {
      input.addData(Attempt("k", t("2024-01-01 00:00:00"), "u1"))
      q.processAllAvailable()
      input.addData(Attempt("w", t("2024-01-01 00:05:00"), "w1")) // watermark → 00:05
      q.processAllAvailable()
      input.addData(Attempt("k", t("2024-01-01 00:05:30"), "u2")) // still inside TTL
      q.processAllAvailable()
      val got = spark.table("ttl2").as[Audited].collect()
        .map(a => a.record_uuid -> a.state).toMap
      assert(got("u1") === RecordState.Success)
      assert(got("u2") === RecordState.Duplicate)
    } finally q.stop()
  }

  test("windowedCounts: tumbling windows emit on watermark passage, late data dropped") {
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[Attempt]
    val counts = windowedCounts(input.toDF(), "event_time", Seq("key"),
      windowLen = "10 minutes", watermark = "0 seconds")
    val q = counts.writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      input.addData(
        Attempt("a", t("2024-01-01 00:01:00"), "u1"),
        Attempt("a", t("2024-01-01 00:02:00"), "u2"),
        Attempt("b", t("2024-01-01 00:03:00"), "u3"))
      q.processAllAvailable()
      // nothing emitted yet: the 00:00-00:10 window is still open
      assert(spark.table("wc").count() === 0)
      // an event far ahead closes the first window
      input.addData(Attempt("c", t("2024-01-01 00:25:00"), "u4"))
      q.processAllAvailable()
      input.addData(Attempt("c", t("2024-01-01 00:26:00"), "u5"))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .select("key", "n_attempts").as[(String, Long)].collect().toMap
      assert(rows === Map("a" -> 2L, "b" -> 1L))
      // late arrival for the closed window is dropped, not re-emitted
      input.addData(Attempt("a", t("2024-01-01 00:04:00"), "u6"))
      q.processAllAvailable()
      assert(spark.table("wc").count() === 2)
    } finally q.stop()
  }

  test("file-source stream: readStream over a parquet events dir dedups like batch") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // materialize a small keyed slice of events as the stream source
    val src = java.nio.file.Files.createTempDirectory("stream-src").toString
    graft.Tables.events(spark, sfDir)
      .select(col("user_id").cast("string").as("key"), col("ts").as("event_time"),
        col("event_id").cast("string").as("record_uuid"))
      .limit(200)
      .write.mode("overwrite").parquet(src)
    val batchKeys = spark.read.parquet(src).select("key").distinct().count()
    val stream = spark.readStream
      .schema("key STRING, event_time TIMESTAMP, record_uuid STRING")
      .parquet(src)
    val q = dropDuplicatesStream(stream, "event_time", Seq("key"), "1 hour")
      .writeStream.format("memory").queryName("filewm").outputMode("append").start()
    try {
      q.processAllAvailable()
      // one survivor per key, same key set as the batch distinct
      val got = spark.table("filewm")
      assert(got.count() === batchKeys)
      assert(got.select("key").distinct().count() === batchKeys)
    } finally q.stop()
  }

  test("ExactlyOnceSink: transient write failures retried; replayed batch does not duplicate") {
    import org.apache.spark.sql.{DataFrame, SaveMode}
    import graft.provider._
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("eos").toString
    val failures = new AtomicInteger(2) // first two write attempts blow up
    val attempts = new AtomicInteger(0)
    val flakyWrite: (DataFrame, String) => Unit = (df, dir) => {
      attempts.incrementAndGet()
      if (failures.getAndDecrement() > 0) throw new java.io.IOException("storage down")
      df.write.mode(SaveMode.Overwrite).parquet(dir)
    }
    val sink = new ExactlyOnceSink(root, "parquet",
      new FixedDelayRetryStrategy(3, 1L), Some(flakyWrite))
    val input = MemoryStream[Attempt]
    val q = input.toDF().writeStream.foreachBatch(sink.writer).start()
    try {
      input.addData(Attempt("k1", t("2024-01-01 00:00:00"), "u1"),
                    Attempt("k2", t("2024-01-01 00:00:01"), "u2"))
      q.processAllAvailable()
      assert(attempts.get === 3) // 2 failures + 1 success, strategy-driven
      assert(spark.read.parquet(s"$root/batch_id=0").count() === 2)
      // simulate an upstream replay of the same batch: same dir, same rows
      sink.writer(Seq(Attempt("k1", t("2024-01-01 00:00:00"), "u1"),
                      Attempt("k2", t("2024-01-01 00:00:01"), "u2")).toDF(), 0L)
      assert(spark.read.parquet(s"$root/batch_id=0").count() === 2) // no dupes
    } finally q.stop()

    // default write path (no override): real parquet batch dirs
    val root2 = java.nio.file.Files.createTempDirectory("eos2").toString
    val plain = new ExactlyOnceSink(root2, "parquet", new NoRetryStrategy)
    plain.writer(Seq(Attempt("k", t("2024-01-01 00:00:00"), "u")).toDF(), 5L)
    assert(spark.read.parquet(s"$root2/batch_id=5").count() === 1)

    // budget exhaustion surfaces RetriesExceededException
    val alwaysDown = new ExactlyOnceSink(root, "parquet",
      new FixedDelayRetryStrategy(1, 1L),
      Some((_, _) => throw new java.io.IOException("still down")))
    intercept[RetriesExceededException] {
      alwaysDown.writer(Seq(Attempt("k", t("2024-01-01 00:00:00"), "u")).toDF(), 1L)
    }
  }

  test("dropDuplicatesStream deduplicates keyed events within the watermark") {
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[Attempt]
    val deduped = dropDuplicatesStream(input.toDF(), "event_time", Seq("key"), "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("wm").outputMode("append").start()
    try {
      input.addData(
        Attempt("a", t("2024-01-01 00:00:00"), "u1"),
        Attempt("a", t("2024-01-01 00:00:30"), "u2"),
        Attempt("b", t("2024-01-01 00:01:00"), "u3"))
      q.processAllAvailable()
      assert(spark.table("wm").select("key").as[String].collect().sorted.toSeq === Seq("a", "b"))
    } finally q.stop()
  }
}
