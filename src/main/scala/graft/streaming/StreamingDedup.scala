package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.RecordState

/** Streaming dedup (SURVEY.md §7 M4): the per-call protocol's async face,
  * re-expressed as Structured Streaming.
  *
  *  - `dropDuplicatesStream`: first-writer-wins on the key within the
  *    watermark — Spark's built-in `dropDuplicatesWithinWatermark`
  *    (the TTL analog: state for a key is reclaimed after the watermark
  *    passes, like the reference's row TTL — README.md:44).
  *  - `auditStream`: the full state lattice via `flatMapGroupsWithState`:
  *    first attempt per key emits SUCCESS(1), later attempts DUPLICATE(2),
  *    with a processing-time state timeout as the TTL (reference's
  *    absorber window + row TTL collapsed into GroupState timeout).
  *
  * Scale: state is hash-partitioned by key across executors (the same
  * partition-per-key layout as the reference's Cassandra table); the
  * watermark bounds state size — mandatory at 100 TB (SURVEY.md §7.4).
  */
object StreamingDedup {

  case class Attempt(key: String, event_time: Timestamp, record_uuid: String)
  case class Audited(key: String, event_time: Timestamp, record_uuid: String, state: Short)

  /** Built-in watermark dedup: exactly-one emission per key among rows
    * arriving within the watermark window.
    */
  def dropDuplicatesStream(events: DataFrame, eventTimeCol: String,
                           keyCols: Seq[String], watermark: String): DataFrame =
    events
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Windowed attempt counts: tumbling event-time windows with a
    * watermark bounding state — the streaming analog of
    * `Dedup.counts` (per-key attempt histograms), and the canonical
    * watermark + windowed-aggregation shape (SURVEY §7 M4). Append mode:
    * a window emits once, when the watermark passes its end.
    */
  def windowedCounts(events: DataFrame, eventTimeCol: String,
                     keyCols: Seq[String], windowLen: String,
                     watermark: String): DataFrame =
    events
      .withWatermark(eventTimeCol, watermark)
      .groupBy((window(col(eventTimeCol), windowLen) +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n_attempts"))
      .select((Seq(col("window.start").as("window_start"),
        col("window.end").as("window_end")) ++ keyCols.map(col) :+
        col("n_attempts")): _*)

  /** HOPPING-window event rollup — the streaming face of
    * `Relational.qEventsHopping` (same TVF, same output contract:
    * window start as epoch micros, value as per-row micro-integers):
    * overlapping windows of `windowLen` advancing every `slide`, so an
    * event lands in windowLen/slide windows; append mode emits each
    * window exactly once when the watermark passes its end.
    * StreamingHoppingSpec pins stream ≡ batch row-for-row on the real
    * events corpus — the backfill-equals-live property a deployment
    * switching a windowed rollup from nightly batch to continuous
    * ingest depends on.
    */
  def hoppingCounts(events: DataFrame, eventTimeCol: String,
                    windowLen: String, slide: String,
                    watermark: String): DataFrame =
    events
      .withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), windowLen, slide),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * lit(1000000.0)).cast("bigint"))
          .as("value_micros"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("value_micros"))

  /** Full state lattice as a stream: emits every attempt labeled with its
    * protocol state. `GroupState[String]` holds the winning record_uuid
    * per key; `ttlMillis > 0` sets an EVENT-TIME timeout at
    * success_event_time + ttl — write-relative expiry exactly like the
    * reference's per-row `USING TTL` (README.md:44), measured on the
    * stream's own clock (the watermark), so expiry is deterministic and
    * testable without wall-clock sleeps. 0 ⇒ keep forever (reference
    * TTL 0). A processing-time timeout would also livelock
    * `processAllAvailable` in tests by scheduling poll batches forever.
    *
    * When `ttlMillis > 0` the caller must have a watermark on
    * `event_time` (applied here via `watermarkDelay`).
    */
  def auditStream(attempts: Dataset[Attempt], ttlMillis: Long,
                  watermarkDelay: String = "0 seconds")
                 (implicit spark: SparkSession): Dataset[Audited] = {
    import spark.implicits._
    val src =
      if (ttlMillis > 0) attempts.withWatermark("event_time", watermarkDelay)
      else attempts
    // state = (winning record_uuid, expiry epoch-ms; Long.MaxValue = never).
    // The expiry must live IN the state: Spark clears a group's timeout on
    // every invocation that sees data, so the duplicate branch has to
    // re-arm the winner's original write-relative expiry each time.
    src
      .groupByKey(_.key)
      .flatMapGroupsWithState[(String, Long), Audited](
        OutputMode.Append,
        if (ttlMillis > 0) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Attempt], state: GroupState[(String, Long)]) =>
          // Spark requires event-time timeouts strictly beyond the watermark
          def arm(expiresAtMs: Long): Unit =
            if (ttlMillis > 0 && expiresAtMs != Long.MaxValue)
              state.setTimeoutTimestamp(
                math.max(expiresAtMs, state.getCurrentWatermarkMs() + 1))
          if (state.hasTimedOut) {
            state.remove() // TTL expiry: key becomes claimable again
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(a => (a.event_time.getTime, a.record_uuid))
            val out = scala.collection.mutable.ArrayBuffer.empty[Audited]
            sorted.foreach { a =>
              if (state.exists) {
                out += Audited(a.key, a.event_time, a.record_uuid, RecordState.Duplicate)
              } else {
                val expiresAt =
                  if (ttlMillis > 0) a.event_time.getTime + ttlMillis else Long.MaxValue
                state.update((a.record_uuid, expiresAt))
                out += Audited(a.key, a.event_time, a.record_uuid, RecordState.Success)
              }
            }
            arm(state.get._2)
            out.iterator
          }
      }
  }
}
