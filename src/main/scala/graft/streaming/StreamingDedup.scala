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

  /** Full state lattice as a stream: emits every attempt labeled with its
    * protocol state. `GroupState[String]` holds the winning record_uuid
    * per key; `ttlMillis` ⇒ `GroupStateTimeout.ProcessingTimeTimeout`
    * reclaims it (0 ⇒ keep forever, like the reference's TTL 0).
    */
  def auditStream(attempts: Dataset[Attempt], ttlMillis: Long)
                 (implicit spark: SparkSession): Dataset[Audited] = {
    import spark.implicits._
    attempts
      .groupByKey(_.key)
      .flatMapGroupsWithState[String, Audited](
        OutputMode.Append,
        if (ttlMillis > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Attempt], state: GroupState[String]) =>
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
                state.update(a.record_uuid)
                if (ttlMillis > 0) state.setTimeoutDuration(ttlMillis)
                out += Audited(a.key, a.event_time, a.record_uuid, RecordState.Success)
              }
            }
            out.iterator
          }
      }
  }
}
