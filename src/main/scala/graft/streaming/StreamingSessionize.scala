package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the continuous twin of the batch
  * gap-sessionizer ([[graft.operators.Relational.sessionize]], oracle row
  * `q_events_sessionize`): per user, events closer than `gapSeconds`
  * belong to one session; a session CLOSES when the event-time watermark
  * passes its last event + gap, and only closed sessions are emitted
  * (append mode has no second chance — an open session may still grow).
  *
  * Parity contract (pinned in StreamingSessionizeSpec): for sessions the
  * watermark has closed, (user_id, session_id, n_events, session_start,
  * session_end) equals the batch sessionizer on the same events,
  * including the per-user 1-based session numbering in time order and
  * the batch gap convention (exact MICROSECOND difference > gap,
  * matching the oracle's epoch_us — the sf1 scale drill showed the
  * older epoch-second truncation fuses sessions at fractional-second
  * boundaries).
  *
  * State per user: the open session (4 longs) plus the session counter —
  * constant size, reclaimed down to the counter when a session closes.
  * The counter survives closure so later sessions keep the batch
  * numbering; at 100 TB that residual is 3 longs per user ever seen,
  * the same order as any per-user aggregate state.
  *
  * CHECKPOINT COMPATIBILITY: the state tuple's start/end changed meaning
  * from epoch-MILLIS to epoch-MICROS when the sessionizer moved to exact
  * microsecond gaps (commit b8c05f6). A streaming query restarted from a
  * pre-change checkpoint would silently reinterpret old millis as micros
  * (timestamps ~1000× too early, spurious session splits); a magnitude
  * guard in the state handler rejects such state loudly — restart the
  * query with a fresh checkpoint instead.
  */
object StreamingSessionize {

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long)
  case class Session(user_id: Long, session_id: Long, n_events: Long,
                     session_start: Timestamp, session_end: Timestamp)

  /** Epoch-micros floor for the magnitude guard: ≥1e14 is micros for
    * any date from 1973 on, while epoch-MILLIS stays below ~1e13 until
    * the year 2286 — the two encodings are separated by a full decade
    * of magnitude for every date this engine can meet.
    */
  private[streaming] val MinEpochMicros = 100000000000000L

  /** The checkpoint-compat guard, factored out so the failure mode is
    * unit-testable (no way to synthesize a genuine pre-change
    * checkpoint binary from current code): an OPEN session (n > 0)
    * whose start is below the epoch-micros range can only be
    * pre-change millis state — fail the query loudly instead of
    * emitting sessions ~1000× too early. The closed-session residual
    * (n == 0, start == 0) is exempt: it carries only the counter.
    */
  private[streaming] def guardStateEpoch(user: Long,
                                         s: (Long, Long, Long, Long)): Unit =
    if (s._4 > 0 && s._2 < MinEpochMicros)
      throw new IllegalStateException(
        s"StreamingSessionize state for user $user has session start ${s._2} " +
          "below the epoch-micros range: this checkpoint predates the " +
          "millis->micros state change (commit b8c05f6) and cannot be " +
          "resumed. Restart the query with a fresh checkpoint location.")

  def sessionize(events: Dataset[Ev], gapSeconds: Long = 1800,
                 watermarkDelay: String = "0 seconds")
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    val gapUs = gapSeconds * 1000000L
    def micros(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    def fromMicros(us: Long): Timestamp = {
      val ts = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      ts
    }
    // state tuple: (nextId, start, end, n) — nextId is the id the OPEN
    // (or next) session takes, 1-based; n == 0 ⇔ no open session. A
    // tuple, not a nested case class: product encoders for private
    // nested classes trip Janino codegen.
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long, Long), Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Ev],
         state: GroupState[(Long, Long, Long, Long)]) =>
          def closed(s: (Long, Long, Long, Long)): Session =
            Session(user, s._1, s._4, fromMicros(s._2), fromMicros(s._3))
          state.getOption.foreach(guardStateEpoch(user, _))
          if (state.hasTimedOut) {
            val s = state.get
            // keep the counter so the next session continues the numbering
            state.update((s._1 + 1, 0L, 0L, 0L))
            Iterator.single(closed(s))
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var s = state.getOption.getOrElse((1L, 0L, 0L, 0L))
            // deterministic intra-batch order = the batch window's order
            rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
              val t = micros(e.ts) // state start/end are epoch MICROS
              if (s._4 == 0) s = (s._1, t, t, 1L)
              // batch convention: exact microsecond difference > gap
              else if (t - s._3 > gapUs) {
                out += closed(s)
                s = (s._1 + 1, t, t, 1L)
              } else s = (s._1, s._2, math.max(s._3, t), s._4 + 1)
            }
            state.update(s)
            if (s._4 > 0)
              state.setTimeoutTimestamp(
                math.max(s._3 / 1000 + gapMs + 1000, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
