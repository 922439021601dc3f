package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The engine's gaps-and-islands sessionization (oracle-gated as
  * `q_events_sessionize`) against Spark's BUILT-IN `session_window`
  * aggregation: same gap, same corpus — per-user session count and
  * per-session event counts must agree. Guards both directions: a
  * regression in the custom path breaks parity with the built-in, and
  * a semantic change in the built-in (gap boundary handling) surfaces
  * here instead of silently diverging in production.
  */
class SessionWindowParitySpec extends SparkSpec {

  test("custom sessionization == built-in session_window (30 min gap)") {
    val e = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"))

    val builtin = e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))

    val custom = Relational.qEventsSessionize(spark, sfDir)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))

    // identical session boundaries and sizes (the custom rule starts a
    // new session when gap > 30 min; session_window closes a window
    // when the next event is >= last + gap — on this corpus of
    // microsecond timestamps an exact-1800s gap would be the only
    // divergence, and parity proves there is none)
    // raw objects: ts is TIMESTAMP_NTZ (LocalDateTime) on round-8+
    // driver files, java.sql.Timestamp on older ones — both sides of
    // the parity produce the same type either way
    val b = builtin.collect().map(r =>
      (r.getLong(0), r.get(1), r.get(2), r.getLong(3))).toSet
    val c = custom.collect().map(r =>
      (r.getLong(0), r.get(1), r.get(2), r.getLong(3))).toSet
    assert(b.nonEmpty)
    assert(b === c)
  }
}
