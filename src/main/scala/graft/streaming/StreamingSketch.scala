package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuously-maintained SKETCH table — the streaming half of the
  * sketch re-aggregation story (`Approx.hllDailyMergeChecked` is the
  * batch half): the stream keeps one DataSketches HLL per
  * (event_type, day) in the aggregation state store, merging each
  * micro-batch's registers into it. Because HLL merge is a per-slot max,
  * the maintained sketch is byte-for-byte ORDER-INDEPENDENT in estimate:
  * any micro-batch arrival split yields the same estimates as one batch
  * pass (pinned in StreamingSketchSpec across a mid-stream file
  * arrival). The persisted daily sketch table then answers any window
  * via `hll_union_agg` without touching raw events — at 100 TB the raw
  * stream is read once, ever.
  */
object StreamingSketch {

  /** Daily per-type HLL user sketches over a (streaming or batch)
    * events frame with (ts, event_type, user_id).
    */
  def dailySketches(events: DataFrame): DataFrame =
    events
      .withColumn("day", to_date(col("ts")))
      .groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))

  /** Estimates view of [[dailySketches]] for parity checks. */
  def dailyEstimates(events: DataFrame): DataFrame =
    dailySketches(events)
      .select(col("event_type"), col("day"),
        hll_sketch_estimate(col("sk")).as("users"))
}
