package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Binned (bucketized) range join — the scale technique for
  * point-in-interval joins. Spark plans a raw `p BETWEEN s AND e`
  * join as BroadcastNestedLoopJoin (O(points × intervals) comparisons —
  * a job-killer once neither side broadcasts); binning turns it into an
  * EQUI-join: every interval explodes into the bins it overlaps, every
  * point maps to exactly one bin, the join key is the bin id, and the
  * exact predicate filters the (bin-confined) candidates. Cost is
  * points + Σ interval-spans/bin — linear, hash-partitioned, AQE-able,
  * the same shape Databricks' range-join optimization produces.
  */
object RangeJoin {

  /** Join `points` (column `pt`, int64) to `intervals` (columns `s`, `e`
    * inclusive, int64) on `s ≤ pt ≤ e` via equi-join on bin id.
    * `binSize` trades explode factor against candidate precision; any
    * value in (Long.MinValue + binSize, Long.MaxValue] is correct — bin
    * assignment is pure int64 arithmetic (see [[floorDiv]]), never a
    * double round trip that could mis-bin (and silently LOSE matches,
    * since the exact predicate only removes false positives) above 2^53.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val binnedPts = points.withColumn("__bin", floorDiv(col("pt"), binSize))
    val binnedIvs = intervals.withColumn("__bin",
      explode(sequence(floorDiv(col("s"), binSize), floorDiv(col("e"), binSize))))
    binnedPts.join(binnedIvs, Seq("__bin"))
      .filter(col("pt") >= col("s") && col("pt") <= col("e"))
      .drop("__bin")
  }

  /** Exact int64 floor division: subtract the (non-negative) pmod so the
    * operand is an exact multiple, then integral-divide — truncation and
    * floor coincide on exact multiples, so the result is bit-exact for
    * the full int64 range (`floor(c / d)` in doubles rounds wrong above
    * 2^53). Only c within binSize of Long.MinValue could wrap.
    */
  private def floorDiv(c: org.apache.spark.sql.Column, d: Long) =
    call_function("div", c - pmod(c, lit(d)), lit(d))

  /** Session-concurrency analytic: for every purchase event, how many
    * sessions (any user, from the 30-min-gap sessionization) were active
    * at its timestamp.
    *
    * Executed as a SWEEP, not a join: a session contributes +1 at its
    * start instant and −1 at end+1µs (inclusive interval in integer
    * micros), and the answer at a probe is the running sum of deltas at
    * its position — `starts ≤ pt` minus `ends < pt`. Cost is one sort
    * of (boundaries + probes), linear-ish in rows, where the binned
    * join's candidate set is Σ per-bin points × intervals — quadratic
    * in temporal DENSITY, which grows with SF at a fixed time range
    * (measured 24.6× at the 100× sf10 drill before this change).
    * The prefix sum is distributed: per-hour-bin partial sums inside a
    * bin-partitioned window + a report-sized (hours in the corpus
    * range) bin-offset frame broadcast back — no global window over
    * corpus rows. Equal-instant semantics: all boundary deltas sort
    * BEFORE probes at the same t (`__p` ordering), so a session
    * starting exactly at pt counts and one ending at pt−1µs does not.
    */
  def qSessionConcurrency(spark: SparkSession, dir: String): DataFrame = {
    // unix_micros rejects TIMESTAMP_NTZ; the cast is a no-op for
    // TIMESTAMP and reinterprets NTZ wall-clock in the session zone
    // (pinned UTC), so both driver file flavors (µs-NTZ since round 8,
    // nanos→TIMESTAMP before) yield identical epoch values.
    val micros = (c: org.apache.spark.sql.Column) => unix_micros(c.cast("timestamp"))
    val sessions = Relational.sessionize(Tables.events(spark, dir))
      .select(micros(col("session_start")).as("s"),
              micros(col("session_end")).as("e"))
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"), micros(col("ts")).as("t"))
    val tsType = purchases.schema("ts").dataType
    val binSize = 3600L * 1000000L

    val deltas = sessions.select(col("s").as("t"), lit(1L).as("d"))
      .unionByName(sessions.select((col("e") + lit(1L)).as("t"), lit(-1L).as("d")))
      .select(lit(null).cast("long").as("event_id"),
              lit(null).cast(tsType).as("ts"),
              col("t"), col("d"), lit(0).as("__p"))
    val probes = purchases
      .select(col("event_id"), col("ts"), col("t"),
              lit(0L).as("d"), lit(1).as("__p"))
    val all = deltas.unionByName(probes)
      .withColumn("__bin", floorDiv(col("t"), binSize))

    // Per-bin delta totals → running offset of all PRIOR bins. Probes
    // participate with d=0 so every probe's bin is present. The bins
    // frame is report-sized (hours spanned by the corpus), so the
    // unpartitioned window is bounded — the anomalyDays argument.
    val wBins = Window.orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = all.groupBy(col("__bin")).agg(sum(col("d")).as("bd"))
      .withColumn("off", coalesce(sum(col("bd")).over(wBins), lit(0L)))
      .select(col("__bin"), col("off"))

    val wBin = Window.partitionBy(col("__bin"))
      .orderBy(col("t"), col("__p"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    all.withColumn("run", sum(col("d")).over(wBin))
      .filter(col("__p") === 1)
      .join(broadcast(offsets), Seq("__bin"))
      .select(col("event_id"), col("ts"),
              (col("off") + col("run")).as("n_active_sessions"))
      .orderBy(col("event_id"))
  }

  /** The pre-sweep formulation (binned interval join + count per
    * probe) — the semantic foil: RangeJoinSpec asserts sweep ≡ binned
    * row-for-row on the test corpus and checks THIS plan for the
    * no-nested-loop contract. The sweep above is the registered lane.
    */
  private[graft] def qSessionConcurrencyBinned(spark: SparkSession, dir: String): DataFrame = {
    val micros = (c: org.apache.spark.sql.Column) => unix_micros(c.cast("timestamp"))
    val sessions = Relational.sessionize(Tables.events(spark, dir))
      .select(micros(col("session_start")).as("s"),
              micros(col("session_end")).as("e"))
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"), micros(col("ts")).as("pt"))
    pointInInterval(purchases, sessions, binSize = 3600L * 1000000L)
      .groupBy(col("event_id"), col("ts"))
      .agg(count(lit(1)).as("n_active_sessions"))
      .orderBy(col("event_id"))
  }
}
