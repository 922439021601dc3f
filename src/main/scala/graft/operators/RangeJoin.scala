package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * at its timestamp. The interval side is the sessionize aggregate
    * (already small: one row per session); the point side never
    * shuffles more than its bin key. Bin = 1 hour of event time.
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
      .select(col("event_id"), col("ts"), micros(col("ts")).as("pt"))
    pointInInterval(purchases, sessions, binSize = 3600L * 1000000L)
      .groupBy(col("event_id"), col("ts"))
      .agg(count(lit(1)).as("n_active_sessions"))
      .orderBy(col("event_id"))
  }
}
