package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate aggregation — at 100 TB, exact `COUNT(DISTINCT)` and
  * exact percentiles are among the most expensive operations in a
  * pipeline (full shuffle of the distinct key space / full sort). The
  * sketch versions are single-pass, map-side-mergeable, and bounded-
  * memory, which is why they are the default at scale:
  *
  *  - `approx_count_distinct` = HyperLogLog++ (relative error `rsd`),
  *  - `percentile_approx` = KLL-style quantile sketch with `accuracy`.
  *
  * Sketch VALUES are implementation-defined, so engine-vs-DuckDB value
  * equality on them is the wrong gate. The registered queries therefore
  * emit **oracle-checkable exact invariants** instead: the exact
  * aggregates (recomputable in any engine) plus booleans attesting that
  * the sketch landed inside its published error bound. The oracle SQL
  * recomputes the exact side and expects the booleans `true` — a green
  * row attests the accuracy CONTRACT, not the sketch bits. The raw
  * sketch outputs stay available (`approxDistinctUsers` /
  * `approxValueQuantiles`) and are accuracy/determinism-pinned in
  * ApproxSpec.
  */
object Approx {

  /** Approximate distinct users per event type (HLL++, 1% rsd), next to
    * the exact cardinality's cost profile: the exact variant shuffles
    * every (event_type, user_id) pair; the sketch ships one 1.5 KB
    * buffer per partition per group.
    */
  def approxDistinctUsers(spark: SparkSession, dir: String,
                          rsd: Double = 0.01): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Approximate value quantiles per event type (p50/p95/p99). */
  def approxValueQuantiles(spark: SparkSession, dir: String,
                           accuracy: Int = 10000): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy)).as("q"))
      .select(col("event_type"),
        col("q")(0).as("p50"), col("q")(1).as("p95"), col("q")(2).as("p99"))
      .orderBy(col("event_type"))

  /** HLL++ distinct-count with its accuracy contract made exact: per
    * event type, the exact `n_events` and `exact_users`, plus
    * `hll_within_5rsd` = |approx − exact| ≤ 5·rsd·exact computed from the
    * live sketch. The HLL estimator's standard error is rsd; the gate
    * uses the 5-sigma band (P[miss] ≈ 6e-7 per group) rather than 3-sigma
    * (≈3e-3), because the correctness driver regenerates data with fresh
    * seeds — at 3σ a healthy sketch has a real per-regeneration chance of
    * flipping a red row, conflating noise with regression. A genuine
    * sketch bug (wrong merge, lost buffer) misses by far more than 5σ.
    * (HLL++ also falls back to exact linear counting at small
    * cardinalities — the bound is loose there by construction.)
    */
  def approxDistinctUsersChecked(spark: SparkSession, dir: String,
                                 rsd: Double = 0.01): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), rsd).as("approx_users"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          lit(5 * rsd) * col("exact_users")).as("hll_within_5rsd"))
      .orderBy(col("event_type"))

  /** Quantile sketch with its rank-error contract made exact. For each
    * p ∈ {0.5, 0.95, 0.99}, `percentile_approx` guarantees the returned
    * value's rank is within n/accuracy of p·n. The returned value v
    * occupies ranks [count(value < v) + 1, count(value ≤ v)]; the query
    * re-scans the group counting those two sides against the live sketch
    * output and emits `pXX_in_bounds` = that rank interval intersects
    * [p·n − ε, p·n + ε] with ε = n/accuracy + 1 (the +1 absorbs
    * floor/ceil convention differences — the attested property is still
    * the published bound, not a vacuous one).
    *
    * Second pass is a broadcast join of the 5-row sketch result back to
    * the events scan — at 100 TB this is the standard "validate the
    * sketch on a sample/shard" shape; here the full scan doubles as the
    * validator because the gate demands exactness.
    */
  def approxValueQuantilesChecked(spark: SparkSession, dir: String,
                                  accuracy: Int = 10000): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val apx = ev.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy)).as("q"))
      .select(col("event_type"),
        col("q")(0).as("p50"), col("q")(1).as("p95"), col("q")(2).as("p99"))
    val j = ev.join(broadcast(apx), Seq("event_type"))
    def lt(c: String) = sum(when(col("value") < col(c), 1L).otherwise(0L))
    def le(c: String) = sum(when(col("value") <= col(c), 1L).otherwise(0L))
    val counted = j.groupBy(col("event_type")).agg(
      count(col("value")).as("n"),
      lt("p50").as("lt50"), le("p50").as("le50"),
      lt("p95").as("lt95"), le("p95").as("le95"),
      lt("p99").as("lt99"), le("p99").as("le99"))
    def inBounds(p: Double, ltc: String, lec: String) = {
      val eps = col("n").cast("double") / accuracy + lit(1.0)
      val target = col("n").cast("double") * p
      (col(ltc) + lit(1L) <= target + eps) && (col(lec) >= target - eps)
    }
    counted.select(col("event_type"), col("n").as("n_events"),
        inBounds(0.50, "lt50", "le50").as("p50_in_bounds"),
        inBounds(0.95, "lt95", "le95").as("p95_in_bounds"),
        inBounds(0.99, "lt99", "le99").as("p99_in_bounds"))
      .orderBy(col("event_type"))
  }
}
