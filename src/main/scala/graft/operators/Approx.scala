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
  * These queries register with NO oracle SQL: sketch estimates are
  * implementation-defined, so engine-vs-DuckDB value equality is the
  * wrong gate. They are deterministic for a fixed input (ApproxSpec pins
  * that) and accuracy-tested against the exact aggregates.
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
}
