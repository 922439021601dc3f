package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality profiling: per-column completeness + cardinality in ONE
  * pass over the table — the pre-ingest audit a curation pipeline runs
  * before trusting a new source (the Deequ/WhyLogs shape, exact here so
  * the oracle can hash it).
  *
  * Scale: all per-column aggregates run in a single aggregation (Spark
  * plans multi-distinct via Expand — one scan, rows × #columns
  * intermediate, map-side partial). For a 100 TB table you'd swap the
  * exact distinct counts for `approx_count_distinct` sketches (the
  * Approx tier's HLL path) and keep the identical output shape; the
  * exact form is what makes the correctness gate byte-stable.
  */
object Profile {

  /** (col_name, n_rows, n_nonnull, n_distinct) per column of `df`. */
  def columnProfile(df: DataFrame): DataFrame = {
    val cols = df.columns
    val aggs = count(lit(1)).as("__n") +:
      cols.flatMap(c => Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', __nn_$c, __nd_$c").mkString(", ")
    one.select(col("__n"),
        expr(s"stack(${cols.length}, $stackArgs) AS (col_name, n_nonnull, n_distinct)"))
      .select(col("col_name"), col("__n").as("n_rows"),
        col("n_nonnull"), col("n_distinct"))
      .orderBy(col("col_name"))
  }

  def profileOrders(spark: SparkSession, dir: String): DataFrame =
    columnProfile(Tables.orders(spark, dir))
}
