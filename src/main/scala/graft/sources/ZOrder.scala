package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-ORDER (Morton-curve) layout — multi-column data locality at rest.
  * A single-column sort buys row-group skipping on that column only;
  * interleaving the bits of two columns and sorting by the interleaved
  * value clusters the file so that range/point predicates on EITHER
  * column touch a small band of row groups (the Delta/Iceberg
  * `OPTIMIZE ZORDER BY` technique, expressed directly in Spark).
  *
  * The z-value is pure bit arithmetic on bounded ints (the caller maps
  * each column into [0, 2^bits)): bit i of `a` lands at position 2i,
  * bit i of `b` at 2i+1 — whole-stage-codegen'd Column ops, no UDF.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative int columns. */
  def zValue(a: Column, b: Column, bits: Int = 10): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Min-max normalize a non-negative column into [0, 2^bits) so both
    * interleaved dimensions spend the SAME bit budget. Without this, the
    * wider-ranged column owns the high interleaved bits and the curve
    * degenerates toward a single-column sort of that column (measured on
    * the events corpus: value spans ~9 bits vs user_id's 8, and the
    * user-predicate decode fraction degraded to ~70% of the file) —
    * the same reason Delta/Iceberg OPTIMIZE ZORDER range-normalizes
    * every dimension first. Monotone per column, so point/range
    * predicates map to contiguous normalized cells.
    */
  private def normalized(c: Column, lo: Long, hi: Long, bits: Int): Column =
    if (hi > lo) ((c - lit(lo)) * lit((1L << bits) - 1) / lit(hi - lo)).cast("bigint")
    else lit(0L)

  /** Events z-ordered at rest by (user_id, floor(value)), both min-max
    * normalized to the shared 10-bit budget at write. Small row groups
    * at test scale (the production default is 128 MB; the locality
    * property is identical).
    */
  def writeZOrderedEvents(spark: SparkSession, dir: String, outDir: String,
                          blockBytes: Long = 64 * 1024): Unit = {
    val e = Tables.events(spark, dir)
      .withColumn("value_bucket", floor(col("value")).cast("bigint"))
    // non-negativity matters: a NEGATIVE value would sign-extend through
    // shiftrightunsigned and silently destroy the interleaving (no
    // error, just a layout with no locality); empty input is a clear
    // failure, not an NPE on the null aggregate
    val (uMin, uMax, bMin, bMax) =
      e.select(min(col("user_id")), max(col("user_id")),
               min(col("value_bucket")), max(col("value_bucket")))
        .collect()(0) match {
        case r =>
          require(!r.isNullAt(0), "z-order layout write on an empty table")
          require(r.getLong(0) >= 0 && r.getLong(2) >= 0,
            s"z-order needs non-negative dims, got user_id min ${r.getLong(0)}, " +
              s"bucket min ${r.getLong(2)}")
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    e.withColumn("__z", zValue(
        normalized(col("user_id"), uMin, uMax, 10),
        normalized(col("value_bucket"), bMin, bMax, 10)))
      .repartition(1)
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", blockBytes.toString)
      .parquet(outDir)
  }
}
