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

  /** Events z-ordered at rest by (user_id, floor(value)) — both bounded
    * under 2^10 in this corpus, asserted at write. Small row groups at
    * test scale (the production default is 128 MB; the locality
    * property is identical).
    */
  def writeZOrderedEvents(spark: SparkSession, dir: String, outDir: String,
                          blockBytes: Long = 64 * 1024): Unit = {
    val e = Tables.events(spark, dir)
      .withColumn("value_bucket", floor(col("value")).cast("bigint"))
    // both bounds matter: a NEGATIVE value would sign-extend through
    // shiftrightunsigned and silently destroy the interleaving (no
    // error, just a layout with no locality); empty input is a clear
    // failure, not an NPE on the null aggregate
    e.select(min(col("user_id")), max(col("user_id")),
             min(col("value_bucket")), max(col("value_bucket")))
      .collect()(0) match {
      case r =>
        require(!r.isNullAt(0), "z-order layout write on an empty table")
        require(r.getLong(0) >= 0 && r.getLong(1) < 1024 &&
                r.getLong(2) >= 0 && r.getLong(3) < 1024,
          s"z-order bit budget: need 0 <= value < 1024, got user_id in " +
            s"[${r.getLong(0)}, ${r.getLong(1)}], bucket in " +
            s"[${r.getLong(2)}, ${r.getLong(3)}] — widen bits or shift")
    }
    e.withColumn("__z", zValue(col("user_id"), col("value_bucket")))
      .repartition(1)
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", blockBytes.toString)
      .parquet(outDir)
  }
}
