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
    e.select(max(col("user_id")), max(col("value_bucket"))).collect()(0) match {
      case r => require(r.getLong(0) < 1024 && r.getLong(1) < 1024,
        "z-order bit budget exceeded — widen bits")
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
