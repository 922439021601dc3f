package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order locality: predicates on EITHER interleaved column skip row
  * groups, where a single-column sort only serves its own column. All
  * assertions use the executed scan's decoded-row metric (numOutputRows
  * of the scan node), never plan text.
  */
class ZOrderSpec extends SparkSpec {

  test("z-ordered layout skips row groups for point predicates on both columns") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dataDir = "/root/testdata/sf0.01" // ~10k rows -> many 64 KB row groups
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    val uDir = java.nio.file.Files.createTempDirectory("graft_usort_").toString
    ZOrder.writeZOrderedEvents(spark, dataDir, zDir)
    TimePartitionedStore.writeSortedLayout(spark, dataDir, uDir, "user_id")
    def decoded(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val n = df.collect().length.toLong // drives df's OWN QueryExecution
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: FileSourceScanExec => f
      }.get
      (n, scan.metrics("numOutputRows").value)
    }
    val total = spark.read.parquet(zDir).count()
    val userPred = col("user_id") === 7L
    val valuePred = col("value") >= 100.0 && col("value") < 110.0

    val (zUserN, zUserDec) = decoded(spark.read.parquet(zDir).filter(userPred))
    val (zValN, zValDec) = decoded(spark.read.parquet(zDir).filter(valuePred))
    val (uUserN, uUserDec) = decoded(spark.read.parquet(uDir).filter(userPred))
    val (uValN, uValDec) = decoded(spark.read.parquet(uDir).filter(valuePred))

    assert(zUserN > 0 && zValN > 0)
    assert(zUserN === uUserN && zValN === uValN)
    // z-order: BOTH predicates decode a minority of the file
    assert(zUserDec < total * 6 / 10,
      s"z-order user predicate decoded $zUserDec of $total")
    assert(zValDec < total * 6 / 10,
      s"z-order value predicate decoded $zValDec of $total")
    // single-column sort: its own column skips harder than z-order...
    assert(uUserDec <= zUserDec)
    // ...but the OTHER column decodes essentially everything — the
    // trade z-order exists to break
    assert(uValDec > total * 8 / 10,
      s"user-sorted layout unexpectedly skipped for value predicate: $uValDec of $total")
    assert(zValDec < uValDec)
  }
}
