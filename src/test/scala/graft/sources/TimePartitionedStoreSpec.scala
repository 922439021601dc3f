package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dated-layout pruning: the window read must touch ONLY the window's
  * day directories (proved by the scan's post-execution numFiles
  * metric, not just the plan text), and the round trip must preserve
  * the data exactly.
  */
class TimePartitionedStoreSpec extends SparkSpec {

  test("window read prunes to the window's day partitions; round trip exact") {
    val store = TimePartitionedStore.ensureDatedLayout(spark, sfDir)
    val all = spark.read.parquet(store)
    val nDays = all.select(col("event_date")).distinct().count()
    assert(nDays >= 28, s"expected ~30 day partitions, got $nDays")

    val window = TimePartitionedStore.readWindow(spark, store, "2024-01-08", "2024-01-15")
    // partition pruning is static: the filter must land in
    // PartitionFilters (directory pruning), not PushedFilters (row
    // groups inside already-opened files)
    val scanStr = window.queryExecution.executedPlan.toString
    assert(scanStr.contains("PartitionFilters") &&
      scanStr.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").nonEmpty,
      s"no partition filters in:\n${scanStr.take(800)}")

    // the executed scan opened files from exactly the 7 window days
    val rows = window.collect()
    val scan = window.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val filesRead = scan.metrics("numFiles").value
    val filesPerDay = all.inputFiles.length.toDouble / nDays
    assert(filesRead <= math.ceil(filesPerDay * 7).toLong,
      s"read $filesRead files for a 7-day window of ~$filesPerDay files/day")
    assert(filesRead > 0)

    // round trip: the windowed rows equal the source rows in the window
    val expected = graft.Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) >= lit("2024-01-08") &&
              to_date(col("ts")) < lit("2024-01-15"))
      .count()
    assert(rows.length.toLong === expected)
    assert(expected > 0)
  }
}
