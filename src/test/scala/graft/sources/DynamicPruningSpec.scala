package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Dynamic partition pruning — the third runtime-pruning axis next to
  * static partition pruning (TimePartitionedStoreSpec) and runtime
  * Bloom-filter row pruning (RuntimeFilterSpec): when a partitioned
  * fact joins a dim whose SELECTIVE filter determines the matching
  * partitions only at runtime, Catalyst injects a
  * `dynamicpruningexpression` into the fact scan's PartitionFilters so
  * the non-matching day directories are never opened. At 100 TB this
  * turns "scan the year, then throw away 51 weeks in the join" into
  * "open one week" — without the query author hand-copying the dim
  * predicate onto the fact.
  *
  * Asserted on the EXECUTED scan's metrics (files actually opened),
  * not just plan text, and pinned result-equal to the DPP-off run.
  */
class DynamicPruningSpec extends SparkSpec {

  test("selective dim filter prunes fact partitions at runtime (dynamicpruning in scan)") {
    val store = TimePartitionedStore.ensureDatedLayout(spark, sfDir)
    val dimDir = java.nio.file.Files.createTempDirectory("graft_datedim_").toString
    // an on-disk calendar dim: one row per day, a focus flag on one
    // week. The flag is an INT compared with a literal because the
    // PartitionPruning rule keys on "likely selective" predicate shapes
    // (comparisons/IN) — a bare boolean attribute does not qualify.
    spark.read.parquet(store).select(col("event_date")).distinct()
      .withColumn("focus_week",
        when(col("event_date") >= lit("2024-01-08") &&
             col("event_date") < lit("2024-01-15"), 1).otherwise(0))
      .write.mode("overwrite").parquet(dimDir)

    val prior = Seq("spark.sql.adaptive.enabled",
        "spark.sql.optimizer.dynamicPartitionPruning.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    def query() = {
      val fact = spark.read.parquet(store)
      val dim = spark.read.parquet(dimDir).filter(col("focus_week") === 1)
      fact.join(dim, Seq("event_date"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }
    try {
      // AQE off so the executed plan tree is directly walkable; DPP is
      // independent of AQE (the dim side broadcasts either way)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")

      val q = query()
      val rows = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.nonEmpty && rows.values.sum > 0)

      val factScan = q.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec if f.partitionFilters.nonEmpty => f
      }
      assert(factScan.size === 1, "expected exactly one partitioned fact scan")
      val scan = factScan.head
      assert(scan.partitionFilters.mkString(",").toLowerCase
          .contains("dynamicpruning"),
        s"no dynamicpruning expression in PartitionFilters: ${scan.partitionFilters}")

      // files actually opened = the focus week only, not the whole store
      val allFiles = spark.read.parquet(store).inputFiles.length.toLong
      val nDays = spark.read.parquet(store)
        .select(col("event_date")).distinct().count()
      val filesRead = scan.metrics("numFiles").value
      val filesPerDay = allFiles.toDouble / nDays
      assert(filesRead > 0 && filesRead <= math.ceil(filesPerDay * 7).toLong,
        s"DPP opened $filesRead of $allFiles files (~$filesPerDay/day)")

      // pruning changed nothing about the answer
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      val off = query().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows === off, "DPP changed the result")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
