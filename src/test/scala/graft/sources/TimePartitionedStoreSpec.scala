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

  test("compaction: one file per day, data byte-identical") {
    val store = TimePartitionedStore.ensureDatedLayout(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft_compacted_").toString
    TimePartitionedStore.compactDatedLayout(spark, store, out)
    val before = spark.read.parquet(store)
    val after = spark.read.parquet(out)
    val nDays = after.select("event_date").distinct().count()
    // exactly one data file per day partition remains
    assert(after.inputFiles.length.toLong === nDays)
    assert(before.inputFiles.length >= after.inputFiles.length)
    // and the rewrite moved no data
    assert(after.count() === before.count())
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
  }

  test("backfill replaces exactly one day: other days' files untouched") {
    // a fresh store (not the shared memo) — this test mutates it
    val store = java.nio.file.Files.createTempDirectory("graft_backfill_").toString
    val events = graft.Tables.events(spark, sfDir)
    events.withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(store)
    val day = "2024-01-10"
    def fileSet(exceptDay: String): Set[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(store)).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .filterNot(_.toString.contains(s"event_date=$exceptDay"))
        .map(p => p.toString + "@" + java.nio.file.Files.getLastModifiedTime(p))
        .toSet
    }
    val othersBefore = fileSet(day)
    // backfill the day with a corrected feed: that day's values doubled
    val corrected = events.withColumn("value",
      when(to_date(col("ts")) === lit(day), col("value") * 2).otherwise(col("value")))
    TimePartitionedStore.backfillDay(spark, store, day, corrected)
    // other days: same files, same mtimes — not rewritten
    assert(fileSet(day) === othersBefore)
    // the day itself: replaced with the corrected rows
    val dayRows = spark.read.parquet(store)
      .filter(col("event_date") === lit(day))
    val expected = corrected.filter(to_date(col("ts")) === lit(day))
    assert(dayRows.count() === expected.count())
    // int64-cents sum (FIXTURES §3): a raw double sum is partition-order
    // dependent and would flake on a last-ulp difference
    def centsSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum((col("value").cast("decimal(18,2)") * 100).cast("bigint")))
        .collect()(0).getLong(0)
    assert(centsSum(dayRows) === centsSum(expected))
  }

  test("streaming ingest into the dated layout equals the batch layout, exactly once") {
    val events = graft.Tables.events(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_lake_").toString
    events.write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$tmp/in")
    val q = TimePartitionedStore.streamIntoDatedLayout(
      spark, stream, s"$tmp/out", s"$tmp/ckpt")
    try q.processAllAvailable() finally q.stop()
    // the _spark_metadata commit log is the exactly-once mechanism
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$tmp/out/_spark_metadata")))
    val streamed = spark.read.parquet(s"$tmp/out")
    assert(streamed.count() === events.count())
    // same partition spine and same rows as the batch-written layout
    val batchStore = TimePartitionedStore.ensureDatedLayout(spark, sfDir)
    val batch = spark.read.parquet(batchStore)
    assert(streamed.select("event_date").distinct().count() ===
      batch.select("event_date").distinct().count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("schema evolution: a later day adds a column; merged read backfills nulls") {
    // day 1 lands with the original schema; day 2's producer added a
    // quality_score column. mergeSchema must union the schemas, old days
    // reading null for the new column — silent schema drift is the
    // ingestion failure mode this pins (the default non-merged read
    // would pick ONE footer's schema and silently drop the column).
    val store = java.nio.file.Files.createTempDirectory("graft_evolve_").toString
    val events = graft.Tables.events(spark, sfDir)
    events.withColumn("event_date", to_date(col("ts")))
      .filter(col("event_date") === lit("2024-01-05"))
      .write.mode("append").partitionBy("event_date").parquet(store)
    events.withColumn("event_date", to_date(col("ts")))
      .filter(col("event_date") === lit("2024-01-06"))
      .withColumn("quality_score", col("value") * 0.5)
      .write.mode("append").partitionBy("event_date").parquet(store)
    val merged = spark.read.option("mergeSchema", "true").parquet(store)
    assert(merged.columns.contains("quality_score"))
    val d1 = merged.filter(col("event_date") === lit("2024-01-05"))
    val d2 = merged.filter(col("event_date") === lit("2024-01-06"))
    assert(d1.count() > 0 && d2.count() > 0)
    // old day: all nulls for the new column; new day: none
    assert(d1.filter(col("quality_score").isNotNull).count() === 0)
    assert(d2.filter(col("quality_score").isNull).count() === 0)
  }

  test("sorted layout: row-group stats skip most of the file for a point predicate") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // sf0.01 events (~10k rows): with 64 KB row groups the single file
    // holds many groups, so there is something to skip at test scale
    val dataDir = "/root/testdata/sf0.01"
    val byUser = java.nio.file.Files.createTempDirectory("graft_sorted_u_").toString
    val byTs = java.nio.file.Files.createTempDirectory("graft_sorted_t_").toString
    TimePartitionedStore.writeSortedLayout(spark, dataDir, byUser, "user_id")
    TimePartitionedStore.writeSortedLayout(spark, dataDir, byTs, "ts")
    def scanRows(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      // collect() drives df's OWN QueryExecution (count() would plan a
      // separate one whose scan metrics this method then couldn't see)
      val n = df.collect().length.toLong
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: FileSourceScanExec => f
      }.get
      (n, scan.metrics("numOutputRows").value)
    }
    val total = spark.read.parquet(byUser).count()
    // point predicate on the sort column: only row groups whose min/max
    // straddle the key decode — the scan's numOutputRows metric counts
    // DECODED rows, so skipping shows up as decoded << total. The same
    // predicate against the ts-sorted layout decodes everything (every
    // row group's user_id range spans the whole universe there).
    val (matchedS, decodedS) = scanRows(
      spark.read.parquet(byUser).filter(col("user_id") === 7L))
    assert(matchedS > 0)
    assert(decodedS < total / 4,
      s"sorted layout decoded $decodedS of $total rows — row groups not skipped")
    val (matchedU, decodedU) = scanRows(
      spark.read.parquet(byTs).filter(col("user_id") === 7L))
    assert(matchedU === matchedS)
    assert(decodedS < decodedU,
      s"sorted decoded $decodedS vs ts-sorted $decodedU — sorting bought nothing")
  }

  test("vacuum drops only pre-retention day directories; kept files untouched") {
    // fresh copy — the shared memoized layout must never be mutated
    val src = TimePartitionedStore.ensureDatedLayout(spark, sfDir)
    val store = java.nio.file.Files.createTempDirectory("graft_vacuum_").toString
    spark.read.parquet(src).write.mode("overwrite")
      .partitionBy("event_date").parquet(store)

    val keepFrom = "2024-01-15"
    val allDays = spark.read.parquet(store)
      .select(col("event_date").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    val (expectDrop, expectKeep) = allDays.partition(_ < keepFrom)
    assert(expectDrop.nonEmpty && expectKeep.nonEmpty)

    def fileState(day: String): Set[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(
        java.nio.file.Paths.get(store, s"event_date=$day")).iterator().asScala
        .map(p => p.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toSet
    }
    val keptBefore = expectKeep.map(d => d -> fileState(d)).toMap

    val dropped = TimePartitionedStore.vacuumBefore(store, keepFrom)
    assert(dropped === expectDrop.toSeq)
    expectDrop.foreach(d => assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(store, s"event_date=$d"))))
    // kept days: identical files, not rewritten — vacuum is metadata-only
    expectKeep.foreach(d => assert(fileState(d) === keptBefore(d)))

    val after = spark.read.parquet(store)
    assert(after.select(col("event_date").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq === expectKeep.toSeq)
    val expected = graft.Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) >= lit(keepFrom)).count()
    assert(after.count() === expected && expected > 0)
  }
}
