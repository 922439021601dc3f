package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CDC MERGE: upserts/deletes land in O(changed days), not O(table) —
  * result equals a full-table reference merge, untouched days' files are
  * not rewritten (mtime identity), the snapshot read is partition-pruned
  * to the touched days, and an all-deleted day's directory disappears.
  */
class CdcMergeSpec extends SparkSpec {

  private def freshLayout(): String = {
    val src = TimePartitionedStore.ensureDatedLayout(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft_cdc_store_").toString
    spark.read.parquet(src).write.mode("overwrite")
      .partitionBy("event_date").parquet(out)
    out
  }

  test("merge applies upserts/deletes, touches only changed days, prunes the read") {
    val store = freshLayout()
    // reference copy via localCheckpoint, NOT cache(): a cached plan over
    // the same files would be substituted into the merge view's snapshot
    // read by the cache manager, hiding the file scan this spec asserts
    val before = spark.read.parquet(store).localCheckpoint(true)

    // change batch: update 5 day-08 rows (value += 1000), insert 3 new
    // rows on day 09, delete 4 day-10 rows
    val upd = before.filter(col("event_date") === lit("2024-01-08"))
      .orderBy(col("event_id")).limit(5)
      .withColumn("value", col("value") + 1000.0)
      .withColumn("op", lit("upsert"))
    val maxId = before.agg(max(col("event_id"))).collect()(0).getLong(0)
    val ins = before.filter(col("event_date") === lit("2024-01-09"))
      .orderBy(col("event_id")).limit(3)
      .withColumn("event_id", col("event_id") + lit(maxId))
      .withColumn("op", lit("upsert"))
    val del = before.filter(col("event_date") === lit("2024-01-10"))
      .orderBy(col("event_id")).limit(4)
      .withColumn("op", lit("delete"))
    val changes = upd.unionByName(ins).unionByName(del)
      .select("op", "event_id", "ts", "user_id", "event_type", "value", "props")
      .localCheckpoint(true)

    // the merge's snapshot read must be directory-pruned to touched days
    // (AQE off for the inspection run — query stages hide the scan nodes
    // from plan traversal; the applied merge below runs with AQE as-is)
    val days = CdcMerge.touchedDays(changes)
    assert(days.map(_.toString) === Seq("2024-01-08", "2024-01-09", "2024-01-10"))
    val adaptivePrior = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val view = CdcMerge.mergedView(spark, store, changes, days)
      val viewRows = view.collect().length
      val scan = view.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.partitionFilters.nonEmpty => f
      }
      assert(scan.nonEmpty, "no partitioned scan in merge view")
      val allFiles = spark.read.parquet(store).inputFiles.length.toLong
      val nDays = before.select(col("event_date")).distinct().count()
      val filesRead = scan.map(_.metrics("numFiles").value).sum
      assert(filesRead <= math.ceil(allFiles.toDouble / nDays * 3).toLong,
        s"merge read $filesRead of $allFiles files for 3 of $nDays days")
      assert(viewRows > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", adaptivePrior)

    // untouched-day file inventory before the merge
    def fileState(day: String): Set[(String, Long)] = {
      val d = java.nio.file.Paths.get(store, s"event_date=$day")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(d).iterator().asScala
        .map(p => p.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toSet
    }
    val untouchedBefore = fileState("2024-01-20")

    CdcMerge.mergeChanges(spark, store, changes)
    val after = spark.read.parquet(store)

    // reference: the same merge applied naively over the WHOLE table
    val expected = before
      .join(changes.filter(col("op") === "delete").select(col("event_id").as("k")),
        col("event_id") === col("k"), "left_anti").drop("k")
      .join(changes.filter(col("op") === "upsert").select(col("event_id").as("k")),
        col("event_id") === col("k"), "left_anti").drop("k")
      .unionByName(changes.filter(col("op") === "upsert").drop("op")
        .withColumn("event_date", to_date(col("ts"))))
    assert(after.count() === expected.count())
    assert(after.exceptAll(expected).isEmpty && expected.exceptAll(after).isEmpty)

    // untouched day: identical files, not rewritten copies
    assert(fileState("2024-01-20") === untouchedBefore)
  }

  test("a day whose rows are all deleted loses its directory") {
    val store = freshLayout()
    val day = "2024-01-12"
    val doomed = spark.read.parquet(store)
      .filter(col("event_date") === lit(day))
      .withColumn("op", lit("delete"))
      .select("op", "event_id", "ts", "user_id", "event_type", "value", "props")
      .localCheckpoint(true)
    assert(doomed.count() > 0)
    CdcMerge.mergeChanges(spark, store, doomed)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(store, s"event_date=$day")))
    assert(spark.read.parquet(store)
      .filter(col("event_date") === lit(day)).count() === 0)
  }
}
