package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Shuffle-byte MEASUREMENT of the two-phase-distinct rewrite the
  * engine uses throughout (`Approx.approxDistinctUsersChecked`,
  * region-revenue, event-stats): mixing COUNT(DISTINCT) with plain
  * aggregates makes Catalyst plan an Expand that multiplies every input
  * row through the shuffle, while the staged form reduces to one row
  * per (group, user) first. The code comments claim the staged form
  * ships a fraction of the bytes — this spec MEASURES both plans with a
  * stage-metrics listener and pins the direction (and the results'
  * equality). At 100 TB the delta is the difference between shuffling
  * the table three times and shuffling the distinct pairs once.
  */
class ShuffleBytesSpec extends SparkSpec {

  private def shuffleBytes(body: => Unit): Long = {
    val total = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        total.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.GraftTestBridge.waitUntilListenerBusEmpty(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    total.get()
  }

  test("two-phase distinct shuffles strictly fewer bytes than the Expand plan") {
    val events = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"))

    // the exact aggregate trio of approxDistinctUsersChecked
    def naive() = events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy(col("event_type"))
    def staged() = events
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_rows"))
      .groupBy(col("event_type"))
      .agg(sum(col("n_rows")).as("n_events"),
        count(lit(1)).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy(col("event_type"))

    // the rewrite must not change the answer
    val a = naive().collect().map(_.toSeq).toSeq
    val b = staged().collect().map(_.toSeq).toSeq
    assert(a === b && a.nonEmpty)

    val naiveBytes = shuffleBytes(naive().collect())
    val stagedBytes = shuffleBytes(staged().collect())
    assert(naiveBytes > 0 && stagedBytes > 0)
    assert(stagedBytes < naiveBytes,
      s"staged=$stagedBytes !< naive=$naiveBytes shuffle bytes")
  }
}
