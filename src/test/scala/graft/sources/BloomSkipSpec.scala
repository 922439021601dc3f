package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Per-file Bloom skipping specs: result parity with the raw filter
  * (zero false negatives), REAL pruning on a single-key probe, and the
  * motivating gap — the min/max manifest axis cannot skip for this
  * scattered key while the bloom can.
  */
class BloomSkipSpec extends SparkSpec {

  test("bloom read ≡ raw filter for the probe workload (no false negatives)") {
    val got = BloomSkipIndex.bloomLookup(spark, sfDir)
      .collect().map(_.getAs[Long]("event_id")).toSeq
    val expected = graft.Tables.events(spark, sfDir)
      .filter(col("event_id").isin(BloomSkipIndex.ProbeIds: _*))
      .collect().map(_.getAs[Long]("event_id")).sorted.toSeq
    assert(expected.nonEmpty, "probe workload vacuous at this sf")
    assert(got === expected)
  }

  test("single-key probe opens a strict subset of the layout's files") {
    val present = graft.Tables.events(spark, sfDir)
      .select(col("event_id")).limit(1).collect()(0).getLong(0)
    val (positive, total) = BloomSkipIndex.positiveFiles(spark, sfDir, Seq(present))
    assert(total > 1, "layout must be multi-file for skipping to mean anything")
    assert(positive.nonEmpty, "the key's own file must be bloom-positive")
    assert(positive.size < total,
      s"bloom skipped nothing: $positive of $total files positive")
    // the scan is confined to the positive files
    val scanned = BloomSkipIndex.readForEventIds(spark, sfDir, Seq(present)).inputFiles
    assert(scanned.toSet.subsetOf(positive.map(p => p.stripPrefix("file://")).toSet
      ++ positive.toSet))
    // and the row itself comes back
    assert(BloomSkipIndex.readForEventIds(spark, sfDir, Seq(present)).count() === 1L)
  }

  test("min/max stats CANNOT prune this key — the axis the bloom adds is real") {
    val (dataDir, _) = BloomSkipIndex.ensureBloomIndex(spark, sfDir)
    // a mid-domain key: hash distribution scatters its neighborhood
    // across every file, so every [min,max] range covers it
    val present = graft.Tables.events(spark, sfDir)
      .agg(max(col("event_id"))).collect()(0).getLong(0) / 2
    val ranges = spark.read.parquet(dataDir)
      .select(input_file_name().as("path"), col("event_id"))
      .groupBy(col("path"))
      .agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val statPositive = ranges.count { case (lo, hi) => lo <= present && present <= hi }
    assert(statPositive === ranges.length,
      "expected every file's [min,max] to cover the key (hash-scattered layout)")
    val (bloomPositive, total) = BloomSkipIndex.positiveFiles(spark, sfDir, Seq(present))
    assert(bloomPositive.size < total)
  }

  test("absent key: zero files opened, empty result with the layout schema") {
    val absent = -99999L
    val (positive, _) = BloomSkipIndex.positiveFiles(spark, sfDir, Seq(absent))
    // an absent key is *probably* all-negative at this fill rate; if a
    // false positive fires, the exact filter must still return nothing
    val out = BloomSkipIndex.readForEventIds(spark, sfDir, Seq(absent))
    assert(out.count() === 0L)
    if (positive.isEmpty) assert(out.inputFiles.isEmpty)
  }
}
