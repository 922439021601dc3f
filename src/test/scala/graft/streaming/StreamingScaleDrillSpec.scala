package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** sf1 STREAMING scale drill (round-9; the streaming counterpart of the
  * round-8 batch drill): the highest-state lanes run against the 10×
  * gendata corpus with state-store metrics pinned — peak state rows
  * must be bounded by watermark/TTL arithmetic, NOT corpus size, which
  * is the whole 100-TB claim for streaming state.
  *
  * The drill corpus (`graft.tools.GenData`, seed 42, multi-file) is
  * generated per round into target/ (179 MB — not committed); the suite
  * cancels cleanly when it is absent. Measured numbers are recorded in
  * BASELINE.md's streaming-drill section.
  */
class StreamingScaleDrillSpec extends SparkSpec {

  private val sf1Dir = sys.props.getOrElse(
    "graft.sf1.dir", "/root/repo/target/gendata/sf1")

  private def sf1Exists = new java.io.File(s"$sf1Dir/events.parquet").isDirectory

  test("stream-stream join at sf1: state evicts with the watermark, parity by count") {
    assume(sf1Exists, s"sf1 drill corpus absent at $sf1Dir")
    val events = graft.Tables.events(spark, sf1Dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("user_id", "event_id", "event_type", "ts")
    // ts-ordered splittable layout: range-partitioned part files arrive
    // in path order ≈ time order, so the watermark advances every
    // micro-batch and join state actually evicts — the arrival
    // discipline a production attribution pipeline has anyway
    val tmp = java.nio.file.Files.createTempDirectory("drill-join").toString
    events.repartitionByRange(24, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "2").parquet(s"$tmp/in")
    val q = StreamingJoin.viewPurchaseAttribution(stream, stream)
      .writeStream.format("memory").queryName("drill_vp").outputMode("append").start()
    val peaks = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      q.processAllAvailable()
      q.recentProgress.foreach { p =>
        if (p.stateOperators.nonEmpty)
          peaks += p.stateOperators.map(_.numRowsTotal).sum
      }
    } finally q.stop()
    val streamedCount = spark.table("drill_vp").count()
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val batchCount = v.join(p,
        col("user_id") === col("pu") &&
          col("view_ts") <= col("purchase_ts") &&
          col("view_ts") >= col("purchase_ts") - expr("INTERVAL 3600 SECONDS"))
      .count()
    assert(batchCount > 0 && streamedCount === batchCount)
    val total = events.count()
    val peak = peaks.max
    info(f"sf1 join drill: $total rows, peak state $peak rows " +
      f"(${100.0 * peak / total}%.1f%% of corpus), ${peaks.size} progress samples")
    // the watermark bound: state holds rows within the join window +
    // watermark delay, never a corpus-sized fraction. The corpus spans
    // ~3 weeks; window+delay is ~1.2h → a generous 25% ceiling still
    // separates "evicting" from "accreting" by an order of magnitude.
    assert(peak < total / 4,
      s"join state accretes: peak $peak of $total rows — watermark not evicting")
  }

  test("streaming LSH near-dup at sf1 documents: band state bounded by TTL, not corpus") {
    assume(sf1Exists, s"sf1 drill corpus absent at $sf1Dir")
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    import StreamingNearDup._
    val docs = graft.Tables.documents(spark, sf1Dir)
      .select(col("doc_id"), col("text")).collect()
    val nDocs = docs.length
    val batches = 10
    val perBatch = (nDocs + batches - 1) / batches
    val ttlMs = 60_000L
    val input = MemoryStream[Doc]
    // TTL 1 min; consecutive batches 5 min apart — every batch's bands
    // expire before batch k+2, so peak state ≈ one batch's bands
    val q = candidates(input.toDS(), ttlMillis = ttlMs)
      .writeStream.format("memory").queryName("drill_cand").outputMode("append").start()
    val peaks = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      docs.grouped(perBatch).zipWithIndex.foreach { case (chunk, i) =>
        val t = new Timestamp(
          Timestamp.valueOf("2024-01-01 00:00:00").getTime + i * 300_000L)
        input.addData(chunk.map(r => Doc(r.getLong(0), r.getString(1), t)).toSeq: _*)
        q.processAllAvailable()
        val prog = q.lastProgress
        if (prog != null && prog.stateOperators.nonEmpty)
          peaks += prog.stateOperators.map(_.numRowsTotal).sum
      }
    } finally q.stop()
    val nBands = graft.operators.MinHash.NumHashes / graft.operators.MinHash.BandRows
    val corpusBands = nBands.toLong * nDocs
    val peak = peaks.max
    info(f"sf1 near-dup drill: $nDocs docs, peak band state $peak groups " +
      f"(corpus-lifetime bound $corpusBands), pairs ${spark.table("drill_cand").count()}")
    // TTL arithmetic: at most ~2 batches of bands live at once (the
    // current batch + the not-yet-timed-out previous one) vs the
    // corpus-lifetime total of 3 bands per doc
    assert(peak <= 2L * nBands * perBatch + 1000,
      s"band state accretes: peak $peak vs per-batch bound ${2L * nBands * perBatch}")
    assert(peak < corpusBands / 2)
  }

  test("streaming IVF append at sf1 embeddings: stream ingest equals one-shot assignment") {
    assume(sf1Exists, s"sf1 drill corpus absent at $sf1Dir")
    val emb = graft.Tables.embeddings(spark, sf1Dir)
    val tmp = java.nio.file.Files.createTempDirectory("drill-ivf").toString
    // replay the corpus as ~8 micro-batches through the append sink
    emb.repartitionByRange(8, col("vec_id")).write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val q = StreamingIvf.appendSink(spark, sf1Dir, s"$tmp/idx", stream)
    try q.processAllAvailable() finally q.stop()
    // partition-dir read-back infers list_id as INT — normalize both sides
    val streamed = spark.read.parquet(s"$tmp/idx")
      .groupBy(col("list_id").cast("long").as("list_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShot = graft.operators.Similarity.assignBatch(spark, sf1Dir, emb)
      .groupBy(col("list_id").cast("long").as("list_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    info(s"sf1 IVF drill: ${streamed.values.sum} vectors across ${streamed.size} lists")
    assert(streamed === oneShot)
  }
}
