package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** sf10 STREAMING scale drill (round-11): the round-9 sf1 drill's two
  * stateful lanes re-measured one decade up, putting TWO decades under
  * the watermark/TTL state-bound claims (sf0.1-shaped spec corpora →
  * sf1 → sf10). The sf1 ceilings in [[StreamingScaleDrillSpec]] are
  * unchanged — this suite exists to RECORD peak-state numbers at 100×
  * data (BASELINE.md streaming-drill section), so it is double-gated:
  * corpus present AND -Dgraft.drill.sf10=1 (it streams the full 100×
  * corpus; run it solo like the batch drills, 32g driver).
  *
  * The join drill counts rows per micro-batch in foreachBatch instead
  * of a memory sink — at sf10 the attribution pair set is too large to
  * park in driver memory, and the drill's contract is count parity +
  * state peaks, not row storage.
  */
class StreamingScaleDrillSf10Spec extends SparkSpec {

  private val sf10Dir = sys.props.getOrElse(
    "graft.sf10.dir", "/root/repo/target/gendata/sf10")

  private def enabled = sys.props.get("graft.drill.sf10").contains("1")

  private def sf10Exists = new java.io.File(s"$sf10Dir/events.parquet").isDirectory

  test("stream-stream join at sf10: state evicts with the watermark, parity by count") {
    assume(enabled && sf10Exists,
      s"sf10 drill disabled (need -Dgraft.drill.sf10=1 and corpus at $sf10Dir)")
    val events = graft.Tables.events(spark, sf10Dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("user_id", "event_id", "event_type", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("drill10-join").toString
    events.repartitionByRange(48, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.parquet(s"$tmp/in")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "4").parquet(s"$tmp/in")
    val streamed = new java.util.concurrent.atomic.LongAdder
    val q = StreamingJoin.viewPurchaseAttribution(stream, stream)
      .writeStream.outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          streamed.add(b.count())
      }
      .start()
    val peaks = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      q.processAllAvailable()
      q.recentProgress.foreach { p =>
        if (p.stateOperators.nonEmpty)
          peaks += p.stateOperators.map(_.numRowsTotal).sum
      }
    } finally q.stop()
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
    assert(batchCount > 0 && streamed.sum() === batchCount)
    val total = events.count()
    val peak = peaks.max
    info(f"sf10 join drill: $total rows, peak state $peak rows " +
      f"(${100.0 * peak / total}%.2f%% of corpus), ${peaks.size} progress samples")
    // same eviction ceiling as sf1 — the PERCENTAGE should fall with
    // corpus span, because window+delay is fixed while the corpus grows
    assert(peak < total / 4,
      s"join state accretes: peak $peak of $total rows — watermark not evicting")
  }

  test("streaming LSH near-dup at sf10 documents: band state bounded by TTL, not corpus") {
    assume(enabled && sf10Exists,
      s"sf10 drill disabled (need -Dgraft.drill.sf10=1 and corpus at $sf10Dir)")
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    import StreamingNearDup._
    val docs = graft.Tables.documents(spark, sf10Dir)
      .select(col("doc_id"), col("text")).collect()
    val nDocs = docs.length
    val batches = 20
    val perBatch = (nDocs + batches - 1) / batches
    val ttlMs = 60_000L
    val input = MemoryStream[Doc]
    val q = candidates(input.toDS(), ttlMillis = ttlMs)
      .writeStream.format("memory").queryName("drill10_cand").outputMode("append").start()
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
    info(f"sf10 near-dup drill: $nDocs docs, peak band state $peak groups " +
      f"(corpus-lifetime bound $corpusBands), pairs ${spark.table("drill10_cand").count()}")
    assert(peak <= 2L * nBands * perBatch + 1000,
      s"band state accretes: peak $peak vs per-batch bound ${2L * nBands * perBatch}")
    assert(peak < corpusBands / 2)
  }
}
