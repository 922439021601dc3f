package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming curation ≡ batch: the scrub kernel is stateless (row
  * parity is exact per micro-batch) and the per-source report is a
  * streaming aggregation whose state is source-cardinality-bounded and
  * merges across micro-batches to exactly the batch report.
  */
class StreamingCurationSpec extends SparkSpec {

  private def docsFrame = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("source"), col("text"))

  test("streamed per-source scrub report matches the batch report across micro-batches") {
    val tmp = java.nio.file.Files.createTempDirectory("stream-cur").toString
    val d = docsFrame
    // every source group spans both chunks → batch 2 must merge state
    d.filter(col("doc_id") % 2 === 0).write.parquet(s"$tmp/in")

    val incoming = spark.readStream.schema(d.schema).parquet(s"$tmp/in")
    val q = StreamingCuration.report(incoming)
      .writeStream.format("memory").queryName("cur_report")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      d.filter(col("doc_id") % 2 =!= 0).write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty)
      // state is one row per source — catalog cardinality, not corpus
      val nSources = d.select("source").distinct().count()
      assert(st.map(_.numRowsTotal).max <= nSources)
    } finally q.stop()

    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val streamed = keyed(spark.table("cur_report").collect())
    val batch = keyed(graft.operators.TextOps.piiReport(spark, sfDir).collect())
    assert(batch.nonEmpty && batch.values.map(_._2).sum > 0, "report must be non-vacuous")
    assert(streamed === batch)
  }

  test("streamed rule matrix merges across micro-batches to the batch capstone") {
    val tmp = java.nio.file.Files.createTempDirectory("stream-matrix").toString
    val d = docsFrame
    d.filter(col("doc_id") % 2 === 0).write.parquet(s"$tmp/in")
    val incoming = spark.readStream.schema(d.schema).parquet(s"$tmp/in")
    val q = StreamingCuration.matrixReport(incoming)
      .writeStream.format("memory").queryName("cur_matrix")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      d.filter(col("doc_id") % 2 =!= 0).write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty)
      assert(st.map(_.numRowsTotal).max <= d.select("source").distinct().count())
    } finally q.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val streamed = keyed(spark.table("cur_matrix").collect())
    val batch = keyed(graft.operators.Curation.ruleMatrix(spark, sfDir).collect())
    assert(batch.nonEmpty && batch.values.map(_._4).sum > 0, "matrix must be non-vacuous")
    assert(streamed === batch)
  }

  test("streamed C4 report merges across micro-batches to the batch report") {
    val tmp = java.nio.file.Files.createTempDirectory("stream-c4").toString
    val d = docsFrame
    d.filter(col("doc_id") % 2 === 0).write.parquet(s"$tmp/in")
    val incoming = spark.readStream.schema(d.schema).parquet(s"$tmp/in")
    val q = StreamingCuration.c4Report(incoming)
      .writeStream.format("memory").queryName("cur_c4")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      d.filter(col("doc_id") % 2 =!= 0).write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty)
      // state is one row per source — catalog cardinality, not corpus
      assert(st.map(_.numRowsTotal).max <= d.select("source").distinct().count())
    } finally q.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val streamed = keyed(spark.table("cur_c4").collect())
    val batch = keyed(graft.operators.TextOps.c4Report(spark, sfDir).collect())
    assert(batch.nonEmpty, "report must be non-vacuous")
    assert(streamed === batch)
  }

  test("stateless scrub: per-micro-batch rows equal the batch kernel row-for-row") {
    val tmp = java.nio.file.Files.createTempDirectory("stream-cur2").toString
    val d = docsFrame
    d.write.parquet(s"$tmp/in")
    val incoming = spark.readStream.schema(d.schema).parquet(s"$tmp/in")
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = StreamingCuration.scrubbed(incoming).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.collect().map(_.toString); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val want = StreamingCuration.scrubbed(d).collect().map(_.toString)
    assert(got.sorted.toSeq === want.sorted.toSeq)
    assert(want.length === d.count())
  }

  test("streamed chunk appends build the same store as one batch segmentation") {
    val tmp = java.nio.file.Files.createTempDirectory("stream-chunks").toString
    val d = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    d.filter(col("doc_id") % 2 === 0).write.parquet(s"$tmp/in")
    val table = "graft_chunk_stream_spec"
    if (spark.catalog.tableExists(table)) spark.sql(s"DROP TABLE $table")
    graft.sources.FsPaths.deleteRecursively(
      spark, graft.sources.FsPaths.warehouseTablePath(spark, table))
    val incoming = spark.readStream.schema(d.schema).parquet(s"$tmp/in")
    val q = StreamingCuration.chunkAppendSink(table, incoming)
    try {
      q.processAllAvailable()
      d.filter(col("doc_id") % 2 =!= 0).write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
    } finally q.stop()
    val stored = spark.table(table).collect().map(_.toString)
    val oneShot = graft.operators.TextOps.cdcChunkRows(d).collect().map(_.toString)
    assert(stored.nonEmpty)
    assert(stored.sorted.toSeq === oneShot.sorted.toSeq)
    // scrub-on-read over the streamed store ≡ the batch scrub
    val scrub = graft.operators.TextOps.cdcScrubFromChunks(
      spark.table(table).select(col("doc_id"), col("chunk_id"),
        col("chunk_text"), col("h"))).collect().map(_.toString)
    val batchScrub = graft.operators.TextOps.cdcScrubOf(d).collect().map(_.toString)
    assert(scrub.sorted.toSeq === batchScrub.sorted.toSeq)
  }
}
