package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.MinHash

/** Stream-static incremental probe ≡ batch incrementalDedup on the same
  * batch/corpus split — the docs the stream finds corpus matches for
  * must be exactly the docs the batch path rejects, with zero streaming
  * state (the query plan must contain no stateful operator).
  */
class StreamingIncrementalSpec extends SparkSpec {

  test("stream-static probe rejects exactly the batch path's rejected docs") {
    import spark.implicits._
    val batchMod = 5
    val tmp = java.nio.file.Files.createTempDirectory("stream-incr").toString
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % batchMod =!= 0)
    docs.filter(col("doc_id") % batchMod === 0)
      .select("doc_id", "text").write.parquet(s"$tmp/in")

    val incoming = spark.readStream
      .schema(docs.select("doc_id", "text").schema).parquet(s"$tmp/in")
    val matched = StreamingIncremental.matches(incoming,
      StreamingIncremental.corpusBandIndex(corpus),
      StreamingIncremental.corpusShingleStore(corpus))
    val q = matched.writeStream.format("memory")
      .queryName("incr_matches").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("incr_matches").collect()
    got.foreach(r => assert(r.getDouble(2) >= 0.5))
    val streamRejected = got.map(_.getLong(0)).toSet
    val batchRejected = MinHash.incrementalDedup(spark, sfDir, batchMod = batchMod)
      .filter(col("admitted") === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(batchRejected.nonEmpty, "split must reject at least one doc")
    assert(streamRejected === batchRejected)
    // stateless contract: no state store operator in the executed plan
    val progress = q.lastProgress
    assert(progress == null || progress.stateOperators.isEmpty)
  }
}
