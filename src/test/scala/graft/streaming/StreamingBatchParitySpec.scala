package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.MinHash
import graft.provider.NoRetryStrategy

/** Batch/stream parity for the near-dup pipeline over a FILE-SOURCE
  * stream on the real `documents` corpus: candidates (band state) →
  * verify (exact Jaccard in foreachBatch) → exactly-once sink must land
  * the SAME (doc_a, doc_b, jaccard) set as the batch `minhashDedup` on
  * the same corpus. This pins the streaming path as a re-expression of
  * the batch semantics, not a parallel implementation with its own
  * contract — the property a pipeline migrating from nightly batch to
  * continuous ingest depends on.
  */
class StreamingBatchParitySpec extends SparkSpec {
  import StreamingNearDup.Doc

  test("file-source stream candidates→verify ≡ batch minhashDedup on the documents corpus") {
    implicit val s = spark
    import s.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("stream-parity").toString
    // stage the corpus as a file-source directory; event_time is constant
    // (no TTL in this test — the batch contract has no time dimension)
    val staged = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("event_time"))
    staged.write.parquet(s"$tmp/in")

    val stream = spark.readStream.schema(staged.schema)
      .parquet(s"$tmp/in").as[Doc]
    val store = MinHash.shingleArray(graft.Tables.documents(spark, sfDir))
    val sink = new ExactlyOnceSink(s"$tmp/out", "parquet", new NoRetryStrategy)
    // uncapped band state: parity must be exact, so the streaming cap
    // (a deliberate divergence knob for degenerate bands) is disabled
    val q = StreamingVerify.verifiedPairs(
      StreamingNearDup.candidates(stream, maxDocsPerBand = Int.MaxValue),
      store, sink, s"$tmp/ckpt")
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(s"$tmp/out")
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val batch = MinHash.minhashDedup(spark, sfDir)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(batch.nonEmpty, "corpus must contain planted near-dups")
    assert(streamed === batch,
      s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
  }
}
