package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** The stateless DSIR serving path: the dense weight vector scores each
  * row in one kernel call, agreeing with the staged-aggregation
  * training path on the ranking it produces, and streaming ≡ batch
  * row-for-row because the transform holds no state at all.
  */
class StreamingDsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val weights = TextOps.dsirWeightsVector(spark, sfDir)

  test("kernel scoring reproduces the aggregation path's top-k exactly") {
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val kernelTop = StreamingDsir.scored(docs, weights)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, s) => (-s, id) }.take(50).toSeq
    val aggTop = TextOps.dsirTopK(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(kernelTop === aggTop)
    // guard: the comparison is only airtight while every winner has
    // features (sub-bigram docs score 0 here but are absent there)
    assert(kernelTop.forall(_._2 != 0L))
  }

  test("single-bigram doc scores exactly its bucket's weight; featureless docs score 0") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val rows = Seq((1L, "zqx9 vbn7"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val got = StreamingDsir.scored(rows, weights)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === weights((h60("dsir|zqx9 vbn7") % 1024).toInt))
    assert(got(2L) === 0L && got(3L) === 0L)
  }

  test("streamed scoring ≡ batch scoring row-for-row (zero state)") {
    val tmp = java.nio.file.Files.createTempDirectory("dsir-stream").toString
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    docs.write.parquet(s"$tmp/in")
    val incoming = spark.readStream.schema(docs.schema).parquet(s"$tmp/in")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = StreamingDsir.scored(incoming, weights).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.collect().map(r => (r.getLong(0), r.getLong(1))); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val want = StreamingDsir.scored(docs, weights)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq === want.sorted.toSeq)
    // the streaming plan is stateless — no state store operators at all
    assert(q.lastProgress == null || q.lastProgress.stateOperators.isEmpty)
  }
}
