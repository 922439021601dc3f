package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Streamed 13-gram decontamination ≡ the batch lane: train docs
  * arrive in two micro-batches, each flagged against the STATIC eval
  * gram set inside foreachBatch (zero streaming state) — the unioned
  * sink must equal `TextOps.decontaminate` row-for-row, because a
  * per-doc verdict depends only on the doc's own grams and the static
  * set (batch boundaries unobservable).
  */
class StreamingDecontaminateSpec extends SparkSpec {

  test("foreachBatch flags over streamed train docs == batch decontaminate") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdecon_").toString
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("split", TextOps.splitCol)
      .select("doc_id", "split", "text").localCheckpoint(true)
    val train = docs.filter(col("split") === "train").select("doc_id", "text")
    val evalGrams = StreamingDecontaminate.evalGramSet(
      docs.filter(col("split") =!= "train").select("doc_id", "text"))
      .localCheckpoint(true)

    // two file-arrivals -> at least two micro-batches partitioning train
    train.filter(col("doc_id") % 2 === 0).write.parquet(s"$tmp/in")
    val incoming = spark.readStream.schema(train.schema).parquet(s"$tmp/in")
    val q = StreamingDecontaminate.flagsIntoSink(spark, incoming, evalGrams,
      s"$tmp/sink", s"$tmp/ckpt")
    try {
      q.processAllAvailable()
      train.filter(col("doc_id") % 2 =!= 0)
        .write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$tmp/sink")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = TextOps.decontaminate(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.nonEmpty, "vacuous: no contaminated docs at this sf")
    assert(streamed.toSeq === batch.toSeq,
      "streamed flags diverge from the batch lane")
  }

  test("foreachBatch span cuts over streamed train docs == batch decontaminateCut") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdecon_cut_").toString
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("split", TextOps.splitCol)
      .select("doc_id", "split", "text").localCheckpoint(true)
    val train = docs.filter(col("split") === "train").select("doc_id", "text")
    val evalGrams = StreamingDecontaminate.evalGramSet(
      docs.filter(col("split") =!= "train").select("doc_id", "text"))
      .localCheckpoint(true)

    train.filter(col("doc_id") % 2 === 0).write.parquet(s"$tmp/in")
    val incoming = spark.readStream.schema(train.schema).parquet(s"$tmp/in")
    val q = StreamingDecontaminate.cutsIntoSink(spark, incoming, evalGrams,
      s"$tmp/sink", s"$tmp/ckpt")
    try {
      q.processAllAvailable()
      train.filter(col("doc_id") % 2 =!= 0)
        .write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$tmp/sink").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val batch = TextOps.decontaminateCut(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(streamed.exists(_._3 > 0L), "vacuous: no dirty positions at this sf")
    assert(streamed.toSeq === batch.toSeq,
      "streamed span cuts diverge from the batch lane")
  }
}
