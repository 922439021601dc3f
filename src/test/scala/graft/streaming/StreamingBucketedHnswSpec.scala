package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Hnsw, Similarity}

/** Streaming ingest into the BUCKETED HNSW serving store
  * ([[StreamingHnsw.bucketedInsertSink]]): micro-batch inserts must
  * leave the log-structured table row-identical to the same inserts
  * made synchronously in batch; a replayed batch must write NOTHING;
  * pre-existing bucket files stay byte-identical (append-only
  * maintenance); the streamed store's probe surfaces the exact
  * brute-force top-k; and compaction collapses the log without moving
  * a single probe row.
  */
class StreamingBucketedHnswSpec extends SparkSpec {

  private val params = Hnsw.Params()
  private val shards = 3

  private def tableFiles(table: String): Map[String, (Long, Long)] = {
    val root = graft.sources.FsPaths.warehouseTablePath(spark, table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val b = Map.newBuilder[String, (Long, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        b += f.getPath.toString -> (f.getModificationTime, f.getLen)
    }
    b.result()
  }

  private def storeRows(table: String) =
    spark.table(table)
      .select("shard", "vec_id", "level", "nbrs", "ver")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getSeq[scala.collection.Seq[Long]](3).map(_.toList).toList,
        r.getLong(4)))
      .sortBy(t => (t._1, t._2, t._5)).toSeq

  test("stream ≡ batch twin; replay writes nothing; base buckets untouched; exact probe; compaction stable") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val base = emb.filter(col("vec_id") % 7 =!= 0)
    val rest = emb.filter(col("vec_id") % 7 === 0).select("vec_id", "embedding")

    val tStream = "graft_test_bhnsw_stream"
    val tBatch = "graft_test_bhnsw_batch"
    Hnsw.buildBucketedStore(spark, base, tStream, shards, params)
    Hnsw.buildBucketedStore(spark, base, tBatch, shards, params)
    val baseFiles = tableFiles(tStream)

    val restRows = rest.as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    assert(restRows.size >= 4)
    val chunks = restRows.grouped(math.max(1, restRows.size / 2)).toSeq

    chunks.foreach { c =>
      Hnsw.insertIntoBucketedStore(spark, tBatch,
        c.toDF("vec_id", "embedding"), params)
    }

    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    val q = StreamingHnsw.bucketedInsertSink(spark, tStream,
      stream.toDF().toDF("vec_id", "embedding"), params)
    try {
      chunks.foreach { c => stream.addData(c); q.processAllAvailable() }
    } finally q.stop()

    // log-row identity (versions included — same batches, same log)
    assert(storeRows(tStream) === storeRows(tBatch))
    // append-only maintenance: every base bucket file byte-identical
    val after = tableFiles(tStream)
    assert(baseFiles.forall { case (f, sig) => after.get(f).contains(sig) },
      "an insert rewrote a pre-existing bucket file")

    // replay of an applied batch: zero writes
    Hnsw.insertIntoBucketedStore(spark, tStream,
      chunks.last.toDF("vec_id", "embedding"), params)
    assert(tableFiles(tStream) === after, "replayed batch wrote to the store")

    // the streamed store answers exactly (ingest must not cost recall)
    val truth = Similarity.cosineTopK(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def probed(table: String) = Hnsw.servedTopKOf(spark, table, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probed(tStream) === truth)

    // compaction: one row per vec_id, probe rows unmoved
    Hnsw.compactBucketedStore(spark, tStream)
    val compacted = spark.table(tStream)
    assert(compacted.count() === compacted.select("vec_id").distinct().count())
    assert(compacted.count() === emb.count())
    assert(probed(tStream) === truth)
  }
}
