package graft.streaming

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Hnsw, Similarity}

/** Streaming HNSW ingest: micro-batch inserts through the foreachBatch
  * sink must leave the graph store node-row-identical to the same
  * inserts made synchronously in batch; replayed batches must write
  * NOTHING (exactly-once store content under at-least-once delivery);
  * untouched shards keep their bytes; and probing the streamed store
  * must still surface the exact brute-force top-k — ingest must not
  * cost recall.
  */
class StreamingHnswSpec extends SparkSpec {

  private val params = Hnsw.Params()
  private val shards = 3

  private def parquetFiles(root: String): Map[String, (Long, Long)] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => (Paths.get(root).relativize(p).toString,
        (Files.getLastModifiedTime(p).toMillis, Files.size(p))))
      .toMap

  private def nodeRows(dir: String) =
    spark.read.parquet(dir)
      .select("shard", "vec_id", "level", "nbrs")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getSeq[scala.collection.Seq[Long]](3).map(_.toList).toList))
      .sortBy(t => (t._1, t._2)).toSeq

  test("micro-batch inserts ≡ batch inserts; replay writes nothing; exact probe") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val base = emb.filter(col("vec_id") % 7 =!= 0)
    val rest = emb.filter(col("vec_id") % 7 === 0)
      .select("vec_id", "embedding")

    val stStream = graft.sources.Scratch.tempDir("hnsw-stream")
    val stBatch = graft.sources.Scratch.tempDir("hnsw-batch")
    Hnsw.buildGraphStore(spark, base, stStream, shards, params)
    Hnsw.buildGraphStore(spark, base, stBatch, shards, params)

    val restRows = rest.as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    assert(restRows.size >= 4)
    val chunks = restRows.grouped(math.max(1, restRows.size / 2)).toSeq

    // batch twin: the same inserts, synchronously
    chunks.foreach { c =>
      Hnsw.insertIntoGraphStore(spark, stBatch,
        c.toDF("vec_id", "embedding"), shards, params)
    }

    // streaming side
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    val q = StreamingHnsw.insertSink(spark, stStream,
      stream.toDF().toDF("vec_id", "embedding"), shards, params)
    try {
      chunks.foreach { c => stream.addData(c); q.processAllAvailable() }
    } finally q.stop()

    assert(nodeRows(stStream) === nodeRows(stBatch))
    // every corpus vector present exactly once
    assert(nodeRows(stStream).map(_._2).distinct.size === emb.count())

    // replay of an already-applied batch: zero writes — every file
    // keeps its mtime and size
    val before = parquetFiles(stStream)
    Hnsw.insertIntoGraphStore(spark, stStream,
      chunks.last.toDF("vec_id", "embedding"), shards, params)
    assert(parquetFiles(stStream) === before)

    // the streamed store still answers exactly
    val truth = Similarity.cosineTopK(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Hnsw.probeGraphStore(spark, stStream, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === truth)
  }

  test("an insert touching one shard leaves the other shards' bytes alone") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val st = graft.sources.Scratch.tempDir("hnsw-touch")
    Hnsw.buildGraphStore(spark, emb.filter(col("vec_id") < 40), st, shards, params)
    val before = parquetFiles(st)
    // one new vector → exactly one touched shard (vec 41 % 3 = shard 2)
    Hnsw.insertIntoGraphStore(spark, st,
      emb.filter(col("vec_id") === 41).select("vec_id", "embedding"),
      shards, params)
    val after = parquetFiles(st)
    val untouchedBefore = before.filterNot(_._1.startsWith("shard=2"))
    assert(untouchedBefore.nonEmpty)
    assert(untouchedBefore.forall { case (f, sig) => after.get(f).contains(sig) },
      "an unrelated shard's files were rewritten")
    assert(after.keys.exists(f => f.startsWith("shard=2") && !before.contains(f)) ||
      before.filter(_._1.startsWith("shard=2")) != after.filter(_._1.startsWith("shard=2")))
  }
}
