package graft.streaming

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Similarity

/** Streaming IVF append symmetry (VERDICT r7 next-round #5): vector
  * micro-batches through the foreachBatch sink must leave the on-disk
  * index row-equivalent to ONE batch append of the same vectors, and
  * must never rewrite a list no batch landed in (append-only growth —
  * the property that makes daily vector ingest O(batch), not O(index),
  * at 100 TB).
  */
class StreamingIvfSpec extends SparkSpec {

  private def parquetFiles(root: String): Map[String, (Long, Long)] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => (Paths.get(root).relativize(p).toString,
        (Files.getLastModifiedTime(p).toMillis, Files.size(p))))
      .toMap

  private def indexRows(dir: String) =
    spark.read.parquet(dir)
      .select("vec_id", "list_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq

  test("micro-batch appends == one batch append; untouched lists keep bytes") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val batchMod = 7
    val base = emb.filter(col("vec_id") % batchMod =!= 0)
    val rest = emb.filter(col("vec_id") % batchMod === 0)
      .select("vec_id", "embedding", "label")

    val idxStream = graft.sources.Scratch.tempDir("ivf-stream-idx")
    val idxBatch = graft.sources.Scratch.tempDir("ivf-batch-idx")
    // base build via the same append path (append into an empty dir)
    Similarity.appendIvfIndex(spark, sfDir, idxStream, base)
    Similarity.appendIvfIndex(spark, sfDir, idxBatch, base)
    val baseFiles = parquetFiles(idxStream)
    assert(baseFiles.nonEmpty)

    // batch twin: the whole remainder in one append
    Similarity.appendIvfIndex(spark, sfDir, idxBatch, rest)

    // streaming side: the remainder in 3 micro-batches
    val restRows = rest.as[(Long, Array[Float], Int)].collect().toSeq
    assert(restRows.size >= 3, "need at least 3 vectors to form micro-batches")
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float], Int)]
    val q = StreamingIvf.appendSink(spark, sfDir, idxStream,
      stream.toDF().toDF("vec_id", "embedding", "label"))
    try {
      restRows.grouped(math.max(1, restRows.size / 3)).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    // row equivalence with the one-shot batch append (incl. list assignment)
    assert(indexRows(idxStream) === indexRows(idxBatch))

    // append-only growth: every base file survives byte-identical
    val after = parquetFiles(idxStream)
    baseFiles.foreach { case (rel, stamp) =>
      assert(after.get(rel).contains(stamp), s"base index file rewritten: $rel")
    }
    assert(after.size > baseFiles.size, "appends must add files")
  }

  test("exactly-once sink: replayed micro-batch leaves the store row-identical") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val rest = emb.filter(col("vec_id") % 7 === 0)
      .select("vec_id", "embedding", "label")
    val idxEo = graft.sources.Scratch.tempDir("ivf-eo-idx")
    val idxFlat = graft.sources.Scratch.tempDir("ivf-eo-flat")
    Similarity.appendIvfIndex(spark, sfDir, idxFlat, rest)

    val writer = StreamingIvf.exactlyOnceWriter(spark, sfDir, idxEo)
    val rows = rest.as[(Long, Array[Float], Int)].collect().toSeq
    val chunks = rows.grouped(math.max(1, rows.size / 3)).toSeq
    chunks.zipWithIndex.foreach { case (chunk, id) =>
      writer(chunk.toDF("vec_id", "embedding", "label"), id.toLong)
    }
    // the layout nests lists under batch dirs; list_id stays a partition col
    assert(indexRows(idxEo) === indexRows(idxFlat))

    // REPLAY batch 1 (failure re-execution): store must not change
    val before = indexRows(idxEo)
    writer(chunks(1).toDF("vec_id", "embedding", "label"), 1L)
    assert(indexRows(idxEo) === before, "replayed batch duplicated rows")

    // a PARTIAL previous attempt of a batch is replaced, not merged
    writer(chunks(2).take(1).toDF("vec_id", "embedding", "label"), 5L)
    writer(chunks(2).toDF("vec_id", "embedding", "label"), 5L)
    val withFive = indexRows(idxEo)
    val expectedFive = (before ++ chunks(2).map(r =>
      // chunk 2 re-lands under batch 5: assignments are deterministic,
      // so the duplicate vec_ids appear exactly once more
      (r._1, -1))).map(_._1).sorted
    assert(withFive.map(_._1).sorted === expectedFive,
      "partial batch attempt was merged instead of replaced")
  }
}
