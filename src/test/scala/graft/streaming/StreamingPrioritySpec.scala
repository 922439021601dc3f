package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming priority reservoir ≡ batch priority sample: after all docs
  * have flowed through (split across micro-batches so reservoirs must
  * merge), each source's kept list equals the batch lane's top-k in
  * rank order with the same weights, and state stays one row per
  * source.
  */
class StreamingPrioritySpec extends SparkSpec {
  import spark.implicits._

  test("final reservoir per source ≡ batch prioritySample, across micro-batch splits") {
    implicit val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("prio-stream").toString
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        (size(split(col("text"), " ", -1)) + 1).cast("long").as("n_tokens"))
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$tmp/in")
    val incoming = spark.readStream.schema(docs.schema).parquet(s"$tmp/in")
      .as[StreamingPriority.Doc]
    val q = StreamingPriority.priorityKept(incoming)
      .writeStream.format("memory").queryName("prio_kept")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      docs.filter(col("doc_id") % 2 =!= 0).write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty)
      val nSources = docs.select("source").distinct().count()
      assert(st.map(_.numRowsTotal).max <= nSources,
        "state must be one row per source (catalog-sized), not per doc")
    } finally q.stop()

    val emitted = spark.table("prio_kept").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    val finalKept = emitted.zipWithIndex.groupBy(_._1._1)
      .map { case (src, rows) =>
        val last = rows.maxBy(_._2)._1
        src -> (last._2, last._3)
      }
    val batch = graft.operators.TextOps.prioritySample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).map { case (src, rows) =>
        val sorted = rows.sortBy(_._4)
        src -> (sorted.map(_._2).toSeq, sorted.map(_._3).toSeq)
      }
    assert(finalKept.keySet === batch.keySet)
    finalKept.foreach { case (src, (ids, ws)) =>
      assert(ids === batch(src)._1, s"kept ids mismatch for $src")
      assert(ws === batch(src)._2, s"kept weights mismatch for $src")
    }
  }
}
