package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming quota ≡ batch quota: after all docs have flowed through
  * (split across micro-batches so state must merge), each source's
  * final kept list equals the batch lane's kept set in rank order, and
  * the state store holds at most one row per source (cap-bounded
  * entries inside it — never corpus-sized).
  */
class StreamingQuotaSpec extends SparkSpec {
  import spark.implicits._

  test("final kept set per source ≡ batch quotaSample, across micro-batch splits") {
    implicit val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("quota-stream").toString
    val docs = graft.Tables.documents(spark, sfDir).select(col("source"), col("doc_id"))
    // chunk 1 = even ids, chunk 2 = odd ids: every source spans both
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$tmp/in")
    val incoming = spark.readStream.schema(docs.schema).parquet(s"$tmp/in")
      .as[StreamingQuota.Doc]
    val q = StreamingQuota.quotaKept(incoming)
      .writeStream.format("memory").queryName("quota_kept")
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

    // last emission per source is the live kept list
    val emitted = spark.table("quota_kept").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1)))
    val finalKept = emitted.zipWithIndex.groupBy(_._1._1)
      .map { case (src, rows) => src -> rows.maxBy(_._2)._1._2 }
    val batch = graft.operators.TextOps.quotaSample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (src, rows) =>
        src -> rows.sortBy(_._3).map(_._2).toSeq }
    assert(finalKept.keySet === batch.keySet)
    finalKept.foreach { case (src, ids) =>
      assert(ids === batch(src), s"kept mismatch for $src")
    }
  }
}
