package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted inverted-index store: grown (base + appended segment)
  * store must rank identically to the session-staged full rebuild,
  * appends must only ADD files (mtime identity for every pre-existing
  * file), and the probe's store side must read buckets.
  */
class SearchStoreSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("doc_id"), col("score"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("grown store ≡ session-staged full rebuild (same BM25 ranking)") {
    val full = rows(Search.bm25TopK(spark, sfDir))
    val grown = rows(Search.bm25TopKGrown(spark, sfDir))
    assert(full.nonEmpty && grown === full)
  }

  test("append only adds files: every pre-existing file keeps path+mtime+size") {
    val name = "graft_search_store_spec"
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    Seq("_postings", "_dl", "_df", "_stats").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $name$s"))
    try {
      Search.buildSearchIndex(spark, docs.filter(col("doc_id") % 3 =!= 0), name)
      def snapshot(): Map[String, (Long, Long)] =
        Seq("_postings", "_dl", "_df", "_stats").flatMap { s =>
          val p = graft.sources.FsPaths.warehouseTablePath(spark, name + s)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val it = fs.listFiles(p, true)
          val b = Seq.newBuilder[(String, (Long, Long))]
          while (it.hasNext) {
            val f = it.next()
            // _SUCCESS markers are rewritten by every commit protocol
            // run — only DATA files carry the mtime-identity contract
            if (!f.getPath.getName.startsWith("_"))
              b += f.getPath.toString -> (f.getModificationTime, f.getLen)
          }
          b.result()
        }.toMap
      val before = snapshot()
      Thread.sleep(1100) // ensure a rewrite would move mtime (fs second granularity)
      Search.appendSearchIndex(spark, name, docs.filter(col("doc_id") % 3 === 0))
      val after = snapshot()
      // every pre-existing file untouched, and the append added some
      before.foreach { case (path, meta) =>
        assert(after.get(path).contains(meta), s"rewritten: $path")
      }
      assert(after.size > before.size, "append added no files")
      // and the two-segment store equals a one-shot build's ranking
      val viaStore = rows(Search.bm25TopKStored(spark, name))
      val viaStaged = rows(Search.bm25TopK(spark, sfDir))
      assert(viaStore === viaStaged)
    } finally Seq("_postings", "_dl", "_df", "_stats").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $name$s"))
  }

  test("store probe reads buckets; scoring joins keep the store exchange-free") {
    val name = Search.ensureGrownSearchIndex(spark, sfDir)
    val plan = Search.bm25TopKStored(spark, name)
      .queryExecution.executedPlan.toString
    assert("Bucketed: true".r.findAllIn(plan).nonEmpty,
      s"store probe must read buckets:\n${plan.take(1200)}")
  }
}
