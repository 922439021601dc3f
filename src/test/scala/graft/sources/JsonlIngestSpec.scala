package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JSONL landing-zone edges: the quarantine lane catches exactly the
  * corrupted lines, nothing leaks, and a fully-clean file yields an
  * empty quarantine (no false positives from the PERMISSIVE parse).
  */
class JsonlIngestSpec extends SparkSpec {

  test("quarantine accounting: lanes partition the corpus exactly") {
    val rows = JsonlIngest.quarantineAccounting(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (corrupt, clean) = docs.partition(_._1 % 17 == 3)
    assert(corrupt.nonEmpty && clean.nonEmpty)
    val byLane = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byLane("_quarantined") === ((corrupt.length.toLong, 0L, 0L)))
    clean.groupBy(_._2).foreach { case (lang, ds) =>
      assert(byLane(lang) ===
        ((ds.length.toLong, ds.map(_._3).sum, ds.map(_._1).sum)))
    }
    // total lines in == total lines accounted
    assert(rows.map(_.getLong(1)).sum === docs.length.toLong)
  }

  test("a clean file yields no quarantine lane") {
    val tmp = java.nio.file.Files.createTempDirectory("jsonl-clean").toString
    graft.Tables.documents(spark, sfDir)
      .select(to_json(struct(col("doc_id"), col("lang"), col("source"),
        col("n_chars"))).as("value"))
      .write.mode("overwrite").text(tmp)
    // Spark disallows querying ONLY the corrupt column from a raw file
    // scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache first, the
    // documented pattern
    val parsed = JsonlIngest.readWithQuarantine(spark, tmp).cache()
    try {
      assert(parsed.filter(col("_corrupt").isNotNull).count() === 0L)
      assert(parsed.filter(col("doc_id").isNull).count() === 0L)
    } finally parsed.unpersist()
  }
}
