package graft

import org.apache.spark.sql.functions._

/** Typed decode (O5) over the FIXTURES.md §1 canonical fixture. */
class DedupRecordSpec extends SparkSpec {
  import spark.implicits._

  test("decode round-trips the fixture through DataFrame and back") {
    val ds = DedupRecord.fixture(spark)
    val decoded = DedupRecord.decode(ds.toDF())
    assert(decoded.collect().sortBy(_.record_uuid).toSeq ===
           ds.collect().sortBy(_.record_uuid).toSeq)
  }

  test("decode tolerates a missing expires_at column (immortal rows)") {
    val df = DedupRecord.fixture(spark).toDF().drop("expires_at")
    val decoded = DedupRecord.decode(df)
    assert(decoded.collect().forall(_.expires_at.isEmpty))
  }

  test("fixture covers all four states with expected counts") {
    val byState = DedupRecord.fixture(spark).groupByKey(_.state).count().collect().toMap
    assert(byState === Map(1.toShort -> 3L, 2.toShort -> 2L, 3.toShort -> 1L, 4.toShort -> 1L))
  }
}
