package graft.sources

import java.sql.Timestamp
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.RecordState

/** File-backed dedup log: append/read round-trip per format, bucket
  * pruning, TTL read filter, converged state view, compaction.
  */
class DedupLogStoreSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  private val now = t("2024-01-10 00:00:00")

  private def fixture = Seq(
    ("k1", t("2024-01-01 00:00:00"), "u1", RecordState.Success, None),
    ("k2", t("2024-01-01 00:00:00"), "u2", RecordState.Success, None),
    ("k2", t("2024-01-01 00:00:01"), "u3", RecordState.Success, None),
    ("k3", t("2024-01-01 00:00:00"), "u4", RecordState.Failed, None),
    ("k3", t("2024-01-01 00:00:05"), "u5", RecordState.Success, None),
    ("k4", t("2024-01-01 00:00:00"), "u6", RecordState.Success,
      Some(t("2024-01-05 00:00:00"))) // expired before `now`
  ).toDF("key", "event_time", "record_uuid", "state", "expires_at")

  for (fmt <- Seq("parquet", "orc", "json", "csv")) {
    test(s"append/read round-trip with TTL filtering [$fmt]") {
      val root = Files.createTempDirectory(s"dlog-$fmt").toString
      val store = new DedupLogStore(spark, root, fmt)
      store.append("ks", "t1", fixture) // auto-creates the path (O17)
      val live = store.read("ks", "t1", now)
      assert(live.count() === 5) // k4 expired
      assert(live.schema.fieldNames.toSet ===
        Set("key", "event_time", "record_uuid", "state", "expires_at"))
      // key lookup hits only that key
      assert(store.read("ks", "t1", now, Some("k2")).count() === 2)
      // second append accumulates (append sink, not overwrite)
      store.append("ks", "t1", fixture.filter(col("key") === "k1"))
      assert(store.read("ks", "t1", now, Some("k1")).count() === 2)
    }
  }

  test("stateView: one SUCCESS winner per key, FAILED never wins") {
    val root = Files.createTempDirectory("dlog-state").toString
    val store = new DedupLogStore(spark, root)
    store.append("ks", "t1", fixture)
    val state = store.stateView("ks", "t1", now)
      .select("record_uuid", "state").as[(String, Short)].collect().toMap
    assert(state("u1") === RecordState.Success)
    assert(state("u2") === RecordState.Success)
    assert(state("u3") === RecordState.Duplicate)
    assert(state("u5") === RecordState.Success) // u4 FAILED loses despite earlier time
    assert(!state.contains("u6")) // expired row gone
  }

  test("compact drops expired rows permanently") {
    val root = Files.createTempDirectory("dlog-compact").toString
    val store = new DedupLogStore(spark, root)
    store.append("ks", "t1", fixture)
    val compacted = store.compact("ks", "t1", now, s"$root/compacted")
    assert(compacted.count() === 5)
    assert(compacted.filter(col("key") === "k4").count() === 0)
  }

  test("namespaces are isolated per (keyspace, table)") {
    val root = Files.createTempDirectory("dlog-ns").toString
    val store = new DedupLogStore(spark, root)
    store.append("ks1", "t1", fixture.limit(1))
    store.append("ks2", "t1", fixture)
    assert(store.read("ks1", "t1", now).count() === 1)
    assert(store.read("ks2", "t1", now).count() === 5)
  }
}
