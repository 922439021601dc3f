package graft.provider

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.RecordState

/** One attempt row of the dedup log — mirrors the reference's table
  * (key TEXT, time_uuid TIMEUUID ASC, record_uuid TEXT, state SMALLINT,
  * per-row TTL; reference: DeduplicationProvider.kt:226-236). TIMEUUID
  * becomes (eventTimeMicros, recordUuid) — the same total order the
  * compound clustering key gives (SURVEY.md §1.3).
  */
final case class AttemptRecord(
    key: String,
    eventTimeMicros: Long,
    recordUuid: String,
    state: Short,
    expiresAtMicros: Option[Long])

/** Storage abstraction for the per-call protocol: append an attempt,
  * upsert a state transition by full primary key, read a key's live
  * attempts in time order (SURVEY.md §2 O1, O2, O8).
  *
  * ── Cassandra mapping ──
  * The reference runs this protocol against a Cassandra table; this
  * sandbox has no cluster, so the trait is the seam where a Cassandra
  * binding would plug in. A production `CassandraDedupLog` maps 1:1:
  *  - `append`      → `INSERT ... USING TTL ttl` at LOCAL_QUORUM
  *                    (reference DeduplicationProvider.kt:135-155),
  *  - `updateState` → re-INSERT of the full primary key with the new
  *                    state — Cassandra upserts (reference :157-179),
  *  - `read`        → `SELECT ... WHERE key = ?` at EACH_QUORUM, rows
  *                    already in clustering order (reference :125-133);
  *    the `nowMicros` TTL filter is server-side row expiry there.
  * The engine's implementations keep those semantics without the
  * cluster: [[InMemoryDedupLog]] for the per-call API and its tests,
  * `graft.sources.DedupLogStore` for the durable, bucket-partitioned
  * file layout (the partition-per-key analog).
  */
trait DedupLog {
  def append(keyspace: String, table: String, rec: AttemptRecord): Unit
  def updateState(keyspace: String, table: String, key: String,
                  eventTimeMicros: Long, recordUuid: String, state: Short): Unit
  /** All non-expired attempts for `key`, ordered by (time, recordUuid) —
    * the EACH_QUORUM read-back (SURVEY.md §2 O2). */
  def read(keyspace: String, table: String, key: String, nowMicros: Long): Seq[AttemptRecord]
}

/** In-memory log for the per-call API and its tests. Thread-safe;
  * upsert-by-primary-key exactly like a Cassandra re-insert (O8).
  */
class InMemoryDedupLog extends DedupLog {
  // (keyspace:table:key) -> primaryKey(timeMicros, recordUuid) -> record
  private val data =
    new ConcurrentHashMap[String, ConcurrentHashMap[(Long, String), AttemptRecord]]()

  private def bucket(ks: String, t: String, k: String) =
    data.computeIfAbsent(s"$ks:$t:$k", _ => new ConcurrentHashMap())

  override def append(ks: String, t: String, rec: AttemptRecord): Unit =
    bucket(ks, t, rec.key).put((rec.eventTimeMicros, rec.recordUuid), rec)

  override def updateState(ks: String, t: String, key: String,
                           timeMicros: Long, uuid: String, state: Short): Unit =
    bucket(ks, t, key).computeIfPresent((timeMicros, uuid),
      (_, old) => old.copy(state = state))

  override def read(ks: String, t: String, key: String, nowMicros: Long): Seq[AttemptRecord] = {
    import scala.jdk.CollectionConverters._
    bucket(ks, t, key).values().asScala.toSeq
      .filter(r => r.expiresAtMicros.forall(_ > nowMicros))
      .sortBy(r => (r.eventTimeMicros, r.recordUuid))
  }

  /** Bridge to the set-oriented engine: the whole log as a DataFrame with
    * the FIXTURES.md §1 schema.
    */
  def toDataFrame(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // Full microsecond precision: the monotonic clock spaces sequential
    // attempts 1 µs apart, so truncating to millis would tie same-ms
    // attempts on event_time and let the set engine crown a different
    // winner than the per-call protocol recorded.
    def microsToTs(m: Long): java.sql.Timestamp = {
      val ts = new java.sql.Timestamp(Math.floorDiv(m, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(m, 1000000L) * 1000L).toInt)
      ts
    }
    val rows = data.asScala.toSeq.flatMap { case (ns, recs) =>
      val Array(ks, t, _*) = ns.split(":", 3)
      recs.values().asScala.map { r =>
        Row(ks, t, r.key,
          microsToTs(r.eventTimeMicros),
          r.recordUuid, r.state,
          r.expiresAtMicros.map(microsToTs).orNull)
      }
    }
    val schema = StructType(Seq(
      StructField("keyspace", StringType), StructField("table", StringType),
      StructField("key", StringType), StructField("event_time", TimestampType),
      StructField("record_uuid", StringType), StructField("state", ShortType),
      StructField("expires_at", TimestampType)))
    spark.createDataFrame(rows.asJava, schema)
  }
}
