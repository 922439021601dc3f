package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.provider.{AttemptRecord, DedupLog}

/** Durable [[DedupLog]] over the bucketed file store: the per-call
  * protocol (`DedupProvider.process`) running against the same storage
  * the batch engine reads — the "switchable" configuration a user of the
  * reference would deploy (protocol + durable log), minus the Cassandra
  * cluster (mapping documented on the trait).
  *
  * Upsert-by-primary-key on an append-only store: the reference relies
  * on Cassandra upserts for state transitions (re-INSERT of the same
  * primary key, DeduplicationProvider.kt:157-179). A file log is
  * append-only, but the protocol's transitions only ever RAISE the state
  * value — SUCCESS(1) → DUPLICATE(2) / RETRY(3) / FAILED(4) — so the
  * log-structured resolution "max(state) per (key, time, uuid)" is
  * exactly Cassandra's last-write-wins for this workload. Read-back
  * reduces with one bucket-pruned aggregation.
  *
  * Transition rows re-carry the original row's TTL (`expires_at`), so
  * expiry semantics survive the append-only encoding: once the original
  * attempt expires, all its rows expire with it.
  *
  * Cost model: one file write per attempt — correct and durable, but a
  * point-write KV store is the production choice for the hot path; this
  * implementation is the durability-correct reference, and the batch
  * engine (`DedupLogStore.stateView`) is the throughput path.
  */
class FileDedupLog(spark: SparkSession, store: DedupLogStore) extends DedupLog {

  private def microsToTs(m: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(m, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(m, 1000000L) * 1000L).toInt)
    ts
  }
  private def tsToMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def appendRow(ks: String, table: String, key: String, timeMicros: Long,
                        uuid: String, state: Short, expiresMicros: Option[Long]): Unit = {
    import scala.jdk.CollectionConverters._
    val row = Row(key, microsToTs(timeMicros), uuid, state,
      expiresMicros.map(microsToTs).orNull)
    // appendAtomic, not append: per-call attempts land concurrently
    // (threads in one JVM, or two JVMs racing on one key), and the
    // default committer's shared _temporary makes concurrent appends
    // destroy each other's in-flight files.
    store.appendAtomic(ks, table, spark.createDataFrame(Seq(row).asJava, store.schema))
  }

  override def append(ks: String, table: String, rec: AttemptRecord): Unit =
    appendRow(ks, table, rec.key, rec.eventTimeMicros, rec.recordUuid,
      rec.state, rec.expiresAtMicros)

  override def updateState(ks: String, table: String, key: String,
                           timeMicros: Long, uuid: String, state: Short): Unit = {
    // carry the original attempt's TTL onto the transition row so the
    // whole primary key expires together (reference preserves TTL on
    // upsert, DeduplicationProvider.kt:171)
    val expiry = read(ks, table, key, Long.MinValue)
      .find(r => r.eventTimeMicros == timeMicros && r.recordUuid == uuid)
      .flatMap(_.expiresAtMicros)
    appendRow(ks, table, key, timeMicros, uuid, state, expiry)
  }

  override def read(ks: String, table: String, key: String,
                    nowMicros: Long): Seq[AttemptRecord] = {
    // nowMicros = Long.MinValue reads through expiry (internal use)
    val now = if (nowMicros == Long.MinValue) new java.sql.Timestamp(0)
              else microsToTs(nowMicros)
    val df =
      try store.read(ks, table, now, Some(key))
      catch { case _: org.apache.spark.sql.AnalysisException => return Seq.empty }
    df.groupBy(col("key"), col("event_time"), col("record_uuid"))
      .agg(max(col("state")).as("state"), first(col("expires_at")).as("expires_at"))
      .collect()
      .toSeq
      .map { r =>
        AttemptRecord(
          r.getAs[String]("key"),
          tsToMicros(r.getAs[java.sql.Timestamp]("event_time")),
          r.getAs[String]("record_uuid"),
          r.getAs[Short]("state"),
          Option(r.getAs[java.sql.Timestamp]("expires_at")).map(tsToMicros))
      }
      .sortBy(r => (r.eventTimeMicros, r.recordUuid))
  }
}
