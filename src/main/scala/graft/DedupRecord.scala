package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row of the dedup log (FIXTURES.md §1) — the engine's analog of
  * the reference's row decode `Row.toDeduplicationData()`
  * (reference: DeduplicationProvider.kt:238-248; table schema :226-236).
  *
  * `state`: 1=SUCCESS 2=DUPLICATE 3=RETRY 4=FAILED (reference :250-251).
  * `expires_at = None` ⇔ TTL 0 (immortal, README.md:44).
  */
final case class DedupRecord(
    key: String,
    event_time: Timestamp,
    record_uuid: String,
    state: Short,
    expires_at: Option[Timestamp])

object DedupRecord {

  /** O5: decode a dedup-log DataFrame into the typed Dataset. Missing
    * `expires_at` column is treated as all-immortal.
    */
  def decode(df: DataFrame): Dataset[DedupRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    val withExpiry =
      if (df.columns.contains("expires_at")) df
      else df.withColumn("expires_at", lit(null).cast("timestamp"))
    withExpiry
      .select(col("key").cast("string"), col("event_time").cast("timestamp"),
        col("record_uuid").cast("string"), col("state").cast("smallint"),
        col("expires_at").cast("timestamp"))
      .as[DedupRecord]
  }

  /** The canonical FIXTURES.md §1 fixture (used by specs). */
  def fixture(spark: SparkSession): Dataset[DedupRecord] = {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    Seq(
      DedupRecord("k1", t("2024-01-01 00:00:00"), "u1", 1, None),
      DedupRecord("k2", t("2024-01-01 00:00:00"), "u2", 1, None),
      DedupRecord("k2", t("2024-01-01 00:00:01"), "u3", 2, None),
      DedupRecord("k3", t("2024-01-01 00:00:00"), "u4", 3, None),
      DedupRecord("k3", t("2024-01-01 00:00:01"), "u5", 2, None),
      DedupRecord("k4", t("2024-01-01 00:00:00"), "u6", 4, None),
      DedupRecord("k5", t("2024-01-01 00:00:00"), "u7", 1,
        Some(t("2024-01-02 00:00:00")))
    ).toDS()
  }
}
