package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** As-of join semantics on a hand-built fixture + the events corpus. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("as-of picks the latest right row at or before each left time") {
    val purchases = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L),
      (1L, t("2024-01-01 12:00:00"), 101L),
      (2L, t("2024-01-01 09:00:00"), 102L) // no preceding view
    ).toDF("user_id", "ts", "event_id")
    val views = Seq(
      (1L, t("2024-01-01 09:30:00"), 50L, 50L),
      (1L, t("2024-01-01 10:00:00"), 51L, 51L), // same-ts view counts (≤)
      (1L, t("2024-01-01 11:00:00"), 52L, 52L),
      (2L, t("2024-01-01 09:30:00"), 53L, 53L)  // AFTER the purchase
    ).toDF("user_id", "ts", "event_id", "view_event_id")
    val got = AsOf.asOfJoin(purchases, views, Seq("user_id"), "ts", "event_id", "view_event_id")
      .select(col("event_id"), col("asof_view_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got(100L) === Some(51L)) // same-timestamp view wins over 09:30
    assert(got(101L) === Some(52L))
    assert(got(102L) === None)      // nothing precedes
  }

  test("purchaseAttribution: every purchase emitted exactly once") {
    val e = graft.Tables.events(spark, sfDir)
    val nPurchases = e.filter(col("event_type") === "purchase").count()
    val attributed = AsOf.purchaseAttribution(spark, sfDir)
    assert(attributed.count() === nPurchases)
    assert(attributed.select("purchase_id").distinct().count() === nPurchases)
    // attributed views must actually be view events of the same user
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_event_id"), col("user_id").as("vu"), col("ts").as("vts"))
    val joined = attributed.filter(col("view_event_id").isNotNull)
      .join(views, "view_event_id")
    assert(joined.filter(col("vu") =!= col("user_id")).isEmpty)
    assert(joined.filter(col("vts") > col("ts")).isEmpty) // never a future view
  }
}
