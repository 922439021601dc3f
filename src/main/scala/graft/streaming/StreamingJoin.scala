package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STREAM join: view→purchase attribution where BOTH sides arrive
  * continuously — the last of the streaming join shapes (stream-static
  * is [[StreamingIncremental]]). Spark buffers each side in the state
  * store keyed by the join key; the watermark + the time-range predicate
  * bound that state: a buffered view can only ever match purchases with
  * `purchase_ts ∈ [view_ts, view_ts + window]`, so once the watermark
  * passes `view_ts + window + delay` the row is reclaimed. Without BOTH
  * the watermarks and the range condition the state grows with the
  * stream forever — the difference between a pipeline that runs for an
  * hour and one that runs for a year.
  */
object StreamingJoin {

  /** Event-time watermarks require TIMESTAMP; driver files since round 8
    * load `ts` as TIMESTAMP_NTZ. The cast is a no-op for TIMESTAMP and
    * reinterprets NTZ wall-clock in the session zone (pinned UTC).
    */
  private def tsAsInstant(df: DataFrame): DataFrame =
    df.withColumn("ts", col("ts").cast("timestamp"))

  /** (view_id, purchase_id, user_id, view_ts, purchase_ts) pairs where
    * the view preceded the purchase by at most `windowSeconds`, both
    * sides streaming (columns: user_id, event_id, event_type, ts).
    * Event-time watermark `delay` on both sides.
    */
  def viewPurchaseAttribution(views: DataFrame, purchases: DataFrame,
                              windowSeconds: Long = 3600,
                              delay: String = "10 minutes"): DataFrame = {
    val v = tsAsInstant(views).filter(col("event_type") === "view")
      .withWatermark("ts", delay)
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val p = tsAsInstant(purchases).filter(col("event_type") === "purchase")
      .withWatermark("ts", delay)
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"))
  }

  /** LEFT OUTER [[viewPurchaseAttribution]]: views that never convert are
    * EMITTED (purchase columns null) instead of dropped — the attribution-
    * miss feed an experimentation pipeline alerts on. Operationally a
    * different operator than the inner join: a buffered view now has an
    * emission obligation, so the row is held until the WATERMARK proves no
    * in-window purchase can still arrive (watermark > view_ts + window),
    * at which point the state store evicts it and emits the null-extended
    * row. Same state bound as the inner join — the outer semantics change
    * WHEN rows leave state, not how much state is held.
    */
  def viewPurchaseAttributionOuter(views: DataFrame, purchases: DataFrame,
                                   windowSeconds: Long = 3600,
                                   delay: String = "10 minutes"): DataFrame = {
    val v = tsAsInstant(views).filter(col("event_type") === "view")
      .withWatermark("ts", delay)
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val p = tsAsInstant(purchases).filter(col("event_type") === "purchase")
      .withWatermark("ts", delay)
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowSeconds SECONDS"),
      "left_outer")
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"))
  }
}
