package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with the same key and time ≤ left time.
  *
  * Composed from built-ins per the preference order — no custom
  * LogicalPlan needed: tag both sides, union, then one windowed
  * `last(_, ignoreNulls)` pass per key in time order. This is the
  * scalable formulation: ONE shuffle on the key and a single ordered
  * pass, versus the naive range join (key-equi + time-range), which
  * explodes to every (left, right) pair per key before aggregation.
  * Same-timestamp right rows sort BEFORE the left probe (tag ordering),
  * so "≤" semantics hold; ties break on the unique id column.
  */
object AsOf {

  /** Generic as-of: left/right must share `keyCols`, `timeCol`, `idCol`.
    * Output: every left row + `asof_<valueCol>` from the matched right
    * row (null when no right row precedes).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               timeCol: String, idCol: String, valueCol: String): DataFrame = {
    val l = left.select(
      (keyCols.map(col) :+ col(timeCol) :+ col(idCol)
        :+ lit(1).as("__is_left") :+ lit(null).cast(right.schema(valueCol).dataType).as("__rv")): _*)
    val r = right.select(
      (keyCols.map(col) :+ col(timeCol) :+ col(idCol)
        :+ lit(0).as("__is_left") :+ col(valueCol).as("__rv")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol), col("__is_left"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn(s"asof_$valueCol", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__rv")
  }

  /** Each purchase event joined to the user's latest preceding view
    * event (≤ its timestamp): the classic clickstream attribution as-of.
    */
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_id").as("view_event_id"))
    asOfJoin(purchases, views, Seq("user_id"), "ts", "event_id", "view_event_id")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"),
        col("asof_view_event_id").as("view_event_id"))
  }

  /** [[purchaseAttribution]] through the custom merge operator
    * ([[graft.plans.AsOfMergeJoin]]) instead of the union+window
    * composition — same rows (shared DuckDB oracle), different physical
    * strategy: each side shuffles itself once and a streamed two-pointer
    * merge replaces the window machinery.
    */
  def purchaseAttributionExec(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_id").as("view_event_id"))
    graft.plans.AsOfMergeJoin.asOf(
        purchases, views, Seq("user_id"), "ts", "event_id", "view_event_id")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"),
        col("asof_view_event_id").as("view_event_id"))
  }
}
