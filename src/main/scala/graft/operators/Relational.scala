package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Relational analytics surface over the TPC-H-ish tables (SURVEY.md §7 M3).
  *
  * The reference library has no relational operators (SURVEY.md §2, "does
  * NOT implement"); this layer is the north-star extension, built entirely
  * from Catalyst-optimized built-ins: scans with pushdown, hash
  * aggregations with partial combine, broadcast joins for the small
  * dimensions, window functions for top-k.
  *
  * Determinism discipline (oracle hash-compare, FIXTURES.md §3):
  *  - Money/quantity doubles are snapped to cents per row (double →
  *    DECIMAL(18,2) rounds identically in Spark and DuckDB — value-exact
  *    per the round-1 audit) and then ALL arithmetic runs in int64:
  *    sums are partition-order independent, whole-stage-codegen friendly,
  *    and hash-stable across engines (the same numeric value can render
  *    differently as Decimal vs float64; an int64 cannot). Output money
  *    columns are therefore fixed-point integers: ×100 for plain
  *    cents, ×10^4 for discounted prices (cents × percent), ×10^6 for
  *    tax-adjusted charges (cents × percent × percent).
  *  - Every top-k has a total order: measure first, then a unique key.
  *
  * Scale notes (100 TB):
  *  - `region`/`nation` are constant-size (5/25 rows) → always broadcast.
  *  - Other dimension joins are left to AQE, which broadcasts at runtime
  *    when the build side is small; at 100 TB customer/part/supplier are
  *    shuffle-hash/sort-merge joined on their keys, which is correct.
  *  - All aggregations are partial-aggregated map-side before the shuffle.
  */
object Relational {

  /** Per-row fixed-point snap: double → DECIMAL(18,2) (same rounding both
    * engines) → int64 cents. Everything downstream is integer arithmetic.
    */
  private def cents(c: Column): Column =
    (c.cast(DecimalType(18, 2)) * lit(100)).cast("long")
  /** Discounted price in 10^-4 units: cents × (100 - discount_cents). */
  private def discPriceC: Column =
    cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  /** TPC-H Q1-style pricing summary: single scan, hash agg, int64-exact. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit(ts("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_price"),
        sum(discPriceC).as("sum_disc_price"),
        sum(discPriceC * (lit(100L) + cents(col("l_tax")))).as("sum_charge"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-style: top 10 unshipped orders by revenue in one segment. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = ts("1998-01-01")
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < lit(cutoff))
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit(cutoff))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(discPriceC).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation where customer and supplier are in
    * the same nation, one region, one year. region+nation broadcast.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val r = broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA"))
    val n = broadcast(Tables.nation(spark, dir))
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(ts("1996-01-01")) &&
              col("o_orderdate") < lit(ts("1997-01-01")))
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
               col("c_nationkey") === col("s_nationkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPriceC).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q10-style: top 20 customers by returned-item revenue. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(ts("1996-01-01")) &&
              col("o_orderdate") < lit(ts("1996-07-01")))
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(discPriceC).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q4-style via semi join: order count per priority where at least
    * one lineitem was returned. Semi join = EXISTS, no row multiplication.
    */
  def q4PriorityExists(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(ts("1996-01-01")) &&
              col("o_orderdate") < lit(ts("1997-01-01")))
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Anti join (NOT EXISTS): churned customers — no orders on/after the
    * cutoff. The test corpus gives every customer at least one order
    * overall, so the unfiltered variant returns 0 rows at every scale
    * factor and its green gate would attest nothing; the dated variant is
    * non-empty at sf0.001/0.01/0.1 (3/8/142 rows).
    */
  def qCustomersNoOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(ts("1998-06-01")))
      .select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** Window top-k per group: 3 priciest parts per brand, deterministic
    * tie-break on p_partkey.
    */
  def qTopPartsPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("p_name"),
              cents(col("p_retailprice")).as("retail_price"), col("rk").cast("bigint").as("rk"))
  }

  /** ROLLUP aggregation (grouping-sets family). */
  def qRollupReturns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(cents(col("l_quantity"))).as("sum_qty"))

  /** Revenue by region: the full 6-table star-join chain. */
  def qRegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = broadcast(Tables.region(spark, dir))
    val n = broadcast(Tables.nation(spark, dir))
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum(discPriceC).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("r_name"))
  }

  /** TPC-H Q6-style: pure scan-filter-aggregate — the pushdown showcase
    * (predicates and the 3-column projection reach the parquet scan).
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(ts("1996-01-01")) &&
              col("l_shipdate") < lit(ts("1997-01-01")) &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(sum(cents(col("l_extendedprice")) * cents(col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_rows"))

  /** TPC-H Q7-style: bilateral trade volume between two nations by year.
    * Exercises join-of-joins with a disjunctive cross-nation predicate.
    */
  def q7NationTrade(spark: SparkSession, dir: String): DataFrame = {
    val n1 = broadcast(Tables.nation(spark, dir))
      .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
    val n2 = broadcast(Tables.nation(spark, dir))
      .select(col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation"))
    val s = Tables.supplier(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("supp_nk"))
      .join(n2, col("c_nationkey") === col("cust_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("bigint").as("l_year"))
      .agg(sum(discPriceC).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q14-style: promo revenue share. Ratio of two decimal-exact
    * sums, emitted as both numerator and denominator (deterministic) plus
    * the double ratio (single division — IEEE-deterministic).
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(ts("1996-09-01")) &&
              col("l_shipdate") < lit(ts("1996-10-01")))
    val rev = discPriceC
    // No double ratio column: numeric→double conversion can differ by an
    // ulp between engines (single vs double rounding); numerator and
    // denominator are exact int64, callers divide.
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0L))).as("promo_revenue"),
        sum(rev).as("total_revenue"))
  }

  /** TPC-H Q18-style: large-volume orders — aggregate-then-join with a
    * having filter.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(cents(col("l_quantity"))).as("total_qty"))
      .filter(col("total_qty") > 15000L) // 150 units, in cents
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(50)
  }

  /** Sessionization over the events stream table: windows + lag + running
    * sum. A new session starts after a >30 min gap per user.
    */
  def qEventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
  }

  /** Events value profile: count/min/max per type. Double min/max are
    * pure comparisons (deterministic); no double sums (FIXTURES.md §3).
    */
  def qEventsValueStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  /** Semi-structured: parse the JSON `props` column and aggregate. */
  def qEventsProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"),
           max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Set operations: event types seen in the first week vs the last week. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val early = e.filter(col("ts") < lit(ts("2024-01-08"))).select(col("event_type")).distinct()
    val late  = e.filter(col("ts") >= lit(ts("2024-01-24"))).select(col("event_type")).distinct()
    early.intersect(late).withColumn("which", lit("both"))
      .union(early.except(late).withColumn("which", lit("early_only")))
      .union(late.except(early).withColumn("which", lit("late_only")))
      .orderBy(col("event_type"))
  }
}
