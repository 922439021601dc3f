package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exchange REUSE: when the same aggregated subtree feeds two places in
  * one query (here: daily revenue joined against its own maximum),
  * Catalyst must plan ONE shuffle and wire the second consumer to a
  * ReusedExchange — at 100 TB recomputing a shared CTE-shaped subtree
  * doubles the scan and shuffle for no reason. Asserted on the executed
  * plan (AQE off so the node names are directly visible) plus result
  * correctness.
  */
class ReusedExchangeSpec extends SparkSpec {

  test("self-referencing aggregate plans one exchange + a ReusedExchange") {
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val daily = graft.Tables.orders(spark, sfDir)
        .groupBy(col("o_orderdate"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("bigint")).as("rev_c"))
      val top = daily.join(
        daily.agg(max(col("rev_c")).as("mx")), col("rev_c") === col("mx"))
      val rows = top.collect()
      assert(rows.length >= 1)
      // the joined max really is the max of the aggregate itself
      val mx = daily.agg(max(col("rev_c"))).collect()(0).getLong(0)
      rows.foreach(r => assert(r.getLong(1) === mx))
      val plan = top.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        s"no ReusedExchange in:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }
}
