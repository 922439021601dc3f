package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Cost-based join REORDER: with ANALYZE'd table + column statistics
  * and CBO on, Catalyst must rewrite a badly-written join order —
  * (fact ⋈ dim1) ⋈ tiny-filtered-dim2 as authored — so the selective
  * dim⋈dim join happens FIRST and the fact table joins the already-
  * reduced side. At 100 TB authoring order cannot be the execution
  * order: the reorder is the difference between shuffling the fact
  * twice and once. Also pins that ANALYZE actually populated rowCount
  * stats (the input CBO decides on).
  */
class CboReorderSpec extends SparkSpec {

  private def bottomJoinTables(plan: LogicalPlan): Set[String] = {
    // the deepest Join node's leaf catalog tables
    val joins = plan.collect { case j: Join => j }
    val bottom = joins.last // collect is pre-order; last = deepest
    bottom.collectLeaves().flatMap {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.catalogTable.map(_.identifier.table)
      case _ => None
    }.toSet
  }

  test("ANALYZE'd stats + CBO move the selective dim join below the fact join") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cbo_").toString
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prior = keys.map(k => k -> spark.conf.getOption(k)).toMap
    spark.sql("DROP TABLE IF EXISTS g_orders")
    spark.sql("DROP TABLE IF EXISTS g_customer")
    spark.sql("DROP TABLE IF EXISTS g_nation")
    try {
      graft.Tables.orders(spark, sfDir).write
        .option("path", s"$tmp/orders").saveAsTable("g_orders")
      graft.Tables.customer(spark, sfDir).write
        .option("path", s"$tmp/customer").saveAsTable("g_customer")
      graft.Tables.nation(spark, sfDir).write
        .option("path", s"$tmp/nation").saveAsTable("g_nation")
      Seq("g_orders", "g_customer", "g_nation").foreach(t =>
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))

      // authored badly: fact joins the big dim first, the selective
      // tiny dim last
      def query() = spark.sql(
        """SELECT n.n_name, count(*) AS n_orders
          |FROM g_orders o
          |JOIN g_customer c ON o.o_custkey = c.c_custkey
          |JOIN g_nation n ON c.c_nationkey = n.n_nationkey
          |WHERE n.n_name = 'NATION_7'
          |GROUP BY n.n_name""".stripMargin)

      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val withoutCbo = bottomJoinTables(query().queryExecution.optimizedPlan)
      val rowsOff = query().collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // ANALYZE populated the row counts CBO reasons over (only exposed
      // in plan stats once CBO is on)
      val nationStats = spark.table("g_nation")
        .queryExecution.optimizedPlan.stats
      assert(nationStats.rowCount.contains(BigInt(25)),
        s"nation rowCount=${nationStats.rowCount}")
      val withCbo = bottomJoinTables(query().queryExecution.optimizedPlan)
      val rowsOn = query().collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      // as written, the bottom join touches the fact table...
      assert(withoutCbo.contains("g_orders"), s"unexpected: $withoutCbo")
      // ...with CBO, the dims join first and the fact joins their result
      assert(withCbo === Set("g_customer", "g_nation"),
        s"CBO did not reorder: bottom join = $withCbo")
      assert(rowsOn === rowsOff && rowsOn.nonEmpty, "reorder changed the result")
    } finally {
      prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS g_orders")
      spark.sql("DROP TABLE IF EXISTS g_customer")
      spark.sql("DROP TABLE IF EXISTS g_nation")
    }
  }
}
