package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** SQL front-end surface: the engine's tables registered as views and
  * queried with `spark.sql` — the same ANSI text the DuckDB oracle runs,
  * exercising Spark's SQL parser/analyzer path (correlated subqueries,
  * CUBE) rather than the DataFrame DSL.
  */
object SqlQueries {

  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      // events.parquet stores TIMESTAMP(NANOS): it must only ever be read
      // through Tables.events (which sets nanosAsLong first) — a raw
      // schema read throws PARQUET_TYPE_ILLEGAL on a fresh session.
      val df = if (n == "events") Tables.events(spark, dir) else Tables.load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  /** Correlated scalar subquery: parts priced at their brand's minimum.
    * Catalyst decorrelates this into an aggregate + join automatically.
    */
  val minCostPerBrandSql: String =
    """SELECT p_brand, p_partkey,
      |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS retail_price
      |FROM part p
      |WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
      |                       WHERE p2.p_brand = p.p_brand)""".stripMargin

  /** CUBE grouping-sets over return flags. */
  val cubeReturnsSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin

  /** TPC-H q21-style "suppliers who kept orders waiting": TWO correlated
    * subqueries against the same outer row — an EXISTS (some other
    * supplier on the order) and a NOT EXISTS (no other supplier was also
    * late) — the hardest decorrelation shape Catalyst handles (both
    * rewrite to left-semi / left-anti joins on l_orderkey; `.explain`
    * shows no nested-loop per-row subquery execution). "Late" adapts
    * TPC-H's receipt>commit to this schema as shipdate > orderdate+60d
    * (the q12 definition). The inner NOT EXISTS re-joins orders rather
    * than referencing the outer o_orderdate so the only correlation is
    * the equi-predicate — the shape Spark AND DuckDB both decorrelate.
    */
  val supplierWaitSql: String =
    """SELECT s_suppkey, s_name, n_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1, 2, 3""".stripMargin

  def qSupplierWait(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(supplierWaitSql)
  }

  def qMinCostPerBrand(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(minCostPerBrandSql)
  }

  def qCubeReturns(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(cubeReturnsSql)
  }
}
