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

  def qMinCostPerBrand(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(minCostPerBrandSql)
  }

  def qCubeReturns(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(cubeReturnsSql)
  }
}
