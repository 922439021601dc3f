package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketed co-located joins: the join on the bucket key must plan with
  * ZERO shuffle exchanges, and results must equal the plain join.
  */
class BucketedTablesSpec extends SparkSpec {

  test("bucketed fact-to-fact join plans without any shuffle exchange") {
    val l = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    BucketedTables.writeBucketed(l, "li_bkt", "l_orderkey", nBuckets = 8)
    BucketedTables.writeBucketed(o, "ord_bkt", "o_orderkey", nBuckets = 8)
    try {
      // Shape assertion under the conditions bucketing exists for: big
      // sides (broadcast off — at 100 TB neither fact side broadcasts)
      // and AQE off (an unfinalized adaptive plan hides exchanges).
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedTables.colocatedJoin(spark, "li_bkt", "ord_bkt",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(plan.contains("Bucketed: true"), s"bucketing not used:\n${plan.take(800)}")
      // and the result is the same as the unbucketed join
      val expected = l.join(o, l("l_orderkey") === o("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
