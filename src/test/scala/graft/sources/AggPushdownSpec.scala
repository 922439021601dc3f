package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Attests native parquet AGGREGATE PUSHDOWN: on the DSv2 scan path
  * with `spark.sql.parquet.aggregatePushdown`, un-grouped COUNT/MIN/MAX
  * are answered from row-group footer STATISTICS — the scan reads no
  * data pages at all. At 100 TB this is the difference between a
  * metadata-only operation and a full corpus read for the commonest
  * audit queries. Result parity with the ordinary v1 scan is pinned
  * alongside the plan shape.
  */
class AggPushdownSpec extends SparkSpec {

  test("v2 parquet scan answers COUNT/MIN/MAX from footers; values match the v1 scan") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val p = s"$sfDir/lineitem.parquet"
    val pushed = s2.read.parquet(p)
      .agg(count(lit(1)).as("n"), min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*)"),
      s"aggregate not pushed into the scan:\n$plan")
    val r = pushed.collect()(0)
    val e = spark.read.parquet(p)
      .agg(count(lit(1)), min("l_orderkey"), max("l_orderkey")).collect()(0)
    assert(r.getLong(0) === e.getLong(0) && r.getLong(0) > 0)
    assert(r.getLong(1) === e.getLong(1) && r.getLong(2) === e.getLong(2))
  }

  test("pushdown declines safely when the aggregate needs real rows (SUM)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val p = s"$sfDir/lineitem.parquet"
    // SUM is not answerable from min/max/count footers alone — the
    // scan must fall back to reading pages, values still correct
    val s1 = s2.read.parquet(p).agg(sum("l_orderkey").as("s")).collect()(0).getLong(0)
    val sv1 = spark.read.parquet(p).agg(sum("l_orderkey")).collect()(0).getLong(0)
    assert(s1 === sv1 && s1 > 0)
  }
}
