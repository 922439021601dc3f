package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning: when one join side carries a
  * selective filter, Catalyst can build a Bloom filter over its join
  * keys at runtime and push a `might_contain` probe into the OTHER
  * side's scan — rows that cannot match are dropped before the shuffle.
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling the ~matching slice; here the spec attests the
  * filter is actually injected and changes nothing about the result.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom-filter probe into the fact scan") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prior = keys.map(k => k -> spark.conf.getOption(k)).toMap
    def join() = {
      val l = graft.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"))
      val o = graft.Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
    }
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // test-scale thresholds: the defaults assume MB/GB-sized sides
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join
      val filtered = join()
      val plan = filtered.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n${plan.take(1000)}")
      val withBloom = filtered.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(withBloom === join().count(), "bloom pruning changed the result")
      assert(withBloom > 0)
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
