package graft.operators

import graft.SparkSpec
import graft.Tables

/** Salted two-phase aggregation ≡ direct aggregation. */
class SkewSpec extends SparkSpec {

  test("saltedAggregate equals direct groupBy for count/min/max") {
    val events = Tables.events(spark, sfDir)
    val salted = Skew.saltedAggregate(events, Seq("user_id", "event_type"),
      Seq(Skew.SaltedCount("n_attempts"),
          Skew.SaltedMin("ts", "first_time"),
          Skew.SaltedMax("ts", "last_time")), saltFactor = 7)
    val direct = Dedup.counts(events, Seq("user_id", "event_type"), Seq("ts", "event_id"))
    assert(salted.except(direct).isEmpty && direct.except(salted).isEmpty)
  }

  test("saltFactor 1 degenerates to the direct aggregation") {
    val events = Tables.events(spark, sfDir)
    val salted = Skew.saltedAggregate(events, Seq("user_id", "event_type"),
      Seq(Skew.SaltedCount("n")), saltFactor = 1)
    assert(salted.count() ===
      events.select("user_id", "event_type").distinct().count())
  }

  test("saltedJoin equals the plain inner join, including duplicate build keys") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // skewed probe: most lineitems share one hot order key
    val probe = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
    val build = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val salted = Skew.saltedJoin(probe, build, Seq("l_orderkey"), saltFactor = 8)
    val plain = probe.join(build, Seq("l_orderkey"))
    assert(salted.count() === plain.count())
    assert(salted.columns.toSeq === plain.columns.toSeq)
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // duplicate keys on the build side multiply rows identically
    val dupBuild = build.union(build.limit(50))
    val saltedDup = Skew.saltedJoin(probe, dupBuild, Seq("l_orderkey"), saltFactor = 4)
    val plainDup = probe.join(dupBuild, Seq("l_orderkey"))
    assert(saltedDup.count() === plainDup.count())
    // and the salted plan shuffles on (key, salt), spreading hot keys
    val shuffle = salted.queryExecution.executedPlan.toString
    assert(shuffle.contains("__salt") || shuffle.contains("hashpartitioning"))
  }

  test("AQE skew join splits the hot partition at runtime (skew=true in the final plan)") {
    import org.apache.spark.sql.functions._
    // When does AQE skew handling replace manual salting? AQE splits a
    // skewed SORT-MERGE-JOIN partition at runtime from observed shuffle
    // stats — zero code changes, but only for join shuffles. Manual
    // salting (Skew.saltedAggregate / saltedJoin, q5_local_supplier_salted)
    // still owns skewed AGGREGATIONS (AQE never splits an agg partition —
    // that would break key-grouping) and cases where the skew is known
    // ahead of time and the plan must not depend on runtime stats.
    val keys = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold")
    val prior = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-scale thresholds: the hot partition is ~MBs, not GBs
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // one pathological key carries ~95% of the left side
      val left = spark.range(0, 200000)
        .select(when(col("id") < 190000, lit(0L)).otherwise(col("id") % 100).as("k"),
          col("id").as("v"))
      val right = spark.range(0, 100).select(col("id").as("k"), col("id").as("w"))
      val joined = left.join(right, Seq("k"))
      // collect() drives joined's OWN QueryExecution, so the adaptive
      // plan below is the finalized one (count() would plan separately)
      assert(joined.collect().length === 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n${finalPlan.take(1200)}")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q5 salted ≡ q5 unsalted; plan shows the salt expansion on the build side") {
    val plain = Relational.q5LocalSupplier(spark, sfDir)
    val salted = Relational.q5LocalSupplierSalted(spark, sfDir)
    assert(salted.columns.toSeq === plain.columns.toSeq)
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // the salt is physically present: build-side explode over the salt
    // array and a join condition carrying __salt
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt column missing from plan:\n${plan.take(800)}")
    assert(plan.toLowerCase.contains("explode") || plan.contains("Generate"),
      s"build-side salt expansion missing:\n${plan.take(800)}")
  }
}
