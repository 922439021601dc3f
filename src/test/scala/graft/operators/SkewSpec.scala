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
