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
}
