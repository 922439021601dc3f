package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Dedup operator invariants (SURVEY.md §5 engine test plan): exactly one
  * winner per key, winner = min by (event_time, record_uuid), idempotence,
  * partitioning-invariance, absorber-equivalence, TTL semantics — the
  * set-oriented translation of the reference's five integration outcomes
  * (reference: DeduplicationProviderTest.kt:78-284).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  /** FIXTURES.md §1 canonical fixture. */
  private lazy val fixture = Seq(
    ("k1", t("2024-01-01 00:00:00"), "u1"),
    ("k2", t("2024-01-01 00:00:00"), "u2"),
    ("k2", t("2024-01-01 00:00:01"), "u3"),
    ("k3", t("2024-01-01 00:00:00"), "u4"),
    ("k3", t("2024-01-01 00:00:01"), "u5"),
    ("k4", t("2024-01-01 00:00:00"), "u6")
  ).toDF("key", "event_time", "record_uuid")

  test("firstWins keeps exactly one row per key, the time-order winner") {
    val got = Dedup.firstWins(fixture, Seq("key"), Seq("event_time", "record_uuid"))
      .select("key", "record_uuid").as[(String, String)].collect().toMap
    assert(got === Map("k1" -> "u1", "k2" -> "u2", "k3" -> "u4", "k4" -> "u6"))
  }

  test("firstWins breaks timestamp ties by record_uuid") {
    val tied = Seq(
      ("k", t("2024-01-01 00:00:00"), "zz"),
      ("k", t("2024-01-01 00:00:00"), "aa")
    ).toDF("key", "event_time", "record_uuid")
    val got = Dedup.firstWins(tied, Seq("key"), Seq("event_time", "record_uuid"))
      .select("record_uuid").as[String].collect()
    assert(got.toSeq === Seq("aa"))
  }

  test("auditStates labels rank-1 SUCCESS and the rest DUPLICATE") {
    val got = Dedup.auditStates(fixture, Seq("key"), Seq("event_time", "record_uuid"))
      .select("record_uuid", "state").as[(String, Short)].collect().toMap
    assert(got("u2") === RecordState.Success)
    assert(got("u3") === RecordState.Duplicate)
    assert(got("u1") === RecordState.Success)
  }

  test("auditStates marks failed attempts FAILED and excludes them from winning") {
    val withFailed = fixture.withColumn("failed", col("record_uuid") === "u2")
    val got = Dedup.auditStates(withFailed, Seq("key"), Seq("event_time", "record_uuid"),
        failedCol = Some(col("failed")))
      .select("record_uuid", "state").as[(String, Short)].collect().toMap
    assert(got("u2") === RecordState.Failed)
    assert(got("u3") === RecordState.Success) // u2 failed, so u3 wins k2
  }

  test("FirstByOrder aggregate ≡ built-in min_by formulation") {
    val events = graft.Tables.events(spark, sfDir)
    val fast = Dedup.firstWins(events, Seq("user_id", "event_type"), Seq("ts", "event_id"))
    val ref = Dedup.firstWinsMinBy(events, Seq("user_id", "event_type"), Seq("ts", "event_id"))
    assert(fast.except(ref).isEmpty && ref.except(fast).isEmpty)
    // and it actually plans as ObjectHashAggregate, not SortAggregate
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
  }

  test("topKPerKey ≡ window row_number <= k, and plans as ObjectHashAggregate") {
    val events = graft.Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts", "event_id")
    val agg = Dedup.topKPerKey(events, Seq("user_id", "event_type"),
      Seq(col("ts"), col("event_id")), k = 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val win = events.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= 3)
    assert(agg.except(win).isEmpty && win.except(agg).isEmpty)
    assert(agg.count() === win.count())
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
  }

  test("topKPerKey with k=1 equals firstWins (plus the rank column)") {
    val events = graft.Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts", "event_id")
    val top1 = Dedup.topKPerKey(events, Seq("user_id", "event_type"),
      Seq(col("ts"), col("event_id")), k = 1).drop("rk")
    val fw = Dedup.firstWins(events, Seq("user_id", "event_type"), Seq("ts", "event_id"))
    assert(top1.except(fw).isEmpty && fw.except(top1).isEmpty)
  }

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val once = Dedup.firstWins(fixture, Seq("key"), Seq("event_time", "record_uuid"))
    val twice = Dedup.firstWins(once, Seq("key"), Seq("event_time", "record_uuid"))
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
  }

  test("result is independent of input partitioning") {
    val events = graft.Tables.events(spark, sfDir)
    val a = Dedup.firstWins(events.repartition(1), Seq("user_id", "event_type"), Seq("ts", "event_id"))
    val b = Dedup.firstWins(events.repartition(13), Seq("user_id", "event_type"), Seq("ts", "event_id"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("absorberFirstWins ≡ firstWins (map-side pre-dedup is pure optimization)") {
    val events = graft.Tables.events(spark, sfDir)
    val plain = Dedup.firstWins(events, Seq("user_id", "event_type"), Seq("ts", "event_id"))
    val absorbed = Dedup.absorberFirstWins(events, Seq("user_id", "event_type"), Seq("ts", "event_id"))
    assert(plain.except(absorbed).isEmpty && absorbed.except(plain).isEmpty)
  }

  test("absorber with tiny cache still ≡ firstWins (overflow falls through)") {
    val events = graft.Tables.events(spark, sfDir)
    val plain = Dedup.firstWins(events, Seq("user_id", "event_type"), Seq("ts", "event_id"))
    val absorbed = Dedup.absorberFirstWins(events, Seq("user_id", "event_type"),
      Seq("ts", "event_id"), maxCacheSize = 7)
    assert(plain.except(absorbed).isEmpty && absorbed.except(plain).isEmpty)
  }

  test("mapSideFirstWins overflow: cache ≪ distinct keys in ONE partition, winners survive") {
    // every row lands in a single partition so the 2-entry cache overflows
    // by construction; the overflowed keys must stream through un-absorbed
    // (each of their rows emitted), and the global agg over the pre-pass
    // must still equal plain firstWins
    val events = graft.Tables.events(spark, sfDir).repartition(1)
    val keys = Seq("user_id", "event_type")
    val ord  = Seq("ts", "event_id")
    val pre = Dedup.mapSideFirstWins(events, keys, ord, maxCacheSize = 2)
    val plain = Dedup.firstWins(events, keys, ord)
    val viaPre = Dedup.firstWins(pre, keys, ord)
    assert(plain.except(viaPre).isEmpty && viaPre.except(plain).isEmpty)
    // overflow really happened: more rows out than distinct keys (cached
    // keys collapse to 1 row; uncached keys pass all their rows through)
    val nKeys = events.select(keys.map(col): _*).distinct().count()
    assert(pre.count() > nKeys, "expected un-absorbed pass-through rows")
  }

  test("ttlFilter: ttl=0 keeps everything; finite ttl drops expired rows") {
    val now = t("2024-01-03 00:00:00")
    val df = Seq(
      ("old", t("2024-01-01 00:00:00"), "u1"),
      ("new", t("2024-01-02 12:00:00"), "u2")
    ).toDF("key", "event_time", "record_uuid")
    assert(Dedup.ttlFilter(df, "event_time", 0L, now).count() === 2)
    val day = 86400L
    val kept = Dedup.ttlFilter(df, "event_time", day, now).select("key").as[String].collect()
    assert(kept.toSeq === Seq("new"))
  }

  test("counts: per-key histogram matches") {
    val got = Dedup.counts(fixture, Seq("key"), Seq("event_time", "record_uuid"))
      .select("key", "n_attempts").as[(String, Long)].collect().toMap
    assert(got === Map("k1" -> 1L, "k2" -> 2L, "k3" -> 2L, "k4" -> 1L))
  }

  test("absorberFirstWins matches firstWins on null order values (nulls-first)") {
    val withNulls = Seq(
      ("k", Option(t("2024-01-01 00:00:01")), "u1"),
      ("k", Option.empty[Timestamp], "u2"), // null ts sorts first
      ("k2", Option(t("2024-01-01 00:00:00")), "u3")
    ).toDF("key", "event_time", "record_uuid")
    val plain = Dedup.firstWins(withNulls, Seq("key"), Seq("event_time", "record_uuid"))
    val absorbed = Dedup.absorberFirstWins(withNulls, Seq("key"), Seq("event_time", "record_uuid"))
    assert(plain.except(absorbed).isEmpty && absorbed.except(plain).isEmpty)
    val winner = plain.filter(col("key") === "k").select("record_uuid").as[String].collect()
    assert(winner.toSeq === Seq("u2"))
  }

  test("per-call log bridged to the set engine crowns the protocol's winner (µs precision)") {
    import graft.provider._
    import scala.concurrent.duration._
    val log = new InMemoryDedupLog
    val p = new DedupProvider(log, new NoRetryStrategy, new NoDuplicateBurstAbsorber)
    // sequential attempts land ~1 µs apart — same millisecond, so a
    // millis-truncating bridge would tie them and let record_uuid decide
    p.process("kb", "t", "ks", Duration.Zero, () => "ran")
    (1 to 5).foreach { _ =>
      intercept[DuplicateException] { p.process("kb", "t", "ks", Duration.Zero, () => "again") }
    }
    val protocolWinner = log.read("ks", "t", "kb", Long.MaxValue)
      .filter(_.state == RecordState.Success).head.recordUuid
    val bridged = log.toDataFrame(spark)
    val engineWinner = Dedup.firstWins(bridged, Seq("key"), Seq("event_time", "record_uuid"))
      .select("record_uuid").as[String].collect()
    assert(engineWinner.toSeq === Seq(protocolWinner))
    // and the bridge did not collapse distinct micros onto one timestamp
    val distinctTimes = bridged.select("event_time").distinct().count()
    assert(distinctTimes === 6L)
  }

  test("bloom prefilter: never a false negative; tiny bit space shows false positives") {
    // batch docs 0,5,10,... — docs 0 and 5 are exact copies of corpus
    // docs 1 and 6, so exact_dup = 1 for them; the rest are unique
    val docs = (0L until 40L).map { id =>
      val text = if (id == 0L) "copied corpus text one"
      else if (id == 5L) "copied corpus text two"
      else if (id == 1L) "copied corpus text one"
      else if (id == 6L) "copied corpus text two"
      else s"unique document number $id with its own words"
    (id, text)
    }.toDF("doc_id", "text")
    val wide = Dedup.bloomPrefilterOf(docs, m = 32768, batchMod = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the one-sided contract: exact_dup = 1 ⇒ bloom_maybe = 1, always
    wide.foreach { case (id, maybe, exact) =>
      if (exact == 1L) assert(maybe === 1L, s"false negative on doc $id")
    }
    assert(wide.count(_._3 == 1L) === 2)
    // a deliberately tiny bit space saturates: false positives appear
    // (maybe = 1, exact = 0) yet false negatives remain impossible
    val tiny = Dedup.bloomPrefilterOf(docs, m = 8, batchMod = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    tiny.foreach { case (id, maybe, exact) =>
      if (exact == 1L) assert(maybe === 1L, s"false negative on doc $id at m=8")
    }
    assert(tiny.exists { case (_, maybe, exact) => maybe == 1L && exact == 0L },
      "m=8 should produce false positives")
  }
}
