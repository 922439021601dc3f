package graft.provider

import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RecordState

/** Statement-level fidelity of the CQL binding: the exact texts,
  * consistency levels, execution profile, DDL-on-first-use, and
  * statement caching the reference wires onto its prepared statements
  * (reference: provider/DeduplicationProvider.kt:181-236) — plus the
  * TIMEUUID codec's round-trip/bit-layout properties, and the builder's
  * withSession/withSessionProfile wiring.
  */
class CqlDedupLogSpec extends AnyFunSuite {

  /** Records every statement the binding issues, then delegates. */
  private class Recorder(inner: CqlSessionLike) extends CqlSessionLike {
    val issued = collection.mutable.ArrayBuffer.empty[(CqlStatement, Map[String, Any])]
    override def execute(stmt: CqlStatement, params: Map[String, Any]): CqlResult = {
      issued += ((stmt, params)); inner.execute(stmt, params)
    }
  }

  private def newRig(profile: String = CqlDedupLog.DefaultProfile) = {
    val clock = new SteppedClock
    val rec = new Recorder(new InMemoryCqlSession(() => clock.now()))
    (clock, rec, new CqlDedupLog(rec, profile))
  }

  test("DDL is issued before first use and rendered exactly once per statement kind") {
    val (clock, rec, log) = newRig()
    log.append("ks", "t", AttemptRecord("k", clock.now(), "u1", RecordState.Success, None))
    log.append("ks", "t", AttemptRecord("k", clock.now() + 1, "u2", RecordState.Duplicate, None))
    log.read("ks", "t", "k", clock.now())
    log.read("ks", "t", "k", clock.now())
    val ddls = rec.issued.map(_._1.cql).filter(_.startsWith("CREATE TABLE"))
    // one DDL per statement-KIND miss (insert, select) — the reference's
    // computeIfAbsent does the same (:183,196,212); repeats hit the cache
    assert(ddls.size === 2)
    assert(ddls.head ===
      "CREATE TABLE IF NOT EXISTS ks.t (key text,time_uuid timeuuid," +
        "record_uuid text,state smallint," +
        "PRIMARY KEY (key,time_uuid,record_uuid)) " +
        "WITH CLUSTERING ORDER BY (time_uuid ASC)")
  }

  test("statement texts and consistency levels match the reference wiring") {
    val (clock, rec, log) = newRig()
    val t0 = clock.now()
    log.append("ks", "t", AttemptRecord("k", t0, "u1", RecordState.Success, Some(t0 + 5000000L)))
    log.read("ks", "t", "k", clock.now())
    log.updateState("ks", "t", "k", t0, "u1", RecordState.Failed)
    val byKind = rec.issued.filterNot(_._1.cql.startsWith("CREATE TABLE"))
    val insert = byKind.head._1
    assert(insert.cql ===
      "INSERT INTO ks.t (key,time_uuid,record_uuid,state) " +
        "VALUES (:key,:time_uuid,:record_uuid,:state) USING TTL :ttl")
    assert(insert.consistency === "LOCAL_QUORUM") // reference :206,222
    val select = byKind.find(_._1.cql.startsWith("SELECT time_uuid")).get._1
    assert(select.cql === "SELECT time_uuid,record_uuid,state FROM ks.t WHERE key=:key")
    assert(select.consistency === "EACH_QUORUM") // reference :190
    // the update path: remaining-ttl point read, then the upsert
    assert(byKind.exists(_._1.cql.startsWith("SELECT ttl(state)")))
    // TTL binds: 5s on the insert; preserved remaining on the upsert
    assert(byKind.head._2("ttl") === 5)
    assert(byKind.last._2("ttl") === 5) // updated in the same instant
  }

  test("the execution profile rides on every statement") {
    val (clock, rec, log) = newRig(profile = "dedup-dc2")
    log.append("ks", "t", AttemptRecord("k", clock.now(), "u1", RecordState.Success, None))
    log.read("ks", "t", "k", clock.now())
    assert(rec.issued.nonEmpty && rec.issued.forall(_._1.profileName === "dedup-dc2"))
  }

  test("TIMEUUID codec: exact round-trip, v1 bits, time-ordered") {
    val rnd = new scala.util.Random(11)
    (0 until 500).foreach { _ =>
      val m = math.abs(rnd.nextLong()) % (4000000000000000L) // through year ~2096
      val u = TimeUuid.fromMicros(m, rnd.nextString(8))
      assert(u.version === 1 && u.variant === 2)
      assert(TimeUuid.toMicros(u) === m)
    }
    // distinct uniquifiers at the same instant → distinct uuids
    assert(TimeUuid.fromMicros(1000L, "a") !== TimeUuid.fromMicros(1000L, "b"))
    // the time component orders like the clock
    val times = Seq(1L, 50L, 51L, 1000000L, 4102444800000000L)
    assert(times.map(t => TimeUuid.toMicros(TimeUuid.fromMicros(t, "x"))) === times)
  }

  test("builder: withSession wraps the session under the builder's profile") {
    val clock = new SteppedClock
    val rec = new Recorder(new InMemoryCqlSession(() => clock.now()))
    val p = DedupProviderBuilder.newProviderBuilder()
      .withSession(rec)
      .withSessionProfile("fast-lane")
      .withRetryStrategy(new NoRetryStrategy)
      .build()
    assert(p.process("k", "t", "ks", Duration.Zero, () => 42) === 42)
    assert(rec.issued.nonEmpty && rec.issued.forall(_._1.profileName === "fast-lane"))
    intercept[DuplicateException] { p.process("k", "t", "ks", Duration.Zero, () => 0) }
  }

  test("builder: the default retry delay reads the NAMED profile's timeout") {
    val profKey = DedupProviderBuilder.profileTimeoutConfKey("slow-dc")
    sys.props(profKey) = "7000"
    try {
      // profile key wins over base key and default
      assert(DedupProviderBuilder.requestTimeoutMillis("slow-dc") === 7000L)
      // unprofiled name falls back to the base chain
      assert(DedupProviderBuilder.requestTimeoutMillis("other") ===
        DedupProviderBuilder.requestTimeoutMillis)
      val p = DedupProviderBuilder.newProviderBuilder()
        .withSessionProfile("slow-dc").build()
      // default strategy = exponential with 2× the profile timeout
      val s = p.strategy.asInstanceOf[ExponentialDelayRetryStrategy]
      assert(s.initialDelayMillis === 14000L)
    } finally sys.props.remove(profKey)
  }
}
