package graft.provider

import org.scalatest.funsuite.AnyFunSuite

/** Pins the offline half of the documented DataStax adapter
  * ([[DataStaxCqlSession]]): EVERY statement + bind set the binding can
  * hand a session — DDL, insert, state upsert (incl. the TTL point
  * read), keyed select, across fresh and cached statement paths — must
  * pass [[DataStaxCqlSession.accepts]], i.e. carry a
  * driver-enumerable consistency, a profile name, and only
  * driver-codec-mappable bind values. If the binding grows a statement
  * the documented snippet couldn't execute, this fails at build time
  * instead of at a production copy-paste.
  */
class DataStaxAdapterSpec extends AnyFunSuite {

  /** Records every call while delegating to the in-memory executor. */
  private class RecordingSession(clock: () => Long) extends CqlSessionLike {
    val inner = new InMemoryCqlSession(clock)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(CqlStatement, Map[String, Any])]
    override def execute(stmt: CqlStatement, params: Map[String, Any]): CqlResult = {
      seen += ((stmt, params))
      inner.execute(stmt, params)
    }
  }

  test("the binding's full statement surface is adapter-acceptable") {
    var nowMicros = 1700000000000000L
    val session = new RecordingSession(() => nowMicros)
    val log = new CqlDedupLog(session)
    // exercise all four statement kinds + DDL, expiring and immortal
    log.append("ks", "t", AttemptRecord("k1", nowMicros, "uuid-1", 1,
      expiresAtMicros = Some(nowMicros + 5000000L)))
    log.append("ks", "t", AttemptRecord("k1", nowMicros + 1, "uuid-2", 1,
      expiresAtMicros = None))
    log.updateState("ks", "t", "k1", nowMicros, "uuid-1", 2)
    nowMicros += 1000000L
    assert(log.read("ks", "t", "k1", nowMicros).nonEmpty)
    // every recorded call must be executable by the documented adapter
    assert(session.seen.nonEmpty)
    session.seen.foreach { case (stmt, params) =>
      assert(DataStaxCqlSession.accepts(stmt, params),
        s"adapter cannot execute: $stmt binds ${params.view.mapValues(_.getClass).toMap}")
    }
    // and the surface actually covered all four kinds + DDL
    val texts = session.seen.map(_._1.cql)
    assert(texts.exists(_.startsWith("CREATE TABLE")))
    assert(texts.exists(_.startsWith("INSERT INTO")))
    assert(texts.exists(_.contains("ttl(state)")))
    assert(texts.exists(_.startsWith("SELECT time_uuid")))
  }

  test("accepts rejects what the driver would reject") {
    val ok = CqlStatement("SELECT 1", "LOCAL_QUORUM", "default")
    assert(DataStaxCqlSession.accepts(ok, Map("key" -> "k")))
    assert(!DataStaxCqlSession.accepts(ok.copy(consistency = "QUOROM"), Map.empty))
    assert(!DataStaxCqlSession.accepts(ok.copy(profileName = ""), Map.empty))
    assert(!DataStaxCqlSession.accepts(ok, Map("ttl" -> 3.5d))) // no codec for Double here
  }
}
