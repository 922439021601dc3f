package graft.sources

import scala.concurrent.duration._
import graft.SparkSpec
import graft.operators.RecordState
import graft.provider._

/** The per-call protocol running against the durable file-backed log —
  * the full "switchable" deployment (provider + bucketed storage), and
  * the append-only max(state) upsert resolution.
  */
class FileDedupLogSpec extends SparkSpec {

  private def newLog() = {
    val root = java.nio.file.Files.createTempDirectory("fdl").toString
    new FileDedupLog(spark, new DedupLogStore(spark, root, nBuckets = 4))
  }

  test("protocol outcomes over the durable log: success, then duplicate") {
    val log = newLog()
    val p = new DedupProvider(log, new NoRetryStrategy, new NoDuplicateBurstAbsorber)
    assert(p.process("k1", "t", "ks", Duration.Zero, () => "ran") === "ran")
    intercept[DuplicateException] {
      p.process("k1", "t", "ks", Duration.Zero, () => "again")
    }
    val states = log.read("ks", "t", "k1", Long.MaxValue).map(_.state).sorted
    assert(states === Seq(RecordState.Success, RecordState.Duplicate).sorted)
  }

  test("append-only upsert: a state transition resolves by max(state), not duplication") {
    val log = newLog()
    log.append("ks", "t", AttemptRecord("k", 1000L, "u1", RecordState.Success, None))
    log.updateState("ks", "t", "k", 1000L, "u1", RecordState.Failed)
    val recs = log.read("ks", "t", "k", Long.MaxValue)
    assert(recs.size === 1) // one primary key, not two rows
    assert(recs.head.state === RecordState.Failed)
  }

  test("TTL carries onto transition rows: expired keys are re-claimable") {
    val log = newLog()
    var now = 10_000_000L
    val p = new DedupProvider(log, new NoRetryStrategy, new NoDuplicateBurstAbsorber,
      clockMicros = () => now)
    val boom = new RuntimeException("bzzt")
    intercept[RuntimeException] {
      p.process("k2", "t", "ks", 1.second, () => throw boom)
    }
    // FAILED row present (transition row carries the original TTL)
    assert(log.read("ks", "t", "k2", now).map(_.state) === Seq(RecordState.Failed))
    now += 2_000_000L // past the 1s TTL: FAILED row expired with its attempt
    assert(log.read("ks", "t", "k2", now).isEmpty)
    assert(p.process("k2", "t", "ks", 1.second, () => "fresh") === "fresh")
  }
}
