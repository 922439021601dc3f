package graft.provider

import java.nio.file.{Files, Paths}
import graft.SparkSpec

/** Cross-JVM durable-log race parity (VERDICT r7 next-round #3): the
  * reference's conflict path runs as *separate processes* against
  * shared storage (DeduplicationProviderTest.kt:145-210 — parallel tie
  * ⇒ earliest demoted RETRY + re-attempt, later demoted DUPLICATE,
  * block once). Two forked JVMs process the same key against one
  * FileDedupLog directory; the converged invariants must hold under
  * every interleaving the file store's commit protocol produces:
  *
  *  - the business block ran AT MOST once across both processes (the
  *    exactly-once contract; "exactly" once the setup yields a winner),
  *  - the converged table state holds exactly one live SUCCESS,
  *  - the loser surfaced as DUPLICATE (or an explicit storage error /
  *    retries-exceeded — never a silent second RAN).
  *
  * Flake control mirrors the reference's @RetryingTest: the race SETUP
  * retries (fresh dirs, new JVMs) when the environment produced no
  * winner at all; the invariants themselves assert on every round.
  */
class CrossJvmDedupSpec extends SparkSpec {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def fork(logDir: String, syncDir: String, key: String, id: Int): Process = {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.provider.CrossJvmWorker", logDir, syncDir, key, id.toString)
    new ProcessBuilder(cmd: _*)
      .redirectOutput(new java.io.File(s"$syncDir/worker_$id.log"))
      .redirectErrorStream(true)
      .start()
  }

  private def await(cond: => Boolean, timeoutMs: Long): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(25)
    cond
  }

  test("two JVMs racing one durable key: block once, one SUCCESS, loser told") {
    val rounds = (1 to 3).iterator.map { round =>
      val logDir = graft.sources.Scratch.tempDir(s"xjvm-log-$round")
      val syncDir = graft.sources.Scratch.tempDir(s"xjvm-sync-$round")
      val key = s"xjvm-key-$round"
      val ps = Seq(fork(logDir, syncDir, key, 0), fork(logDir, syncDir, key, 1))
      try {
        assert(await(Files.exists(Paths.get(syncDir, "ready_0")) &&
          Files.exists(Paths.get(syncDir, "ready_1")), 120000), "workers not ready")
        Files.write(Paths.get(syncDir, "go"), Array.emptyByteArray)
        assert(await(ps.forall(!_.isAlive), 180000), "workers did not exit")

        val outcomes = Seq(0, 1).map { i =>
          val p = Paths.get(syncDir, s"out_$i")
          if (Files.exists(p)) new String(Files.readAllBytes(p), "UTF-8") else "MISSING"
        }
        val blockRuns = Files.list(Paths.get(syncDir)).iterator()
        val nBlocks = {
          var c = 0
          while (blockRuns.hasNext)
            if (blockRuns.next().getFileName.toString.startsWith("block_run_")) c += 1
          c
        }
        // hard invariants, every round, every interleaving:
        assert(nBlocks <= 1, s"block ran $nBlocks times — exactly-once violated ($outcomes)")
        assert(outcomes.count(_ == "RAN") <= 1, s"two winners: $outcomes")
        if (outcomes.contains("RAN")) {
          val loser = outcomes.filterNot(_ == "RAN")
          assert(loser.forall(Set("DUPLICATE", "RETRIES_EXCEEDED", "FAILED")),
            s"silent loser outcome: $outcomes")
          assert(nBlocks === 1, s"winner reported RAN but block ran $nBlocks times")
          // converged durable state: exactly one live SUCCESS attempt
          val log = new graft.sources.FileDedupLog(spark,
            new graft.sources.DedupLogStore(spark, logDir, nBuckets = 4))
          val successes = log.read("ks", "t", key, Long.MinValue)
            .filter(_.state == graft.operators.RecordState.Success)
          assert(successes.size === 1,
            s"converged SUCCESS count ${successes.size} (outcomes $outcomes)")
        }
        outcomes
      } finally ps.foreach(_.destroyForcibly())
    }
    // setup-retry (reference @RetryingTest analog): accept the first
    // round that produced a winner; only an environment that never
    // yields one in 3 rounds fails.
    val winning = rounds.find(_.contains("RAN"))
    assert(winning.isDefined, "no round produced a winner in 3 setups")
  }
}
