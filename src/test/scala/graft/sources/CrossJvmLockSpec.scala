package graft.sources

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** The cross-JVM store-build mutex (FsPaths.withFileLock — VERDICT r13
  * next-round #8): two FORKED JVMs hammer a shared read-modify-write
  * section under the lock; mutual exclusion must hold under every
  * interleaving the filesystem produces (zero busy-flag overlaps, zero
  * lost counter updates), and a stale lock left by a crashed holder
  * must be broken rather than wedging every future builder.
  */
class CrossJvmLockSpec extends SparkSpec {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def fork(sharedDir: String, syncDir: String, id: Int,
                   iters: Int): Process = {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g",
      "-cp", sys.props("java.class.path"),
      "graft.tools.CrossJvmLockWorker", sharedDir, syncDir,
      id.toString, iters.toString)
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

  test("two JVMs under one file lock: zero overlaps, zero lost updates") {
    val iters = 25
    val sharedDir = Scratch.tempDir("xjvm-lock")
    val syncDir = Scratch.tempDir("xjvm-lock-sync")
    val ps = Seq(fork(sharedDir, syncDir, 0, iters),
      fork(sharedDir, syncDir, 1, iters))
    try {
      assert(await(Files.exists(Paths.get(syncDir, "ready_0")) &&
        Files.exists(Paths.get(syncDir, "ready_1")), 120000), "workers not ready")
      Files.write(Paths.get(syncDir, "go"), Array.emptyByteArray)
      assert(await(ps.forall(!_.isAlive), 180000), "workers did not exit")
    } finally ps.foreach(_.destroyForcibly())

    val overlaps = Seq(0, 1).map { i =>
      new String(Files.readAllBytes(Paths.get(syncDir, s"out_$i")), "UTF-8").trim.toInt
    }
    assert(overlaps.forall(_ == 0), s"critical sections overlapped: $overlaps")
    val counter = new String(
      Files.readAllBytes(Paths.get(sharedDir, "counter")), "UTF-8").trim.toLong
    assert(counter === 2L * iters,
      s"lost updates: counter=$counter expected ${2 * iters}")
    // released cleanly: no lock residue for the next builder
    assert(!Files.exists(Paths.get(sharedDir, "_LOCK")))
  }

  test("a stale lock from a crashed holder is broken, not waited on forever") {
    val dir = Scratch.tempDir("stale-lock")
    val lock = Paths.get(dir, "_LOCK")
    Files.write(lock, "dead@nowhere".getBytes("UTF-8"))
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600000L))
    var ran = false
    FsPaths.withFileLock(spark, new Path(dir, "_LOCK"), staleMillis = 1000L) {
      ran = true
    }
    assert(ran, "stale lock must be broken and the section entered")
    assert(!Files.exists(lock), "lock released after the section")
  }
}
