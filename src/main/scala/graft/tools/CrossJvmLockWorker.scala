package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.Path

/** Forked-JVM worker for the cross-JVM file-lock spec: loops a
  * read-modify-write critical section on a SHARED directory under
  * [[graft.sources.FsPaths.withFileLockRaw]]. Inside the section it
  * (a) asserts mutual exclusion via a busy flag another holder would
  * have left set, and (b) increments a shared counter file with a
  * deliberate sleep between read and write — the textbook lost-update
  * window that unserialized processes WOULD hit. Reports the overlap
  * count to `out_<id>`; the spec asserts zero overlaps and a counter
  * equal to the total iteration count.
  */
object CrossJvmLockWorker {
  def main(args: Array[String]): Unit = {
    val Array(sharedDir, syncDir, id, itersS) = args.take(4)
    val iters = itersS.toInt
    val conf = new org.apache.hadoop.conf.Configuration()
    val lock = new Path(sharedDir, "_LOCK")

    Files.write(Paths.get(syncDir, s"ready_$id"), Array.emptyByteArray)
    val deadline = System.nanoTime() + 120000L * 1000000L
    while (!Files.exists(Paths.get(syncDir, "go")) &&
      System.nanoTime() < deadline) Thread.sleep(10)

    var overlaps = 0
    (1 to iters).foreach { _ =>
      graft.sources.FsPaths.withFileLockRaw(conf, lock, 600000L) {
        val busy = Paths.get(sharedDir, "busy")
        if (Files.exists(busy)) overlaps += 1
        Files.write(busy, id.getBytes("UTF-8"))
        val counter = Paths.get(sharedDir, "counter")
        val v =
          if (Files.exists(counter))
            new String(Files.readAllBytes(counter), "UTF-8").trim.toLong
          else 0L
        Thread.sleep(3) // widen the lost-update window
        Files.write(counter, (v + 1).toString.getBytes("UTF-8"))
        Files.deleteIfExists(busy)
      }
    }
    Files.write(Paths.get(syncDir, s"out_$id"),
      overlaps.toString.getBytes("UTF-8"))
  }
}
