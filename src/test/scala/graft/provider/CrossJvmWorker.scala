package graft.provider

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.concurrent.duration._
import org.apache.spark.sql.SparkSession

/** Forked-JVM worker for [[CrossJvmDedupSpec]]: one OS process running
  * the per-call protocol against a SHARED durable FileDedupLog dir —
  * the reference pins its conflict outcomes under process-level
  * concurrency against shared external storage
  * (DeduplicationProviderTest.kt:145-210, testcontainers Cassandra);
  * the in-JVM race specs can't exercise separate commit protocols,
  * separate monotonic clocks, or file-store visibility across
  * processes. Protocol: write `ready_<id>`, spin on `go`, run
  * `process`, record the outcome in `out_<id>`; the block drops a
  * `block_run_<id>` marker so the spec can count executions globally.
  */
object CrossJvmWorker {
  def main(args: Array[String]): Unit = {
    val Array(logDir, syncDir, key, id) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-xjvm-$id")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var outcome = "UNKNOWN"
    try {
      val store = new graft.sources.DedupLogStore(spark, logDir, nBuckets = 4)
      val provider = DedupProviderBuilder.newProviderBuilder()
        .withLog(new graft.sources.FileDedupLog(spark, store))
        .withRetryStrategy(new FixedDelayRetryStrategy(3, 200L))
        .build()
      Files.write(Paths.get(syncDir, s"ready_$id"), Array.emptyByteArray)
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (!Files.exists(Paths.get(syncDir, "go")) && System.nanoTime() < deadline)
        Thread.sleep(10)
      provider.process(key, "t", "ks", Duration.Zero, () => {
        Files.write(Paths.get(syncDir, s"block_run_$id"), Array.emptyByteArray,
          StandardOpenOption.CREATE_NEW)
        "ok"
      })
      outcome = "RAN"
    } catch {
      case _: DuplicateException => outcome = "DUPLICATE"
      case _: RetriesExceededException => outcome = "RETRIES_EXCEEDED"
      case _: FailedException => outcome = "FAILED"
      case e: Throwable => outcome = s"ERROR:${e.getClass.getSimpleName}"
    } finally {
      Files.write(Paths.get(syncDir, s"out_$id"),
        outcome.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      spark.stop()
    }
  }
}
