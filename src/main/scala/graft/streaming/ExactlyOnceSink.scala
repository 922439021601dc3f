package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.provider.{RetryException, RetryStrategy}

/** Exactly-once, retry-orchestrated `foreachBatch` file sink — the
  * streaming-sink analog of the reference's insert + retry machinery
  * (SURVEY.md §2: O1 `insertRecord` write path; O13-O15 retry
  * strategies, whose batch mapping is "foreachBatch + retry util").
  *
  * Exactly-once mechanics: each micro-batch lands in its own
  * `batch_id=<n>` directory written with Overwrite mode, so a replayed
  * batch (micro-batch re-execution after failure, or a sink-level retry)
  * REPLACES its own previous partial output instead of appending a
  * duplicate — idempotence by directory, the same trick as the engine's
  * dedup log keyed by attempt. Readers take the union of batch dirs
  * (`spark.read.format(...).load(root)` with partition discovery).
  *
  * Retry mechanics: transient write failures are surfaced to the given
  * [[RetryStrategy]] (the reference's e^n law by default via the
  * builder), which re-invokes the idempotent write; exhaustion throws
  * `RetriesExceededException` and fails the stream — at-least-once
  * delivery from the engine + idempotent writes = exactly-once output.
  *
  * `writeOverride` is a test seam to inject transient failures.
  */
class ExactlyOnceSink(root: String, format: String = "parquet",
                      strategy: RetryStrategy,
                      writeOverride: Option[(DataFrame, String) => Unit] = None) {

  private def write(df: DataFrame, dir: String): Unit =
    writeOverride match {
      case Some(w) => w(df, dir)
      case None => df.write.mode(SaveMode.Overwrite).format(format).save(dir)
    }

  /** The function to pass to `writeStream.foreachBatch`. */
  def writer: (DataFrame, Long) => Unit = (df, batchId) => {
    val dir = s"$root/batch_id=$batchId"
    strategy.retry { () =>
      try write(df, dir)
      catch {
        case scala.util.control.NonFatal(e) =>
          // transient storage failure → retryable (strategy decides);
          // the write is idempotent, so a re-run cannot double-append
          val re = new RetryException(s"batch_$batchId", root, format)
          re.addSuppressed(e)
          throw re
      }
    }
  }
}
