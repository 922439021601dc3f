package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TextOps

/** STREAMING 13-gram decontamination — the ingest-time face of
  * [[graft.operators.TextOps.decontaminate]]: the eval gram set is a
  * STATIC artifact (materialized once per eval-set release — it only
  * changes when the benchmark suite does), and each arriving train
  * micro-batch is flagged against it before admission.
  *
  * Shape: a per-doc verdict depends ONLY on the doc's own grams and
  * the static set, so each micro-batch runs the exact batch flag tail
  * inside `foreachBatch` (the streaming-MERGE pattern of
  * [[StreamingCdcMerge]]'s lane) with ZERO streaming state — no
  * watermark, no GroupState, restart-trivial; batches partition the
  * doc set, so the unioned sink equals the one-shot batch lane
  * row-for-row however arrivals are sliced. At 100 TB the static side
  * is a broadcast-or-bucketed gram table and per-batch cost is linear
  * in the batch's own gram count.
  */
object StreamingDecontaminate {

  /** The static side: the eval splits' DISTINCT md5 gram set. */
  def evalGramSet(evalDocs: DataFrame, n: Int = 13): DataFrame =
    TextOps.gramsetOf(evalDocs, n).select("gh").distinct()

  /** One micro-batch's flags: (doc_id, n_grams, n_dirty) for arriving
    * train docs contaminated by the static eval set — the identical
    * flag tail the batch lane runs.
    */
  def flagBatch(batch: DataFrame, evalGrams: DataFrame, n: Int = 13): DataFrame =
    TextOps.deconFlags(TextOps.gramsetOf(batch, n), evalGrams)

  /** Wire an incoming (doc_id, text) train stream into a parquet sink
    * of flagged docs, one append per micro-batch.
    */
  def flagsIntoSink(spark: SparkSession, incoming: DataFrame,
                    evalGrams: DataFrame, sinkDir: String,
                    checkpointDir: String, n: Int = 13): StreamingQuery =
    incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          flagBatch(batch.localCheckpoint(true), evalGrams, n)
            .write.mode("append").parquet(sinkDir)
          ()
        }
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** One micro-batch's SPAN CUTS: the [[graft.operators.TextOps
    * .decontaminateCut]] tail over arriving train docs vs the static
    * eval set — per-doc scrubbed text, same zero-state argument as
    * [[flagBatch]] (coverage depends only on the doc's own positional
    * grams and the static set).
    */
  def cutBatch(batch: DataFrame, evalGrams: DataFrame, n: Int = 13): DataFrame =
    TextOps.decontaminateCutBatch(batch, evalGrams, n)

  /** Wire an incoming train stream into a parquet sink of scrubbed
    * docs — the admission gate that ships CLEAN text downstream.
    */
  def cutsIntoSink(spark: SparkSession, incoming: DataFrame,
                   evalGrams: DataFrame, sinkDir: String,
                   checkpointDir: String, n: Int = 13): StreamingQuery =
    incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          cutBatch(batch.localCheckpoint(true), evalGrams, n)
            .write.mode("append").parquet(sinkDir)
          ()
        }
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
