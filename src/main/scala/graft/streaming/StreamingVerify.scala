package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.MinHash

/** The verify stage of the streaming near-dup pipeline: LSH candidates
  * from [[StreamingNearDup.candidates]] become VERIFIED `(doc_a, doc_b,
  * jaccard)` pairs, emitted exactly once.
  *
  * Composition (each step is an existing engine op, nothing bespoke):
  *
  *  1. `dropDuplicates(doc_a, doc_b)` — the engine's own streaming dedup
  *     collapses multi-band hits: a pair surfacing via several bands (or
  *     in several micro-batches) verifies ONCE ever. The dedup state is
  *     checkpointed, so the guarantee survives restarts. State is one
  *     row per distinct candidate pair — bounded by the near-dup rate,
  *     not the corpus; pair volume high enough to pressure it would
  *     call for `dropDuplicatesWithinWatermark` keyed like the band TTL.
  *  2. `foreachBatch` runs the BATCH verifier [[MinHash.exactJaccard]]
  *     (array-intersect on per-doc shingle arrays) against the admitted-
  *     document store — candidate-bounded work, the same join shape and
  *     cost model as the batch `minhashDedup` verify.
  *  3. [[ExactlyOnceSink]] writes each batch to its own `batch_id=<n>`
  *     dir with overwrite semantics: a replayed micro-batch (foreachBatch
  *     is at-least-once) REPLACES its own output instead of appending a
  *     duplicate. At-least-once delivery + idempotent writes + dedup
  *     state = exactly-once verified pairs end-to-end.
  *
  * `shingleStore` is the per-doc shingle-array table of admitted
  * documents (`MinHash.shingleArray`) — in production a bucketed table
  * keyed by doc_id ([[graft.sources.BucketedTables]]), here any
  * DataFrame with (doc_id, shingles).
  */
object StreamingVerify {
  import StreamingNearDup.{CandPair, TimedCandPair}

  def verifiedPairs(cands: Dataset[CandPair], shingleStore: DataFrame,
                    sink: ExactlyOnceSink, checkpointDir: String,
                    threshold: Double = 0.5): StreamingQuery = {
    val verifyBatch: (Dataset[CandPair], Long) => Unit = (batch, batchId) => {
      val verified = MinHash.exactJaccard(
          batch.toDF().select(col("doc_a"), col("doc_b")), shingleStore)
        .filter(col("jaccard") >= threshold)
      sink.writer(verified, batchId)
    }
    cands
      .dropDuplicates("doc_a", "doc_b")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(verifyBatch)
      .start()
  }

  /** [[verifiedPairs]] with BOUNDED dedup state — the shape the scaladoc
    * above prescribes when candidate-pair volume pressures the unbounded
    * `dropDuplicates`: `dropDuplicatesWithinWatermark` keyed on the pair,
    * clocked by the candidate's event time ([[TimedCandPair]]). State for
    * a pair is reclaimed once the watermark passes its event time +
    * `withinWatermark`, so state size is bounded by the pair RATE inside
    * the window, independent of stream lifetime — the same reclamation
    * contract as the band TTL upstream.
    *
    * Tradeoff (the documented one, pinned in StreamingBoundedVerifySpec):
    * a near-dup pair re-surfacing AFTER its dedup window re-verifies —
    * at-least-once pairs with bounded state, versus exactly-once pairs
    * with state ∝ all pairs ever. Downstream consumers treat verified
    * pairs as an idempotent upsert (pair ids are the key), so re-emission
    * is safe.
    *
    * Requires `spark.sql.streaming.statefulOperator.checkCorrectness
    * .enabled=false`: Spark's global-watermark check conservatively
    * rejects ANY stateful op downstream of flatMapGroupsWithState. Here
    * the emitted pair's stamp IS the triggering arrival's event time —
    * rows are stamped no earlier than the inputs that produced them, so
    * they are not late to the downstream dedup; the static check just
    * cannot see that.
    */
  def verifiedPairsBounded(cands: Dataset[TimedCandPair], shingleStore: DataFrame,
                           sink: ExactlyOnceSink, checkpointDir: String,
                           threshold: Double = 0.5,
                           withinWatermark: String = "10 minutes"): StreamingQuery = {
    val verifyBatch: (Dataset[TimedCandPair], Long) => Unit = (batch, batchId) => {
      val verified = MinHash.exactJaccard(
          batch.toDF().select(col("doc_a"), col("doc_b")).distinct(),
          shingleStore)
        .filter(col("jaccard") >= threshold)
      sink.writer(verified, batchId)
    }
    cands
      .withWatermark("event_time", withinWatermark)
      .dropDuplicatesWithinWatermark("doc_a", "doc_b")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(verifyBatch)
      .start()
  }
}
