package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.TextOps

/** Continuous CURATION — the always-on face of the PII-scrub lane
  * (`text_pii_scrub` / `pipeline_pii_report`): each micro-batch of
  * incoming documents is scrubbed by the SAME single-projection codegen
  * kernel as the batch row, and the per-source scrub report is
  * maintained as a streaming aggregation.
  *
  * Scale posture:
  *  - The scrub itself is stateless per-row expression work, so
  *    stream ≡ batch holds row-for-row by construction (pinned by
  *    StreamingCurationSpec), and throughput is bounded only by scan
  *    bandwidth — no shuffle, no state.
  *  - The report's streaming state is ONE ROW PER SOURCE (corpus
  *    catalog cardinality, not corpus size): integer counters merged
  *    associatively across micro-batches. This is the invariant that
  *    lets the report run forever against a 100 TB/day firehose.
  */
object StreamingCuration {

  /** Stateless scrub of a (doc_id, source, text) stream: per-doc class
    * counts + masked text, with the same deterministic seeding as the
    * oracle-gated batch rows.
    */
  def scrubbed(stream: DataFrame): DataFrame =
    TextOps.piiScrubOf(TextOps.piiSeeded(stream))

  /** Per-source running scrub report — a streaming aggregation for
    * complete/update output (state rows = |sources|).
    */
  def report(stream: DataFrame): DataFrame =
    TextOps.piiReportAggOf(scrubbed(stream))

  /** Per-doc rule-matrix gate bits of a (doc_id, source, text) stream —
    * stateless like the scrub: the same one-projection gates (Gopher
    * bits + RepStats kernel + PII regexp_count) as the batch capstone,
    * so stream ≡ batch holds row-for-row by construction.
    */
  def gateBits(stream: DataFrame): DataFrame =
    graft.operators.Curation.ruleBitsOf(TextOps.piiSeeded(stream))

  /** Per-source running rule matrix (`pipeline_rule_matrix`'s always-on
    * face) — a streaming aggregation for complete/update output; state
    * rows = |sources|, integer counters merged associatively across
    * micro-batches.
    */
  def matrixReport(stream: DataFrame): DataFrame =
    graft.operators.Curation.ruleMatrixAggOf(gateBits(stream))

  /** Stateless C4 gate of a (doc_id, source, text) stream: the same
    * line gates / page killers / kept-line reassembly as the batch
    * lane over the same deterministic line seeding — per-row HOF work
    * only, so stream ≡ batch holds row-for-row by construction.
    */
  def c4Gated(stream: DataFrame): DataFrame =
    TextOps.c4RulesOf(TextOps.c4Seeded(stream))

  /** Per-source running C4 report (`pipeline_c4_report`'s always-on
    * face) — a streaming aggregation for complete/update output; state
    * rows = |sources|, integer counters merged associatively across
    * micro-batches.
    */
  def c4Report(stream: DataFrame): DataFrame =
    TextOps.c4ReportAggOf(c4Gated(stream))

  /** Streaming ingest into the persisted CDC chunk store — the
    * sub-document twin of [[StreamingIvf.appendSink]]: each document
    * micro-batch is segmented by the content-defined boundary rule
    * (per-doc work, so every micro-batch produces exactly the chunk
    * rows a batch rebuild would) and appended into its doc_id buckets
    * via `foreachBatch`. The scrub itself stays a batch/on-read face
    * ([[TextOps.cdcScrubStored]]) because the banned set is a
    * corpus-df aggregate — the store appends forever, scrubs read
    * current truth. Delivery: at-least-once on replay; the df count
    * would double-count a replayed doc's chunks, so exactly-once
    * deployments stage per-batch dirs ([[ExactlyOnceSink]] pattern),
    * same trade as the IVF sink.
    */
  def chunkAppendSink(table: String,
                      docs: org.apache.spark.sql.DataFrame,
                      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = docs.writeStream
      .outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          TextOps.appendChunkIndex(table, batch.toDF())
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }
}
