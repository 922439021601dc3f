package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-flight DSIR importance scoring — the serving half of the
  * selection lane: the bucket-weight vector is TRAINED offline
  * ([[graft.operators.TextOps.dsirWeightsVector]], a `buckets`-length
  * int64 artifact) and enters the plan as ONE array literal, so scoring
  * is a single stateless codegen'd kernel call per row
  * ([[graft.functions.ExpressionKernels.dsirScore]]): no joins, no
  * aggregation, no streaming state — the same `DataFrame` transform
  * works identically on a batch frame and a `readStream` frame, and
  * stream ≡ batch row-for-row by construction.
  *
  * This is the 100-TB serving shape: the corpus-sized work (feature
  * counting, weight training) happened once offline; arriving documents
  * pay O(tokens) each, inside whole-stage codegen, at ingest time.
  */
object StreamingDsir {

  def scored(docs: DataFrame, weights: Array[Long]): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.functions.dsir_score(col("text"),
        typedLit(weights.toSeq)).as("dsir_score"))
}
