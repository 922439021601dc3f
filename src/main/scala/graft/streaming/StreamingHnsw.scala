package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Hnsw

/** Streaming ingest into the on-disk sharded HNSW graph store — the
  * graph-index member of the exactly-once ingest family
  * ([[StreamingIvf]] for inverted lists, [[StreamingIncremental]] for
  * shingle buckets): vector micro-batches are INSERTED into their
  * shard graphs via `foreachBatch`, only touched shard directories are
  * rewritten, and a replayed micro-batch performs zero writes (the
  * insert narrows to never-seen vec_ids first), so store CONTENT is
  * exactly-once under at-least-once replay without a batch-id layout.
  *
  * Parity (StreamingHnswSpec): after the stream drains, the store is
  * node-row-identical to the same [[Hnsw.insertIntoGraphStore]] calls
  * made synchronously in batch (micro-batch boundaries are the ONLY
  * thing streaming adds, and each insert is a deterministic function
  * of store content + batch), and probing it surfaces the exact
  * brute-force top-k — ingest must not cost recall, the same contract
  * the grown-graph lane gates.
  *
  * Why `foreachBatch`: the store layout (one dir per shard, loaded
  * whole per insert) and the anti-join narrowing are batch constructs;
  * a streaming file sink cannot express read-modify-rewrite of a graph.
  */
object StreamingHnsw {

  /** Start the insert sink: each micro-batch of `vectors`
    * (`vec_id bigint, embedding array<float>`) lands in its shard
    * graphs under `storeDir` (built beforehand via
    * [[Hnsw.buildGraphStore]]).
    */
  def insertSink(spark: SparkSession, storeDir: String, vectors: DataFrame,
                 shards: Int, params: Hnsw.Params = Hnsw.Params(),
                 checkpoint: Option[String] = None): StreamingQuery = {
    val writer = vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        Hnsw.insertIntoGraphStore(spark, storeDir, batch.toDF(), shards, params)
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }
}
