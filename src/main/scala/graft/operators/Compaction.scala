package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AUTOMATED compaction policy for the log-structured ANN stores —
  * the maintenance loop a standing deployment runs so nobody has to
  * remember to: every ingest-time mutation checks cheap store health
  * metrics against thresholds and fires the EXISTING partial
  * compaction when one trips (the LSM/Lucene merge-policy pattern).
  * The compactions themselves are unchanged and result-preserving, so
  * every store oracle row reads identically whether maintenance ran
  * by hand or by policy; only file lifetimes differ — and untouched
  * partitions stay byte-identical either way
  * (CompactionPolicySpec re-pins it through the auto face).
  *
  * Thresholds are exact RATIONALS compared by integer cross-multiply
  * (`tombstones·tombDen ≥ rows·tombNum`, default 1/5) — never a float
  * fraction — plus a segment-count bound on the log-structured
  * bucketed store (distinct `ver` values, default 8). Both metrics
  * are one cheap aggregate over data the mutation just touched.
  *
  * Scale: the policy adds two counts per mutation batch; a fire costs
  * exactly what the manual compaction costs — the tombstone-bearing
  * partitions' rewrite, never a full-store pass (except the bucketed
  * log collapse, which is the log-bounding rewrite by design).
  */
object Compaction {

  /** `tombNum/tombDen` — the tombstone fraction that triggers a dir
    * store compaction; `maxSegments` — the bucketed store's version
    * count that triggers a log collapse.
    */
  final case class Policy(tombNum: Long = 1L, tombDen: Long = 5L,
                          maxSegments: Long = 8L)

  // ── IVF dir index (list_id-partitioned parquet + tombstone sidecar) ──

  /** Tombstone `ids` then compact if the pending-tombstone fraction
    * reached the policy threshold. Returns whether compaction fired.
    */
  def deleteFromIvfIndexAuto(spark: SparkSession, indexDir: String,
                             ids: DataFrame,
                             policy: Policy = Policy()): Boolean = {
    Similarity.deleteFromIvfIndex(spark, indexDir, ids)
    maybeCompactIvf(spark, indexDir, policy)
  }

  /** The policy check alone (the seam a scheduled maintenance tick or
    * a streaming micro-batch calls): fires [[Similarity.compactIvfIndex]]
    * when tombstones·tombDen ≥ liveRows·tombNum.
    */
  def maybeCompactIvf(spark: SparkSession, indexDir: String,
                      policy: Policy = Policy()): Boolean = {
    val t = Similarity.ivfTombstones(spark, indexDir).count()
    if (t == 0L) false
    else {
      val n = spark.read.parquet(indexDir).count()
      val fire = t * policy.tombDen >= n * policy.tombNum
      if (fire) Similarity.compactIvfIndex(spark, indexDir)
      fire
    }
  }

  // ── HNSW dir graph store (shard-partitioned parquet + sidecar) ──

  /** Tombstone `ids` then compact if the pending-tombstone fraction
    * reached the policy threshold. Returns whether compaction fired.
    */
  def removeFromGraphStoreAuto(spark: SparkSession, storeDir: String,
                               ids: DataFrame, shards: Int,
                               params: Hnsw.Params = Hnsw.Params(),
                               policy: Policy = Policy()): Boolean = {
    Hnsw.removeFromGraphStore(spark, storeDir, ids, shards)
    maybeCompactGraph(spark, storeDir, shards, params, policy)
  }

  def maybeCompactGraph(spark: SparkSession, storeDir: String, shards: Int,
                        params: Hnsw.Params = Hnsw.Params(),
                        policy: Policy = Policy()): Boolean = {
    val t = Hnsw.graphTombstones(spark, storeDir).count()
    if (t == 0L) false
    else {
      val n = spark.read.parquet(storeDir).count()
      val fire = t * policy.tombDen >= n * policy.tombNum
      if (fire) Hnsw.compactGraphStore(spark, storeDir, shards, params)
      fire
    }
  }

  // ── HNSW bucketed serving store (log-structured catalog table) ──

  /** Insert `batch` then collapse the log if the store's segment count
    * (distinct versions) or pending-tombstone fraction reached the
    * policy bound. Returns whether compaction fired.
    */
  def insertIntoBucketedStoreAuto(spark: SparkSession, table: String,
                                  batch: DataFrame,
                                  params: Hnsw.Params = Hnsw.Params(),
                                  policy: Policy = Policy()): Boolean = {
    Hnsw.insertIntoBucketedStore(spark, table, batch, params)
    maybeCompactBucketed(spark, table, policy)
  }

  /** Tombstone `ids` in the bucketed store then collapse the log if a
    * policy bound tripped. Returns whether compaction fired.
    */
  def removeFromBucketedStoreAuto(spark: SparkSession, table: String,
                                  ids: DataFrame,
                                  policy: Policy = Policy()): Boolean = {
    Hnsw.removeFromBucketedStore(spark, table, ids)
    maybeCompactBucketed(spark, table, policy)
  }

  def maybeCompactBucketed(spark: SparkSession, table: String,
                           policy: Policy = Policy()): Boolean = {
    val stats = spark.table(table).agg(
      countDistinct(col("ver")).as("segs"),
      count(lit(1)).as("rows"),
      count(when(col("level") < 0, 1)).as("tombs")).head
    val (segs, rows, tombs) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    val fire = segs >= policy.maxSegments ||
      (tombs > 0L && tombs * policy.tombDen >= rows * policy.tombNum)
    if (fire) Hnsw.compactBucketedStore(spark, table)
    fire
  }
}
