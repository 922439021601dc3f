package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write-side bucketing for co-located joins — the 100 TB answer to
  * "this join shuffles both sides every time".
  *
  * `bucketBy(n, key)` + `saveAsTable` persists each side hash-partitioned
  * on the join key with the SAME bucketing function Spark's shuffle uses,
  * so a subsequent equi-join on that key needs NO exchange on either
  * side (SortMergeJoin reads bucket i against bucket i directly). This is
  * the durable analog of the reference's partition-per-key table layout
  * (Cassandra partition key ≍ bucket column; SURVEY.md §1.3) applied to
  * the analytic tables: fact-to-fact joins (lineitem ⋈ orders) are
  * repeated daily in a training-data pipeline, and pre-bucketing
  * amortizes their shuffle once at ingest.
  *
  * Bucketed tables must go through the catalog (`saveAsTable`) — plain
  * `.parquet(path)` writes drop bucketing metadata.
  */
object BucketedTables {

  /** Persist `df` bucketed (and sorted within buckets) by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed location under spark.sql.warehouse.dir

  /** Append to an existing bucketed table with the SAME bucket spec:
    * new rows land as additional files in their hash buckets; every
    * pre-existing file is untouched (append-only maintenance — the
    * mtime-identity contract the grown-index specs pin).
    */
  def appendBucketed(df: DataFrame, table: String, key: String,
                     nBuckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Append)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — shuffle-free when
    * both sides were bucketed with the same count on the join columns.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
