package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Scheme-agnostic filesystem helpers for store lifecycle markers and
  * managed-table locations. The earlier shape —
  * `warehouse.stripPrefix("file:")` + `java.nio.file.Paths` — silently
  * breaks on any non-local warehouse (`hdfs://`, `s3a://`), which is
  * exactly where a 100-TB deployment's warehouse lives; every
  * marker/location operation instead resolves the path's OWN filesystem
  * from the session's Hadoop configuration, so the same code serves
  * local test runs and object-store deployments. FsPathsSpec pins the
  * non-`file:` case via a RawLocalFileSystem-backed mock scheme.
  */
object FsPaths {

  /** Managed location of `table` under the session's warehouse dir,
    * scheme preserved (Spark lowercases managed table dirs).
    */
  def warehouseTablePath(spark: SparkSession, table: String): Path =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, p: Path): Boolean = fs(spark, p).exists(p)

  /** Create (or truncate) a zero-byte marker file. */
  def touch(spark: SparkSession, p: Path): Unit =
    fs(spark, p).create(p, true).close()

  /** Recursive delete; absent path is a no-op. */
  def deleteRecursively(spark: SparkSession, p: Path): Unit = {
    val h = fs(spark, p)
    if (h.exists(p)) h.delete(p, true)
  }
}
