package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** A local-disk FileSystem that answers to the `graftmock:` scheme —
  * RawLocalFileSystem's IO with only getUri overridden (the stock class
  * hardcodes `file:///`, so checkPath would reject foreign-scheme
  * paths).
  */
class GraftMockFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftmock:///")
}

/** Pins that store-lifecycle markers resolve through the path's OWN
  * Hadoop FileSystem rather than java.nio — the property that makes
  * `_GRAFT_GROWN` (MinHash grown store, IVF grown index) correct on
  * hdfs:// and s3a:// warehouses. A non-`file:` scheme is simulated by
  * registering `graftmock:` as a second name for local-disk IO, so the
  * suite proves scheme-dispatch without a cluster: the old
  * `stripPrefix("file:")` + `Paths.get` shape cannot even parse these
  * URIs.
  */
class FsPathsSpec extends SparkSpec {

  private def withMockFs[A](body: String => A): A = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftmock.impl", classOf[GraftMockFileSystem].getName)
    val dir = java.nio.file.Files.createTempDirectory("graft_fspaths_").toString
    try body(s"graftmock:$dir")
    finally {
      val p = java.nio.file.Paths.get(dir)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("touch/exists/delete work through a non-file scheme") {
    withMockFs { base =>
      val marker = new Path(base, "_GRAFT_GROWN")
      assert(!FsPaths.exists(spark, marker))
      FsPaths.touch(spark, marker)
      assert(FsPaths.exists(spark, marker))
      // the marker landed at the local path the mock scheme maps to
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(base.stripPrefix("graftmock:"), "_GRAFT_GROWN")))
      // touch truncates (idempotent re-create, not an error)
      FsPaths.touch(spark, marker)
      FsPaths.deleteRecursively(spark, marker)
      assert(!FsPaths.exists(spark, marker))
      // absent path delete is a no-op
      FsPaths.deleteRecursively(spark, marker)
    }
  }

  test("deleteRecursively removes a populated directory tree") {
    withMockFs { base =>
      val sub = new Path(base, "store/part-0000")
      FsPaths.touch(spark, sub)
      FsPaths.touch(spark, new Path(base, "store/_GRAFT_GROWN"))
      val store = new Path(base, "store")
      assert(FsPaths.exists(spark, store))
      FsPaths.deleteRecursively(spark, store)
      assert(!FsPaths.exists(spark, store))
      assert(!FsPaths.exists(spark, sub))
    }
  }

  test("warehouseTablePath preserves the warehouse scheme and lowercases the table") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = FsPaths.warehouseTablePath(spark, "Graft_Shingle_GROWN_5_x")
    assert(p.toString.startsWith(wh.replaceAll("/+$", "")))
    assert(p.getName === "graft_shingle_grown_5_x")
  }
}
