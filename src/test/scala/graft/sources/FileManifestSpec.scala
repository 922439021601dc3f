package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest file skipping: a keyed read opens ONLY the files whose
  * manifest stat range covers the key (inputFiles is the proof — the
  * skip happens before any footer is opened), and the pruned result
  * equals the full-scan filter exactly.
  */
class FileManifestSpec extends SparkSpec {

  test("keyed read opens only manifest-matching files; result exact") {
    val (dataDir, manifest) = FileManifest.ensureClusteredLayout(spark, sfDir)
    assert(manifest.size === 8)
    // range clustering worked: file key ranges are disjoint
    val sorted = manifest.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Seq((_, _, hiA), (_, loB, _)) => assert(hiA <= loB)
      case _ =>
    }

    val userId = 7L
    val pruned = FileManifest.readForKey(spark, sfDir, userId)
    val matching = manifest.filter(m => m._2 <= userId && userId <= m._3)
    assert(matching.size < manifest.size, "key unexpectedly spans most files")
    assert(pruned.inputFiles.map(_.replace("file://", "")).toSet ===
      matching.map(_._1.replace("file://", "")).toSet)

    val expected = spark.read.parquet(dataDir)
      .filter(col("user_id") === userId)
    assert(pruned.count() === expected.count())
    assert(pruned.count() > 0)
    assert(pruned.exceptAll(expected).isEmpty &&
      expected.exceptAll(pruned).isEmpty)
  }
}
