package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Persist-footprint drill (VERDICT r7 next-round #8): measure the
  * near-dup family's memoized stage cache under MEMORY_AND_DISK vs
  * MEMORY_AND_DISK_SER and pin that the level knob works. The measured
  * numbers land in BASELINE.md; the driver-heap-constrained deployment
  * flips `-Dgraft.stagememo.level=MEMORY_AND_DISK_SER` if the
  * deserialized footprint ever becomes the eviction-thrash surface.
  *
  * (SQL caches store compressed columnar CachedBatch blocks under
  * either level — the level decides block REPLICATION/disk semantics
  * and whether the batches are kept as objects or serialized bytes in
  * the memory store; for columnar byte-array batches the delta is
  * small, which is exactly what this spec demonstrates and BASELINE.md
  * records.)
  */
class StageMemoFootprintSpec extends SparkSpec {

  private def cachedBytes(): Long = {
    val infos = spark.sparkContext.getRDDStorageInfo
    infos.map(i => i.memSize + i.diskSize).sum
  }

  private def measure(level: String): Long = {
    val prev = sys.props.get("graft.stagememo.level")
    sys.props("graft.stagememo.level") = level
    try {
      spark.sharedState.cacheManager.clearCache()
      val fresh = spark.newSession() // fresh memo (weak-keyed by session)
      // the near-dup family's shared stages: verified pairs + cluster
      // labels (the heaviest persists in the bench's memo set)
      val survivors = MinHash.clusterSurvivors(fresh, sfDir)
      assert(survivors.collect().nonEmpty)
      val bytes = cachedBytes()
      assert(bytes > 0, s"no cached blocks under $level")
      bytes
    } finally {
      prev match {
        case Some(v) => sys.props("graft.stagememo.level") = v
        case None => sys.props.remove("graft.stagememo.level")
      }
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("stage memo honors the level knob; SER footprint measured vs default") {
    assert(StageMemo.level.useDisk && StageMemo.level.useMemory)
    val deser = measure("MEMORY_AND_DISK")
    val ser = measure("MEMORY_AND_DISK_SER")
    info(f"near-dup stage cache: MEMORY_AND_DISK=$deser%d B, MEMORY_AND_DISK_SER=$ser%d B, ratio ${ser.toDouble / deser}%.2f")
    // both materialize; SER must not blow the footprint up (the knob
    // would then be a regression, not an option)
    assert(ser <= deser * 2)
  }

  test("level knob parses every storage level name") {
    val prev = sys.props.get("graft.stagememo.level")
    try {
      sys.props("graft.stagememo.level") = "MEMORY_AND_DISK_SER"
      assert(StageMemo.level ===
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      sys.props("graft.stagememo.level") = "MEMORY_ONLY"
      assert(StageMemo.level === org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    } finally {
      prev match {
        case Some(v) => sys.props("graft.stagememo.level") = v
        case None => sys.props.remove("graft.stagememo.level")
      }
    }
  }
}
