package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketed on-disk HNSW graph store (the repeat-batch serving
  * layout): probing it must surface the exact top-k the gate lane
  * surfaces, the second-and-later probe batches must touch the store
  * with ZERO store-side Exchange (the whole point of bucketing the
  * shard column — [[Hnsw.searchGraph]]'s cogroup pays a corpus-sized
  * shuffle per batch, the store must not), and probing must never
  * rewrite a store file.
  */
class HnswStoreSpec extends SparkSpec {

  private def topkRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  test("served probe ≡ session-staged gate lane (exact top-k)") {
    val gate = topkRows(Hnsw.hnswTopK(spark, sfDir))
    val served = topkRows(Hnsw.hnswServedTopK(spark, sfDir))
    assert(gate.nonEmpty && served === gate)
  }

  test("second probe batch: bucketed scan, zero store-side Exchange, no file rewritten") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val table = Hnsw.ensureBucketedGraphStore(spark, sfDir)
    Hnsw.hnswServedTopK(spark, sfDir).count() // first batch (warm regime)

    val storePath = graft.sources.FsPaths.warehouseTablePath(spark, table)
    def snapshot(): Map[String, (Long, Long)] = {
      val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(storePath, true)
      val b = Map.newBuilder[String, (Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_"))
          b += f.getPath.toString -> (f.getModificationTime, f.getLen)
      }
      b.result()
    }
    val before = snapshot()
    assert(before.nonEmpty, "store wrote no data files")

    // the raw second-batch probe plan (pre-rerank: the store-touching half)
    val probe = Hnsw.probeBucketedStore(spark, table,
      graft.Tables.embeddings(spark, sfDir), 50, Hnsw.Params())
    assert(probe.count() > 0)

    // the store's CORPUS-sized reads (node payload incl. embedding) —
    // the query side legitimately reads the ≤|shards|-row shard-id
    // column off the same table for its broadcast fanout, and shuffling
    // THAT is planning metadata, not a store re-shuffle
    def storeScans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(table)) &&
            f.output.exists(_.name == "embedding") => Seq(f)
        case _ => Nil
      }
      val nested = p match {
        case a: AdaptiveSparkPlanExec => storeScans(a.executedPlan)
        case _ => Nil
      }
      here ++ nested ++ p.children.flatMap(storeScans)
    }
    def offendingExchanges(p: SparkPlan): Seq[SparkPlan] = {
      val here = p match {
        case e: ShuffleExchangeLike if storeScans(e).nonEmpty => Seq(e)
        case _ => Nil
      }
      val nested = p match {
        case a: AdaptiveSparkPlanExec => offendingExchanges(a.executedPlan)
        case _ => Nil
      }
      here ++ nested ++ p.children.flatMap(offendingExchanges)
    }
    val plan = probe.queryExecution.executedPlan
    // the store IS read, through its buckets
    val scans = storeScans(plan)
    assert(scans.nonEmpty, s"no store scan found:\n${plan.toString.take(1500)}")
    assert(scans.forall(_.bucketedScan), "store scan must ride the buckets")
    // and nothing between the store scan and the probe re-shuffles it
    val bad = offendingExchanges(plan)
    assert(bad.isEmpty,
      s"store-side Exchange on a repeat probe batch:\n${bad.map(_.nodeName).mkString(", ")}")
    // probing rewrote nothing
    val after = snapshot()
    assert(after === before, "probe mutated the store")
  }

  test("store name is injective across dirs (dirHash rides the slug)") {
    assert(Search.dirHash("/a/b") !== Search.dirHash("/a_b"))
  }

  test("executor-resident graph cache: second batch reconstructs ZERO shards, rebuild invalidates") {
    val table = Hnsw.ensureBucketedGraphStore(spark, sfDir)
    def probeOnce(): Long =
      Hnsw.probeBucketedStore(spark, table,
        graft.Tables.embeddings(spark, sfDir), 50, Hnsw.Params()).count()
    val r0 = probeOnce() // warm: populates the per-JVM cache for this store version
    val c1 = Hnsw.probeReconstructs.get()
    val r1 = probeOnce()
    assert(r1 === r0)
    assert(Hnsw.probeReconstructs.get() === c1,
      "second batch re-reconstructed shard graphs despite an unchanged store")
    // rebuild: drop the completion marker, ensure again — the marker's
    // mtime (the cache's version stamp) moves, so the next probe must
    // reconstruct fresh graphs instead of serving the old store's
    val marker = new org.apache.hadoop.fs.Path(
      graft.sources.FsPaths.warehouseTablePath(spark, table), "_GRAFT_GROWN")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldMtime = fs.getFileStatus(marker).getModificationTime
    fs.delete(marker, false)
    Thread.sleep(5) // marker mtime must tick past the old stamp
    assert(Hnsw.ensureBucketedGraphStore(spark, sfDir) === table)
    assert(fs.getFileStatus(marker).getModificationTime !== oldMtime)
    val r2 = probeOnce()
    assert(r2 === r0, "rebuilt store changed probe results")
    assert(Hnsw.probeReconstructs.get() > c1,
      "probe served graphs cached from the SUPERSEDED store version")
  }
}
