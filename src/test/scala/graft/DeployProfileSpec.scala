package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins DeployProfile to the committed bench config (BASELINE.md's
  * protocol records are only reproducible if this map never drifts)
  * and the cluster-profile invariants the scale drills established.
  */
class DeployProfileSpec extends AnyFunSuite {

  test("local profile IS the committed protocol-bench config") {
    assert(DeployProfile.local(32) === Map(
      "spark.master" -> "local[32]",
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.session.timeZone" -> "UTC",
      "spark.ui.enabled" -> "false"))
  }

  test("a session configured from the local profile carries it") {
    // configure() must land every entry on the live session conf —
    // this is the Bench/Verify construction path
    val spark = DeployProfile.configure(
      org.apache.spark.sql.SparkSession.builder()
        .appName("graft-test"),
      DeployProfile.local(4))
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
  }

  test("cluster profile: AQE headroom above the shuffle width, 128 MB scan contract") {
    val m = DeployProfile.cluster(executors = 250, coresPerExecutor = 4)
    val cores = 250L * 4
    assert(m("spark.sql.shuffle.partitions").toLong === cores * 2)
    assert(m("spark.sql.adaptive.coalescePartitions.initialPartitionNum").toLong === cores * 4)
    // the initial partition count must exceed the static width, or AQE
    // coalescing has nothing to work with — the recorded A/B's cluster side
    assert(m("spark.sql.adaptive.coalescePartitions.initialPartitionNum").toLong >
      m("spark.sql.shuffle.partitions").toLong)
    assert(m("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(m("spark.sql.files.maxPartitionBytes").toLong === 128L * 1024 * 1024)
    assert(m("spark.executor.instances") === "250")
  }

  test("IVF list sizing tracks sqrt(N) with the committed small-SF floor") {
    assert(DeployProfile.ivfLists(2000) === 45)
    assert(DeployProfile.ivfLists(31849) === 178)
    assert(DeployProfile.ivfLists(100) === 16, "never below the committed K=16")
    // at 1e10 vectors (100 TB-ish): 100k lists, per-query nProbe*100k
    assert(DeployProfile.ivfLists(10000000000L) === 100000)
  }

  test("driver-mem floor matches the measured OOM boundary") {
    assert(DeployProfile.localDriverMemFloorGb(0.1) === 8)
    assert(DeployProfile.localDriverMemFloorGb(1.0) === 32)
    assert(DeployProfile.localDriverMemFloorGb(10.0) === 32)
  }
}
