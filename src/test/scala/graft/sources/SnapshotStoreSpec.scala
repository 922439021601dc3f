package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the versioned snapshot store (oracle row `source_time_travel`):
  * manifest-log commit protocol (a version exists iff its manifest
  * does), bucket-level copy-on-write (untouched buckets carried by
  * reference — mtime identity), optimistic concurrency, time-travel
  * content across versions, pruned reads, and vacuum's
  * metadata-only reachability plan.
  */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): String = {
    val dir = Scratch.tempDir("graft_snapshot_spec_")
    val base = (0L until 64L).map(k => (k, s"t${k % 4}", k.toDouble)).toSeq
      .toDF("event_id", "event_type", "value")
    SnapshotStore.create(spark, dir, base, "event_id")
    dir
  }

  private def changes(rows: Seq[(Long, String, Double, String)]) =
    rows.toDF("event_id", "event_type", "value", "op")

  private def content(dir: String, v: Int): Map[Long, Double] =
    SnapshotStore.readAt(spark, dir, v)
      .select(col("event_id"), col("value")).as[(Long, Double)]
      .collect().toMap

  private def bucketDirs(dir: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "data"))
      .iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("__bucket="))
      .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  test("commit rewrites only touched buckets; every other bucket dir is byte-untouched") {
    val dir = freshStore()
    val before = bucketDirs(dir)
    assert(before.size === SnapshotStore.Buckets)
    // keys 0 and 8 both live in bucket 0; 15 lives in bucket 7
    val v1 = SnapshotStore.commit(spark, dir,
      changes(Seq((0L, "t0", 100.0, "upsert"), (8L, "t0", 0.0, "delete"),
        (15L, "t3", 115.0, "upsert"))),
      "event_id", expectedVersion = 0)
    assert(v1 === 1)
    val after = bucketDirs(dir)
    val newDirs = after.keySet.diff(before.keySet)
    assert(newDirs.forall(_.contains("data/v1")))
    assert(newDirs.map(_.split("__bucket=").last).toSet === Set("0", "7"))
    // untouched v0 bucket dirs: same mtimes (carried by reference)
    before.foreach { case (p, t) => assert(after(p) === t, s"$p was rewritten") }
  }

  test("time travel: every version's content is exact; upsert wins, delete beats upsert") {
    val dir = freshStore()
    SnapshotStore.commit(spark, dir,
      changes(Seq((0L, "t0", 100.0, "upsert"), (8L, "t0", 0.0, "delete"),
        // same key deleted AND upserted in one batch — delete wins
        (16L, "t0", 116.0, "upsert"), (16L, "t0", 0.0, "delete"))),
      "event_id", expectedVersion = 0)
    SnapshotStore.commit(spark, dir,
      changes(Seq((0L, "t0", 200.0, "upsert"), (1L, "t1", 201.0, "upsert"))),
      "event_id", expectedVersion = 1)
    val v0 = (0L until 64L).map(k => k -> k.toDouble).toMap
    val v1 = (v0 - 8L - 16L) + (0L -> 100.0)
    val v2 = v1 + (0L -> 200.0) + (1L -> 201.0)
    assert(content(dir, 0) === v0)
    assert(content(dir, 1) === v1)
    assert(content(dir, 2) === v2)
  }

  test("optimistic concurrency: a stale expectedVersion fails loudly and changes nothing") {
    val dir = freshStore()
    SnapshotStore.commit(spark, dir,
      changes(Seq((3L, "t3", 300.0, "upsert"))), "event_id", expectedVersion = 0)
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.commit(spark, dir,
        changes(Seq((4L, "t0", 400.0, "upsert"))), "event_id", expectedVersion = 0)
    }
    assert(e.getMessage.contains("expected version 0"))
    assert(SnapshotStore.latestVersion(spark, dir) === 1)
    assert(content(dir, 1)(3L) === 300.0)
  }

  test("a data dir without a manifest is invisible garbage, not a version") {
    val dir = freshStore()
    // simulate a crashed commit: data written, manifest never published
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "data/v9/__bucket=0"))
    assert(SnapshotStore.latestVersion(spark, dir) === 0)
    intercept[IllegalArgumentException] {
      SnapshotStore.readAt(spark, dir, 9).collect()
    }
  }

  test("reads open only manifest-referenced bucket dirs (pruned time travel)") {
    val dir = freshStore()
    SnapshotStore.commit(spark, dir,
      changes(Seq((0L, "t0", 100.0, "upsert"))), "event_id", expectedVersion = 0)
    val files = SnapshotStore.readAt(spark, dir, 1).inputFiles
    // bucket 0 must come from v1, all others from v0
    assert(files.exists(_.contains("data/v1/__bucket=0")))
    assert(!files.exists(f => f.contains("data/v0/__bucket=0/")))
    assert((1 until SnapshotStore.Buckets).forall(b =>
      files.exists(_.contains(s"data/v0/__bucket=$b"))))
  }

  test("point lookup opens exactly one bucket dir and returns the keyed row per version") {
    val dir = freshStore()
    SnapshotStore.commit(spark, dir,
      changes(Seq((9L, "t1", 900.0, "upsert"))), "event_id", expectedVersion = 0)
    val hit = SnapshotStore.readKeyAt(spark, dir, 1, "event_id", 9L)
    val dirs = hit.inputFiles.map(_.split("/__bucket=")(1).split("/")(0)).distinct
    assert(dirs.toSeq === Seq("1"), "lookup must touch only the key's bucket")
    assert(hit.select("value").as[Double].collect().toSeq === Seq(900.0))
    // the same key at v0 time-travels to the pre-upsert value
    assert(SnapshotStore.readKeyAt(spark, dir, 0, "event_id", 9L)
      .select("value").as[Double].collect().toSeq === Seq(9.0))
  }

  test("optimize rewrites current content into one data version; vacuum then drops all fragments") {
    val dir = freshStore()
    SnapshotStore.commit(spark, dir,
      changes(Seq((0L, "t0", 100.0, "upsert"))), "event_id", expectedVersion = 0)
    SnapshotStore.commit(spark, dir,
      changes(Seq((1L, "t1", 201.0, "upsert"), (2L, "t2", 0.0, "delete"))),
      "event_id", expectedVersion = 1)
    val want = content(dir, 2)
    val v = SnapshotStore.optimize(spark, dir)
    assert(v === 3)
    assert(content(dir, 3) === want, "optimize must not change content")
    // everything now reads from the fresh data version
    val files = SnapshotStore.readAt(spark, dir, 3).inputFiles
    assert(files.nonEmpty && files.forall(_.contains("data/v3/")))
    // all older fragments are unreachable from v3 and reclaimed
    SnapshotStore.vacuum(spark, dir, keepFrom = 3)
    val left = bucketDirs(dir).keySet
    assert(left.forall(_.contains("data/v3/")), s"fragments survived: $left")
    assert(content(dir, 3) === want)
  }

  test("change feed classifies insert/update/delete and skips unmoved buckets entirely") {
    val dir = freshStore()
    SnapshotStore.commit(spark, dir, changes(Seq(
      (0L, "t0", 100.0, "upsert"),    // update (key exists, value differs)
      (8L, "t0", 8.0, "upsert"),      // touched but value identical → no change row
      (5L, "t1", 0.0, "delete"),      // delete
      (64L, "t0", 640.0, "upsert"))), // insert (key beyond the base range)
      "event_id", expectedVersion = 0)
    val feed = SnapshotStore.readChangesBetween(spark, dir, 0, 1, "event_id")
    val got = feed.select(col("change"), col("event_id")).as[(String, Long)]
      .collect().toSet
    assert(got === Set(("update", 0L), ("delete", 5L), ("insert", 64L)))
    // old/new value columns carry both sides
    val upd = feed.where(col("event_id") === 0L).collect().head
    assert(upd.getAs[Double]("__old_value") === 0.0)
    assert(upd.getAs[Double]("__new_value") === 100.0)
    // only moved buckets are opened: keys 0,8,64 → bucket 0; 5 → bucket 5
    val openedBuckets = feed.inputFiles
      .map(_.split("/__bucket=")(1).split("/")(0)).toSet
    assert(openedBuckets === Set("0", "5"),
      s"change feed opened unmoved buckets: $openedBuckets")
    // a no-op step reports no changes
    val v2 = SnapshotStore.commit(spark, dir,
      changes(Seq((1L, "t1", 11.0, "upsert"))), "event_id", expectedVersion = 1)
    assert(SnapshotStore.readChangesBetween(spark, dir, 0, 1, "event_id").count() === 3)
    assert(SnapshotStore.readChangesBetween(spark, dir, 1, v2, "event_id")
      .select("change").as[String].collect().toSeq === Seq("update"))
  }

  test("schema evolution: a commit with a new column widens reads; old versions keep their schema") {
    val dir = freshStore()
    val evolved = Seq((0L, "t0", 100.0, "gold", "upsert"), (64L, "t0", 640.0, "silver", "upsert"))
      .toDF("event_id", "event_type", "value", "tier", "op")
    SnapshotStore.commit(spark, dir, evolved, "event_id", expectedVersion = 0)
    val v1 = SnapshotStore.readAt(spark, dir, 1)
    assert(v1.columns.contains("tier"))
    val tiers = v1.select(col("event_id"), col("tier")).as[(Long, Option[String])]
      .collect().toMap
    assert(tiers(0L) === Some("gold") && tiers(64L) === Some("silver"))
    // untouched rows (other buckets AND same-bucket survivors) null-backfill
    assert(tiers(8L).isEmpty && tiers(1L).isEmpty)
    assert(tiers.size === 65) // 64 base rows + the inserted key
    // pre-evolution version is untouched — no tier column at v0
    assert(!SnapshotStore.readAt(spark, dir, 0).columns.contains("tier"))
    // the change feed spans the evolution: the new column appears with
    // null old values
    val feed = SnapshotStore.readChangesBetween(spark, dir, 0, 1, "event_id")
    val ins = feed.where(col("event_id") === 64L).collect().head
    assert(ins.getAs[String]("__new_tier") === "silver")
    assert(ins.isNullAt(ins.fieldIndex("__old_tier")))
  }

  test("vacuum drops exactly the unreachable bucket dirs; kept versions stay exact") {
    val dir = freshStore()
    SnapshotStore.commit(spark, dir,
      changes(Seq((0L, "t0", 100.0, "upsert"))), "event_id", expectedVersion = 0) // rewrites b0
    SnapshotStore.commit(spark, dir,
      changes(Seq((1L, "t1", 201.0, "upsert"))), "event_id", expectedVersion = 1) // rewrites b1
    val keepFrom = 1
    val expectV1 = content(dir, 1)
    val before = bucketDirs(dir)
    val deleted = SnapshotStore.vacuum(spark, dir, keepFrom)
    // only v0's bucket-0 dir is unreachable (superseded in v1 and v2;
    // v0's other buckets are still referenced by the kept manifests)
    assert(deleted.size === 1 && deleted.head.contains("data/v0/__bucket=0"))
    intercept[IllegalArgumentException] { SnapshotStore.readAt(spark, dir, 0) }
    assert(content(dir, 1) === expectV1)
    // kept data untouched byte-for-byte
    val after = bucketDirs(dir)
    after.foreach { case (p, t) => assert(before(p) === t) }
  }
}
