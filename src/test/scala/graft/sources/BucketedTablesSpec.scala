package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketed co-located joins: the join on the bucket key must plan with
  * ZERO shuffle exchanges, and results must equal the plain join.
  */
class BucketedTablesSpec extends SparkSpec {

  /** Run `body` with AQE off and auto-broadcast disabled (the conditions
    * bucketing exists for), restoring the PRIOR values afterwards even on
    * failure — a leaked `adaptive.enabled=false` would silently change
    * every later suite in the shared session.
    */
  private def withPlanShapeConfs[A](body: => A): A = {
    val keys = Seq("spark.sql.adaptive.enabled",
                   "spark.sql.autoBroadcastJoinThreshold")
    val prior = keys.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally keys.foreach { k =>
      prior(k) match {
        case Some(v) => spark.conf.set(k, v)
        case None    => spark.conf.unset(k)
      }
    }
  }

  test("bucketed shingle index: store-side Exchange-free verify join, same pairs") {
    import graft.operators.MinHash
    val table = "shingle_idx_spec"
    MinHash.materializeShingleIndex(spark, sfDir, table, nBuckets = 8)
    try {
      val (bucketed, bucketedPlan, unbucketedPlan) = withPlanShapeConfs {
        def planOf(df: org.apache.spark.sql.DataFrame) =
          df.queryExecution.executedPlan.toString
        val b = MinHash.minhashDedupBucketed(spark, sfDir, table)
        // same collapsed pipeline over unbucketed frames → the
        // comparative shape assertion: bucketing must remove at least
        // the two store-side verify-probe exchanges, whatever the
        // candidate subtree plans as
        val docs = graft.Tables.documents(spark, sfDir)
        val shArr = MinHash.shingleArray(docs)
        val members = MinHash.dupClasses(shArr)
        val repSh = shArr.join(
          members.filter(col("doc_id") === col("rep")).select(col("doc_id")),
          Seq("doc_id"))
        val u = MinHash.collapsedVerifiedPairs(members, repSh, shArr, 0.5)
          .orderBy(col("doc_a"), col("doc_b"))
        (b, planOf(b), planOf(u))
      }
      def countEx(plan: String) = "Exchange".r.findAllIn(plan).size
      // the store feeds the rep/band subtree, both verify probes, and
      // the member fan-out — every one of them must read buckets
      assert("Bucketed: true".r.findAllIn(bucketedPlan).size >= 2,
        s"store probes must read buckets:\n${bucketedPlan.take(1200)}")
      // ≥2: the two store-side probes stop shuffling (exchange-reuse
      // nodes also match the substring, so the count is a lower bound)
      assert(countEx(bucketedPlan) <= countEx(unbucketedPlan) - 2,
        s"bucketing removed only ${countEx(unbucketedPlan) - countEx(bucketedPlan)} exchanges, wanted >= 2")
      // and identical verified pairs as the cached path
      val viaCache = MinHash.minhashDedup(spark, sfDir)
        .select("doc_a", "doc_b", "jaccard").collect().toSet
      val viaBucket = bucketed.select("doc_a", "doc_b", "jaccard").collect().toSet
      assert(viaBucket === viaCache)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("incremental dedup probes the store with zero store-side Exchange") {
    import graft.operators.MinHash
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val table = "shingle_idx_incr_spec"
    MinHash.materializeShingleIndex(spark, sfDir, table, nBuckets = 8)
    try {
      val (df, plan) = withPlanShapeConfs {
        val d = MinHash.incrementalDedupBucketed(spark, sfDir, table)
        (d, d.queryExecution.executedPlan)
      }
      // the store's rows must reach their first join without EVER being
      // shuffled (the band join broadcasts the batch side; the verify
      // probe reads doc_id buckets). Exchanges above a join carry the
      // already-candidate-sized combined stream — those are fine (the
      // final orderBy range-exchange necessarily spans everything).
      // bare(p) = subtree holds a store scan not yet sealed by a join.
      def bare(p: SparkPlan): Boolean = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.toString.contains(table)
        case j if j.children.length > 1 => false
        case _ => p.children.exists(bare)
      }
      plan.foreach {
        case s: ShuffleExchangeExec =>
          assert(!bare(s.child),
            s"store scan shuffled before its first join:\n${s.toString.take(800)}")
        case _ => ()
      }
      // and the store is genuinely read through its buckets, twice
      // (corpus band stream + verify probe)
      assert("Bucketed: true".r.findAllIn(plan.toString).size >= 2,
        s"store not read bucketed:\n${plan.toString.take(1200)}")
      // same admissions as the recompute-per-run path
      val viaStore = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val viaFresh = MinHash.incrementalDedup(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(viaStore === viaFresh)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("shingle-store append: no existing file rewritten, grown probe ≡ one-shot pairs") {
    import graft.operators.MinHash
    import scala.jdk.CollectionConverters._
    val table = "shingle_grow_spec"
    val docs = graft.Tables.documents(spark, sfDir)
    val base = MinHash.shingleArray(docs.filter(col("doc_id") % 5 =!= 0))
    graft.sources.BucketedTables.writeBucketed(
      base.join(MinHash.dupClasses(base).select(col("doc_id"), col("rep")),
        Seq("doc_id")),
      table, "doc_id", 8)
    try {
      val loc = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") +
        "/" + table.toLowerCase(java.util.Locale.ROOT)
      def fileState: Map[String, Long] =
        java.nio.file.Files.walk(java.nio.file.Paths.get(loc)).iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.startsWith("part-"))
          .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .toMap
      val before = fileState
      MinHash.appendShingleIndex(table,
        docs.filter(col("doc_id") % 5 === 0), nBuckets = 8)
      val after = fileState
      before.foreach { case (f, m) =>
        assert(after.contains(f) && after(f) === m, s"append rewrote $f")
      }
      assert((after.keySet -- before.keySet).nonEmpty, "append added no files")
      // the grown store verifies the same pairs as the one-shot pipeline
      val grown = MinHash.minhashDedupBucketed(spark, sfDir, table)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val oneShot = MinHash.minhashDedup(spark, sfDir)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(grown === oneShot)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("grown shingle store: absent completion marker forces a rebuild, never a half-grown serve") {
    import graft.operators.MinHash
    val table = MinHash.ensureGrownShingleIndex(spark, sfDir)
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val loc = java.nio.file.Paths.get(wh, table.toLowerCase(java.util.Locale.ROOT))
    val marker = loc.resolve("_GRAFT_GROWN")
    assert(java.nio.file.Files.exists(marker),
      "completed build must leave the _GRAFT_GROWN marker")
    // simulate the half-grown hazard: the base write landed (table
    // exists) but the append "failed" — marker gone AND the appended
    // batch rows removed; tableExists alone would serve this store
    java.nio.file.Files.delete(marker)
    val expected = MinHash.minhashDedup(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reprobed = MinHash.minhashDedupGrown(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reprobed === expected, "marker-less store was not rebuilt")
    assert(java.nio.file.Files.exists(marker),
      "rebuild must re-create the completion marker")
  }

  test("pre-rep store schema (doc_id, shingles) still probes via read-time class derivation") {
    import graft.operators.MinHash
    val table = "shingle_prerep_spec"
    // the OLD schema, as materializeShingleIndex wrote it before class
    // reps rode along — the migration branch derives reps at read time
    BucketedTables.writeBucketed(
      MinHash.shingleArray(graft.Tables.documents(spark, sfDir)),
      table, "doc_id", 8)
    try {
      val viaOld = MinHash.minhashDedupBucketed(spark, sfDir, table)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaCache = MinHash.minhashDedup(spark, sfDir)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaOld === viaCache)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("bucketed fact-to-fact join plans without any shuffle exchange") {
    val l = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    BucketedTables.writeBucketed(l, "li_bkt", "l_orderkey", nBuckets = 8)
    BucketedTables.writeBucketed(o, "ord_bkt", "o_orderkey", nBuckets = 8)
    try {
      // Shape assertion under the conditions bucketing exists for: big
      // sides (broadcast off — at 100 TB neither fact side broadcasts)
      // and AQE off (an unfinalized adaptive plan hides exchanges).
      val (joined, plan) = withPlanShapeConfs {
        val j = BucketedTables.colocatedJoin(spark, "li_bkt", "ord_bkt",
          "l_orderkey", "o_orderkey")
        (j, j.queryExecution.executedPlan.toString)
      }
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(plan.contains("Bucketed: true"), s"bucketing not used:\n${plan.take(800)}")
      // and the result is the same as the unbucketed join
      val expected = l.join(o, l("l_orderkey") === o("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
