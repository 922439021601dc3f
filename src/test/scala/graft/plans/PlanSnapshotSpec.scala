package graft.plans

import org.apache.spark.sql.DataFrame
import graft.{SparkEntry, SparkSpec}

/** Plan-regression guard for the headline queries: the join strategies
  * and exchange count of each plan are diffed against a committed
  * snapshot (src/test/resources/plan_snapshot.txt), so a silent planner
  * degradation — a broadcast decaying to a shuffle join, an extra
  * exchange sneaking into a hot path — fails a spec instead of only
  * showing up as a bench regression two rounds later. Codegen ids and
  * operator ordering are deliberately NOT part of the signature: they
  * churn with harmless refactors.
  *
  * Regenerate after an INTENTIONAL plan change:
  * `PLAN_SNAPSHOT_WRITE=1 sbt "testOnly graft.plans.PlanSnapshotSpec"`
  * and commit the diff with the reason it moved.
  */
class PlanSnapshotSpec extends SparkSpec {

  private val snapshotPath =
    java.nio.file.Paths.get("src/test/resources/plan_snapshot.txt")

  // ten headline queries across the families: scan-agg, multi-join,
  // sessionize, as-of (custom SparkPlan), ANN, sketch-broadcast,
  // first-wins dedup, skew-salted join, exact dedup. The near-dup LSH
  // rows are deliberately absent: their plans flow through the
  // session-scoped stage memo, whose cache substitution makes the shape
  // depend on suite order — their exchange discipline is pinned by
  // BucketedTablesSpec instead.
  private val Headline = Seq(
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q21_supplier_wait",
    "q_events_sessionize",
    "q_asof_attribution",
    "ann_ivf_topk",
    "q_approx_heavy_hitters",
    "dedup_first_wins",
    "q5_local_supplier_salted",
    "dedup_exact_text",
    // r9 session 4: the hand-decorrelated Q21 (its SQL twin
    // q21_supplier_wait is already pinned above — the pair keeps BOTH
    // decorrelation paths' join/exchange shapes under guard)
    "q21_waiting_suppliers")

  private def signatureOf(df: DataFrame): String = {
    // static plan (AQE would leave an unfinalized adaptive wrapper whose
    // join picks aren't visible); broadcast threshold left at default so
    // the signature reflects the picks the production session would make
    val plan = df.queryExecution.executedPlan.toString
    def n(re: String) = re.r.findAllIn(plan).length
    Seq(
      "bhj=" + n("BroadcastHashJoin"),
      "smj=" + n("SortMergeJoin"),
      "shj=" + n("ShuffledHashJoin"),
      "bnlj=" + n("BroadcastNestedLoopJoin"),
      "exchanges=" + n("Exchange")).mkString(" ")
  }

  // The memoized near-dup lanes, snapshotted CANONICALLY (VERDICT r7
  // next-round #7): a fresh session per lane (fresh StageMemo — the
  // memo is weak-keyed by session) with the shared cache cleared first,
  // so the signature is the plan a production session builds on first
  // use, not whatever InMemoryRelation substitutions the suite order
  // left behind. Stage persists registered DURING the build substitute
  // deterministically (same order every time in a fresh world), so the
  // signature is stable — broadcast decay in the highest-value family
  // now fails a spec too.
  private val NearDup = Seq(
    "dedup_minhash_lsh",
    "dedup_incremental_bucketed",
    "dedup_media_phash",
    // round-9 staged lanes: the CDC scrub (chunk stage + broadcast
    // anti-join) and the RRF fusion (shared postings stage feeding two
    // retrievers) — stage-recompute regressions like the ones the first
    // r9 protocol run caught now fail here, not in a bench two rounds on
    "dedup_cdc_scrub",
    "search_hybrid_rrf",
    // round-10: the query-by-document hybrid (staged cosine frame +
    // staged pair frame + broadcast probes + rank-list full-outer
    // fusion) — a probe-set broadcast decaying to a shuffle, or the
    // fusion join going corpus-sized, fails here
    "search_related_hybrid")

  private val nearDupSnapshotPath =
    java.nio.file.Paths.get("src/test/resources/plan_snapshot_neardup.txt")

  test("near-dup lanes: fresh-session canonical plans match the snapshot") {
    val current = NearDup.map { name =>
      val fresh = spark.newSession()
      fresh.conf.set("spark.sql.adaptive.enabled", "false")
      spark.sharedState.cacheManager.clearCache()
      name -> signatureOf(SparkEntry.queries(name)(fresh, sfDir))
    }
    // drop this spec's stage builds so later suites rebuild their memos
    // from a clean cache instead of half-evicted leftovers
    spark.sharedState.cacheManager.clearCache()
    if (sys.env.get("PLAN_SNAPSHOT_WRITE").contains("1")) {
      val body = current.map { case (k, v) => s"$k $v" }.mkString("", "\n", "\n")
      java.nio.file.Files.createDirectories(nearDupSnapshotPath.getParent)
      java.nio.file.Files.writeString(nearDupSnapshotPath, body)
      info(s"snapshot rewritten: $nearDupSnapshotPath")
    } else {
      assert(java.nio.file.Files.exists(nearDupSnapshotPath),
        s"missing $nearDupSnapshotPath — regenerate with PLAN_SNAPSHOT_WRITE=1")
      val expected = java.nio.file.Files.readString(nearDupSnapshotPath)
        .linesIterator.filter(_.nonEmpty).map { l =>
          val i = l.indexOf(' '); l.take(i) -> l.drop(i + 1)
        }.toMap
      current.foreach { case (name, sig) =>
        assert(expected.contains(name), s"$name missing from snapshot")
        assert(sig === expected(name),
          s"$name plan shape drifted: now [$sig], snapshot [${expected(name)}]")
      }
    }
  }

  test("headline query plans match the committed join/exchange snapshot") {
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val current = Headline.map { name =>
        name -> signatureOf(SparkEntry.queries(name)(spark, sfDir))
      }
      if (sys.env.get("PLAN_SNAPSHOT_WRITE").contains("1")) {
        val body = current.map { case (k, v) => s"$k $v" }.mkString("", "\n", "\n")
        java.nio.file.Files.createDirectories(snapshotPath.getParent)
        java.nio.file.Files.writeString(snapshotPath, body)
        info(s"snapshot rewritten: $snapshotPath")
      } else {
        assert(java.nio.file.Files.exists(snapshotPath),
          s"missing $snapshotPath — regenerate with PLAN_SNAPSHOT_WRITE=1")
        val expected = java.nio.file.Files.readString(snapshotPath)
          .linesIterator.filter(_.nonEmpty).map { l =>
            val i = l.indexOf(' '); l.take(i) -> l.drop(i + 1)
          }.toMap
        current.foreach { case (name, sig) =>
          assert(expected.contains(name), s"$name missing from snapshot")
          assert(sig === expected(name),
            s"$name plan shape drifted: now [$sig], snapshot [${expected(name)}]")
        }
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
        case None => spark.conf.unset("spark.sql.adaptive.enabled")
      }
    }
  }
}
