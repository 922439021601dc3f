package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Approximate aggregates: accuracy vs the exact computation and
  * determinism across runs (the driver's rows-only gate relies on the
  * row set being stable).
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct is within 3·rsd of the exact cardinality") {
    val approx = Approx.approxDistinctUsers(spark, sfDir, rsd = 0.01)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      val err = math.abs(approx(k) - ex).toDouble / ex
      assert(err <= 0.03, s"$k: approx=${approx(k)} exact=$ex err=$err")
    }
  }

  test("percentile_approx brackets the exact percentiles") {
    val approx = Approx.approxValueQuantiles(spark, sfDir)
      .select("event_type", "p50", "p95").as[(String, Double, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val events = graft.Tables.events(spark, sfDir)
    approx.foreach { case (et, (p50, p95)) =>
      val vals = events.filter(col("event_type") === et)
        .select("value").as[Double].collect().sorted
      // sketch answers must land inside a generous rank window
      def rankOf(v: Double) = vals.count(_ <= v).toDouble / vals.length
      assert(rankOf(p50) >= 0.45 && rankOf(p50) <= 0.55, s"$et p50=$p50 rank=${rankOf(p50)}")
      assert(rankOf(p95) >= 0.90 && rankOf(p95) <= 1.00, s"$et p95=$p95 rank=${rankOf(p95)}")
      assert(p50 <= p95)
    }
  }

  test("checked invariant queries attest the error bounds (all booleans true)") {
    val hll = Approx.approxDistinctUsersChecked(spark, sfDir)
      .select("event_type", "hll_within_5rsd").as[(String, Boolean)].collect()
    assert(hll.nonEmpty)
    hll.foreach { case (et, ok) => assert(ok, s"$et: HLL outside 3·rsd band") }
    val q = Approx.approxValueQuantilesChecked(spark, sfDir)
      .select("event_type", "p50_in_bounds", "p95_in_bounds", "p99_in_bounds")
      .as[(String, Boolean, Boolean, Boolean)].collect()
    assert(q.nonEmpty)
    q.foreach { case (et, a, b, c) =>
      assert(a && b && c, s"$et: quantile sketch outside rank bound ($a,$b,$c)")
    }
  }

  test("sketches are deterministic for a fixed input (stable rows-only gate)") {
    val a = Approx.approxDistinctUsers(spark, sfDir).collect().toSeq
    val b = Approx.approxDistinctUsers(spark, sfDir).collect().toSeq
    assert(a === b)
    val c = Approx.approxValueQuantiles(spark, sfDir).collect().toSeq
    val d = Approx.approxValueQuantiles(spark, sfDir).collect().toSeq
    assert(c === d)
  }

  test("CMS heavy hitters: one-sided error, exact top-k selection") {
    val rows = Approx.cmsHeavyHitters(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // CMS never underestimates (counters only ever include a key's own
    // increments plus collisions)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS underestimated key ${r.getLong(0)}"))
    // the selection is the exact top-k: recompute from the raw table
    val exact = graft.Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, n) => (-n, k) }.take(rows.length)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq === exact.toSeq)
  }

  test("CMS estimate join broadcasts the constant-size cell table") {
    // the d×w counter grid is constant-size by construction but its
    // planner ESTIMATE derives from the events scan — the pick must be
    // pinned so scale can't degrade it to a shuffle join
    val df = Approx.cmsHeavyHitters(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join for CMS cells, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "CMS estimate join degraded to a shuffle join")
  }

  test("KLL daily merge: contract booleans true, exact side recomputed, merged quantiles near exact") {
    val rows = Approx.kllDailyMergeChecked(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val events = graft.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") * lit(1000000L)).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val mine = events.filter(_._1 == et)
      // exact side must match a full driver-side recompute
      assert(r.getAs[Long]("n_days") === mine.map(_._2).distinct.length.toLong)
      assert(r.getAs[Long]("n_values") === mine.length.toLong)
      // the attested contract
      assert(r.getAs[Boolean]("p50_rank_ok"), s"$et: merged p50 outside rank band")
      assert(r.getAs[Boolean]("p95_rank_ok"), s"$et: merged p95 outside rank band")
    }
    // independent of the lane's own counters: the merged sketch's p50
    // must rank inside the band against a driver-side sort too
    val merged = graft.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(kll_sketch_agg_bigint(
        floor(col("value") * lit(1000000L)).cast("long"), lit(200)).as("sk"))
      .groupBy(col("event_type"))
      .agg(kll_sketch_get_quantile_bigint(
        kll_merge_agg_bigint(col("sk"), lit(200)), lit(0.5)).as("q50"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    merged.foreach { case (et, q50) =>
      val sorted = events.filter(_._1 == et).map(_._3).sorted
      val rank = sorted.count(_ <= q50).toDouble / sorted.length
      assert(rank >= 0.45 && rank <= 0.55, s"$et: merged p50=$q50 rank=$rank")
    }
  }

  test("KMV A-not-B: retained bound, scale-up monotonicity, unsaturated degeneracy") {
    val r = Approx.kmvAnotB(spark, sfDir).collect().head
    val (k, nA, nB, rhoD, est, exact) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))
    assert(k === 64L && nA <= 64L && nB <= 64L)
    assert(rhoD >= 0L && rhoD <= nA, "retained entries live inside A's sketch")
    // θ ≤ 2^60 ⇒ the estimate only ever scales ρ_d UP; when both
    // sketches are complete sets (unsaturated) it degenerates to the
    // exact count — seed-independent invariants, safe under corpus
    // regeneration
    assert(est >= rhoD.toDouble - 1e-9)
    if (nA < 64L && nB < 64L) {
      assert(est === rhoD.toDouble)
      assert(rhoD === exact, "complete sketches must answer exactly")
    }
    assert(exact >= 0L)
  }
}
