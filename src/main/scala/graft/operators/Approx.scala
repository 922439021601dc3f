package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate aggregation — at 100 TB, exact `COUNT(DISTINCT)` and
  * exact percentiles are among the most expensive operations in a
  * pipeline (full shuffle of the distinct key space / full sort). The
  * sketch versions are single-pass, map-side-mergeable, and bounded-
  * memory, which is why they are the default at scale:
  *
  *  - `approx_count_distinct` = HyperLogLog++ (relative error `rsd`),
  *  - `percentile_approx` = KLL-style quantile sketch with `accuracy`.
  *
  * Sketch VALUES are implementation-defined, so engine-vs-DuckDB value
  * equality on them is the wrong gate. The registered queries therefore
  * emit **oracle-checkable exact invariants** instead: the exact
  * aggregates (recomputable in any engine) plus booleans attesting that
  * the sketch landed inside its published error bound. The oracle SQL
  * recomputes the exact side and expects the booleans `true` — a green
  * row attests the accuracy CONTRACT, not the sketch bits. The raw
  * sketch outputs stay available (`approxDistinctUsers` /
  * `approxValueQuantiles`) and are accuracy/determinism-pinned in
  * ApproxSpec.
  */
object Approx {

  /** Approximate distinct users per event type (HLL++, 1% rsd), next to
    * the exact cardinality's cost profile: the exact variant shuffles
    * every (event_type, user_id) pair; the sketch ships one 1.5 KB
    * buffer per partition per group.
    */
  def approxDistinctUsers(spark: SparkSession, dir: String,
                          rsd: Double = 0.01): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Approximate value quantiles per event type (p50/p95/p99). */
  def approxValueQuantiles(spark: SparkSession, dir: String,
                           accuracy: Int = 10000): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy)).as("q"))
      .select(col("event_type"),
        col("q")(0).as("p50"), col("q")(1).as("p95"), col("q")(2).as("p99"))
      .orderBy(col("event_type"))

  /** Sketch RE-AGGREGATION — the property that justifies storing
    * sketches in a lake at all: per-day DataSketches HLL sketches
    * (`hll_sketch_agg`), persisted once, can be UNIONED
    * (`hll_union_agg`) to answer any later window without rescanning
    * the raw 100 TB. The gate makes two contracts exact:
    *
    *  - `merged_eq_global`: estimate(union of daily sketches) ==
    *    estimate(one sketch over the whole range). Structural, not
    *    data-luck — HLL registers are per-slot maxima, and max is
    *    associative over any partitioning of the stream (coupon modes
    *    union exact hash sets), so same-lgK union is lossless.
    *  - `merged_within_5rsd`: the merged estimate sits inside the
    *    5-sigma band around the exact cardinality (same rationale as
    *    [[approxDistinctUsersChecked]]; lgK=12 → rsd ≈ 1.625%/√2^… ≈
    *    1.04/√4096 ≈ 1.6%).
    *
    * Scale: the daily groupBy is one shuffle producing ~(types × days)
    * 1.5 KB sketch rows; the union aggregates THOSE, never the events.
    */
  def hllDailyMergeChecked(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    val daily = e.groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_users"),
           count(lit(1)).as("n_days"))
    val global = e.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_rows"))
      .groupBy(col("event_type"))
      // count(user_id), not count(1): the replaced countDistinct ignores
      // a NULL key, so the null group (if the corpus ever grows one)
      // must not count as a user
      .agg(count(col("user_id")).as("exact_users"),
           hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("global_users"))
    val rsd = 1.04 / math.sqrt(1 << 12) // lgConfigK = 12 default
    merged.join(global, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("exact_users"),
        (col("merged_users") === col("global_users")).as("merged_eq_global"),
        (abs(col("merged_users") - col("exact_users")) <=
          lit(5 * rsd) * col("exact_users")).as("merged_within_5rsd"))
      .orderBy(col("event_type"))
  }

  /** Count-Min-sketch heavy hitters (Cormode/Muthukrishnan 2005) — the
    * third sketch family beside HLL and KLL, and unlike those, fully
    * DETERMINISTIC under the exact hash gate: with md5-derived bucket
    * hashes the whole d×w counter table is a pure function of the data,
    * so the oracle SQL rebuilds the identical sketch and the estimates
    * hash-match exactly. Emits the top-k keys by exact count with both
    * the exact count and the CMS estimate — the one-sided error contract
    * (estimate ≥ exact, overshoot ≤ collisions) is visible in the gated
    * values themselves.
    *
    * Scale: the sketch is the point — the exact path shuffles the whole
    * key universe; CMS ships a constant d×w counter grid per partition
    * (map-side combinable: the bucket-sum aggregation IS the merge).
    * d=4 rows × w=64 buckets suit the 150-user test universe; production
    * sizes w = e/ε for εN overshoot as usual — the plan shape is
    * unchanged.
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String, d: Int = 4,
                      w: Int = 64, k: Int = 20): DataFrame = {
    val e = Tables.events(spark, dir).select(col("user_id").as("key"))
    def bucket(r: Int) = pmod(
      conv(substring(md5(concat(lit(s"$r|"), col("key").cast("string"))), 1, 15),
        16, 10).cast("bigint"), lit(w))
    val rows = 0 until d
    def rbOf(df: DataFrame) = df.select(df.columns.map(col) :+
        explode(array(rows.map(r =>
          struct(lit(r).as("r"), bucket(r).as("b"))): _*)).as("rb"): _*)
      .withColumn("r", col("rb.r")).withColumn("b", col("rb.b")).drop("rb")
    // the CMS counter table: one count per (row, bucket) cell.
    // Pinned broadcast: the table is d×w rows by construction (256 at
    // defaults) regardless of data size, but its size ESTIMATE flows
    // from the events scan stats, so left unpinned the planner can
    // degrade this to a shuffle join at scale — exactly the wrong shape
    // for a constant-size sketch probing a billion-key estimate side.
    val cells = rbOf(e).groupBy(col("r"), col("b")).agg(count(lit(1)).as("cnt"))
    val exact = e.groupBy(col("key")).agg(count(lit(1)).as("exact_n"))
    val est = rbOf(exact).join(broadcast(cells), Seq("r", "b"))
      .groupBy(col("key"), col("exact_n"))
      .agg(min(col("cnt")).as("cms_estimate"))
    est.orderBy(col("exact_n").desc, col("key")).limit(k)
      .select(col("key"), col("exact_n"), col("cms_estimate"))
  }

  /** HLL++ distinct-count with its accuracy contract made exact: per
    * event type, the exact `n_events` and `exact_users`, plus
    * `hll_within_5rsd` = |approx − exact| ≤ 5·rsd·exact computed from the
    * live sketch. The HLL estimator's standard error is rsd; the gate
    * uses the 5-sigma band (P[miss] ≈ 6e-7 per group) rather than 3-sigma
    * (≈3e-3), because the correctness driver regenerates data with fresh
    * seeds — at 3σ a healthy sketch has a real per-regeneration chance of
    * flipping a red row, conflating noise with regression. A genuine
    * sketch bug (wrong merge, lost buffer) misses by far more than 5σ.
    * (HLL++ also falls back to exact linear counting at small
    * cardinalities — the bound is loose there by construction.)
    */
  def approxDistinctUsersChecked(spark: SparkSession, dir: String,
                                 rsd: Double = 0.01): DataFrame =
    // Two-phase distinct instead of `agg(count, countDistinct, hll)`:
    // mixing distinct and plain aggregates makes Catalyst plan an Expand
    // (every input row triplicated through the shuffle). Phase 1 reduces
    // to one row per (event_type, user_id) with a map-side-combined row
    // count; phase 2's count/sum/HLL over the deduped pairs are exact
    // equalities — HLL registers are hash maxima, so duplicates never
    // change the estimate. Identical output, one-third the shuffle bytes.
    Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_rows"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("n_rows")).as("n_events"),
        // count(user_id), not count(1): countDistinct semantics exclude
        // a NULL key — the null group must not count as a user
        count(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), rsd).as("approx_users"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          lit(5 * rsd) * col("exact_users")).as("hll_within_5rsd"))
      .orderBy(col("event_type"))

  /** Quantile sketch with its rank-error contract made exact. For each
    * p ∈ {0.5, 0.95, 0.99}, `percentile_approx` guarantees the returned
    * value's rank is within n/accuracy of p·n. The returned value v
    * occupies ranks [count(value < v) + 1, count(value ≤ v)]; the query
    * re-scans the group counting those two sides against the live sketch
    * output and emits `pXX_in_bounds` = that rank interval intersects
    * [p·n − ε, p·n + ε] with ε = n/accuracy + 1 (the +1 absorbs
    * floor/ceil convention differences — the attested property is still
    * the published bound, not a vacuous one).
    *
    * Second pass is a broadcast join of the 5-row sketch result back to
    * the events scan — at 100 TB this is the standard "validate the
    * sketch on a sample/shard" shape; here the full scan doubles as the
    * validator because the gate demands exactness.
    */
  def approxValueQuantilesChecked(spark: SparkSession, dir: String,
                                  accuracy: Int = 10000): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val apx = ev.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy)).as("q"))
      .select(col("event_type"),
        col("q")(0).as("p50"), col("q")(1).as("p95"), col("q")(2).as("p99"))
    val j = ev.join(broadcast(apx), Seq("event_type"))
    def lt(c: String) = sum(when(col("value") < col(c), 1L).otherwise(0L))
    def le(c: String) = sum(when(col("value") <= col(c), 1L).otherwise(0L))
    val counted = j.groupBy(col("event_type")).agg(
      count(col("value")).as("n"),
      lt("p50").as("lt50"), le("p50").as("le50"),
      lt("p95").as("lt95"), le("p95").as("le95"),
      lt("p99").as("lt99"), le("p99").as("le99"))
    def inBounds(p: Double, ltc: String, lec: String) = {
      val eps = col("n").cast("double") / accuracy + lit(1.0)
      val target = col("n").cast("double") * p
      (col(ltc) + lit(1L) <= target + eps) && (col(lec) >= target - eps)
    }
    counted.select(col("event_type"), col("n").as("n_events"),
        inBounds(0.50, "lt50", "le50").as("p50_in_bounds"),
        inBounds(0.95, "lt95", "le95").as("p95_in_bounds"),
        inBounds(0.99, "lt99", "le99").as("p99_in_bounds"))
      .orderBy(col("event_type"))
  }

  /** KLL quantile-sketch RE-AGGREGATION (`q_approx_quantile_merge`) —
    * the [[hllDailyMergeChecked]] story for the ORDER statistic: per-day
    * DataSketches KLL sketches (`kll_sketch_agg_bigint`, Karnin/Lang/
    * Liberty 2016), persisted once at ingest, are MERGED
    * (`kll_merge_agg_bigint`) to answer any later window's quantiles
    * without rescanning the raw 100 TB — the mergeability `percentile_
    * approx`'s Greenwald-Khanna summaries never expose. KLL compaction
    * is RANDOMIZED (unlike HLL's per-slot maxima), so merged == global
    * is not a sound gate; the sound contract is the published rank
    * bound, made exact the [[approxValueQuantilesChecked]] way: re-scan
    * the group counting strict/weak ranks of each merged-sketch
    * quantile and attest the value's rank interval intersects
    * [p·n − εn, p·n + εn]. k = 200 gives single-sketch normalized rank
    * error ≈ 1.65% at 99% confidence, and KLL merge PRESERVES the
    * k-bound error; the gate uses ε = 5% — loose enough that the
    * driver's per-round data regeneration can never flip a healthy row
    * (a real merge bug — dropped level, double-counted weight — misses
    * by far more), tight enough to be non-vacuous at every p probed.
    *
    * Values ride as micro-integers (floor(value·10⁶), the repo-wide
    * fixed-point discipline) so the bigint sketch variant applies; the
    * emitted row is exact integers + contract booleans only — sketch-
    * internal values never cross the oracle gate.
    *
    * Scale: one shuffle to (types × days) constant-size sketch rows,
    * one k-bounded merge of THOSE, one validation re-scan against the
    * ≤|types|-row broadcast — at 100 TB the daily sketch table is what
    * a deployment persists, and re-answering a quarter's p95 touches
    * ~90 rows per type.
    */
  def kllDailyMergeChecked(spark: SparkSession, dir: String,
                           k: Int = 200): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") * lit(1000000L)).cast("long").as("v"))
    val daily = e.groupBy(col("event_type"), col("day"))
      .agg(kll_sketch_agg_bigint(col("v"), lit(k)).as("sk"))
    val merged = daily.groupBy(col("event_type"))
      .agg(kll_merge_agg_bigint(col("sk"), lit(k)).as("msk"),
           count(lit(1)).as("n_days"))
      .select(col("event_type"), col("n_days"),
        kll_sketch_get_quantile_bigint(col("msk"), lit(0.5)).as("q50"),
        kll_sketch_get_quantile_bigint(col("msk"), lit(0.95)).as("q95"))
    val j = e.join(broadcast(merged), Seq("event_type"))
    def lt(c: String) = sum(when(col("v") < col(c), 1L).otherwise(0L))
    def le(c: String) = sum(when(col("v") <= col(c), 1L).otherwise(0L))
    val counted = j.groupBy(col("event_type"), col("n_days")).agg(
      count(lit(1)).as("n"),
      lt("q50").as("lt50"), le("q50").as("le50"),
      lt("q95").as("lt95"), le("q95").as("le95"))
    def rankOk(p: Double, ltc: String, lec: String) = {
      val eps = col("n").cast("double") * 0.05 + lit(1.0)
      val target = col("n").cast("double") * p
      (col(ltc) + lit(1L) <= target + eps) && (col(lec) >= target - eps)
    }
    counted.select(col("event_type"), col("n_days"), col("n").as("n_values"),
        rankOk(0.50, "lt50", "le50").as("p50_rank_ok"),
        rankOk(0.95, "lt95", "le95").as("p95_rank_ok"))
      .orderBy(col("event_type"))
  }

  /** KMV (k-minimum-values) theta-sketch INTERSECTION — the set
    * operation HLL cannot do: estimated |view-users ∩ purchase-users|
    * from two k=64 sketches, next to the exact answer. Each sketch is
    * the k lexicographically-smallest md5(user_id) digests (md5 hex is
    * uniform, and string order below equals numeric order); merged
    * theta = the k-th smallest over the union, ρ = merged hashes
    * present in BOTH sketches, estimate = (ρ/k)·((k−1)/θ). A saturated
    * case (fewer than k distinct hashes overall) degenerates to the
    * exact ρ. Every hash is md5, so the whole sketch — not just its
    * contract — is reproduced bit-exactly by the oracle.
    *
    * Scale: sketches are k-bounded per group (TopKByOrder heaps — one
    * map-side-combined pass, no global sort); everything after the
    * sketch is constant-size driver-free arithmetic. This is the
    * mergeable-sketch story for distributed set intersection: ship 64
    * hashes per partition, never user sets.
    */
  def kmvIntersection(spark: SparkSession, dir: String, k: Int = 64): DataFrame =
    // session-memoized like every other multi-consumer lane: repeated
    // registry enumeration reuses one pair of persisted sketch frames
    // instead of pinning a fresh copy per call
    StageMemo.memoized(spark, s"kmv_intersection_$k", dir)(
      kmvIntersectionBuild(spark, dir, k))

  /** The two k-minimum-value sketches (event_type, h) — the shared
    * ingest artifact of [[kmvIntersection]] and [[kmvAnotB]]: one
    * heap-agg pass over distinct user hashes, memoized per (session,
    * dir, k) so every set operation reads the same 2·k rows.
    */
  private def kmvSketches(spark: SparkSession, dir: String, k: Int): DataFrame =
    StageMemo.memoized(spark, s"kmv_sketches_$k", dir) {
      val ev = Tables.events(spark, dir)
      val h = ev.filter(col("event_type").isin("view", "purchase"))
        .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
        .distinct()
      Dedup.topKPerKey(h, Seq("event_type"), Seq(col("h")), k)
        .select(col("event_type"), col("h"))
    }

  private def kmvIntersectionBuild(spark: SparkSession, dir: String,
                                   k: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val ev = Tables.events(spark, dir)
    val sk = kmvSketches(spark, dir, k)
      .persist(MEMORY_AND_DISK) // feeds the merge and both ρ probes
    val merged = sk.select(col("h")).distinct()
      .orderBy(col("h")).limit(k)
      .persist(MEMORY_AND_DISK)
    val stats = merged.agg(count(lit(1)).as("n_merged"), max(col("h")).as("hk"))
    val rho = merged
      .join(sk.filter(col("event_type") === "view").select(col("h")),
        Seq("h"), "left_semi")
      .join(sk.filter(col("event_type") === "purchase").select(col("h")),
        Seq("h"), "left_semi")
      .agg(count(lit(1)).as("rho"))
    val exact = ev.filter(col("event_type") === "view").select(col("user_id"))
      .intersect(ev.filter(col("event_type") === "purchase").select(col("user_id")))
      .agg(count(lit(1)).as("exact_inter"))
    // θ = hk / 2^60 from the first 15 hex digits; the estimate's
    // operation tree ((ρ/k) · ((k−1)/θ)) is mirrored exactly in the
    // oracle so the IEEE roundings coincide
    val theta = conv(substring(col("hk"), 1, 15), 16, 10)
      .cast("bigint").cast("double") / lit(1152921504606846976.0)
    stats.crossJoin(broadcast(rho)).crossJoin(broadcast(exact))
      .select(
        lit(k.toLong).as("k"),
        col("n_merged"),
        col("rho"),
        when(col("n_merged") < k, col("rho").cast("double"))
          .otherwise((col("rho").cast("double") / lit(k.toDouble)) *
            (lit((k - 1).toDouble) / theta))
          .as("kmv_estimate"),
        col("exact_inter"))
  }

  /** KMV theta-sketch A-NOT-B — set DIFFERENCE, completing the sketch
    * set-operation triad (HLL merge = union, [[kmvIntersection]] =
    * intersection, this = difference; the DataSketches theta AnotB):
    * estimated |view-users \ purchase-users| next to the exact answer.
    * θ = min(θ_A, θ_B) where an UNSATURATED sketch's θ is 1 (2^60 in
    * the 60-bit integer domain — it holds its whole set); retained
    * ρ_d = A-sketch entries strictly below θ and absent from B's
    * sketch (sound: every B hash < θ_B is IN B's sketch, so absence
    * below θ means absence from B); estimate = ρ_d/θ, degenerating to
    * exact ρ_d when both sketches are complete. All hashes are md5 and
    * the estimate's operation tree is mirrored in the oracle, so the
    * sketch itself — not just its contract — is value-exact.
    *
    * Scale: same k-bounded story as the intersection — both sketches
    * ride the shared [[kmvSketches]] memo; everything downstream is
    * ≤ 2·k rows of arithmetic.
    */
  def kmvAnotB(spark: SparkSession, dir: String, k: Int = 64): DataFrame =
    StageMemo.memoized(spark, s"kmv_anotb_$k", dir) {
      val two60 = 1152921504606846976L // 2^60
      val ev = Tables.events(spark, dir)
      val sk = kmvSketches(spark, dir, k)
      def hInt(c: Column) =
        conv(substring(c, 1, 15), 16, 10).cast("bigint")
      val a = sk.filter(col("event_type") === "view").select(col("h"))
      val b = sk.filter(col("event_type") === "purchase").select(col("h"))
      val aStats = a.agg(count(lit(1)).as("n_a"), max(col("h")).as("hk_a"))
      val bStats = b.agg(count(lit(1)).as("n_b"), max(col("h")).as("hk_b"))
      val stats = aStats.crossJoin(broadcast(bStats)).select(
        col("n_a"), col("n_b"),
        least(
          when(col("n_a") < k, lit(two60)).otherwise(hInt(col("hk_a"))),
          when(col("n_b") < k, lit(two60)).otherwise(hInt(col("hk_b"))))
          .as("theta"))
      val rhoD = a.join(b, Seq("h"), "left_anti")
        .crossJoin(broadcast(stats.select(col("theta"))))
        .filter(hInt(col("h")) < col("theta"))
        .agg(count(lit(1)).as("rho_d"))
      val exact = ev.filter(col("event_type") === "view").select(col("user_id"))
        .except(ev.filter(col("event_type") === "purchase").select(col("user_id")))
        .agg(count(lit(1)).as("exact_diff"))
      stats.crossJoin(broadcast(rhoD)).crossJoin(broadcast(exact))
        .select(
          lit(k.toLong).as("k"),
          col("n_a"), col("n_b"), col("rho_d"),
          when(col("n_a") < k && col("n_b") < k, col("rho_d").cast("double"))
            .otherwise(col("rho_d").cast("double") *
              (lit(two60.toDouble) / col("theta").cast("double")))
            .as("anotb_estimate"),
          col("exact_diff"))
    }
}
