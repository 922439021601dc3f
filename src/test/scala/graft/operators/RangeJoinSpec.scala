package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned range join: equivalence against the raw range predicate on
  * seeded random data (several bin sizes, including degenerate point
  * intervals and bin-boundary-straddling spans), and the plan contract
  * that motivates it — no nested-loop join.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned join ≡ raw range predicate across bin sizes") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(300)(rnd.nextLong(10000L)).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("pid", "pt")
    val ivs = Seq.fill(80) {
      val s = rnd.nextLong(10000L)
      (s, s + rnd.nextLong(400L)) // includes zero-length intervals
    }.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      .toDF("iid", "s", "e")
    val expected = pts.join(ivs, col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    Seq(1L, 7L, 128L, 5000L, 100000L).foreach { bin =>
      val got = RangeJoin.pointInInterval(pts, ivs, bin)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"binSize=$bin")
    }
  }

  test("the binned interval-join plan is an equi-join, not a nested loop") {
    val plan = RangeJoin.qSessionConcurrencyBinned(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }

  test("sweep ≡ binned interval join, row for row, on the test corpus") {
    // The registered q_range_concurrency lane is the boundary sweep;
    // the binned equi-join is its semantic foil. The sweep counts
    // coverage arithmetically (+1/-1 deltas), the foil counts joined
    // rows — byte-equal output proves the sweep's equal-instant
    // conventions (start inclusive, end inclusive, boundary deltas
    // before probes at the same t) match the raw range predicate.
    val sweep = RangeJoin.qSessionConcurrency(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.get(1), r.getLong(2))).toSeq
    val binned = RangeJoin.qSessionConcurrencyBinned(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.get(1), r.getLong(2))).toSeq
    assert(sweep.nonEmpty && sweep === binned)
  }

  test("every purchase probe is covered by its own session (no zero rows)") {
    // The invariant that lets the sweep (which would emit a
    // n_active_sessions=0 row for an uncovered probe) agree with the
    // oracle's inner join + GROUP BY (which emits no row): a purchase
    // event is itself sessionized, so its own session interval covers
    // it and every count is ≥ 1. If sessionization or the generator
    // ever changes such that a purchase falls outside all sessions,
    // this pins the divergence loudly.
    val counts = RangeJoin.qSessionConcurrency(spark, sfDir)
      .agg(min(col("n_active_sessions"))).collect()(0).getLong(0)
    assert(counts >= 1L, "a purchase probe fell outside every session")
  }
}
