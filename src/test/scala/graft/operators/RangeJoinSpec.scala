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

  test("the binned plan is an equi-join, not a nested loop") {
    val plan = RangeJoin.qSessionConcurrency(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }
}
