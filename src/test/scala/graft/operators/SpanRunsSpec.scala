package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the length-thresholded ExactSubstr cut (TextOps.spanRuns,
  * oracle row `dedup_span_runs`) at the paper's contract boundary:
  * a repeated run of 49 covered tokens SURVIVES, a 50-token one is
  * CUT, short shared boilerplate below the threshold is kept, and
  * the sub-threshold output degrades to the identity transform.
  */
class SpanRunsSpec extends SparkSpec {
  import spark.implicits._

  // row layout: (doc_id, n_tokens, n_runs, max_run, n_cut, cut_text)
  private def runs(minLen: Int, texts: String*) =
    TextOps.spanRunsOf(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      k = 5, minLen = minLen)
      .orderBy(col("doc_id")).collect()

  private def span(n: Int, p: String) = (1 to n).map(p + _).mkString(" ")

  test("a 49-token verbatim repeat survives; a 50-token one is cut") {
    val r49 = span(49, "a")
    val r50 = span(50, "b")
    val r = runs(50,
      s"x1 $r49 x2 $r50 x3",
      s"y1 $r49 $r50 y2")
    // doc0: only the 50-run is cut; the 49-run and singles survive
    assert(r(0).getLong(2) === 1L, "one qualifying run")
    assert(r(0).getLong(3) === 50L, "max_run is the 50-token repeat")
    assert(r(0).getLong(4) === 50L, "exactly its 50 positions cut")
    assert(r(0).getString(5) === s"x1 $r49 x2 x3")
    // doc1: the repeats are adjacent, but the grams BRIDGING the
    // 49/50 boundary occur only in doc1 (doc0 has x2 between) — so
    // they stay two islands and only the 50 side is cut. That is the
    // paper's verbatim contract too: the concatenated 99-token
    // substring repeats nowhere, the 50-token one does.
    assert(r(1).getLong(2) === 1L && r(1).getLong(3) === 50L)
    assert(r(1).getLong(4) === 50L)
    assert(r(1).getString(5) === s"y1 $r49 y2")
  }

  test("short shared boilerplate (the paper keeps it) is untouched") {
    val boiler = span(7, "c")
    val r = runs(50, s"u1 $boiler u2", s"v1 $boiler v2 v3")
    r.foreach { row =>
      assert(row.getLong(2) === 0L && row.getLong(4) === 0L)
    }
    assert(r(0).getString(5) === s"u1 $boiler u2")
  }

  test("minLen = k degrades to spanCut's coverage on the same docs") {
    val docs = Seq(
      (0L, "p1 p2 s1 s2 s3 s4 s5 s6 p3"),
      (1L, "q1 s1 s2 s3 s4 s5 s6 q2 q3")).toDF("doc_id", "text")
    val viaRuns = TextOps.spanRunsOf(docs, k = 5, minLen = 5)
      .select(col("doc_id"), col("n_cut").as("n_covered"), col("cut_text"))
    val viaCut = TextOps.spanCutOf(docs, k = 5)
      .select(col("doc_id"), col("n_covered"), col("cut_text"))
    assert(viaRuns.exceptAll(viaCut).count() === 0L)
    assert(viaCut.exceptAll(viaRuns).count() === 0L)
  }

  test("two qualifying runs in one doc: counts, max, and disjoint union") {
    val a = span(50, "m")
    val b = span(60, "n")
    val r = runs(50, s"$a gap1 gap2 $b", s"$a z1", s"$b z2")
    assert(r(0).getLong(2) === 2L && r(0).getLong(3) === 60L)
    assert(r(0).getLong(4) === 110L)
    assert(r(0).getString(5) === "gap1 gap2")
  }
}
