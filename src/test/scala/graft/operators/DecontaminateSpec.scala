package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the GPT-3 exact 13-gram decontamination contract
  * (TextOps.decontaminate, oracle row `dedup_decontaminate`) at its
  * boundary: a 13-token run shared with the eval side flags the train
  * doc, a 12-token one does not; gram counts are DISTINCT per doc;
  * only the train side is ever reported; sub-13-token docs are inert.
  * Splits are injected explicitly here — the content-addressed split
  * rule itself is pinned by the `q_dataset_split` oracle row.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String, String)*) =
    TextOps.decontaminateOf(rows.toDF("doc_id", "split", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def span(n: Int, p: String) = (1 to n).map(p + _).mkString(" ")

  test("13 shared tokens flag the train doc; 12 do not") {
    val r13 = span(13, "a")
    val r12 = span(12, "b")
    val got = run(
      (0L, "train", s"t1 $r13 t2"),
      (1L, "train", s"u1 $r12 u2"),
      (2L, "test", s"e1 $r13 e2 $r12 e3"))
    // doc0: unique padding breaks every bridging gram — exactly the one
    // 13-gram is shared; total grams = 15 tokens − 12 = 3
    assert(got === Map(0L -> ((3L, 1L))))
  }

  test("longer shared runs count one dirty gram per window position") {
    val r15 = span(15, "c")
    val got = run(
      (0L, "train", s"t1 $r15 t2"),
      (1L, "valid", s"v1 $r15 v2"))
    // a 15-token run contains 15−12 = 3 distinct 13-grams, all dirty
    assert(got(0L)._2 === 3L)
  }

  test("repeated grams within one doc count once (distinct per doc)") {
    val r13 = span(13, "d")
    val got = run(
      (0L, "train", s"$r13 x1 $r13"),
      (1L, "test", r13))
    // the doubled run re-emits the same 13-gram — distinct keeps one;
    // bridging grams around x1 are unshared
    assert(got(0L)._2 === 1L)
  }

  test("eval↔eval and train↔train sharing flags nothing; short docs inert") {
    val r13 = span(13, "e")
    // train↔train only: no eval gram set membership → empty result
    assert(run(
      (0L, "train", s"w1 $r13 w2"),
      (1L, "train", s"w3 $r13 w4")).isEmpty)
    // eval↔eval only: nothing on the train side to flag
    assert(run(
      (0L, "test", s"p1 $r13"),
      (1L, "valid", s"q1 $r13")).isEmpty)
    // sub-13-token docs produce no grams on either side
    assert(run(
      (0L, "train", span(12, "z")),
      (1L, "test", span(12, "z"))).isEmpty)
  }

  test("cut variant: eval-covered positions removed, clean text survives") {
    val r13 = span(13, "a")
    val got = TextOps.decontaminateCutOf(Seq(
      (0L, "train", s"t1 $r13 t2"),
      (1L, "train", "clean x1 x2"),
      (2L, "test", s"e1 $r13 e2")).toDF("doc_id", "split", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc0: exactly the 13 run positions are dirty; padding survives
    assert(got(0L) === ((15L, 13L, "t1 t2")))
    // doc1: clean and short — identity passthrough, zero dirty
    assert(got(1L) === ((3L, 0L, "clean x1 x2")))
    // the eval doc itself is never reported
    assert(!got.contains(2L))
  }

  test("cut variant: overlapping dirty windows cover the union of positions") {
    val r14 = span(14, "b")
    val got = TextOps.decontaminateCutOf(Seq(
      (0L, "train", s"t1 $r14 t2"),
      (1L, "valid", s"e1 $r14 e2")).toDF("doc_id", "split", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // a 14-token shared run = two overlapping 13-grams; their coverage
    // union is 14 positions, counted once each
    assert(got(0L) === ((16L, 14L, "t1 t2")))
  }

  test("non-vacuous on the gate corpus: near-dups straddle the content-addressed split") {
    val got = TextOps.decontaminate(spark, sfDir).collect()
    info(s"contaminated train docs at sf0.001: ${got.length}")
    got.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(2) <= r.getLong(1),
        "dirty gram count must be within [1, total grams]")
    }
  }
}
