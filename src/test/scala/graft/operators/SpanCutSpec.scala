package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the ExactSubstr span cut (TextOps.spanCut, oracle row
  * `dedup_span_cut`): coverage is the UNION of cross-doc-repeated
  * 5-gram extents, within-doc repeats never fire, short docs pass
  * through, and the cut text keeps exactly the uncovered tokens in
  * order.
  */
class SpanCutSpec extends SparkSpec {
  import spark.implicits._

  private def cut(texts: String*) =
    TextOps.spanCutOf(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      k = 5)
      .orderBy(col("doc_id")).collect()

  test("a 7-token shared run covers exactly its 7 positions in both docs") {
    val run = "s1 s2 s3 s4 s5 s6 s7"
    val r = cut(s"a1 a2 $run a3", s"b1 $run b2 b3")
    assert(r(0).getLong(1) === 10L && r(0).getLong(2) === 7L)
    assert(r(0).getString(3) === "a1 a2 a3")
    assert(r(1).getLong(2) === 7L)
    assert(r(1).getString(3) === "b1 b2 b3")
  }

  test("within-doc repetition alone never cuts (distinct-doc df, not occurrences)") {
    val run = "r1 r2 r3 r4 r5"
    val r = cut(s"$run x1 $run", "unrelated words only here now")
    assert(r(0).getLong(2) === 0L)
    assert(r(0).getString(3).startsWith("r1"))
  }

  test("docs shorter than k produce no grams and pass through whole") {
    val r = cut("t1 t2 t3", "t1 t2 t3")
    r.foreach { row =>
      assert(row.getLong(1) === 3L && row.getLong(2) === 0L)
      assert(row.getString(3) === "t1 t2 t3")
    }
  }

  test("a fully-shared doc cuts to empty but keeps its row") {
    val run = "f1 f2 f3 f4 f5 f6"
    val r = cut(run, s"$run tail1 tail2")
    assert(r(0).getLong(2) === 6L && r(0).getString(3) === "")
    assert(r(1).getString(3) === "tail1 tail2")
  }

  test("overlapping shared runs union their coverage (no double count)") {
    // doc0 shares tokens 1-6 with doc1 and tokens 5-10 with doc2:
    // coverage = union 1..10, counted once each
    val a = "c1 c2 c3 c4 c5 c6"
    val b = "c5 c6 c7 c8 c9 c10"
    val r = cut(s"c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 z1",
      s"$a y1 y2", s"$b y3 y4")
    assert(r(0).getLong(2) === 10L)
    assert(r(0).getString(3) === "z1")
  }
}
