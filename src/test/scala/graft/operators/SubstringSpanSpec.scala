package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the pairwise ExactSubstr lane (TextOps.substringSpans, oracle
  * row `dedup_substring_spans`) on its two defining properties:
  *
  *  1. VERBATIM — every reported span is a token-for-token match
  *     between the pair at the reported positions.
  *  2. MAXIMAL — extending a reported span by one token on either
  *     side breaks the match or falls off a document boundary (the
  *     suffix-array LCP contract the diagonal islands reproduce).
  *
  * Plus the per-partner discipline that distinguishes this lane from
  * [[TextOps.spanRuns]]: grams shared with DIFFERENT partners must
  * never stitch into one reported span.
  */
class SubstringSpanSpec extends SparkSpec {
  import spark.implicits._

  private def spans(minLen: Int, texts: String*) =
    TextOps.substringSpansOf(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      k = 5, minLen = minLen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private def span(n: Int, p: String) = (1 to n).map(p + _).mkString(" ")

  test("a shared 20-token substring is reported once, at its exact extent") {
    val rep = span(20, "s")
    val r = spans(15, s"a1 a2 $rep a3", s"b1 $rep b2 b3 b4")
    assert(r.toSeq === Seq((0L, 1L, 3L, 2L, 20L)))
  }

  test("every reported span is verbatim and two-sided maximal (sf0.001)") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val toks = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val rows = TextOps.substringSpans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty, "the gate corpus must exercise the lane")
    rows.foreach { case (a, b, ap0, bp0, len0) =>
      val (ta, tb) = (toks(a), toks(b))
      val (ap, bp, len) = (ap0.toInt - 1, bp0.toInt - 1, len0.toInt) // 1-based
      assert(ta.slice(ap, ap + len).sameElements(tb.slice(bp, bp + len)),
        s"span ($a,$b,$ap0,$bp0,$len0) must match verbatim")
      val leftExtends = ap > 0 && bp > 0 && ta(ap - 1) == tb(bp - 1)
      val rightExtends = ap + len < ta.length && bp + len < tb.length &&
        ta(ap + len) == tb(bp + len)
      assert(!leftExtends, s"span ($a,$b,$ap0,$bp0,$len0) extends left")
      assert(!rightExtends, s"span ($a,$b,$ap0,$bp0,$len0) extends right")
    }
  }

  test("grams shared with different partners never stitch into one span") {
    // doc0 carries X immediately followed by Y; doc1 shares only X,
    // doc2 shares only Y — spanRuns would chain X·Y inside doc0, but
    // the pairwise lane must report (0,1):X and (0,2):Y separately
    val x = span(15, "x")
    val y = span(15, "y")
    val r = spans(15, s"$x $y", s"p1 $x p2", s"q1 $y q2")
    assert(r.toSet === Set((0L, 1L, 1L, 2L, 15L), (0L, 2L, 16L, 2L, 15L)))
  }

  test("spans below minLen are kept out; a df-capped gram cannot seed") {
    val shared = span(10, "m")
    assert(spans(15, s"u $shared", s"v $shared w").isEmpty)
    // a gram occurring in 12 docs exceeds dfCap=3 and never seeds
    val boiler = span(20, "z")
    val docs = (0 until 12).map(i => s"d$i $boiler")
    val capped = TextOps.substringSpansOf(
      docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      k = 5, minLen = 15, dfCap = 3)
    assert(capped.count() === 0L)
  }
}
