package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the weighted-Jaccard near-dup row (MinHash.weightedJaccardPairs,
  * oracle row `dedup_weighted_jaccard`) on the property that justifies
  * it: rarity weighting ranks shared RARE content above shared
  * boilerplate that unweighted Jaccard scores identically.
  */
class WeightedJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(threshold: Double, texts: (Long, String)*) =
    MinHash.weightedJaccardPairsOf(texts.toDF("doc_id", "text"), threshold)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap

  test("identical docs score 1.0; disjoint docs never pair") {
    val p = pairs(0.0,
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "one two three four five six seven eight nine ten")
    assert(p((1L, 2L)) === 1.0)
    assert(!p.contains((1L, 3L)) && !p.contains((2L, 3L)))
  }

  test("shared rare content outranks equal-size shared boilerplate") {
    // docs 1&2 share a RARE clause (df=2); docs 3&4 share a clause that
    // is BOILERPLATE (df=8 via docs 10..15 repeating it). Same shared
    // shingle COUNT per pair and same doc sizes, so unweighted Jaccard
    // ties them — the rarity weight must rank (1,2) strictly higher.
    val boiler = "the quick brown fox jumps over lazy dogs today"
    val rare = "quantum flux capacitor resonates beneath crystal archways tonight"
    val fillers = (10L to 15L).map(i => i -> s"pad$i x$i y$i z$i w$i v$i u$i t$i s$i $boiler")
    val docs = Seq(
      1L -> s"intro one1 two1 three1 $rare",
      2L -> s"other four2 five2 six2 $rare",
      3L -> s"intro one3 two3 three3 $boiler",
      4L -> s"other four4 five4 six4 $boiler") ++ fillers
    val p = pairs(0.0, docs: _*)
    assert(p.contains((1L, 2L)) && p.contains((3L, 4L)))
    assert(p((1L, 2L)) > p((3L, 4L)),
      s"rare-content pair ${p((1L, 2L))} must outrank boilerplate pair ${p((3L, 4L))}")
    // and the weighting WIDENS the separation beyond what unweighted
    // Jaccard sees (boundary shingles differ slightly between the two
    // constructions, so the unweighted scores are near-tied, not tied)
    val uw = MinHash.ngramJaccardPairsOf(docs.toDF("doc_id", "text"), 0.0, MinHash.DfCap)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(p((1L, 2L)) - p((3L, 4L)) > uw((1L, 2L)) - uw((3L, 4L)),
      "rarity weighting must widen the rare-vs-boilerplate separation")
  }

  test("gate corpus: weighted pairs agree with a driver-side recompute (sf0.001)") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val got = MinHash.weightedJaccardPairs(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty, "the gate corpus must exercise the lane")
    got.foreach { case ((a, b), (iw, uw)) =>
      assert(iw > 0 && uw >= iw && iw * 2 >= uw,
        s"pair ($a,$b): inter_w=$iw union_w=$uw violates the threshold")
    }
  }
}
