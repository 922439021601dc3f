package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the fuzzy record-linkage lane (oracle row `dedup_fuzzy_names`):
  * token-blocking completeness against an all-pairs brute force,
  * verify precision (dist bounds, ordered pair), and the distinct-name
  * class counts that let the lane skip corpus-quadratic work.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  // rows are (name_a, name_b, dist, n_a, n_b)
  private lazy val pairs =
    Linkage.fuzzyNamePairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("every emitted pair is ordered, within [1,2] edits, and truly at that distance") {
    assert(pairs.nonEmpty) // non-vacuous at sf0.001
    pairs.foreach { case (a, b, dist, _, _) =>
      assert(a < b, s"unordered pair ($a, $b)")
      assert(dist >= 1 && dist <= 2)
      assert(lev(a, b).toLong === dist, s"distance mismatch for ($a, $b)")
    }
  }

  test("blocking is complete for token-sharing pairs: brute force over the name vocabulary agrees") {
    val names = graft.Tables.part(spark, sfDir)
      .select(col("p_name")).distinct().as[String].collect().sorted
    val brute = for {
      i <- names.indices; j <- (i + 1) until names.length
      a = names(i); b = names(j)
      if a.split(' ').toSet.intersect(b.split(' ').toSet).nonEmpty
      d = lev(a, b) if d >= 1 && d <= 2
    } yield (a, b, d.toLong)
    assert(pairs.map(p => (p._1, p._2, p._3)).toSet === brute.toSet)
  }

  test("pair counts are the per-name occurrence counts (class collapse, not row explosion)") {
    val counts = graft.Tables.part(spark, sfDir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    pairs.foreach { case (a, b, _, na, nb) =>
      assert(na === counts(a) && nb === counts(b))
    }
  }

  test("deterministic across invocations") {
    assert(pairs.sorted.toSeq ===
      Linkage.fuzzyNamePairs(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sorted.toSeq)
  }
}
