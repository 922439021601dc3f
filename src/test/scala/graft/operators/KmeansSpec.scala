package graft.operators

import graft.SparkSpec

/** Lloyd-step contract for the IVF codebook trainer: the spherical
  * k-means refinement must not increase the Σ(1−cos) objective
  * (assignment and update each minimize it for the other held fixed),
  * must be deterministic, and must return a full codebook.
  */
class KmeansSpec extends SparkSpec {

  test("one refinement step: objective non-increasing, deterministic, full codebook") {
    val (cb1, before1, after1) = Similarity.kmeansRefineCodebook(spark, sfDir)
    assert(cb1.size === Similarity.CodebookK)
    cb1.foreach { case (_, v) =>
      assert(v.length === 64)
      // refined centroids are unit vectors
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"centroid norm $n")
    }
    assert(before1 > 0)
    assert(after1 <= before1 + 1e-6,
      s"Lloyd step increased the objective: $before1 -> $after1")
    // and genuinely improves on this corpus (hash-sampled init is crude)
    assert(after1 < before1)

    // determinism up to float-accumulation order: the cost is a sum of
    // shuffle partials and the update an avg of doubles, so two runs may
    // differ in the last ulps — compare with a tight relative tolerance,
    // not bit equality
    val (cb2, before2, after2) = Similarity.kmeansRefineCodebook(spark, sfDir)
    assert(math.abs(before1 - before2) <= 1e-9 * before1)
    assert(math.abs(after1 - after2) <= 1e-9 * after1)
    assert(cb1.map(_._1) === cb2.map(_._1))
    cb1.zip(cb2).foreach { case ((_, a), (_, b)) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) <= 1e-5f) }
    }
  }
}
