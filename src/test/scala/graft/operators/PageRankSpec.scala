package graft.operators

import graft.SparkSpec

/** Contract of the exact-integer PageRank: determinism across runs
  * (the oracle gate depends on it), namespaced node ids, and the
  * teleport floor every node's rank must clear.
  */
class PageRankSpec extends SparkSpec {

  test("trade pagerank: deterministic, namespaced, above the teleport floor") {
    val a = PageRank.supplierPageRank(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a.size === 20)
    // every rank ≥ the teleport constant; ids are namespaced longs
    a.foreach { case (node, rank, _) =>
      assert(rank >= 150000L)
      assert(node >= 0L)
    }
    // ranks are non-increasing in rnk order with deterministic tie-break
    a.sliding(2).foreach { case Seq((n1, r1, _), (n2, r2, _)) =>
      assert(r1 > r2 || (r1 == r2 && n1 < n2))
    }
    // bit-identical across a second FRESH build: k = 21 misses the
    // StageMemo key (pagerank_5_20), so the whole iteration loop reruns
    // — its top 20 rows must reproduce the first run exactly
    val b = PageRank.supplierPageRank(spark, sfDir, iters = 5, k = 21)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(b.size === 21)
    assert(a === b.take(20))
  }
}
