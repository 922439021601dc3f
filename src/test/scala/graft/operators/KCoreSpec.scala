package graft.operators

import graft.SparkSpec

/** k-core peel-trace spec: the engine's bounded peel must equal a
  * from-scratch driver-side simulation round for round (including the
  * median-degree threshold derivation), and a zero-peel final round
  * must be a genuine fixpoint (one more simulated round also peels
  * nothing and the survivors all keep degree >= k).
  */
class KCoreSpec extends SparkSpec {

  private val R = 6

  private def degreesOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val deg = scala.collection.mutable.Map.empty[Long, Long]
    edges.foreach { case (a, b) =>
      deg(a) = deg.getOrElse(a, 0L) + 1; deg(b) = deg.getOrElse(b, 0L) + 1
    }
    deg.toMap
  }

  /** Driver-side reference peel at threshold k: (peeled, remaining,
    * edges) per round plus the final surviving edge set.
    */
  private def simulate(edges0: Seq[(Long, Long)], k: Long, rounds: Int)
  : (Seq[(Long, Long, Long)], Seq[(Long, Long)]) = {
    var edges = edges0
    var alive = edges0.flatMap(e => Seq(e._1, e._2)).toSet
    val trace = Seq.newBuilder[(Long, Long, Long)]
    for (_ <- 1 to rounds) {
      val deg = degreesOf(edges)
      val survivors = alive.filter(n => deg.getOrElse(n, 0L) >= k)
      val nextEdges = edges.filter { case (a, b) =>
        survivors(a) && survivors(b) }
      trace += (((alive.size - survivors.size).toLong,
        survivors.size.toLong, nextEdges.length.toLong))
      alive = survivors; edges = nextEdges
    }
    (trace.result(), edges)
  }

  test("kcorePeel trace equals the simulated peel at the median-degree threshold") {
    val edges = KCore.tradeEdges(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSeq
    assert(edges.nonEmpty)
    assert(edges.distinct.length === edges.length)
    // threshold recomputation: lower-median degree = the order
    // statistic at rank ceil(n/2) under (degree, node) order
    val deg0 = degreesOf(edges)
    val sorted = deg0.toSeq.map { case (node, d) => (d, node) }.sorted
    val expectedK = sorted(((sorted.size + 1) / 2) - 1)._1
    val (expected, survivingEdges) = simulate(edges, expectedK, R)

    val got = KCore.kcorePeel(spark, sfDir, R).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("k"),
        r.getAs[Long]("n_peeled"), r.getAs[Long]("n_remaining"),
        r.getAs[Long]("n_edges"))).toSeq.sortBy(_._1)
    assert(got.map(_._2).toSet === Set(expectedK))
    assert(got.map(t => (t._3, t._4, t._5)) === expected)
    // survivor and edge counts are monotone non-increasing
    got.map(_._4).sliding(2).foreach { case Seq(x, y) => assert(x >= y); case _ => }
    got.map(_._5).sliding(2).foreach { case Seq(x, y) => assert(x >= y); case _ => }
    // non-vacuous at this sf: the median threshold peels something in
    // round 1 and something survives the full trace
    assert(got.head._3 > 0L, "vacuous: round 1 peeled nothing")
    assert(got.last._4 > 0L, "vacuous: nothing survives the peel")
    if (got.last._3 == 0L) {
      // termination certificate: a zero-peel round is a fixpoint —
      // one more simulated round peels nothing, and every surviving
      // node keeps degree >= k inside the surviving subgraph
      val (again, _) = simulate(survivingEdges, expectedK, 1)
      assert(again.head._1 === 0L)
      assert(degreesOf(survivingEdges).values.forall(_ >= expectedK))
    }
  }
}
