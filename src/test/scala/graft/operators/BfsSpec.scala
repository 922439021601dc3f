package graft.operators

import graft.SparkSpec

/** Multi-source BFS trace: simulation equality against a driver-side
  * BFS over the raw edge list, plus the structural frontier laws.
  */
class BfsSpec extends SparkSpec {

  test("bfsHops: trace equals a driver-side BFS; frontiers partition the reach") {
    val edges = Triangles.copurchaseEdges(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    var frontier = adj.keySet.filter(_ % 97 == 0).toSet
    var visited = frontier
    var expected = Vector((0L, frontier.size.toLong, visited.size.toLong))
    (1 to 4).foreach { r =>
      val next = frontier.flatMap(adj(_)).diff(visited)
      visited = visited ++ next
      frontier = next
      expected = expected :+ ((r.toLong, next.size.toLong, visited.size.toLong))
    }

    val got = Bfs.bfsHops(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_frontier"),
        r.getAs[Long]("n_reached"))).toVector.sortBy(_._1)
    assert(got === expected)
    assert(got.head._2 > 0L, "vacuous: no probe sources at this sf")
    // frontiers partition the reach: cumulative sums reproduce n_reached
    assert(got.map(_._2).scanLeft(0L)(_ + _).tail === got.map(_._3))
    // reach is monotone and bounded by the node count
    assert(got.map(_._3) === got.map(_._3).sorted)
    assert(got.last._3 <= adj.size.toLong)
  }
}
