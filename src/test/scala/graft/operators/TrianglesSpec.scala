package graft.operators

import graft.SparkSpec

/** Triangle-count spec: the engine's oriented-wedge-closure census must
  * equal a from-scratch adjacency-set recount of the same graph.
  */
class TrianglesSpec extends SparkSpec {

  test("triangleCount equals a brute-force adjacency recount") {
    val edges = Triangles.copurchaseEdges(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(edges.nonEmpty)
    assert(edges.forall { case (a, b) => a < b })
    assert(edges.distinct.length === edges.length)
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    // brute recount: for each edge (a,b), common neighbors with id > b —
    // counts each triangle once at its smallest-id edge
    var tri = 0L
    edges.foreach { case (a, b) =>
      val common = adj(a).intersect(adj(b))
      tri += common.count(c => c > b)
    }
    val row = Triangles.triangleCount(spark, sfDir).collect()(0)
    assert(row.getAs[Long]("n_nodes") === adj.size.toLong)
    assert(row.getAs[Long]("n_edges") === edges.length.toLong)
    assert(row.getAs[Long]("n_triangles") === tri)
    assert(tri > 0L, "vacuous graph: no triangles at this sf")
  }

  test("linkPrediction: scores are exact common-neighbor counts, never existing edges") {
    val edges = Triangles.copurchaseEdges(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    // driver-side reference: per probe, common-neighbor counts of every
    // non-adjacent 2-hop candidate, top-5 by (count desc, id)
    val expected = adj.keys.filter(_ % 97 == 0).flatMap { p =>
      val counts = scala.collection.mutable.Map.empty[Long, Long]
      adj(p).foreach(u => adj(u).foreach { y =>
        if (y != p) counts(y) = counts.getOrElse(y, 0L) + 1 })
      counts.toSeq
        .filter { case (y, _) => !adj(p).contains(y) }
        .sortBy { case (y, c) => (-c, y) }.take(5)
        .zipWithIndex
        .map { case ((y, c), i) => (p, y, c, (i + 1).toLong) }
    }.toSet
    val got = Triangles.linkPrediction(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_part"), r.getAs[Long]("cand_part"),
        r.getAs[Long]("n_common"), r.getAs[Long]("rnk"))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "vacuous: no probe produced a prediction")
    got.foreach { case (p, y, c, _) =>
      assert(!adj(p).contains(y), s"predicted an existing edge $p-$y")
      assert(c === adj(p).intersect(adj(y)).size.toLong)
    }
  }
}
