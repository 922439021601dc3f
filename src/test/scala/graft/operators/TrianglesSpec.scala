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
}
