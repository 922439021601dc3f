package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the push-PPR lane (Ppr.pprTopK, oracle row `q_ppr_topk`)
  * against a driver-side integer simulation of the same synchronous
  * push recurrence on the sf0.001 co-purchase graph, plus the serving
  * exclusions (no source, no existing neighbor) and determinism.
  */
class PprSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  private def simulate(rounds: Int, probeMod: Int,
                       k: Int): Seq[(Long, Long, Long, Long)] = {
    val e = Triangles.copurchaseEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e.map(p => (p._1, p._2)) ++ e.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSeq }
    val deg = adj.map { case (u, vs) => u -> vs.length.toLong }
    val probes = adj.keys.filter(_ % probeMod == 0).toSeq.sorted
    probes.flatMap { p =>
      var r = Map(p -> Scale)
      val score = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      (0 until rounds).foreach { _ =>
        // ACL's ε-push condition: active iff r >= (ε·SCALE)·deg
        val (active, inactive) = r.partition {
          case (u, ru) => ru >= 100000L * deg(u)
        }
        active.foreach { case (u, ru) => score(u) += ru * 3 / 20 }
        val next = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        inactive.foreach { case (u, ru) => next(u) += ru }
        active.foreach { case (u, ru) =>
          val share = ru * 17 / (20 * deg(u))
          adj(u).foreach(v => next(v) += share)
        }
        r = next.toMap
      }
      val excluded = adj(p).toSet + p
      score.toSeq
        .filter { case (u, s) => s > 0 && !excluded.contains(u) }
        .sortBy { case (u, s) => (-s, u) }
        .take(k).zipWithIndex
        .map { case ((u, s), i) => (p, u, s, i + 1L) }
    }
  }

  test("distributed push == driver-side integer simulation (sf0.001)") {
    val got = Ppr.pprTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty, "the gate corpus must exercise the lane")
    assert(got.toSeq === simulate(3, 97, 5))
  }

  test("no source or existing neighbor ever ranks; scores positive") {
    val e = Triangles.copurchaseEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (e ++ e.map(_.swap)).groupBy(_._1)
      .map { case (u, vs) => u -> vs.map(_._2).toSet }
    Ppr.pprTopK(spark, sfDir).collect().foreach { r =>
      val (p, u, s) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(u != p && s > 0)
      assert(!nbrs(p).contains(u), s"existing edge ($p,$u) must be excluded")
    }
  }
}
