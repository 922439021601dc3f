package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PageRank over the bipartite customer↔supplier trade graph — the
  * second iterative graph operator beside [[ConnectedComponents]], and
  * the influence-ranking shape (who do the important buyers buy from?)
  * that degree counting can't express: a supplier serving few but
  * highly-connected customers outranks one serving many one-order
  * customers.
  *
  * Graph: an edge per DISTINCT (customer, supplier) trade relation,
  * materialized in BOTH directions, so every node has out-edges and the
  * dangling-mass problem vanishes. Node ids namespace the two key
  * spaces (2·custkey / 2·suppkey+1).
  *
  * Determinism (the whole point of this formulation): ranks live in
  * integer micro-units and every per-edge contribution is the exact
  * integer division (r·17) div (20·deg) — damping 0.85 as a rational —
  * so partial-aggregation order can never change a bit, and the DuckDB
  * oracle reproduces all five unrolled iterations value-exactly.
  * Float PageRank would be order-dependent and oracle-hostile.
  *
  * Scale: each iteration is one join of the edge list against the
  * (node-cardinality) rank frame plus a hash-agg on dst — edges never
  * re-shuffle (the persisted edge frame is partitioned once), and the
  * driver holds nothing but the loop counter. Rounds localCheckpoint
  * with the previous round unpersisted ([[ConnectedComponents]]
  * pattern), so lineage and cache stay O(1) in the iteration count.
  */
object PageRank {

  def supplierPageRank(spark: SparkSession, dir: String,
                       iters: Int = 5, k: Int = 20): DataFrame =
    // the iteration loop runs actions at build time (like the CC label
    // stage), so it stages once per session, not once per enumeration
    StageMemo.memoized(spark, s"pagerank_${iters}_$k", dir)(
      build(spark, dir, iters, k))

  private def build(spark: SparkSession, dir: String,
                    iters: Int, k: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e0 = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // (src, dst, d): the iteration-invariant frame, staged once
    val ed = edges.join(deg, Seq("src")).persist(MEMORY_AND_DISK)

    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
      .localCheckpoint(true)
    var round = 0
    while (round < iters) {
      val next = ed.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("(r * 17) div (20 * d)").as("c"))
        .groupBy(col("dst"))
        .agg((lit(150000L) + sum(col("c"))).as("r"))
        .select(col("dst").as("node"), col("r"))
        .localCheckpoint(true) // eager: cut lineage before dropping prior
      ranks.unpersist()
      ranks = next
      round += 1
    }
    // partition-less window over the limit(k) frame: ≤ k rows move to
    // one partition (the "No Partition Defined" warning is report-sized)
    val out = ranks.orderBy(col("r").desc, col("node")).limit(k)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          col("r").desc, col("node"))).cast("bigint"))
      .select(col("node"), col("r").as("rank_micro"), col("rnk"))
      .localCheckpoint(true) // sever from the per-round checkpoints
    ranks.unpersist()
    ed.unpersist()
    out
  }
}
