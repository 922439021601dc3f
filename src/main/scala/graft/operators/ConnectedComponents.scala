package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the step that
  * turns verified near-dup PAIRS into duplicate CLUSTERS (every member
  * labeled with its component's minimum id, the canonical
  * representative). The reference's dedup protocol resolves winners
  * per key (DeduplicationProvider.kt:67-95); near-dup dedup needs the
  * transitive closure of pairwise matches first, which is this
  * operator.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014). Both
  * steps are a single keyed aggregation over the EDGE set — never the
  * full corpus — and the alternation converges in O(log n) rounds
  * (vs O(diameter) for naive label propagation, which a 100 TB
  * pathological chain would turn into thousands of shuffles). Each
  * round's result is `localCheckpoint`ed: iterative DataFrame loops
  * otherwise grow the lineage/plan linearly per round, and Catalyst
  * re-optimization cost grows with it.
  *
  * Determinism: min-id labeling is order-independent; no floats, no
  * randomness — the fixpoint is unique, so the output is
  * oracle-checkable (DuckDB replays it as a recursive reachability
  * CTE, exact on the small test graphs).
  */
object ConnectedComponents {

  /** Large-star: every node connects its LARGER neighbors to the
    * minimum of its neighborhood (incl. itself). Operates on the
    * symmetrized edge set; one shuffle on the node id.
    */
  private[operators] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val m = least(col("u"), min(col("v")).over(Window.partitionBy(col("u"))))
    sym.withColumn("m", m)
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: orient edges (larger → smaller), then connect every
    * smaller neighbor (and the center) to the neighborhood minimum.
    * One shuffle on the larger endpoint.
    */
  private[operators] def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val withM = oriented.withColumn(
      "m", min(col("v")).over(Window.partitionBy(col("u"))))
    withM.select(col("v").as("u"), col("m").as("v"))
      .union(withM.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Component labels for every node in `edges` (columns `u`, `v`):
    * (doc_id, cluster_id) where cluster_id = min node id reachable.
    * Self-loops are dropped; singleton nodes never appear in an edge
    * list, so callers add them back if needed.
    *
    * Convergence test is EXACT set equality: at the fixpoint the edge
    * set is a star forest, each node pointing straight at its component
    * minimum. Both rounds' sets are distinct, so equality ⟺ no (u, v)
    * group of their ±1-marked union sums to a nonzero marker — ONE
    * keyed aggregation, i.e. one Spark action per round (it also
    * materializes the new round's lazy checkpoint), where the earlier
    * count + exceptAll pair paid two. Still exact — never a checksum
    * that could collide and silently mislabel a cluster.
    */
  def labels(edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    var cur = edges
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
              least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(false)
    var done = false
    var round = 0
    while (!done && round < maxRounds) {
      val next = smallStar(largeStar(cur)).localCheckpoint(false)
      val mismatches = next.withColumn("w", lit(1L))
        .union(cur.withColumn("w", lit(-1L)))
        .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))
        .filter(col("w") =!= 0)
        .count()
      done = mismatches == 0L
      // the convergence action above was the last reader of the PRIOR
      // round's checkpoint blocks — free them, or block-manager memory
      // grows by one edge-set copy per round
      unpersistLocalCheckpoint(cur)
      cur = next
      round += 1
    }
    require(done, s"connected components did not converge in $maxRounds rounds")
    cur.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .union(cur.select(col("v"), col("v")).distinct()
        .toDF("doc_id", "cluster_id"))
      .distinct()
  }

  /** WARM-START relabelling after new edges arrive — the incremental
    * half of duplicate-cluster maintenance (the cluster analog of
    * `MinHash.incrementalDedup`): the prior labelling re-enters as its
    * star forest (every node → its component minimum — connectivity-
    * equivalent to the full historical edge set, but only one edge per
    * node), unioned with the NEW batch's edges. Because labels are
    * min-id canonical, the result is identical to recomputing over the
    * full union graph (pinned in ConnectedComponentsSpec), while the
    * iteration never re-touches the historical pair set — at 100 TB
    * the prior graph's edges are long gone; only its labels are stored.
    */
  def labelsIncremental(priorLabels: DataFrame,
                        newEdges: DataFrame): DataFrame =
    labels(priorLabels
      .select(col("doc_id").as("u"), col("cluster_id").as("v"))
      .unionByName(newEdges.select(col("u"), col("v"))))

  /** Drop the materialized RDD blocks behind a `localCheckpoint`ed
    * DataFrame (its analyzed plan is the checkpoint's `LogicalRDD`).
    * Non-blocking: the blocks are garbage, not a correctness hazard.
    * Shared with the other bounded driver loops (BPE training).
    */
  private[operators] def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
