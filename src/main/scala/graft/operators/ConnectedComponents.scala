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
    * Convergence test is EXACT set equality (counts equal + one-sided
    * exceptAll empty — both sides are distinct sets): at the fixpoint
    * the edge set is a star forest, each node pointing straight at its
    * component minimum. The equality check is one extra pass over the
    * (shrinking) edge set per round — cheap insurance against a
    * checksum collision silently mislabeling a cluster.
    */
  def labels(edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    // lazy checkpoints: the convergence count() below materializes the
    // truncated lineage, so each round pays one action fewer than an
    // eager checkpoint would
    var cur = edges
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
              least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(false)
    var curCount = cur.count()
    var done = false
    var round = 0
    while (!done && round < maxRounds) {
      val next = smallStar(largeStar(cur)).localCheckpoint(false)
      val nextCount = next.count()
      done = nextCount == curCount && next.exceptAll(cur).isEmpty
      cur = next
      curCount = nextCount
      round += 1
    }
    require(done, s"connected components did not converge in $maxRounds rounds")
    cur.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .union(cur.select(col("v"), col("v")).distinct()
        .toDF("doc_id", "cluster_id"))
      .distinct()
  }
}
