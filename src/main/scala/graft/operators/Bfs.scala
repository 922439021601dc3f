package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search (bounded-round frontier trace)
  * over the part co-purchase graph — the FIFTH classic graph kernel
  * beside [[PageRank]], [[ConnectedComponents]], [[Triangles]] and
  * [[KCore]], and the primitive under "within N hops" product
  * features (related-item expansion radii, blast-radius estimates,
  * contamination spread). This is the Pregel/BSP textbook workload:
  * each round expands the frontier by one hop of the adjacency.
  *
  * Sources are the SAME probe batch as the link-prediction lane
  * (node % probeMod = 0) — the serving framing again: "how much of
  * the catalog is within r hops of this batch", not an all-pairs
  * shortest-path matrix (inherently n² — the thing you never compute
  * at 100 TB).
  *
  * Semantics: one row per round r = 0..R — nodes FIRST discovered at
  * hop r (`n_frontier`) and cumulative reach (`n_reached`). A
  * zero-frontier round is the termination certificate (frontiers
  * partition the reachable set); BfsSpec pins the partition identity
  * and simulation equality against a driver-side BFS.
  *
  * Determinism: every value is a count over sets built by pure
  * joins/anti-joins — bit-exact in the DuckDB oracle, which unrolls
  * the rounds with MATERIALIZED CTEs (the [[KCore]] lesson: plain
  * CTEs re-expand exponentially through an unrolled chain).
  *
  * Scale: round r costs one join of the frontier against the
  * adjacency (frontier-proportional, the BSP bound Σ deg(frontier)),
  * one distinct, and one anti-join against the visited set; frontiers
  * localCheckpoint with the previous round unpersisted so lineage
  * stays O(1) in rounds. The visited set only ever grows to the
  * reachable node count — never edge-shaped.
  */
object Bfs {

  /** Trace rows: (round, n_frontier, n_reached) for rounds 0..R of the
    * multi-source BFS from the probe batch.
    */
  def bfsHops(spark: SparkSession, dir: String, rounds: Int = 4,
              probeMod: Int = 97): DataFrame =
    StageMemo.memoized(spark, s"bfs_hops_${rounds}_$probeMod", dir)(
      build(spark, dir, rounds, probeMod))

  private def build(spark: SparkSession, dir: String, rounds: Int,
                    probeMod: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark2 = spark
    import spark2.implicits._

    val e = Triangles.copurchaseEdges(spark, dir)
    val ebi = e.select(col("a").as("u"), col("b").as("n"))
      .unionAll(e.select(col("b").as("u"), col("a").as("n")))
      .persist(MEMORY_AND_DISK)

    var frontier = ebi.select(col("u")).distinct()
      .filter(col("u") % probeMod === 0).localCheckpoint(true)
    var visited = frontier
    var trace = Vector((0L, frontier.count(), frontier.count()))
    var round = 1
    while (round <= rounds) {
      val next = ebi.join(frontier, Seq("u"))
        .select(col("n").as("u")).distinct()
        .join(visited, Seq("u"), "left_anti")
        .localCheckpoint(true)
      val nextVisited = visited.unionAll(next).localCheckpoint(true)
      val nNext = next.count()
      trace = trace :+ ((round.toLong, nNext, trace.last._3 + nNext))
      frontier.unpersist(); visited.unpersist()
      frontier = next; visited = nextVisited
      round += 1
    }
    frontier.unpersist(); visited.unpersist(); ebi.unpersist()
    trace.toDF("round", "n_frontier", "n_reached").orderBy(col("round"))
  }
}
