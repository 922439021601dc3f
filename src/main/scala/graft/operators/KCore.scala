package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** k-core decomposition (bounded peel trace) over the customer↔supplier
  * trade graph — the fourth classic graph kernel beside [[PageRank]],
  * [[ConnectedComponents]] and [[Triangles]], and the standard
  * "dense-substructure" filter (Seidman 1983; Batagelj–Zaveršnik): the
  * k-core is the maximal subgraph where every node keeps degree ≥ k,
  * found by repeatedly peeling nodes of degree < k.
  *
  * The threshold is DATA-ADAPTIVE: k = the lower-median degree — the
  * exact order statistic at rank ⌈n/2⌉ under the total (degree, node)
  * order — so the peel bites at every scale factor (a fixed literal k
  * is either vacuous or total on a graph whose density moves with
  * corpus size; the part co-purchase graph here never drops below
  * degree 38, while this bipartite graph's median runs 10 → 39 across
  * the test SFs). Both engines derive k from the same rank formula, so
  * it stays hash-exact without ever being a tuned constant.
  *
  * Semantics are an R-round bounded peel TRACE — one row per round:
  * the threshold, how many nodes the round peeled, and what survives —
  * the convergence artifact a deployment inspects before trusting the
  * core (the operating-curve discipline of the LSH banding and IVF
  * nprobe sweeps applied to an iterative kernel). A zero-peel round IS
  * the termination certificate (the peel is a monotone fixpoint
  * iteration); KCoreSpec pins that simulating one more round past a
  * zero-peel tail stays at zero and that every survivor keeps
  * degree ≥ k.
  *
  * Determinism: every emitted value is a count over sets derived by
  * pure (degree < k) predicates on exact integer degrees — bit-exact
  * in the DuckDB oracle, which unrolls the R rounds CTE by CTE.
  *
  * Scale: each round is one degree hash-agg over surviving edges plus
  * two semi-joins against the surviving node set — no driver funnel
  * beyond the threshold scalar, which folds from the DEGREE HISTOGRAM
  * ((d, count) rows — bounded by the distinct-degree count, which
  * grows like the max degree, not the node count), never from a node
  * list. Rounds localCheckpoint with the previous round unpersisted
  * (the [[PageRank]]/[[ConnectedComponents]] pattern) so lineage stays
  * O(1) in the round count; peeling is monotone — the edge frame only
  * shrinks — so the first round bounds the cost of every later one.
  */
object KCore {

  /** Trace rows: (round, k, n_peeled, n_remaining, n_edges) for rounds
    * 1..R of the median-degree peel. `n_remaining`/`n_edges` count the
    * node and edge survivors AFTER the round's removal.
    */
  def kcorePeel(spark: SparkSession, dir: String,
                rounds: Int = 6): DataFrame =
    StageMemo.memoized(spark, s"kcore_med_$rounds", dir)(
      build(spark, dir, rounds))

  /** The distinct customer↔supplier trade edge list, node ids
    * namespaced like [[PageRank]] (2·custkey even / 2·suppkey+1 odd) —
    * canonical one-row-per-undirected-edge form (a even, b odd).
    */
  private[graft] def tradeEdges(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()

  private def degrees(edges: DataFrame): DataFrame =
    edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))

  private def build(spark: SparkSession, dir: String,
                    rounds: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark2 = spark
    import spark2.implicits._

    var edges = tradeEdges(spark, dir).persist(MEMORY_AND_DISK)
    val deg0 = degrees(edges)
    // lower-median degree via the degree HISTOGRAM: (d, count) rows
    // walked cumulatively — the driver never holds a node list
    val hist = deg0.groupBy(col("d")).agg(count(lit(1)).as("c"))
      .orderBy(col("d")).as[(Long, Long)].collect()
    val n = hist.map(_._2).sum
    val kRank = (n + 1) / 2
    // pure cumulative walk (scanLeft) — no mutation inside a pattern
    // guard, so correctness never hinges on single-evaluation semantics
    val cums = hist.scanLeft(0L)(_ + _._2).tail
    val k = hist.zip(cums)
      .collectFirst { case ((d, _), cum) if cum >= kRank => d }
      .getOrElse(0L)

    var alive = deg0.select(col("node")).localCheckpoint(true)
    var trace = Vector.empty[(Long, Long, Long, Long, Long)]
    var round = 1
    while (round <= rounds) {
      val deg = degrees(edges)
      val survivors = alive.join(deg, Seq("node"), "left")
        .filter(coalesce(col("d"), lit(0L)) >= k)
        .select(col("node")).localCheckpoint(true)
      val nAlive = alive.count()
      val nSurv = survivors.count()
      val nextEdges = edges
        .join(survivors.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(survivors.select(col("node").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b")).persist(MEMORY_AND_DISK)
      val nEdges = nextEdges.count()
      edges.unpersist(); alive.unpersist()
      edges = nextEdges; alive = survivors
      trace = trace :+ ((round.toLong, k, nAlive - nSurv, nSurv, nEdges))
      round += 1
    }
    edges.unpersist(); alive.unpersist()
    trace.toDF("round", "k", "n_peeled", "n_remaining", "n_edges")
      .orderBy(col("round"))
  }
}
