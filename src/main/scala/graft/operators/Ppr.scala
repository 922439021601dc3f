package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSONALIZED PageRank in PUSH form (Andersen, Chung & Lang 2006,
  * "Local Graph Partitioning using PageRank Vectors" — the
  * approximate-PPR push algorithm), over the part co-purchase graph in
  * the PROBE-BATCH serving shape of [[Triangles.linkPrediction]]: for
  * each probe node, rank every nearby candidate by the random-walk
  * mass that flows to it from the probe — the related-items ranker
  * that beats raw common-neighbor counts by weighting witnesses by
  * their degree and depth instead of counting them.
  *
  * Algorithm (synchronous bounded-round ε-push — the BSP dual of
  * ACL's sequential queue, WITH the paper's push threshold): per probe
  * p, residual r₀ = SCALE at p; each round, a node is ACTIVE iff
  * r(u) ≥ EpsScaled·deg(u) (EpsScaled = ε·SCALE, ε = 10⁻⁷ unit mass
  * per degree — ACL's queue condition in integers); active
  * nodes absorb α·r into the score (α = 3/20) and push (1−α)·r split
  * by degree to the neighbors, inactive nodes CARRY their residual
  * unchanged. The threshold is the whole scale story: total push work
  * per source is O(1/(ε·α)) regardless of graph size (each push
  * retires ≥ ε·deg(u) residual mass from a unit budget), where the
  * unthresholded synchronous variant saturates the R-hop ball — a
  * measured 33-minute blowup at the sf1 graph density. All arithmetic
  * is int64 with truncating division on non-negative operands
  * (`div` / `//`) — the [[PageRank]] lane's integer discipline, so the
  * ranking is bit-exact in the DuckDB oracle, which unrolls the rounds
  * with MATERIALIZED CTEs (the [[Bfs]]/[[KCore]] convention).
  *
  * Serving semantics: the source itself and its direct neighbors are
  * excluded (the "not yet connected" contract shared with
  * link-prediction), zero-mass candidates drop, ties break
  * (score desc, candidate id), top-k per probe via the k-bounded heap.
  *
  * Scale: round t costs one join of the residual frontier against the
  * adjacency — Σ deg(frontier), proportional to the probe batch's
  * R-hop ball, never the corpus (the reason push-PPR exists; a full
  * power iteration would be corpus-sized per round). Frontiers
  * localCheckpoint so lineage stays O(1) in rounds; the only broadcast
  * is the probe adjacency (the link-prediction discipline — never the
  * corpus-sized edge list).
  */
object Ppr {

  private val Scale = 1000000000000L // 10^12 initial residual units
  private val EpsScaled = 100000L // ε·SCALE: ε = 10^-7 unit mass per degree

  def pprTopK(spark: SparkSession, dir: String, k: Int = 5,
              rounds: Int = 3, probeMod: Int = 97): DataFrame =
    StageMemo.memoized(spark, s"ppr_topk_${k}_${rounds}_$probeMod", dir)(
      build(spark, dir, k, rounds, probeMod))

  private def build(spark: SparkSession, dir: String, k: Int,
                    rounds: Int, probeMod: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = Triangles.copurchaseEdges(spark, dir)
    val ebi = e.select(col("a").as("u"), col("b").as("n"))
      .unionAll(e.select(col("b").as("u"), col("a").as("n")))
      .persist(MEMORY_AND_DISK)
    val deg = ebi.groupBy(col("u")).agg(count(lit(1)).as("d"))
    // probe adjacency: ∝ probe batch — the anti-join side AND hop-1
    val hop1 = ebi.filter(col("u") % probeMod === 0)
      .select(col("u").as("p"), col("n").as("y"))
      .localCheckpoint(true)
    var r = ebi.select(col("u")).distinct()
      .filter(col("u") % probeMod === 0)
      .select(col("u").as("p"), col("u"), lit(Scale).as("r"))
      .localCheckpoint(true)
    var absorbed = Vector.empty[DataFrame]
    var round = 0
    while (round < rounds) {
      val withDeg = r.join(deg, Seq("u"))
      // ACL's push condition in pre-scaled integer form: active iff
      // r(u) ≥ (ε·SCALE)·deg(u) (= r/deg ≥ ε in unit mass) — no wide
      // multiply on the residual side, so no int64 overflow headroom
      // is spent on the comparison
      val isActive = col("r") >= lit(EpsScaled) * col("d")
      val active = withDeg.filter(isActive)
      val inactive = withDeg.filter(!isActive)
        .select(col("p"), col("u"), col("r"))
      // absorb α·r = (r·3) div 20 from ACTIVE nodes only — exact
      // int64, non-negative operands
      absorbed = absorbed :+ active.select(col("p"), col("u"),
        expr("(r * 3) div 20").as("m"))
      // the LAST round only absorbs: its pushed residual would be
      // discarded unabsorbed, and that push is the single biggest join
      // of the whole kernel (Σ deg over the widest frontier — measured
      // a 3.5G-row no-op at the sf1 graph density)
      if (round < rounds - 1) {
        // ONE shuffle per round: raw shares union carried residuals,
        // then a single (p, u) hash-agg (map-side combined) — the
        // previous shape aggregated the pushes and re-aggregated the
        // union, shuffling the widest frame twice
        val pushed = active.join(ebi, Seq("u"))
          .select(col("p"), col("n").as("u"),
            expr("(r * 17) div (20 * d)").as("r"))
        val next = pushed.unionAll(inactive)
          .groupBy(col("p"), col("u")).agg(sum(col("r")).as("r"))
        // checkpoint only frames another round will ITERATE on; the
        // final residual frame is consumed once (last-round absorb),
        // so materializing it would double its I/O for nothing
        r = if (round < rounds - 2) next.localCheckpoint(true) else next
      }
      round += 1
    }
    val score = absorbed.reduce(_ unionAll _)
      .groupBy(col("p"), col("u")).agg(sum(col("m")).as("score"))
      .filter(col("score") > 0 && col("u") =!= col("p"))
    val pred = score.join(
      broadcast(hop1.select(col("p"), col("y").as("u"))),
      Seq("p", "u"), "left_anti")
    ebi.unpersist()
    Dedup.topKPerKey(
        pred.select(col("p").as("probe_part"), col("u").as("cand_part"),
          col("score")),
        Seq("probe_part"), Seq(-col("score"), col("cand_part")), k)
      .withColumnRenamed("rk", "rnk")
      .orderBy(col("probe_part"), col("rnk"))
  }
}
